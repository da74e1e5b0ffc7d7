"""DCE-bisect the real bin_and_sort: time with progressively more outputs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from splatter_a_video_tpu.ops import binning as B
from splatter_a_video_tpu.ops.projection import tile_grid

W, H, N = 854, 480, 100_000
MI = 1 << 21
key = jax.random.PRNGKey(0)
depth = jax.random.uniform(key, (N,), minval=0.1, maxval=2.0)
tiles = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 8, dtype=jnp.int32)
rmin = jnp.stack(
    [
        jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 50, dtype=jnp.int32),
        jax.random.randint(jax.random.PRNGKey(3), (N,), 0, 28, dtype=jnp.int32),
    ],
    axis=1,
)
rmax = rmin + jnp.stack([jnp.minimum(tiles, 4), jnp.maximum(tiles // 4, 1)], axis=1)

tgx, tgy = tile_grid(W, H)
T = tgx * tgy
P = B.padded_intersection_size(MI, T, 128)


def stages(depth, tiles, rmin, rmax):
    tiles = jnp.minimum(tiles.astype(jnp.int32), 32)
    offs = jnp.cumsum(tiles) - tiles
    total = offs[-1] + tiles[-1]
    st = jnp.full((MI,), T, jnp.int32)
    sd = jnp.full((MI,), jnp.inf, jnp.float32)
    sg = jnp.full((MI,), -1, jnp.int32)
    rw = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)
    gall = jnp.arange(N, dtype=jnp.int32)

    def body(j, bufs):
        tb, db, gb = bufs
        valid = j < tiles
        tx = rmin[:, 0] + j % rw
        ty = rmin[:, 1] + j // rw
        tid = (ty * tgx + tx).astype(jnp.int32)
        tgt = jnp.where(valid, offs + j, MI)
        return (
            tb.at[tgt].set(tid, mode="drop"),
            db.at[tgt].set(depth, mode="drop"),
            gb.at[tgt].set(gall, mode="drop"),
        )

    tb, db, gb = jax.lax.fori_loop(0, 32, body, (st, sd, sg))
    s_t, s_d, s_g = jax.lax.sort((tb, db, gb), num_keys=2, is_stable=True)
    edges = jnp.searchsorted(s_t, jnp.arange(T + 1, dtype=jnp.int32), side="left").astype(jnp.int32)
    counts = edges[1:] - edges[:-1]
    pc = -(-counts // 128) * 128
    po = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pc).astype(jnp.int32)])
    idx = jnp.arange(MI, dtype=jnp.int32)
    tc = jnp.clip(s_t, 0, T - 1)
    pos = po[tc] + (idx - edges[tc])
    pos = jnp.where(s_t < T, pos, P)
    gid_pad = jnp.full((P,), -1, jnp.int32).at[pos].set(s_g, mode="drop")
    return dict(total=total, s_t=s_t, s_g=s_g, edges=edges, po=po, gid_pad=gid_pad)


def timeit(name, outs, reps=30):
    fn = lambda d, t, a, b: tuple(stages(d, t, a, b)[k] for k in outs)
    t0 = time.time()
    c = jax.jit(fn).lower(depth, tiles, rmin, rmax).compile()
    tc = time.time() - t0
    r = jax.block_until_ready(c(depth, tiles, rmin, rmax))
    t0 = time.time()
    for _ in range(reps):
        r = c(depth, tiles, rmin, rmax)
    jax.block_until_ready(r)
    print(f"{name}: compile {tc:.0f}s run {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)


timeit("A_sorted_only", ("s_t", "s_g"))
timeit("B_plus_edges", ("s_t", "s_g", "edges"))
timeit("C_plus_gidpad", ("gid_pad",))
timeit("D_all", ("total", "edges", "po", "gid_pad"))
