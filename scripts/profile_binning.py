"""Microbenchmark the binning pipeline pieces on the TPU.

Times each stage in isolation at the production shape (M slots, N=100k
gaussians) so design choices (fill-forward vs owner-gather, sort modes,
packing) are grounded in measurements.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

N = 100_000
M = 1 << 19
Dc = 16

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
g_owner = jnp.sort(jax.random.randint(ks[0], (M,), 0, N))
side3 = jax.random.randint(ks[1], (3, N), 0, 1 << 20)
chans = jax.random.normal(ks[2], (Dc, N))
key32 = jax.random.randint(ks[3], (M,), 0, 1 << 30)
gid = jax.random.randint(ks[4], (M,), 0, N)
tile_id = jnp.sort(jax.random.randint(ks[5], (M,), 0, 1621))
depth_bits = jax.random.randint(ks[6], (M,), 0, 1 << 30)
mark = jnp.zeros((M,), bool).at[jnp.cumsum(jnp.full((N,), M // N))].set(True)
vals2 = jnp.broadcast_to(key32[None, :2].T, (2, M)) * 0  # placeholder


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    print(f"{name:42s} {(time.time()-t0)/reps*1e3:7.3f} ms", flush=True)


# owner gather [3, N] -> [3, M]
timeit("take [3,N]->[3,M]", lambda s, g: jnp.take(s, g, axis=1), side3, g_owner)
# owner gather 1 channel
timeit("take [N]->[M] x1", lambda s, g: jnp.take(s[0], g), side3, g_owner)
# post-sort channel gather [16, N] -> [16, M]
timeit("take [16,N]->[16,M]", lambda c, g: jnp.take(c, g, axis=1), chans, g_owner)
# cummax over M
timeit("cummax [M]", lambda x: jax.lax.cummax(x), key32)
# cumsum over M int32
timeit("cumsum [M] i32", lambda x: jnp.cumsum(x), key32)
# cumsum over [4, M]
timeit("cumsum [4,M] i32", lambda x: jnp.cumsum(x, axis=1),
       jnp.broadcast_to(key32, (4, M)))


# fill-forward (old log-shift impl) over [2, M]
def fill_forward(mark, vals):
    m = mark
    v = vals
    shift = 1
    while shift < M:
        vs = jnp.concatenate([v[:, :shift], v[:, :-shift]], axis=1)
        ms = jnp.concatenate([jnp.zeros((shift,), bool), m[:-shift]])
        v = jnp.where(m[None, :], v, vs)
        m = m | ms
        shift *= 2
    return v


timeit("fill_forward [2,M] (19 passes)", fill_forward, mark,
       jnp.broadcast_to(key32, (2, M)))

# single-key sort carrying 1 value
timeit("sort (key, gid)", lambda k, g: jax.lax.sort((k, g), num_keys=1),
       key32, gid)
# two-key stable sort carrying 1 value
timeit("sort (tile, depth, gid) stable",
       lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2, is_stable=True),
       tile_id, depth_bits, gid)
# scatter one channel at N monotone positions into M
row_idx = jnp.sort(jax.random.randint(ks[7], (N,), 0, M))
timeit("scatter set [N]->[M]",
       lambda r: jnp.full((M,), -1, jnp.int32).at[r].set(
           jnp.arange(N, dtype=jnp.int32), mode="drop"), row_idx)
# scatter add 2x (delta encoding)
timeit("scatter add x2 [N]->[M]",
       lambda r, v: jnp.zeros((M,), jnp.int32).at[r].add(v, mode="drop")
       .at[jnp.minimum(r + 5, M - 1)].add(-v, mode="drop"),
       row_idx, side3[0])
# searchsorted edges
timeit("searchsorted T+1", lambda t: jnp.searchsorted(
    t, jnp.arange(1622, dtype=jnp.int32), side="left"), tile_id)
# pure elementwise pass over [16, M+chunk] (bandwidth floor reference)
timeit("elementwise [16,M] x2", lambda x: x * 2.0 + 1.0,
       jnp.zeros((16, M), jnp.float32))
