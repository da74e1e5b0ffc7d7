"""Profile bin_and_sort stages cumulatively at production scale."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

M = 1 << 21
W, H, N = 854, 480, 100_000
TG = 54 * 30
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


def expansion(depth, tiles, rmin, rmax):
    tiles = jnp.minimum(tiles, 32)
    offs = jnp.cumsum(tiles) - tiles
    st = jnp.full((M,), TG, jnp.int32)
    sd = jnp.full((M,), jnp.inf, jnp.float32)
    sg = jnp.full((M,), -1, jnp.int32)
    rw = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)
    gid = jnp.arange(N, dtype=jnp.int32)

    def body(j, bufs):
        tb, db, gb = bufs
        valid = j < tiles
        tx = rmin[:, 0] + j % rw
        ty = rmin[:, 1] + j // rw
        tid = (ty * 54 + tx).astype(jnp.int32)
        tgt = jnp.where(valid, offs + j, M)
        return (
            tb.at[tgt].set(tid, mode="drop"),
            db.at[tgt].set(depth, mode="drop"),
            gb.at[tgt].set(gid, mode="drop"),
        )

    return jax.lax.fori_loop(0, 32, body, (st, sd, sg))


def exp_sort(depth, tiles, rmin, rmax):
    tb, db, gb = expansion(depth, tiles, rmin, rmax)
    return jax.lax.sort((tb, db, gb), num_keys=2, is_stable=True)


def exp_sort_unstable1(depth, tiles, rmin, rmax):
    tb, db, gb = expansion(depth, tiles, rmin, rmax)
    # packed single int32 key: tile << 20 | depth-bits >> 11
    db_bits = jax.lax.bitcast_convert_type(db, jnp.int32)
    db_bits = jnp.where(db_bits < 0, jnp.int32(2**31 - 1), db_bits)  # inf ok
    key = (tb << 20) | (db_bits >> 11)
    return jax.lax.sort((key, gb), num_keys=1, is_stable=False)


def timeit(name, fn, reps=20):
    t0 = time.time()
    c = jax.jit(fn).lower(depth, tiles, rmin, rmax).compile()
    tc = time.time() - t0
    r = jax.block_until_ready(c(depth, tiles, rmin, rmax))
    t0 = time.time()
    for _ in range(reps):
        r = c(depth, tiles, rmin, rmax)
    jax.block_until_ready(r)
    print(f"{name}: compile {tc:.1f}s run {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)


timeit("expansion3", expansion)
timeit("exp+sort_2key_stable", exp_sort)
timeit("exp+sort_1key_packed", exp_sort_unstable1)
