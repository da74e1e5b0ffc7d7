"""Bisect the slow-compile stage of bin_and_sort at production scale."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

M = 1 << 21
T = 1674
key = jax.random.PRNGKey(0)
tile = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
depth = jax.random.uniform(jax.random.PRNGKey(1), (M,), minval=0.1, maxval=2.0)
gid = jnp.arange(M, dtype=jnp.int32)


def timeit(name, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = jax.block_until_ready(c(*args))
    t0 = time.time()
    for _ in range(5):
        r = c(*args)
    jax.block_until_ready(r)
    print(f"{name}: compile {tc:.1f}s run {(time.time()-t0)/5*1e3:.1f}ms", flush=True)


timeit("sort1_unstable", lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False)[0], depth)
timeit("sort3_2keys_stable", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=True), tile, depth, gid)

N = 100_000
tiles_n = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 16, dtype=jnp.int32)
rect = jax.random.randint(jax.random.PRNGKey(3), (N, 2), 0, 50, dtype=jnp.int32)


def expansion(tiles, rmin):
    offs = jnp.cumsum(tiles) - tiles
    buf = jnp.full((M,), T, jnp.int32)
    gid_all = jnp.arange(N, dtype=jnp.int32)

    def body(j, b):
        valid = j < tiles
        tgt = jnp.where(valid, offs + j, M)
        return b.at[tgt].set(gid_all, mode="drop")

    return jax.lax.fori_loop(0, 32, body, buf)


timeit("expansion_32scatters", expansion, tiles_n, rect[:, 0])


def ranges(sorted_tile):
    edges = jnp.searchsorted(sorted_tile, jnp.arange(T + 1, dtype=jnp.int32), side="left")
    return edges


timeit("searchsorted", ranges, jnp.sort(tile))


def rescatter(sorted_tile, sorted_gid):
    edges = jnp.searchsorted(sorted_tile, jnp.arange(T + 1, dtype=jnp.int32), side="left").astype(jnp.int32)
    counts = edges[1:] - edges[:-1]
    pc = -(-counts // 128) * 128
    po = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pc).astype(jnp.int32)])
    idx = jnp.arange(M, dtype=jnp.int32)
    tc = jnp.clip(sorted_tile, 0, T - 1)
    pos = po[tc] + (idx - edges[tc])
    pos = jnp.where(sorted_tile < T, pos, M + T * 128)
    out = jnp.full((M + T * 128,), -1, jnp.int32).at[pos].set(sorted_gid, mode="drop")
    return out


timeit("rescatter", rescatter, jnp.sort(tile), gid)
print("done", flush=True)
