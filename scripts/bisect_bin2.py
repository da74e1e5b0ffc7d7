"""Compile bin_and_sort alone at production scale."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from splatter_a_video_tpu.ops import binning

W, H, N = 854, 480, 100_000
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

fn = lambda d, t, a, b: binning.bin_and_sort(
    d, t, a, b, W, H, max_intersections=1 << 21
)
print("lowering...", flush=True)
t0 = time.time()
low = jax.jit(fn).lower(depth, tiles, rmin, rmax)
print(f"lowered {time.time()-t0:.1f}s; compiling...", flush=True)
t0 = time.time()
c = low.compile()
print(f"compiled {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
r = jax.block_until_ready(c(depth, tiles, rmin, rmax))
print(f"ran {time.time()-t0:.2f}s nint={int(r.num_intersections)}", flush=True)
t0 = time.time()
for _ in range(5):
    r = c(depth, tiles, rmin, rmax)
jax.block_until_ready(r)
print(f"steady {(time.time()-t0)/5*1e3:.1f} ms", flush=True)
