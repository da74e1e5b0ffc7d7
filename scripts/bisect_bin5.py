"""Check whether identical-input reps fake the timing; then re-time binning
stages with fresh inputs per rep."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from splatter_a_video_tpu.ops import binning as B

W, H, N = 854, 480, 100_000
MI = 1 << 21

inputs = []
for s in range(8):
    key = jax.random.PRNGKey(s)
    depth = jax.random.uniform(key, (N,), minval=0.1, maxval=2.0)
    tiles = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, 8, dtype=jnp.int32)
    rmin = jnp.stack(
        [
            jax.random.randint(jax.random.fold_in(key, 2), (N,), 0, 50, dtype=jnp.int32),
            jax.random.randint(jax.random.fold_in(key, 3), (N,), 0, 28, dtype=jnp.int32),
        ],
        axis=1,
    )
    rmax = rmin + jnp.stack([jnp.minimum(tiles, 4), jnp.maximum(tiles // 4, 1)], axis=1)
    inputs.append((depth, tiles, rmin, rmax))
jax.block_until_ready(inputs)

fn = lambda d, t, a, b: B.bin_and_sort(d, t, a, b, W, H, max_intersections=MI)
print("compiling bin_and_sort...", flush=True)
t0 = time.time()
c = jax.jit(fn).lower(*inputs[0]).compile()
print(f"compiled {time.time()-t0:.0f}s", flush=True)
jax.block_until_ready(c(*inputs[0]))

# same input every rep
t0 = time.time()
for _ in range(16):
    r = c(*inputs[0])
jax.block_until_ready(r)
print(f"same-input: {(time.time()-t0)/16*1e3:.2f} ms", flush=True)

# fresh input every rep
t0 = time.time()
for i in range(16):
    r = c(*inputs[i % 8])
jax.block_until_ready(r)
print(f"varied-input: {(time.time()-t0)/16*1e3:.2f} ms", flush=True)
