"""Test: split frontend (projection/EWA) and binning into separate jits;
also dump HLO sizes to find the compile-hang threshold."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from splatter_a_video_tpu.ops import binning, projection, quaternion

W, H, N = 854, 480, 100_000
MI = 1 << 21
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
xyz = jnp.concatenate(
    [
        jax.random.uniform(k1, (N, 2), minval=-1, maxval=1),
        jax.random.uniform(k2, (N, 1), minval=0.5, maxval=2),
    ],
    axis=1,
)
scale = jnp.exp(jax.random.uniform(k3, (N, 3), minval=-5.5, maxval=-4.0))
quat = quaternion.quat_normalize(jax.random.normal(k4, (N, 4)))
extr = jnp.eye(3, 4)


@jax.jit
def frontend(xyz, scale, quat):
    uv, depth = projection.project_ortho(xyz, extr, W, H, 0.01, 1.3)
    visible = depth != 0
    cov6 = quaternion.build_cov3d(scale, quat, visible)
    conic, radius, tiles, rmin, rmax = projection.ewa_ortho(cov6, extr, uv, W, H, visible)
    return uv, depth, conic, radius, tiles, rmin, rmax


def fused(xyz, scale, quat):
    uv, depth, conic, radius, tiles, rmin, rmax = frontend.__wrapped__(xyz, scale, quat)
    b = binning.bin_and_sort(depth, tiles, rmin, rmax, W, H, max_intersections=MI)
    return b.num_intersections


# HLO sizes
low_front = frontend.lower(xyz, scale, quat)
low_fused = jax.jit(fused).lower(xyz, scale, quat)
print("frontend HLO bytes:", len(low_front.as_text()), flush=True)
print("fused HLO bytes:", len(low_fused.as_text()), flush=True)

print("compiling frontend...", flush=True)
t0 = time.time()
cf = low_front.compile()
print(f"frontend compiled {time.time()-t0:.1f}s", flush=True)
r = jax.block_until_ready(cf(xyz, scale, quat))

print("compiling binning separately...", flush=True)
t0 = time.time()
uv, depth, conic, radius, tiles, rmin, rmax = r
bfn = lambda d, t, a, b: binning.bin_and_sort(d, t, a, b, W, H, max_intersections=MI)
cb = jax.jit(bfn).lower(depth, tiles, rmin, rmax).compile()
print(f"binning compiled {time.time()-t0:.1f}s", flush=True)
rb = jax.block_until_ready(cb(depth, tiles, rmin, rmax))
print("nint:", int(rb.num_intersections), flush=True)

t0 = time.time()
for _ in range(20):
    r = cf(xyz, scale, quat)
    rb = cb(r[1], r[4], r[5], r[6])
jax.block_until_ready(rb)
print(f"two-jit steady: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)

print("compiling fused...", flush=True)
t0 = time.time()
cfu = low_fused.compile()
print(f"fused compiled {time.time()-t0:.1f}s", flush=True)
