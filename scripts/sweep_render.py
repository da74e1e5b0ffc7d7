"""Sweep rasterizer static configs (tile block, chunk, budget) on the TPU.

Reports steady-state ms/frame + the scene's true intersection count per
config so the bench default can be chosen from measurement, not guesswork.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from splatter_a_video_tpu.ops import quaternion, rasterize

W, H, N = 854, 480, 100_000
key = jax.random.PRNGKey(0)
k = jax.random.split(key, 6)
xyz = jnp.concatenate(
    [
        jax.random.uniform(k[0], (N, 2), minval=-1, maxval=1),
        jax.random.uniform(k[1], (N, 1), minval=0.5, maxval=2),
    ],
    axis=1,
)
scale = jnp.exp(jax.random.uniform(k[2], (N, 3), minval=-5.5, maxval=-4.0))
quat = quaternion.quat_normalize(jax.random.normal(k[3], (N, 4)))
opacity = jax.random.uniform(k[4], (N,), minval=0.3, maxval=0.95)
shs = jax.random.normal(k[5], (N, 16, 3)) * 0.3
extr = jnp.eye(3, 4)


def run(block, chunk, max_int, reps=30, rect_mode="tight", scan="matmul"):
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_intersections=max_int,
        block_x=block[0], block_y=block[1], chunk=chunk, rect_mode=rect_mode,
        scan_impl=scan,
    )

    @jax.jit
    def render(xyz, scale, quat, opacity, shs):
        out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, cfg)
        return out.features["rgb"], out.features["depth"], out.num_intersections

    rgb, depth, nint = render(xyz, scale, quat, opacity, shs)
    rgb.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        rgb, depth, nint = render(xyz, scale, quat, opacity, shs)
    rgb.block_until_ready()
    dt = (time.time() - t0) / reps
    return dt * 1e3, int(nint), float(jnp.mean(rgb))


combos = [
    # post-presort sweep: single-scatter binning engages where
    # xb+yb+wb+gbits <= 32 (all of these at N=100k except (16,16))
    ((32, 16), 128, 2720 * 128, "tight", "matmul"),
    ((32, 8), 128, 3400 * 128, "tight", "matmul"),
    ((64, 8), 128, 3600 * 128, "tight", "matmul"),
    ((64, 16), 128, 2600 * 128, "tight", "matmul"),
    ((32, 32), 128, 2400 * 128, "tight", "matmul"),
    ((16, 16), 128, 1 << 19, "tight", "matmul"),
]
for block, chunk, mi, rm, sc in combos:
    try:
        ms, nint, mean = run(block, chunk, mi, rect_mode=rm, scan=sc)
        print(
            f"block={block} chunk={chunk:3d} max_int={mi:>7d} {rm:5s} {sc:6s}: "
            f"{ms:6.2f} ms/frame ({1e3/ms:6.1f} FPS)  nint={nint} mean={mean:.4f}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"block={block} chunk={chunk} max_int={mi} {rm} {sc}: FAILED {type(e).__name__}: {e}", flush=True)
