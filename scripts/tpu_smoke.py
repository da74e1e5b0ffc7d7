"""TPU smoke + micro-benchmark for the rasterization pipeline.

Run directly on the TPU chip (no pytest): builds a synthetic 100k-Gaussian
scene, renders 480p, times steady-state fwd and fwd+bwd.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from splatter_a_video_tpu.ops import quaternion, rasterize

W, H = 854, 480
N = 100_000


def make_scene(key):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    xyz = jnp.concatenate(
        [
            jax.random.uniform(k1, (N, 2), minval=-1.0, maxval=1.0),
            jax.random.uniform(k2, (N, 1), minval=0.5, maxval=2.0),
        ],
        axis=1,
    )
    scale = jnp.exp(jax.random.uniform(k3, (N, 3), minval=-5.5, maxval=-4.0))
    quat = quaternion.quat_normalize(jax.random.normal(k4, (N, 4)))
    opacity = jax.random.uniform(k5, (N,), minval=0.3, maxval=0.95)
    shs = jax.random.normal(k6, (N, 16, 3)) * 0.3
    return xyz, scale, quat, opacity, shs


def main():
    print("devices:", jax.devices())
    cfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=1 << 21)
    xyz, scale, quat, opacity, shs = make_scene(jax.random.PRNGKey(0))
    extr = jnp.eye(3, 4)

    @jax.jit
    def render(xyz, scale, quat, opacity, shs):
        out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, cfg)
        return out.features["rgb"], out.features["depth"], out.num_intersections

    t0 = time.time()
    rgb, dep, nint = render(xyz, scale, quat, opacity, shs)
    rgb.block_until_ready()
    print(f"fwd compile+run: {time.time()-t0:.1f}s  intersections={int(nint)}")
    print("rgb range", float(rgb.min()), float(rgb.max()), "mean", float(rgb.mean()))

    n_it = 20
    t0 = time.time()
    for _ in range(n_it):
        rgb, dep, nint = render(xyz, scale, quat, opacity, shs)
    rgb.block_until_ready()
    dt = (time.time() - t0) / n_it
    print(f"fwd: {dt*1e3:.2f} ms  ({1/dt:.1f} FPS)")

    tgt = jnp.zeros((H, W, 3))

    @jax.jit
    def step(xyz, scale, quat, opacity, shs):
        def loss_fn(params):
            xyz, scale, quat, opacity, shs = params
            out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, cfg)
            return jnp.mean((out.features["rgb"] - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)((xyz, scale, quat, opacity, shs))
        return loss, grads

    t0 = time.time()
    loss, grads = step(xyz, scale, quat, opacity, shs)
    loss.block_until_ready()
    print(f"fwd+bwd compile+run: {time.time()-t0:.1f}s loss={float(loss):.4f}")
    for g, name in zip(grads, ["xyz", "scale", "quat", "opacity", "shs"]):
        has_nan = bool(jnp.isnan(g).any())
        print(f"  d{name}: norm={float(jnp.linalg.norm(g)):.4e} nan={has_nan}")

    t0 = time.time()
    for _ in range(n_it):
        loss, grads = step(xyz, scale, quat, opacity, shs)
    loss.block_until_ready()
    dt = (time.time() - t0) / n_it
    print(f"fwd+bwd: {dt*1e3:.2f} ms  ({1/dt:.1f} steps/s)")


if __name__ == "__main__":
    main()
