"""Tutorial: fit a 2D image with Gaussian splatting, stage by stage.

TPU-native counterpart of the dptr tutorial `gs_2d.py`
(`/root/reference/src/submodules/dptr/README.md:143-286`): random colorful
Gaussians + Adam, driven through the *staged* rasterization API
(projection -> cov3d -> EWA -> rasterize) the way the reference tutorial
chains the five CUDA ops — the fused `render_gaussians` wrapper exists,
but showing the stages is the point of the tutorial.

Run:  python examples/gs_2d.py [--points 10000] [--iters 2000] [--size 256]
Works on CPU (Pallas interpret mode) and TPU alike.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from splatter_a_video_tpu.ops import projection, quaternion, rasterize
from splatter_a_video_tpu.train import losses


def make_target(size: int) -> np.ndarray:
    """A colorful procedural target (the reference fits its logo png)."""
    y, x = np.mgrid[0:size, 0:size] / size
    r = 0.5 + 0.5 * np.sin(6.28 * (x * 2 + y))
    g = 0.5 + 0.5 * np.cos(6.28 * (x - y * 3))
    b = ((x - 0.5) ** 2 + (y - 0.5) ** 2) < 0.16
    return np.stack([r, g, b.astype(np.float64)], axis=-1).astype(np.float32)


def init_params(key, n: int):
    """Random raw attributes; activations keep them in range
    (README.md:165-172): |scale|+eps, normalized quaternion,
    sigmoid opacity and color."""
    ks = jax.random.split(key, 5)
    return {
        "xyz": jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
        .at[:, 2].set(1.0),
        "scale": jax.random.uniform(ks[1], (n, 3)) * 0.5,
        "rotate": jax.random.normal(ks[2], (n, 4)),
        "opacity": jax.random.normal(ks[3], (n,)),
        "rgb": jax.random.normal(ks[4], (n, 3)),
    }


def render_2d(params, cfg: rasterize.RasterizeConfig, extr):
    """The staged pipeline, one stage per line (cf. dptr's
    project_point / compute_cov3d / ewa_project / sort_gaussian /
    alpha_blending chain)."""
    scale = jnp.abs(params["scale"]) * 0.02 + 1e-8
    opacity = jax.nn.sigmoid(params["opacity"])
    rgb = jax.nn.sigmoid(params["rgb"])

    uv, depth = projection.project_ortho(
        params["xyz"], extr, cfg.width, cfg.height
    )
    visible = depth != 0
    cov3d = quaternion.build_cov3d(scale, params["rotate"], visible)
    max_r = projection.max_radius_for_tile_cap(
        cfg.max_tiles_per_gaussian, cfg.block
    )
    conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
        cov3d, extr, uv, cfg.width, cfg.height, visible, cfg.block, max_r,
        cfg.rect_mode, jax.lax.stop_gradient(opacity),
    )
    out = rasterize.rasterize(
        uv, depth, conic, radius, tiles, rmin, rmax, opacity,
        {"rgb": (rgb, 1.0, True)}, cfg,
    )
    return out.features["rgb"]


def fit(target: np.ndarray, num_points: int, iters: int, lr: float = 0.01,
        seed: int = 0, log_every: int = 200, max_intersections: int = 1 << 18):
    H, W = target.shape[:2]
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_intersections=max_intersections
    )
    extr = jnp.eye(3, 4)
    gt = jnp.asarray(target)
    params = init_params(jax.random.PRNGKey(seed), num_points)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            img = render_2d(p, cfg, extr)
            return losses.l1_loss(img, gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for i in range(iters):
        params, opt_state, loss = step(params, opt_state)
        if i % log_every == 0 or i == iters - 1:
            img = render_2d(params, cfg, extr)
            p = float(losses.psnr(img, gt))
            history.append((i, float(loss), p))
            print(f"iter {i:5d}  l1 {float(loss):.4f}  psnr {p:.2f}", flush=True)
    return params, render_2d(params, cfg, extr), history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=2_000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--out", type=str, default="out/gs2d.png")
    args = ap.parse_args()

    target = make_target(args.size)
    _, img, history = fit(target, args.points, args.iters, args.lr)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        try:
            import imageio.v2 as imageio

            pair = np.concatenate([target, np.asarray(img)], axis=1)
            imageio.imwrite(args.out, (np.clip(pair, 0, 1) * 255).astype(np.uint8))
            print(f"wrote {args.out}")
        except ImportError:
            pass
    assert history[-1][2] > history[0][2], "no convergence"


if __name__ == "__main__":
    main()
