"""Tutorial: render a 3D Gaussian scene along an orbiting camera path.

TPU-native counterpart of the dptr tutorial `gs_3d.py`
(`/root/reference/src/submodules/dptr/README.md:286+`): build a colorful
3D point cloud (a torus here), splat it through the perspective pipeline
with the fov-parametrized legacy renderer surface, and write an orbit of
frames. Doubles as a perspective-path convergence/smoke check.

Run:  python examples/gs_3d.py [--points 20000] [--frames 12] [--size 256]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu.models import camera, legacy_render
from splatter_a_video_tpu.ops.quaternion import quat_normalize


def make_torus(n: int, seed: int = 0):
    """Colorful torus point cloud: color = position-derived rainbow."""
    rng = np.random.RandomState(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    R, r = 0.6, 0.22
    x = (R + r * np.cos(v)) * np.cos(u)
    y = (R + r * np.cos(v)) * np.sin(u)
    z = r * np.sin(v)
    pos = np.stack([x, y, z], axis=1).astype(np.float32)
    col = np.stack(
        [0.5 + 0.5 * np.cos(u), 0.5 + 0.5 * np.sin(v), 0.5 + 0.5 * np.sin(u)],
        axis=1,
    ).astype(np.float32)
    return pos, col


def colors_to_shs(col: np.ndarray) -> np.ndarray:
    """DC-only SH so eval_sh(deg 0) reproduces the color: the RGB2SH
    convention (color - 0.5) / C0 (`gaussian_utils.py` / `sh_utils`)."""
    C0 = 0.28209479177387814
    shs = np.zeros((col.shape[0], 16, 3), np.float32)
    shs[:, 0] = (col - 0.5) / C0
    return shs


def orbit_world_view(theta: float, radius: float = 2.5, height: float = 0.8):
    """Row-vector (transposed) world->view transform of a camera orbiting
    the origin — the storage convention of the legacy Camera
    (`camera.py:141+`)."""
    eye = np.array(
        [radius * math.cos(theta), radius * math.sin(theta), height]
    )
    R = np.asarray(
        camera.look_at_rotation(
            jnp.asarray(eye, jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        )
    )
    w2c = np.eye(4, dtype=np.float32)  # R rows are camera axes (w2c)
    w2c[:3, :3] = R
    w2c[:3, 3] = -R @ eye
    return w2c.T  # stored transposed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str, default="out/gs3d")
    args = ap.parse_args()

    pos, col = make_torus(args.points)
    n = args.points
    rng = np.random.RandomState(1)
    render = legacy_render.GaussianSplattingRender()
    render.active_sh_degree = 0
    fov = math.pi / 3

    frames = []
    for f in range(args.frames):
        theta = 2 * math.pi * f / args.frames
        out = render.render_iter(
            FovX=fov, FovY=fov, height=args.size, width=args.size,
            world_view_transform=jnp.asarray(orbit_world_view(theta)),
            full_proj_transform=None,
            camera_center=jnp.zeros(3),
            position=jnp.asarray(pos),
            opacity=jnp.full((n,), 0.8),
            scaling=jnp.full((n, 3), 0.02),
            rotation=jnp.asarray(
                quat_normalize(jnp.asarray(rng.randn(n, 4), jnp.float32))
            ),
            shs=jnp.asarray(colors_to_shs(col)),
        )
        img = np.clip(np.asarray(out["rgb"]), 0, 1)
        frames.append(img)
        print(
            f"frame {f:02d}  visible {int(np.asarray(out['visibility']).sum())}"
            f"  mean {img.mean():.3f}",
            flush=True,
        )

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        try:
            import imageio.v2 as imageio

            for f, img in enumerate(frames):
                imageio.imwrite(
                    os.path.join(args.out, f"{f:03d}.png"),
                    (img * 255).astype(np.uint8),
                )
            print(f"wrote {len(frames)} frames to {args.out}")
        except ImportError:
            pass
    # smoke assertion: the torus is visible and moves across frames
    assert all(f.min() < 0.95 for f in frames), "nothing rendered"
    assert np.abs(frames[0] - frames[len(frames) // 2]).max() > 0.1


if __name__ == "__main__":
    main()
