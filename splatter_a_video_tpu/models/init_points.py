"""Point-cloud initialization strategies.

Parity with the reference's init paths:
  * `positive_Z_random` — uniform points shifted into the canonical frustum
    (z in [shift, shift+radius]) — the YAML default for the poly/fourier
    cloud (`/root/reference/src/pointrix/point_cloud/utils.py:23-50`,
    `src/configs/frag_gs_v10.yaml:16-20`);
  * `depth2pcd` — unproject a (noised) depth map on the pixel grid
    (`src/dynamic_gaussian_points.py:17-32`, the commented depth-init path);
  * track-based init lives in `train/fit.build_scene_from_clip`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def positive_z_random(
    num_points: int,
    radius: float = 1.0,
    z_shift: float = 1.0,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """[N, 3] uniform points with x,y in [-r, r] and z in [z_shift - r/2,
    z_shift + r/2] — inside the canonical ortho frustum."""
    rng = rng or np.random.RandomState(0)
    xy = rng.uniform(-radius, radius, (num_points, 2))
    z = rng.uniform(z_shift - radius / 2, z_shift + radius / 2, (num_points, 1))
    return np.concatenate([xy, z], axis=1).astype(np.float32)


def depth_to_points(
    depth: np.ndarray,
    image: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    stride: int = 5,
    shift: float = 0.1,
    noise: float = 0.0,
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Unproject a depth map to canonical-frustum points — parity with
    `depth2pcd` (`dynamic_gaussian_points.py:17-32`) + the ::stride
    downsample of the commented init path (`:54-66`).

    Returns (points [N,3], colors [N,3] or None).
    """
    rng = rng or np.random.RandomState(0)
    h, w = depth.shape
    d = depth.astype(np.float32) + shift
    if noise > 0:
        d = d + rng.randn(h, w).astype(np.float32) * noise
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = (j - w * 0.5) / (0.5 * w)
    y = (i - h * 0.5) / (0.5 * h)
    pcd = np.stack([x, y, d], axis=-1).astype(np.float32)

    keep = np.ones((h, w), bool) if mask is None else mask.astype(bool)
    pts = pcd[keep][::stride]
    cols = None
    if image is not None:
        cols = image[keep][::stride].astype(np.float32)
    return pts, cols
