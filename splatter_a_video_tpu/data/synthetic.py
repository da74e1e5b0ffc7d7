"""Synthetic video clips with ground-truth tracks/depth/masks.

The reference framework is exercised on preprocessed DAVIS clips; this
module generates an equivalent in-memory clip (images + fg masks +
disparity + TAPIR-style per-pair tracks) with *known* motion so the whole
pipeline — track lifting, spline fitting, training, tracking evaluation —
runs hermetically in tests and benchmarks. Layout mirrors what
`VideoFlowData` reads from disk (reference `src/data_preparation/README.md`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

from .video_flow import VideoFlowData


@dataclass
class SyntheticClipConfig:
    width: int = 64
    height: int = 48
    num_frames: int = 12
    num_blobs: int = 4
    blob_radius: float = 6.0
    track_grid: int = 4      # query-point stride, like TAPIR grid_size=4
    seed: int = 0


def _blob_centers(cfg: SyntheticClipConfig, t: float, rng_phase: np.ndarray) -> np.ndarray:
    """[K, 2] pixel centers at normalized time t — smooth sinusoid paths."""
    K = cfg.num_blobs
    W, H = cfg.width, cfg.height
    base = np.stack(
        [
            W * (0.25 + 0.5 * (np.arange(K) % 2)),
            H * (0.3 + 0.4 * (np.arange(K) // 2 % 2)),
        ],
        axis=1,
    )
    amp = np.array([W * 0.12, H * 0.12])
    ang = 2 * np.pi * (t + rng_phase[:, None])
    return base + amp * np.concatenate([np.sin(ang), np.cos(ang * 1.5)], axis=1)[:, :2]


def make_clip(cfg: SyntheticClipConfig) -> VideoFlowData:
    """Generate a clip and wrap it in a ready `VideoFlowData`."""
    rng = np.random.RandomState(cfg.seed)
    W, H, T, K = cfg.width, cfg.height, cfg.num_frames, cfg.num_blobs
    phases = rng.rand(K)
    colors = rng.uniform(0.3, 1.0, (K, 3))
    depths_k = np.linspace(0.8, 1.6, K)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames, masks, disps = [], [], []
    centers_t = []
    for f in range(T):
        t = f / max(T - 1, 1)
        centers = _blob_centers(cfg, t, phases)
        centers_t.append(centers)
        # background: horizontal color gradient over a slanted depth plane
        # (flat depth would give the MAD-normalized depth loss a degenerate
        # scale and over-amplify its gradients)
        img = np.stack(
            [xx / W, 0.5 + 0.3 * yy / H, 1.0 - xx / W], axis=-1
        ).astype(np.float32) * 0.6
        depth = (2.0 + 0.8 * (yy / H) + 0.2 * (xx / W)).astype(np.float32)
        mask = np.zeros((H, W), bool)
        # paint blobs back-to-front
        order = np.argsort(-depths_k)
        for k in order:
            d2 = (xx - centers[k, 0]) ** 2 + (yy - centers[k, 1]) ** 2
            inside = d2 < cfg.blob_radius**2
            img[inside] = colors[k]
            depth[inside] = depths_k[k]
            mask |= inside
        frames.append(img)
        masks.append(mask)
        disps.append(1.0 / depth)
    centers_t = np.stack(centers_t)  # [T, K, 2]

    # TAPIR-style tracks: grid query points inside the fg mask of each query
    # frame, moved by the rigid motion of the blob they sit on; bg queries
    # follow the (static) background. occ/dist logits: visible & confident.
    tracks: Dict[Tuple[int, int], np.ndarray] = {}
    g = cfg.track_grid
    for q in range(T):
        qmask = masks[q]
        qy, qx = np.mgrid[0:H:g, 0:W:g]
        pts = np.stack([qx.ravel(), qy.ravel()], axis=1).astype(np.float32)
        # blob assignment in the query frame (nearest center if inside)
        d2 = ((pts[:, None, :] - centers_t[q][None]) ** 2).sum(-1)
        owner = np.argmin(d2, axis=1)
        on_blob = d2[np.arange(len(pts)), owner] < cfg.blob_radius**2
        pts_q = pts
        owner_q = owner
        for tt in range(T):
            delta = centers_t[tt][owner_q] - centers_t[q][owner_q]
            delta = np.where(on_blob[:, None], delta, 0.0)  # bg is static
            target = pts_q + delta
            inb = (
                (target[:, 0] >= 0)
                & (target[:, 0] <= W - 1)
                & (target[:, 1] >= 0)
                & (target[:, 1] <= H - 1)
            )
            occ = np.where(inb, -8.0, 8.0).astype(np.float32)  # visible logit
            dist = np.full(len(pts_q), -8.0, np.float32)       # confident
            tracks[(q, tt)] = np.concatenate(
                [target, occ[:, None], dist[:, None]], axis=1
            ).astype(np.float32)

    data = VideoFlowData(
        frames=frames,
        depths_raw=[1.0 / d for d in disps],
        masks_raw=masks,
        tracks=tracks,
        mask_erosion_radius=2,
    )
    return data.setup()


def dump_clip_to_disk(data: VideoFlowData, base_dir: str) -> str:
    """Write an in-memory clip in the reference's on-disk DAVIS layout
    (`/root/reference/src/data_preparation/README.md:39-60`):

      images/{name}.png                     uint8 frames
      masks/{name}.png                      255 = fg
      aligned_depth_anything_v2/{name}.npy  float disparity (1/depth)
      marigold/depth_npy/{name}_pred.npy    raw depth-loss GT ([0,1] scaled)
      bootstapir/{q}_{t}.npy                [N, 4] TAPIR tracks

    so the CLI path `apps.train --datadir ...` can be exercised
    hermetically. Returns base_dir.
    """
    import os

    import imageio.v2 as imageio

    names = data.frame_names or [f"{i:05d}" for i in range(len(data.frames))]
    for sub in (
        "images", "masks", "aligned_depth_anything_v2", "bootstapir",
        os.path.join("marigold", "depth_npy"),
    ):
        os.makedirs(os.path.join(base_dir, sub), exist_ok=True)
    dmax = max(float(np.max(d)) for d in data.depths_raw) or 1.0
    for i, name in enumerate(names):
        imageio.imwrite(
            os.path.join(base_dir, "images", f"{name}.png"),
            (np.clip(data.frames[i], 0, 1) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(base_dir, "masks", f"{name}.png"),
            (np.asarray(data.masks_raw[i], np.uint8) * 255),
        )
        np.save(
            os.path.join(base_dir, "aligned_depth_anything_v2", f"{name}.npy"),
            (1.0 / np.maximum(np.asarray(data.depths_raw[i], np.float32), 1e-6)),
        )
        np.save(
            os.path.join(base_dir, "marigold", "depth_npy", f"{name}_pred.npy"),
            np.asarray(data.depths_raw[i], np.float32) / dmax,
        )
    for (q, t), arr in (data.tracks or {}).items():
        np.save(
            os.path.join(base_dir, "bootstapir", f"{names[q]}_{names[t]}.npy"),
            np.asarray(arr, np.float32),
        )
    return base_dir
