"""Tracking CLI: predict correspondences, draw trajectories, run Tap-Vid eval.

Covers the reference's tracking entry points (`trainer_fragGS.py:1408-1676`:
`draw_gs_trajectory`, `draw_pixel_trajectory`,
`get_correspondences_and_occlusion_masks_for_pixels*`) and the Tap-Vid
evaluation behind its README table.

Usage:
  python -m splatter_a_video_tpu.apps.track --ckpt out --mode eval \
      --datadir data --seq_name clip
  python -m splatter_a_video_tpu.apps.track --ckpt out --mode trajectories \
      --width 854 --height 480 --num_frames 80
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser("sav-track")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--mode", default="eval", choices=["eval", "trajectories", "pixels"])
    p.add_argument("--datadir", default="")
    p.add_argument("--seq_name", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--num_queries", type=int, default=256)
    p.add_argument("--max_intersections", type=int, default=1 << 19)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from ..utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from .. import inference
    from ..models import camera as cam_lib
    from ..ops import rasterize as raster_lib
    from ..utils import vis as vis_lib
    from .train_state_io import load_scene_from_ckpt

    scene = load_scene_from_ckpt(args.ckpt)

    data = None
    if args.synthetic:
        from ..data import synthetic

        data = synthetic.make_clip(synthetic.SyntheticClipConfig())
    elif args.datadir:
        from ..data.video_flow import VideoFlowData

        base = os.path.join(args.datadir, args.seq_name)
        data = VideoFlowData(
            img_dir=os.path.join(base, "images"),
            depth_dir=os.path.join(base, "aligned_depth_anything_v2"),
            mask_dir=os.path.join(base, "masks"),
            tracks_dir=os.path.join(base, "bootstapir"),
        ).setup()

    if data is not None:
        H, W = data.image_size
        T = data.num_frames
    else:
        W, H, T = args.width, args.height, args.num_frames
    cam = cam_lib.canonical_camera(W, H)
    rcfg = raster_lib.RasterizeConfig(
        width=W, height=H, max_intersections=args.max_intersections
    )

    if args.mode == "eval":
        from ..eval import tapvid

        m = tapvid.evaluate_scene_tracking(
            scene, data, cam, rcfg, num_queries=args.num_queries
        )
        print(json.dumps(m, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(m, f, indent=2)
    elif args.mode == "trajectories":
        # overlay sampled Gaussian center trajectories on rendered frames
        # (`draw_gs_trajectory`, trainer_fragGS.py:1408-1480)
        times = list(range(T))
        tr3d = inference.gaussian_trajectories(scene, times, sample=256)
        from ..train.losses import denormalize_coords
        import jax.numpy as jnp

        px = np.asarray(
            denormalize_coords(jnp.asarray(tr3d[..., :2]), H, W)
        )  # [S, T, 2]
        res = inference.render_video(scene, cam, rcfg, times)
        frames = [
            vis_lib.draw_tracks_2d(res["rgb"][t], px[:, : t + 1]) for t in range(T)
        ]
        out = args.out or os.path.join(args.ckpt, "trajectories.mp4")
        vis_lib.write_video(out, frames)
        print(f"wrote {out}")
    elif args.mode == "pixels":
        # track a pixel grid from frame 0 through the clip
        # (`draw_pixel_trajectory`, trainer_fragGS.py:1483-1566)
        g = 16
        ys, xs = np.mgrid[g // 2 : H : g, g // 2 : W : g]
        px0 = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
        tracks = [px0]
        for t in range(1, T):
            px_t, _ = inference.track_correspondences(scene, 0.0, px0, float(t), cam, rcfg)
            tracks.append(px_t)
        tracks = np.stack(tracks, axis=1)  # [S, T, 2]
        res = inference.render_video(scene, cam, rcfg, list(range(T)))
        frames = [
            vis_lib.draw_tracks_2d(res["rgb"][t], tracks[:, : t + 1]) for t in range(T)
        ]
        out = args.out or os.path.join(args.ckpt, "pixel_tracks.mp4")
        vis_lib.write_video(out, frames)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
