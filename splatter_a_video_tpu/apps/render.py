"""Render / NVS / stereo / interpolation CLI over a trained checkpoint.

Covers the reference's inference entry points switched by hand in
`/root/reference/src/train.py:95-156` (`render_video`, NVS, stereo,
interpolation) as explicit subcommands.

Usage:
  python -m splatter_a_video_tpu.apps.render --ckpt out --mode video
  python -m splatter_a_video_tpu.apps.render --ckpt out --mode nvs
  python -m splatter_a_video_tpu.apps.render --ckpt out --mode stereo
  python -m splatter_a_video_tpu.apps.render --ckpt out --mode interp --slowmo 4
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("sav-render")
    p.add_argument("--ckpt", required=True, help="training out_dir")
    p.add_argument("--mode", default="video",
                   choices=["video", "nvs", "stereo", "interp", "depth"])
    p.add_argument("--out", default=None)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--num_frames", type=int, required=True)
    p.add_argument("--slowmo", type=int, default=4)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--max_intersections", type=int, default=1 << 19)
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
    cam = cam_lib.canonical_camera(args.width, args.height)
    rcfg = raster_lib.RasterizeConfig(
        width=args.width, height=args.height,
        max_intersections=args.max_intersections,
    )
    out = args.out or os.path.join(args.ckpt, f"{args.mode}.mp4")

    T = args.num_frames
    if args.mode == "video":
        res = inference.render_video(scene, cam, rcfg, list(range(T)))
        vis_lib.write_video(out, res["rgb"], fps=args.fps)
    elif args.mode == "depth":
        res = inference.render_video(scene, cam, rcfg, list(range(T)))
        frames = [vis_lib.colorize_depth(d) for d in res["depth"]]
        vis_lib.write_video(out, frames, fps=args.fps)
    elif args.mode == "nvs":
        frames = inference.render_nvs(scene, cam, rcfg, list(range(T)))
        vis_lib.write_video(out, frames, fps=args.fps)
    elif args.mode == "stereo":
        frames = inference.render_stereo(scene, cam, rcfg, list(range(T)))
        vis_lib.write_video(out, frames, fps=args.fps)
    elif args.mode == "interp":
        times = np.linspace(0, T - 1, (T - 1) * args.slowmo + 1)
        res = inference.render_video(scene, cam, rcfg, list(times))
        vis_lib.write_video(out, res["rgb"], fps=args.fps * args.slowmo)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
