"""Editing CLI: appearance re-optimization, layer split, object duplication.

Covers the reference editing entry points
(`trainer_fragGS.py:999-1120` `optimize_appearance_from_mask/img`,
`:1310-1341` `render_part`, `:1344-1405` `add_fg`).

Usage:
  python -m splatter_a_video_tpu.apps.edit --ckpt out --mode appearance \
      --mask mask.png --target edited.png --width W --height H --num_frames T
  python -m splatter_a_video_tpu.apps.edit --ckpt out --mode layers ...
  python -m splatter_a_video_tpu.apps.edit --ckpt out --mode addfg \
      --delta 0.2 0.0 0.0 ...
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("sav-edit")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--mode", default="appearance",
                   choices=["appearance", "appearance_img", "layers", "addfg"])
    p.add_argument("--mask", default=None)
    p.add_argument("--target", default=None)
    p.add_argument("--delta", type=float, nargs=3, default=[0.2, 0.0, 0.0])
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--num_frames", type=int, required=True)
    p.add_argument("--max_intersections", type=int, default=1 << 20)
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
    W, H, T = args.width, args.height, args.num_frames
    cam = cam_lib.canonical_camera(W, H)
    rcfg = raster_lib.RasterizeConfig(
        width=W, height=H, max_intersections=args.max_intersections
    )

    if args.mode == "appearance_img":
        # whole-frame appearance transfer (optimize_appearance_from_img):
        # every alive gaussian's SH re-optimized, geometry frozen
        import imageio.v2 as imageio

        target = np.asarray(imageio.imread(args.target), np.float32)[..., :3] / 255.0
        edited = inference.optimize_appearance_from_img(
            scene, target, cam, rcfg, steps=args.steps
        )
        res = inference.render_video(edited, cam, rcfg, list(range(T)))
        out = args.out or os.path.join(args.ckpt, "editing_img.mp4")
        vis_lib.write_video(out, res["rgb"])
        print(f"wrote {out}")
    elif args.mode == "appearance":
        import imageio.v2 as imageio

        target = np.asarray(imageio.imread(args.target), np.float32)[..., :3] / 255.0
        if args.mask:
            mask = np.asarray(imageio.imread(args.mask), np.float32)
            if mask.ndim == 3:
                mask = mask[..., 0]
            mask = mask / max(mask.max(), 1e-6)
            sel = inference.select_gaussians_by_mask(scene, mask, cam, rcfg)
        else:
            # from-image variant: edit wherever the target differs
            out0 = inference.render_frame(scene, 0.0, cam.extrinsic, rcfg)
            diff = np.abs(np.asarray(out0.features["rgb"]) - target).sum(-1)
            sel = inference.select_gaussians_by_mask(
                scene, (diff > 0.05).astype(np.float32), cam, rcfg
            )
        print(f"re-optimizing appearance of {len(sel)} gaussians")
        edited = inference.optimize_appearance(
            scene, sel, target, cam, rcfg, steps=args.steps
        )
        res = inference.render_video(edited, cam, rcfg, list(range(T)))
        out = args.out or os.path.join(args.ckpt, "editing.mp4")
        vis_lib.write_video(out, res["rgb"])
        print(f"wrote {out}")
    elif args.mode == "layers":
        fg, bg = inference.split_layers(scene)
        for name, sub in (("fg", fg), ("bg", bg)):
            res = inference.render_video(sub, cam, rcfg, list(range(T)))
            out = os.path.join(args.out or args.ckpt, f"layer_{name}.mp4")
            vis_lib.write_video(out, res["rgb"])
            print(f"wrote {out}")
    elif args.mode == "addfg":
        dup = inference.add_fg_copy(scene, np.asarray(args.delta), scale=args.scale)
        res = inference.render_video(dup, cam, rcfg, list(range(T)))
        out = args.out or os.path.join(args.ckpt, "added_fg.mp4")
        vis_lib.write_video(out, res["rgb"])
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
