"""Convert a HF Depth-Anything checkpoint to the JAX .npz format.

Usage (on a machine with the checkpoint available):
    python scripts/convert_depth_anything.py \
        --model depth-anything/Depth-Anything-V2-Small-hf \
        --out weights/depth_anything.npz

Then point `$SPLAT_DEPTH_ANYTHING_WEIGHTS` at the npz (or place it under
`splatter_a_video_tpu/weights/`) and `data/preprocess.compute_monodepth`
runs TPU-natively. Mirrors the reference's pipeline model choice
(`/root/reference/src/data_preparation/compute_depth.py:20-30`).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="depth-anything/Depth-Anything-V2-Small-hf",
                    help="HF model id or local checkpoint dir")
    ap.add_argument("--out", default="weights/depth_anything.npz")
    args = ap.parse_args(argv)

    from transformers import AutoModelForDepthEstimation

    from splatter_a_video_tpu.nets import depth_anything as da

    model = AutoModelForDepthEstimation.from_pretrained(args.model)
    bcfg = model.config.backbone_config
    # strict: every checkpoint key must be consumed (upstream-rename guard)
    params = da.params_from_torch(model.state_dict(), strict=True)
    da.save_params(
        args.out, params,
        num_heads=bcfg.num_attention_heads,
        out_indices=list(bcfg.out_indices),
    )
    print(f"wrote {args.out}: {len(params)} arrays, "
          f"heads={bcfg.num_attention_heads}, out_indices={list(bcfg.out_indices)}")


if __name__ == "__main__":
    main()
