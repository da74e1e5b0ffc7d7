"""Convert a (Boots)TAPIR torch checkpoint to the JAX .npz format.

Usage (on a machine with the checkpoint available):
    python scripts/convert_tapir.py \
        --ckpt bootstapir_checkpoint_v2.pt --out weights/tapir.npz

The checkpoint is the torch state_dict the reference loads
(`/root/reference/src/data_preparation/compute_tracks_torch.py:87-93`).
Then point `$SPLAT_TAPIR_WEIGHTS` at the npz (or place it under
`splatter_a_video_tpu/weights/`) and `data/preprocess.compute_tracks`
runs TPU-natively.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch TAPIR state_dict (.pt)")
    ap.add_argument("--out", default="weights/tapir.npz")
    args = ap.parse_args(argv)

    import torch

    from splatter_a_video_tpu.nets import tapir

    sd = torch.load(args.ckpt, map_location="cpu")
    if not any(k.startswith("resnet_torch") for k in sd):
        # some checkpoints nest under 'model' / 'state_dict'
        for key in ("model", "state_dict"):
            if key in sd:
                sd = sd[key]
                break
    # strict: every checkpoint key must be consumed — an upstream rename
    # of the block-pattern keys would otherwise silently convert nothing
    params = tapir.params_from_torch(sd, strict=True)
    tapir.save_params(args.out, params)
    print(f"wrote {args.out}: {len(params)} arrays")


if __name__ == "__main__":
    main()
