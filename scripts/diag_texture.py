"""Diagnostic for the textured-clip train/eval PSNR gap: medium-scale fit,
per-frame eval PSNR, and rendered-frame dumps (out/diag_texture/)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu import inference
from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.eval import metrics
from splatter_a_video_tpu.models import camera
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.train import density, fit, optim, trainer

W, H, T = 428, 240, 24
STEPS = int(os.environ.get("DIAG_STEPS", "2000"))
INIT_N = 25_000
MAXI = 1 << 18

clip = synthetic.make_clip(
    synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T, blob_radius=21.0, num_blobs=6,
        track_grid=2, texture=True,
    )
)
fcfg = fit.FitConfig(
    num_iters=STEPS, num_fg_samples=20_000, num_bg_samples=10_000,
    num_track_samples=2048, log_every=max(STEPS // 10, 1),
    capacity_factor=1.31, init_num_points=INIT_N,
)
tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T,
    loss_flow_weight=float(os.environ.get("DIAG_FLOW_W", "2.0")),
    num_track_samples=2048, max_intersections=MAXI,
    optim=optim.OptimConfig(max_steps=STEPS),
    densify=density.DensifyConfig(
        densify_start_iter=500, densify_stop_iter=100_000,
        opacity_reset_interval=3000, densify_grad_threshold=0.0002,
        size_prune_always=True,
    ),
)

t0 = time.time()
state, hist = fit.fit_clip(
    clip, fcfg, tcfg,
    callback=lambda s, m: print(
        f"step {s}: loss={m['loss']:.3f} psnr={m['psnr']:.2f} "
        f"alive={m['alive']}", flush=True),
)
print(f"trained in {(time.time()-t0)/60:.1f} min", flush=True)

scene = state.scene
cam = camera.canonical_camera(W, H)
outdir = os.path.join(os.path.dirname(__file__), "..", "out", "diag_texture")
os.makedirs(outdir, exist_ok=True)
np.savez(os.path.join(outdir, "scene.npz"),
         **{k: np.asarray(v) for k, v in scene.params.items()},
         alive=np.asarray(scene.alive))

# A/B the exact render configs: the trainer's (block 16x16, tile cap 64)
# vs the eval harness's (defaults) — is the train/eval PSNR gap a config
# artifact (saturation/truncation) or real?
for label, rc in (
    ("eval-default", rasterize.RasterizeConfig(
        width=W, height=H, max_intersections=MAXI)),
    ("trainer-cfg", tcfg.raster_cfg()),
):
    out = inference.render_frame(scene, 8, np.asarray(cam.extrinsic), rc)
    p = float(metrics.psnr(np.clip(np.asarray(out.features["rgb"]), 0, 1),
                           clip.frames[8]))
    print(f"{label}: frame8 psnr {p:.2f} n_int {int(out.num_intersections)}"
          f" budget {rc.max_intersections}", flush=True)

rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=MAXI)
res = inference.render_video(scene, cam, rcfg, list(range(T)))
import imageio.v2 as imageio

for t in range(T):
    p = float(metrics.psnr(res["rgb"][t], clip.frames[t]))
    ni = None
    print(f"frame {t:02d}: psnr {p:6.2f}")
    if t % 4 == 0:
        pair = np.concatenate(
            [np.clip(np.asarray(res["rgb"][t]), 0, 1),
             np.asarray(clip.frames[t])], axis=0)
        imageio.imwrite(os.path.join(outdir, f"f{t:02d}.png"),
                        (pair * 255).astype(np.uint8))
print("dumped renders to", outdir)
