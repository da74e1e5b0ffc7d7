"""Production-scale e2e quality harness: 854x480, ~100k gaussians, >=5k
steps on a synthetic clip — the scale of the reference's DAVIS runs
(`/root/reference/README.md:13-22`, 480p, 100k init points, 20k iters).

Reports recon (PSNR/SSIM/LPIPS-fallback) + TAP-Vid tracking + wall time and
writes METRICS_480p.json at the repo root for the README to cite.

Env knobs: E480_STEPS (default 5000), E480_FRAMES (48), E480_QUICK=1
(tiny sanity config for plumbing tests).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache, force_cpu

enable_compilation_cache()
if os.environ.get("E480_CPU", "0") == "1":
    # JAX_PLATFORMS=cpu is IGNORED under the axon relay plugin; only the
    # config update actually forces CPU
    force_cpu(1)
import numpy as np

from splatter_a_video_tpu import inference
from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.eval import metrics, tapvid
from splatter_a_video_tpu.models import camera
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.train import density, fit, optim, trainer

QUICK = os.environ.get("E480_QUICK", "0") == "1"
STEPS = int(os.environ.get("E480_STEPS", "300" if QUICK else "5000"))
T = int(os.environ.get("E480_FRAMES", "8" if QUICK else "48"))
W, H = (214, 120) if QUICK else (854, 480)
FG, BG = (500, 300) if QUICK else (60_000, 40_000)
MAXI = (1 << 15) if QUICK else (1 << 19)
NTRACK = 512 if QUICK else 4096

clip = synthetic.make_clip(
    synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T,
        blob_radius=(10.0 if QUICK else 42.0), num_blobs=6,
        # stride-2 query grid: ~102k tracks, enough to lift the full 100k
        # init points of the reference's DAVIS scale (stride 4 caps at 25k)
        track_grid=2 if not QUICK else 4,
    )
)
fcfg = fit.FitConfig(
    num_iters=STEPS, num_fg_samples=FG, num_bg_samples=BG,
    num_track_samples=NTRACK, log_every=max(STEPS // 20, 1),
    capacity_factor=1.31,  # ~131k capacity at 100k init (flagship shape)
)
tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T,
    # the synthetic blobs are textureless at every scale, so the
    # photometric term alone "cheats" correspondence exactly as in the
    # toy harness (scripts/e2e_tpu.py) — the synthetic-scene flow weight
    # is 20; production DAVIS keeps the reference's 2 (frag_gs_v10.yaml)
    loss_flow_weight=float(os.environ.get("E480_FLOW_W", "20.0")),
    num_track_samples=NTRACK, max_intersections=MAXI,
    optim=optim.OptimConfig(max_steps=STEPS),
    densify=density.DensifyConfig(
        densify_start_iter=500,
        densify_stop_iter=int(STEPS * 0.75),
        opacity_reset_interval=10**9,
        # bisect knob for the 2026-08-19 divergence: production DAVIS
        # threshold is 0.0002; the toy e2e_tpu harness converges at 0.02
        densify_grad_threshold=float(
            os.environ.get("E480_GRAD_TH", "0.0002")),
    ) if os.environ.get("E480_DENSIFY", "1") == "1" else
    # diagnostic: E480_DENSIFY=0 disables density control entirely (used
    # to bisect the 2026-08-19 divergence to the unconditional size-prune;
    # see METRICS_480p_nodensify.json + the PARITY.md §2.7 density row)
    density.DensifyConfig(densify_start_iter=STEPS + 1,
                          densify_stop_iter=STEPS + 1,
                          opacity_reset_interval=10**9),
)

t0 = time.time()
state, hist = fit.fit_clip(
    clip, fcfg, tcfg,
    callback=lambda s, m: print(
        f"step {s}: loss={m['loss']:.3f} psnr={m['psnr']:.2f} "
        f"alive={m['alive']} {s/(time.time()-t0):.1f} it/s", flush=True,
    ),
)
train_min = (time.time() - t0) / 60
print(f"trained {STEPS} steps in {train_min:.1f} min", flush=True)

scene = state.scene
cam = camera.canonical_camera(W, H)
rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=MAXI)

psnrs, ssims = [], []
res = inference.render_video(scene, cam, rcfg, list(range(T)))
for t in range(T):
    psnrs.append(float(metrics.psnr(res["rgb"][t], clip.frames[t])))
    ssims.append(float(metrics.ssim(res["rgb"][t], clip.frames[t])))
lp = [float(metrics.lpips(res["rgb"][t], clip.frames[t]))
      for t in range(0, T, max(T // 6, 1))]
lp_pre = bool(metrics.lpips_is_pretrained())
print(f"recon: PSNR {np.mean(psnrs):.2f} SSIM {np.mean(ssims):.4f} "
      f"LPIPS {np.mean(lp):.4f}{'' if lp_pre else ' (random-trunk)'}",
      flush=True)

m = tapvid.evaluate_scene_tracking(scene, clip, cam, rcfg, num_queries=256)
print("tapvid:", json.dumps({k: round(v, 2) for k, v in m.items()}),
      flush=True)

out = {
    "date": time.strftime("%Y-%m-%d"),
    "scale": {"width": W, "height": H, "frames": T, "steps": STEPS,
              "init_points_requested": FG + BG,
              # get_tracks_3d filters raw queries by mask/visibility
              # validity, so realized init << requested (reference
              # behavior: read_data_simple filters the same way)
              "init_points": int(hist[0]["alive"]),
              "capacity": int(state.scene.cfg.capacity),
              "densify": os.environ.get("E480_DENSIFY", "1") == "1",
              "densify_grad_threshold": tcfg.densify.densify_grad_threshold},
    "train_minutes": round(train_min, 2),
    "final_alive": int(hist[-1]["alive"]),
    "recon": {"psnr": round(float(np.mean(psnrs)), 2),
              "ssim": round(float(np.mean(ssims)), 4),
              "lpips_fallback": round(float(np.mean(lp)), 4),
              "lpips_is_pretrained": lp_pre},
    "tapvid": {k: round(float(v), 2) for k, v in m.items()},
    "hardware": jax.devices()[0].device_kind,
}
suffix = "" if os.environ.get("E480_DENSIFY", "1") == "1" else "_nodensify"
dest = os.path.join(os.path.dirname(__file__), "..",
                    f"METRICS_480p{suffix}.json")
if not QUICK:
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.abspath(dest)}", flush=True)
print(json.dumps(out), flush=True)
