"""Production-scale e2e quality harness: 854x480, 100k init gaussians,
20k steps, production density control — the exact run shape of the
reference's DAVIS benchmarks (`/root/reference/README.md:13-22`: 480p,
100k init points `frag_gs_v10.yaml:18`, 20k iters `config.txt:17`,
opacity reset every 3000 + unconditional size prune
`atlas_gs_optimizer.py:362` via `frag_gs_v10.yaml:24`).

Reports recon (PSNR/SSIM/LPIPS-fallback) + TAP-Vid tracking + wall time and
writes METRICS_480p.json at the repo root for the README to cite.

Env knobs: E480_STEPS (default 20000), E480_FRAMES (48), E480_QUICK=1
(tiny sanity config for plumbing tests), E480_TEXTURE=1 (textured
adversarial clip at the production flow weight 2 instead of the
textureless blob clip), E480_DENSIFY / E480_GRAD_TH / E480_RESET_INT /
E480_SIZE_PRUNE_ALWAYS (density-control bisect knobs).
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
TEXTURE = os.environ.get("E480_TEXTURE", "0") == "1"
STEPS = int(os.environ.get("E480_STEPS", "300" if QUICK else "20000"))
T = int(os.environ.get("E480_FRAMES", "8" if QUICK else "48"))
W, H = (214, 120) if QUICK else (854, 480)
FG, BG = (500, 300) if QUICK else (60_000, 40_000)
INIT_N = 800 if QUICK else 100_000   # topped up with depth-unprojected pts
# 1 << 20: the r4 production-density run measured 684k true intersections
# at 131k gaussians once footprints grow freely (the reference has NO
# intersection budget — dynamic allocation); 1 << 19 silently truncated
# training AND eval renders (/tmp/e480_fix6k.log)
MAXI = (1 << 15) if QUICK else int(os.environ.get("E480_MAXI", str(1 << 20)))
NTRACK = 512 if QUICK else 4096

# stride-2 query grid: ~100k raw queries; after the reference's
# visibility/confidence filtering this realizes ~28k lifted tracks
# at 480p — FitConfig.init_num_points tops the rest up to 100k.
# The GT track table is [T, n, 4] per query frame (T^2 * n * 16 B total):
# 3.8 GB at T=48/stride 2 but 102 GB at T=250/stride 2, so long clips
# back off to stride 4 (~26 GB) — still ~26k queries/frame, the same
# realized-track density class as the reference's TAPIR grids.
GRID = int(os.environ.get(
    "E480_TRACK_GRID", "4" if QUICK else ("2" if T <= 64 else "4")))
clip = synthetic.make_clip(
    synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T,
        blob_radius=(10.0 if QUICK else 42.0), num_blobs=6,
        track_grid=GRID,
        texture=TEXTURE,
    )
)
# textureless blobs let the photometric term cheat correspondence, so the
# blob clip needs flow weight 20 to make tracking bind (see the r3 bisect);
# the TEXTURED clip uses the reference's production weight 2
# (`configs/config.txt`: loss_flow_weight=2)
FLOW_W = float(os.environ.get("E480_FLOW_W", "2.0" if TEXTURE else "20.0"))
# capacity sweep knob (VERDICT r4 #3: the flagship run ended 97%
# saturated; 1.31 -> 131k is the flagship shape, 1.96/2.62 probe whether
# 26.55 PSNR was capacity-limited)
CAPF = float(os.environ.get("E480_CAPF", "1.31"))
fcfg = fit.FitConfig(
    num_iters=STEPS, num_fg_samples=FG, num_bg_samples=BG,
    num_track_samples=NTRACK, log_every=max(STEPS // 40, 1),
    capacity_factor=CAPF,
    init_num_points=INIT_N,
)
# E480_ATTR=1 switches on the reference's hand-enabled attribute
# supervision (mask MSE + fg-layer terms at weight 20,
# `trainer_fragGS.py:632-668` — `if False:` blocks in the reference,
# switched on by hand for the layer-split/editing capabilities); off for
# the flagship parity config. DINO stays off: synthetic clips carry no
# DINO features (the DAVIS pipeline supplies them via `data/dinov2/`).
ATTR_W = 20.0 if os.environ.get("E480_ATTR", "0") == "1" else 0.0
tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T,
    nearest=float(os.environ.get("E480_NEAREST", "0.2")),
    loss_flow_weight=FLOW_W,
    mask_attr_weight=ATTR_W,
    # fg-layer re-render supervision is separately gated: its second
    # differentiable render measurably destabilizes the flagship on the
    # 2026-08-20 toolchain (PSNR 18 -> 10 by step 5k, /tmp/e480_attr.log)
    # and the layer-split capability needs only the mask attribute
    fg_layer_weight=(ATTR_W if os.environ.get("E480_FG_LAYER") == "1"
                     else 0.0),
    num_track_samples=NTRACK, max_intersections=MAXI,
    # E480_LR_STEPS decouples the lr-annealing horizon from the step
    # count: the 2026-08-20 toolchain's noisier kernel grads destabilize
    # the textured fit at the position-lr level the 20k schedule holds
    # through steps 2-3k (PSNR 20 -> 10 collapse), while the 8k-horizon
    # annealing is measurably stable (METRICS_480p_stop19: PSNR 17.8 at
    # 8k steps, monotone). Training continues past the horizon at the
    # schedule's final lr (expon_lr clamps).
    optim=optim.OptimConfig(
        max_steps=int(os.environ.get("E480_LR_STEPS", str(STEPS)))),
    densify=density.DensifyConfig(
        # production values: frag_gs_v10.yaml:29-38 (start 500, stop
        # 100000 i.e. never within 20k iters, reset every 3000, grad
        # threshold 0.0002) + the atlas optimizer's unconditional size
        # prune (atlas_gs_optimizer.py:362). cameras_extent=5 is the
        # DensifyConfig default (trainer_fragGS.py:229).
        # T-scaled schedule knobs: the reference's step-based schedule
        # implicitly assumes ~T=50-90 clips (per-frame VISIT counts are
        # what the dynamics see: start 500 / interval 100 at T=48 is ~10
        # visits to start and ~2 per event; at T=250 the same steps are
        # 2 and 0.4 — densify then outruns healing and the fit collapses,
        # measured in /tmp/e480_T250*.log 2026-08-20)
        densify_start_iter=int(os.environ.get("E480_DENSIFY_START", "500")),
        densify_stop_iter=int(os.environ.get("E480_DENSIFY_STOP", "100000")),
        prune_interval=int(os.environ.get("E480_DENSIFY_INT", "100")),
        duplicate_interval=int(os.environ.get("E480_DENSIFY_INT", "100")),
        opacity_reset_interval=int(
            os.environ.get("E480_RESET_INT", "3000")),
        densify_grad_threshold=float(
            os.environ.get("E480_GRAD_TH", "0.0002")),
        # per-event growth budget (fraction of alive; 0 = reference's
        # unlimited growth). See density.DensifyConfig.max_growth_frac.
        # Passed via **-filter below so historical density.py versions
        # (A/B archaeology runs) still construct.
        **({"max_growth_frac":
            float(os.environ.get("E480_GROWTH_FRAC", "0"))}
           if any(f.name == "max_growth_frac"
                  for f in __import__("dataclasses").fields(
                      density.DensifyConfig))
           else {}),
        size_prune_always=(
            os.environ.get("E480_SIZE_PRUNE_ALWAYS", "1") == "1"),
    ) if os.environ.get("E480_DENSIFY", "1") == "1" else
    # diagnostic: E480_DENSIFY=0 disables density control entirely (used
    # to bisect the 2026-08-19 divergence, since root-caused to the
    # cameras_extent=1.0 bug; see density.DensifyConfig comments)
    density.DensifyConfig(densify_start_iter=STEPS + 1,
                          densify_stop_iter=STEPS + 1,
                          opacity_reset_interval=10**9),
)

t0 = time.time()
state, hist = fit.fit_clip(
    clip, fcfg, tcfg,
    callback=lambda s, m: print(
        f"step {s}: loss={m['loss']:.3f} psnr={m['psnr']:.2f} "
        f"rgb={m['loss_rgb']:.3f} flow={m['loss_flow']:.3f} "
        f"depth={m['loss_depth']:.3f} arap={m['loss_arap']:.4f} "
        f"alive={m['alive']} {s/(time.time()-t0):.1f} it/s", flush=True,
    ),
)
train_min = (time.time() - t0) / 60
print(f"trained {STEPS} steps in {train_min:.1f} min", flush=True)

scene = state.scene
cam = camera.canonical_camera(W, H)
rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=MAXI)

if not QUICK:
    outdir = os.path.join(os.path.dirname(__file__), "..", "out", "e480")
    os.makedirs(outdir, exist_ok=True)
    # variant runs (T!=48, capacity sweeps) must not clobber the flagship
    # scene that the capability artifacts are generated from
    scene_name = "final_scene.npz"
    if T != 48 or CAPF != 1.31 or ATTR_W or os.environ.get("E480_SUFFIX"):
        scene_name = (f"final_scene_T{T}_c{CAPF}"
                      f"{'_attr' if ATTR_W else ''}"
                      f"{os.environ.get('E480_SUFFIX', '')}.npz")
    np.savez(os.path.join(outdir, scene_name),
             **{k: np.asarray(v) for k, v in scene.params.items()},
             alive=np.asarray(scene.alive),
             # aux needed to reconstruct the scene without the clip
             # (capability_480p.py re-derives knots and asserts the match)
             spline_knots=np.asarray(scene.aux["spline_knots"]))

psnrs, ssims = [], []
res = inference.render_video(scene, cam, rcfg, list(range(T)))
# intersection-budget audit: a truncated render (n_int at the budget
# ceiling) silently degrades eval while training adapts around it
ni = [int(inference.render_frame(scene, t, np.asarray(cam.extrinsic),
                                 rcfg).num_intersections)
      for t in range(0, T, max(T // 6, 1))]
print(f"eval num_intersections: max {max(ni)} of budget "
      f"{rcfg.max_intersections} {'*** OVERFLOW ***' if max(ni) >= rcfg.max_intersections else ''}",
      flush=True)
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
              "track_grid": GRID, "attr_weight": ATTR_W,
              "texture": TEXTURE, "loss_flow_weight": FLOW_W,
              "init_points_requested": INIT_N,
              "init_points": int(hist[0]["alive"]),
              "capacity": int(state.scene.cfg.capacity),
              "densify": os.environ.get("E480_DENSIFY", "1") == "1",
              "densify_start_iter": tcfg.densify.densify_start_iter,
              "densify_interval": tcfg.densify.duplicate_interval,
              "max_growth_frac": getattr(tcfg.densify, "max_growth_frac", None),
              "densify_grad_threshold": tcfg.densify.densify_grad_threshold,
              "opacity_reset_interval": tcfg.densify.opacity_reset_interval,
              "size_prune_always": tcfg.densify.size_prune_always,
              "cameras_extent": tcfg.densify.cameras_extent},
    "train_minutes": round(train_min, 2),
    # phase split: setup (lift/knn/upload) + first-step compile vs the
    # steady loop — the headline train-time comparison vs the reference's
    # ~30 min is `timing.steady_ms * steps`, totals alone hide a 2x
    "timing": hist[-1].get("timing", {}),
    "final_alive": int(hist[-1]["alive"]),
    "saturation": hist[-1].get("saturation"),
    # cumulative clone/split/prune/DROPPED counts — the repo's no-silent-
    # caps rule applied to the flagship artifact (capacity-dropped
    # densify candidates were previously computed but never surfaced)
    "densify_totals": hist[-1].get("densify_totals"),
    "eval_num_intersections": {"max": max(ni),
                               "budget": int(rcfg.max_intersections),
                               "overflow": max(ni) >= rcfg.max_intersections},
    "recon": {"psnr": round(float(np.mean(psnrs)), 2),
              "ssim": round(float(np.mean(ssims)), 4),
              "lpips_fallback": round(float(np.mean(lp)), 4),
              "lpips_is_pretrained": lp_pre,
              # where the loss concentrates along the clip (VERDICT r4
              # weak #3): densify-event or occlusion-local failures show
              # up here as outlier frames, a mean alone hides them
              "psnr_per_frame": [round(p, 2) for p in psnrs],
              "psnr_min": round(float(np.min(psnrs)), 2),
              "psnr_max": round(float(np.max(psnrs)), 2)},
    "tapvid": {k: round(float(v), 2) for k, v in m.items()},
    "hardware": jax.devices()[0].device_kind,
}
# METRICS_480p.json is the flagship artifact: textured clip, production
# density control + loss weights. Variant runs get suffixed names.
suffix = "" if TEXTURE else "_blobs"
if os.environ.get("E480_DENSIFY", "1") != "1":
    suffix = "_nodensify"
if T != 48 and not QUICK:
    suffix += f"_T{T}"   # e.g. the reference-default 250-frame point
if CAPF != 1.31:
    suffix += f"_c{int(state.scene.cfg.capacity/1000)}k"
if ATTR_W:
    suffix += "_attr"
if os.environ.get("E480_SUFFIX"):
    suffix += "_" + os.environ["E480_SUFFIX"]
dest = os.path.join(os.path.dirname(__file__), "..",
                    f"METRICS_480p{suffix}.json")
if not QUICK:
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.abspath(dest)}", flush=True)
print(json.dumps(out), flush=True)
