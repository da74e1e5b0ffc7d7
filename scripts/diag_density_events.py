"""Instrument density-control events: PSNR on a fixed frame immediately
before and after every densify/prune event, with the event's
clone/split/prune counts — quantifies the per-event quality cost that the
eval-after-final-event artifact pays (diag_texture showed train ~20.5 vs
eval ~16.4 on the textured clip)."""
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
from splatter_a_video_tpu.train.fit import (PairSampler, PairSamplerConfig,
                                            BatchBuilder, batch_stream)

W, H, T = 428, 240, 24
STEPS = int(os.environ.get("DIAG_STEPS", "2000"))
MAXI = 1 << 18

clip = synthetic.make_clip(
    synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T, blob_radius=21.0, num_blobs=6,
        track_grid=2, texture=True,
    )
)
fcfg = fit.FitConfig(
    num_iters=STEPS, num_track_samples=2048, capacity_factor=1.31,
    init_num_points=25_000,
)
tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T, loss_flow_weight=2.0,
    num_track_samples=2048, max_intersections=MAXI,
    optim=optim.OptimConfig(max_steps=STEPS),
    densify=density.DensifyConfig(
        densify_start_iter=500, densify_stop_iter=100_000,
        opacity_reset_interval=3000, densify_grad_threshold=0.0002,
        size_prune_always=True,
    ),
)

scene, scfg = fit.build_scene_from_clip(clip, fcfg)
cam = camera.canonical_camera(W, H)
rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=MAXI)
train_step, density_step, opacity_reset = trainer.make_train_step(
    tcfg, cam.extrinsic)
state = trainer.init_train_state(tcfg, scene, seed=0)

gt8 = clip.frames[8]


def p8(scene):
    out = inference.render_frame(scene, 8, np.asarray(cam.extrinsic), rcfg)
    return float(metrics.psnr(
        np.clip(np.asarray(out.features["rgb"]), 0, 1), gt8))


sampler = PairSampler(PairSamplerConfig(num_frames=T, seed=0))
builder = BatchBuilder(clip, 2048, seed=0)
t0 = time.time()
for step, batch in enumerate(batch_stream(sampler, builder, STEPS), start=1):
    state, m = train_step(state, batch)
    if trainer.should_densify(tcfg, step):
        before = p8(state.scene)
        # also measure radii stats feeding the prune decision
        r2d = np.asarray(state.densify_state.max_radii2d)
        alive = np.asarray(state.scene.alive)
        big_vs = int(((r2d > tcfg.densify.max_radii2d_px) & alive).sum())
        sc = np.asarray(
            np.max(np.exp(state.scene.params["scaling"]), axis=-1))
        big_ws = int(
            ((sc > 0.1 * tcfg.densify.cameras_extent) & alive).sum())
        state, info = density_step(state)
        after = p8(state.scene)
        print(
            f"step {step}: psnr {before:.2f} -> {after:.2f} "
            f"(d {after-before:+.2f}) clone {int(info.num_cloned)} "
            f"split {int(info.num_split)} pruned {int(info.num_pruned)} "
            f"[big_vs {big_vs} big_ws {big_ws}] "
            f"alive {int(info.num_alive)}", flush=True)
    if trainer.should_reset_opacity(tcfg, step):
        before = p8(state.scene)
        state = opacity_reset(state)
        print(f"step {step}: OPACITY RESET psnr {before:.2f} -> "
              f"{p8(state.scene):.2f}", flush=True)
print(f"final psnr(frame8) {p8(state.scene):.2f}  "
      f"({(time.time()-t0)/60:.1f} min)", flush=True)
