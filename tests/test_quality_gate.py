"""Offline end-to-end quality gate.

The kernel digest gate (`test_golden_digest.py`) pins the float math
bit-exactly, but training-DYNAMICS changes (density control, loss
weights, schedules) can swing end-to-end quality while every unit test
stays green — in round 3 a size-prune gating change moved synthetic
tracking AJ by 21 points with a fully green suite. This gate is the
complement: one CPU mini-fit on the TEXTURED adversarial clip (procedural
noise textures, rotation/scale deformation, occluder crossings — a scene
where photometric loss cannot cheat correspondence, `data/synthetic.py`)
with the PRODUCTION density-control shape active (clone/split, opacity
reset mid-run, always-on size prune, grad threshold 0.0002 —
`frag_gs_v10.yaml:26-39`, `atlas_gs_optimizer.py:362`), then recon +
TAP-Vid tracking eval against PINNED bands.

The fit is deterministic on CPU (fixed seeds, no atomics anywhere in the
pipeline), verified by re-running to bit-identical metrics, so the bands
are tight: they catch a fraction-of-a-dB recon regression or a few-point
tracking drop, not just collapse. An INTENTIONAL dynamics change is
allowed to move the numbers — re-pin the constants in the same commit and
say why in its message.
"""
import numpy as np
import pytest

from splatter_a_video_tpu import inference
from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.eval import metrics, tapvid
from splatter_a_video_tpu.models import camera
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.train import density, fit, optim, trainer

W, H, T = 128, 96, 12
STEPS = 500
MAXI = 1 << 15

# Pinned 2026-08-19 (determinism verified: two runs of this config were
# bit-identical), AFTER the screen-radius-prune parity fix. Tracking AJ at
# this toy scale is a collapse canary, not a quality measure — it swings
# with step count (8.13 at 500 steps, 1.44 at 750) — so its band is wide
# while PSNR/alive carry the fine-grained signal.
PINNED = {"psnr": 10.37, "aj": 8.13, "oa": 51.99, "alive": 3537}
# Tolerances are one-sided DOWN for quality (drops are regressions;
# improvements re-pin) and two-sided for alive count (density-control
# behavior drift in either direction is a dynamics change worth seeing).
PSNR_DROP = 0.75
AJ_DROP = 4.0
OA_DROP = 6.0
ALIVE_REL = 0.25


@pytest.fixture(scope="module")
def fitted():
    clip = synthetic.make_clip(
        synthetic.SyntheticClipConfig(
            width=W, height=H, num_frames=T, num_blobs=4,
            blob_radius=W / 9.0, track_grid=3, texture=True,
        )
    )
    fcfg = fit.FitConfig(
        num_iters=STEPS, num_fg_samples=1200, num_bg_samples=800,
        num_track_samples=256, log_every=100,
        capacity_factor=1.31, init_num_points=3000,
    )
    tcfg = trainer.TrainerConfig(
        width=W, height=H, num_frames=T, loss_flow_weight=2.0,
        num_track_samples=256, max_intersections=MAXI, arap_sample_num=128,
        optim=optim.OptimConfig(max_steps=STEPS),
        densify=density.DensifyConfig(
            densify_start_iter=100, densify_stop_iter=10**9,
            prune_interval=100, duplicate_interval=100,
            opacity_reset_interval=300,
            densify_grad_threshold=0.0002, size_prune_always=True,
        ),
    )
    state, hist = fit.fit_clip(clip, fcfg, tcfg)
    return clip, state, hist


@pytest.mark.slow
class TestQualityGate:
    def test_recon_band(self, fitted):
        clip, state, hist = fitted
        cam = camera.canonical_camera(W, H)
        rcfg = rasterize.RasterizeConfig(
            width=W, height=H, max_intersections=MAXI
        )
        res = inference.render_video(state.scene, cam, rcfg, list(range(T)))
        ps = float(np.mean([
            float(metrics.psnr(res["rgb"][t], clip.frames[t]))
            for t in range(T)
        ]))
        assert ps > PINNED["psnr"] - PSNR_DROP, (
            f"recon PSNR {ps:.2f} fell below pinned {PINNED['psnr']} - "
            f"{PSNR_DROP} — a training-dynamics regression (or an"
            " intentional change that must re-pin this constant)"
        )

    def test_tracking_band(self, fitted):
        clip, state, hist = fitted
        cam = camera.canonical_camera(W, H)
        rcfg = rasterize.RasterizeConfig(
            width=W, height=H, max_intersections=MAXI
        )
        m = tapvid.evaluate_scene_tracking(
            state.scene, clip, cam, rcfg, num_queries=128
        )
        assert m["average_jaccard"] > PINNED["aj"] - AJ_DROP, m
        assert m["occlusion_accuracy"] > PINNED["oa"] - OA_DROP, m

    def test_density_control_band(self, fitted):
        _, state, hist = fitted
        alive = hist[-1]["alive"]
        lo = PINNED["alive"] * (1 - ALIVE_REL)
        hi = PINNED["alive"] * (1 + ALIVE_REL)
        assert lo < alive < hi, (
            f"final alive {alive} outside [{lo:.0f}, {hi:.0f}] — "
            "clone/split/prune behavior drifted"
        )
        # the run must have actually exercised densification AND survived
        # the mid-run opacity reset (step 300) without collapse
        assert alive != 3000, "no density event ever fired"
