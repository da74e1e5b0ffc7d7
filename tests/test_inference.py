"""Tests: inference capabilities, Tap-Vid metrics, PLY/checkpoint/vis utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu import inference
from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.eval import metrics, tapvid
from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.train import fit
from splatter_a_video_tpu.utils import ply as ply_utils
from splatter_a_video_tpu.utils import vis

W, H = 64, 48


@pytest.fixture(scope="module")
def clip():
    return synthetic.make_clip(synthetic.SyntheticClipConfig())


@pytest.fixture(scope="module")
def scene(clip):
    s, _ = fit.build_scene_from_clip(
        clip, fit.FitConfig(num_fg_samples=150, num_bg_samples=150)
    )
    # bump opacity so renders are substantive without training
    s.params["opacity"] = jnp.full_like(s.params["opacity"], 2.0)
    s.params["scaling"] = jnp.full_like(s.params["scaling"], np.log(0.05))
    return s


@pytest.fixture(scope="module")
def cam():
    return camera.canonical_camera(W, H)


@pytest.fixture(scope="module")
def rcfg():
    return rasterize.RasterizeConfig(width=W, height=H, max_intersections=1 << 14)


class TestRendering:
    def test_render_video(self, scene, cam, rcfg, clip):
        out = inference.render_video(scene, cam, rcfg, [0, 2.5, 5])
        assert out["rgb"].shape == (3, H, W, 3)
        assert out["depth"].shape == (3, H, W)
        assert np.isfinite(out["rgb"]).all()
        # consecutive frames differ (scene is dynamic)
        assert np.abs(out["rgb"][0] - out["rgb"][2]).max() > 0.01

    def test_render_nvs(self, scene, cam, rcfg):
        frames = inference.render_nvs(scene, cam, rcfg, [0, 1, 2], radius=0.05)
        assert frames.shape == (3, H, W, 3)
        assert np.isfinite(frames).all()

    def test_render_stereo(self, scene, cam, rcfg):
        frames = inference.render_stereo(scene, cam, rcfg, [0, 1], baseline=0.05)
        assert frames.shape == (2, H, W, 3)
        # anaglyph: red channel from left eye only -> differs from plain render
        assert np.isfinite(frames).all()


class TestTracking:
    def test_correspondences_shapes(self, scene, cam, rcfg):
        px1 = np.array([[20.0, 20.0], [40.0, 30.0]], np.float32)
        px2, occ = inference.track_correspondences(scene, 0.0, px1, 5.0, cam, rcfg)
        assert px2.shape == (2, 2) and occ.shape == (2,)
        assert np.isfinite(px2).all()

    def test_identity_time_maps_to_self(self, scene, cam, rcfg):
        """Tracking from t to t should return (approximately) the query,
        measured at pixels actually covered by Gaussians."""
        from splatter_a_video_tpu.ops import projection

        pos = np.asarray(scene.get_position(jnp.asarray(2.0)))
        alive = np.asarray(scene.alive)
        uv, depth = projection.project_ortho(
            jnp.asarray(pos), jnp.eye(3, 4), W, H
        )
        uv = np.asarray(uv)[alive]
        inb = (
            (uv[:, 0] > 4) & (uv[:, 0] < W - 4) & (uv[:, 1] > 4) & (uv[:, 1] < H - 4)
        )
        px1 = uv[inb][:4].astype(np.float32)
        px2, occ = inference.track_correspondences(scene, 2.0, px1, 2.0, cam, rcfg)
        # untrained sparse scenes have blend dilution (weights < 1 pull the
        # map toward bg=0), so allow a few px; trained scenes are subpixel
        err = np.abs(px2 - px1)
        assert err.mean() < 4.0 and err.max() < 8.0, (px2, px1)


class TestEditing:
    @pytest.mark.slow
    def test_select_and_optimize(self, scene, cam, rcfg):
        mask = np.zeros((H, W), np.float32)
        mask[10:25, 10:30] = 1.0
        sel = inference.select_gaussians_by_mask(scene, mask, cam, rcfg)
        assert len(sel) > 0
        target = np.zeros((H, W, 3), np.float32)  # paint region black
        edited = inference.optimize_appearance(
            scene, sel, target, cam, rcfg, steps=20
        )
        # edited scene renders darker inside the mask region
        out0 = inference.render_frame(scene, 0.0, jnp.asarray(cam.extrinsic), rcfg)
        out1 = inference.render_frame(edited, 0.0, jnp.asarray(cam.extrinsic), rcfg)
        r0 = float(np.asarray(out0.features["rgb"])[mask > 0].mean())
        r1 = float(np.asarray(out1.features["rgb"])[mask > 0].mean())
        assert r1 < r0 - 0.01, (r0, r1)

    def test_split_layers(self, scene):
        fg, bg = inference.split_layers(scene)
        n_fg = int(fg.num_alive)
        n_bg = int(bg.num_alive)
        assert n_fg + n_bg == int(scene.num_alive)

    def test_add_fg_copy(self, scene):
        params = dict(scene.params)
        params["mask_attribute"] = params["mask_attribute"].at[:20].set(5.0)
        s2 = scene.replace(params=params)
        before = int(s2.num_alive)
        s3 = inference.add_fg_copy(s2, np.array([0.1, 0.0, 0.0]))
        assert int(s3.num_alive) > before

    def test_trajectories(self, scene):
        tr = inference.gaussian_trajectories(scene, [0, 3, 7], sample=16)
        assert tr.shape == (16, 3, 3)
        assert np.abs(tr[:, -1] - tr[:, 0]).max() > 1e-4


class TestTapvid:
    def test_perfect_tracking(self):
        rng = np.random.RandomState(0)
        gt = rng.rand(10, 6, 2).astype(np.float32) * 50
        occ = np.zeros((10, 6), bool)
        m = tapvid.compute_tapvid_metrics(gt, occ, gt, occ, 64, 48)
        assert m["average_jaccard"] == 100.0
        assert m["delta_avg"] == 100.0
        assert m["occlusion_accuracy"] == 100.0
        assert m["temporal_coherence"] < 1e-6

    def test_noisy_tracking_degrades(self):
        rng = np.random.RandomState(0)
        gt = rng.rand(50, 6, 2).astype(np.float32) * 50
        occ = np.zeros((50, 6), bool)
        pred = gt + rng.randn(50, 6, 2).astype(np.float32) * 3.0
        m = tapvid.compute_tapvid_metrics(pred, occ, gt, occ, 64, 48)
        assert 0 < m["delta_avg"] < 100
        assert m["temporal_coherence"] > 1.0

    def test_occlusion_accuracy(self):
        gt = np.zeros((4, 5, 2), np.float32)
        occ_gt = np.zeros((4, 5), bool)
        occ_pred = occ_gt.copy()
        occ_pred[0, :] = True  # 1/4 wrong
        m = tapvid.compute_tapvid_metrics(gt, occ_pred, gt, occ_gt, 64, 48)
        assert abs(m["occlusion_accuracy"] - 75.0) < 1e-5

    def test_scene_eval_runs(self, scene, clip, cam, rcfg):
        m = tapvid.evaluate_scene_tracking(scene, clip, cam, rcfg, num_queries=16)
        for k in ("average_jaccard", "delta_avg", "occlusion_accuracy"):
            assert 0 <= m[k] <= 100


class TestUtils:
    def test_ply_roundtrip(self, scene, tmp_path):
        path = str(tmp_path / "scene.ply")
        params_np = {k: np.asarray(v) for k, v in scene.params.items()}
        alive = np.asarray(scene.alive)
        ply_utils.save_ply(path, params_np, alive)
        loaded = ply_utils.load_ply(path)
        n = int(alive.sum())
        np.testing.assert_allclose(
            loaded["position"], params_np["position"][alive].reshape(n, -1),
            atol=1e-6,
        )
        assert loaded["opacity"].shape == (n, 1)

    def test_checkpoint_roundtrip(self, tmp_path, clip):
        from splatter_a_video_tpu.train import density, optim, trainer
        from splatter_a_video_tpu.utils import checkpoint as ckpt

        s, scfg = fit.build_scene_from_clip(
            clip, fit.FitConfig(num_fg_samples=50, num_bg_samples=50)
        )
        tcfg = trainer.TrainerConfig(
            width=W, height=H, num_frames=clip.num_frames,
            optim=optim.OptimConfig(max_steps=10),
        )
        state = trainer.init_train_state(tcfg, s)
        out = str(tmp_path / "run")
        ckpt.save_checkpoint(out, state, 7)
        assert ckpt.latest_step(out) == 7
        restored, step = ckpt.restore_checkpoint(out, state)
        assert step == 7
        np.testing.assert_array_equal(
            np.asarray(restored.scene.params["position"]),
            np.asarray(state.scene.params["position"]),
        )

    def test_vis(self):
        d = np.linspace(0, 1, 48 * 64).reshape(48, 64)
        img = vis.colorize_depth(d)
        assert img.shape == (48, 64, 3) and img.min() >= 0 and img.max() <= 1
        fl = vis.flow_to_image(np.random.RandomState(0).randn(10, 12, 2))
        assert fl.shape == (10, 12, 3)
        base = np.zeros((48, 64, 3))
        tracks = np.random.RandomState(0).rand(5, 6, 2) * [64, 48]
        over = vis.draw_tracks_2d(base, tracks)
        assert over.max() > 0

    def test_metrics(self):
        rng = np.random.RandomState(0)
        a = rng.rand(32, 32, 3).astype(np.float32)
        assert metrics.psnr(a, a) > 60
        assert metrics.ssim(a, a) > 0.99
        assert 0 < metrics.ms_ssim(a, np.clip(a + 0.1 * rng.randn(32, 32, 3), 0, 1)) < 1
