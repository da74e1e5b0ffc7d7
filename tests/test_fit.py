"""End-to-end video fit smoke: synthetic clip -> spline scene -> training."""

import numpy as np
import pytest

from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.train import density, fit, optim, trainer


@pytest.fixture(scope="module")
def clip():
    return synthetic.make_clip(synthetic.SyntheticClipConfig())


class TestBuildScene:
    def test_spline_scene_from_clip(self, clip):
        cfg = fit.FitConfig(num_fg_samples=120, num_bg_samples=120)
        scene, scfg = fit.build_scene_from_clip(clip, cfg)
        assert scfg.traj == "cubic_spline"
        n = int(scene.num_alive)
        assert n >= 30  # tiny synthetic clip: strict visibility filters
        assert "pos_cubic_coeff" in scene.params
        # positions at t=0 lie in the canonical frustum
        pos = np.asarray(scene.get_position(0))[:n]
        assert np.abs(pos[:, :2]).max() <= 1.3
        assert pos[:, 2].min() >= 0.4 and pos[:, 2].max() <= 2.1
        # trajectories follow tracks: position changes over time for fg
        p0 = np.asarray(scene.get_position(0))[:n]
        p1 = np.asarray(scene.get_position(clip.num_frames - 1))[:n]
        assert np.abs(p1 - p0).max() > 0.01


@pytest.mark.slow
class TestFitClip:
    def test_short_fit_improves(self, clip):
        fcfg = fit.FitConfig(
            num_iters=40, num_fg_samples=100, num_bg_samples=100,
            num_track_samples=64, log_every=10,
        )
        tcfg = trainer.TrainerConfig(
            width=64, height=48, num_frames=clip.num_frames,
            num_track_samples=64, max_intersections=1 << 14,
            arap_sample_num=64,
            optim=optim.OptimConfig(max_steps=40),
            densify=density.DensifyConfig(densify_start_iter=10**9),
        )
        state, history = fit.fit_clip(clip, fcfg, tcfg)
        assert len(history) == 4
        assert int(state.step) == 40
        first, last = history[0], history[-1]
        assert np.isfinite(last["loss"])
        assert last["loss"] < first["loss"], (first["loss"], last["loss"])
        assert last["psnr"] > first["psnr"] - 0.5  # should not degrade


@pytest.mark.slow
class TestErrorResample:
    def test_flow_error_loop_closure(self, clip, tmp_path):
        """Every `error_resample_every` steps the fit loop writes per-frame
        photometric error to flow_error.txt and biases id1 sampling by it —
        the writer side of `gs_data2.py:60-66` the reference never shipped."""
        fcfg = fit.FitConfig(
            num_iters=25, num_fg_samples=100, num_bg_samples=100,
            num_track_samples=64, log_every=25, error_resample_every=10,
        )
        tcfg = trainer.TrainerConfig(
            width=64, height=48, num_frames=clip.num_frames,
            num_track_samples=64, max_intersections=1 << 14,
            arap_sample_num=64,
            optim=optim.OptimConfig(max_steps=25),
            densify=density.DensifyConfig(densify_start_iter=10**9),
        )
        state, history = fit.fit_clip(clip, fcfg, tcfg, out_dir=str(tmp_path))
        errs = np.loadtxt(tmp_path / "flow_error.txt")
        assert errs.shape == (clip.num_frames,)
        assert (errs > 0).all() and np.isfinite(errs).all()

    def test_error_weights_bias_sampling(self):
        from splatter_a_video_tpu.data.pairs import PairSampler, PairSamplerConfig

        w = np.full(8, 1e-6)
        w[3] = 1.0
        s = PairSampler(PairSamplerConfig(num_frames=8, error_weights=w))
        draws = [s.sample(i)[0] for i in range(200)]
        assert np.mean(np.asarray(draws) == 3) > 0.95


@pytest.mark.slow
class TestDistributedFit:
    def test_dp_fit_synthetic(self, clip):
        """--distributed path: fit the synthetic clip end-to-end on the
        8-virtual-CPU mesh, one frame pair per device (`parallel/dp.py`)."""
        import jax

        assert len(jax.devices()) >= 2
        fcfg = fit.FitConfig(
            num_iters=12, num_fg_samples=100, num_bg_samples=100,
            num_track_samples=64, log_every=4, distributed=True,
        )
        tcfg = trainer.TrainerConfig(
            width=64, height=48, num_frames=clip.num_frames,
            num_track_samples=64, max_intersections=1 << 14,
            arap_sample_num=64,
            optim=optim.OptimConfig(max_steps=12),
            densify=density.DensifyConfig(densify_start_iter=10**9),
        )
        state, history = fit.fit_clip(clip, fcfg, tcfg)
        assert int(state.step) == 12
        assert np.isfinite(history[-1]["loss"])
        assert history[-1]["loss"] < history[0]["loss"] * 1.5


@pytest.mark.slow
class TestObservability:
    def test_hook_sites_panels_and_validation(self, clip, tmp_path):
        """All 12 hook sites fire, image panels reach after_train_iter at
        the image cadence, val metrics are produced, and TB event files are
        written (reference panels: `trainer_fragGS.py:847-879`)."""
        from splatter_a_video_tpu.train import hooks as hooks_lib

        seen = {"sites": [], "image_keys": set(), "val": None}

        class Recorder(hooks_lib.Hook):
            image_every = 10

            def __getattribute__(self, name):
                if name in hooks_lib.Hook.locations:
                    def site(ctx, _n=name):
                        seen["sites"].append(_n)
                        if _n == "after_train_iter" and ctx.images:
                            seen["image_keys"] |= set(ctx.images.keys())
                        if _n == "after_val":
                            seen["val"] = dict(ctx.val_metrics)
                    return site
                return object.__getattribute__(self, name)

        fcfg = fit.FitConfig(
            num_iters=20, num_fg_samples=100, num_bg_samples=100,
            num_track_samples=64, log_every=10, val_every=10, val_frames=2,
        )
        tcfg = trainer.TrainerConfig(
            width=64, height=48, num_frames=clip.num_frames,
            num_track_samples=64, max_intersections=1 << 14,
            arap_sample_num=64,
            optim=optim.OptimConfig(max_steps=20),
            densify=density.DensifyConfig(densify_start_iter=10**9),
        )
        log = hooks_lib.LogHook(print_every=0, tensorboard=True)
        ckpt = hooks_lib.CheckPointHook(every=10)
        state, _ = fit.fit_clip(
            clip, fcfg, tcfg, hooks=[Recorder(), log, ckpt],
            out_dir=str(tmp_path),
        )
        sites = set(seen["sites"])
        for s in ("before_run", "before_train", "before_train_iter",
                  "after_train_iter", "before_val", "before_val_iter",
                  "after_val_iter", "after_val", "before_save_checkpoint",
                  "after_train", "after_run"):
            assert s in sites, f"site {s} never fired"
        assert {"rgb_pred", "rgb_gt", "depth", "error"} <= seen["image_keys"]
        assert seen["val"] is not None and seen["val"]["psnr"] > 0
        tb = tmp_path / "tb"
        if tb.exists():  # torch summary writer available
            evs = list(tb.glob("events.*"))
            assert evs and evs[0].stat().st_size > 500

    def test_checkpoint_cadence_not_multiple_of_log_every(self, clip, tmp_path):
        """CheckPointHook(every=7) must save at steps 7 and 14 even with
        log_every=10 (the hook cadence is independent of the log cadence)."""
        from splatter_a_video_tpu.train import hooks as hooks_lib

        fcfg = fit.FitConfig(
            num_iters=14, num_fg_samples=100, num_bg_samples=100,
            num_track_samples=64, log_every=10,
        )
        tcfg = trainer.TrainerConfig(
            width=64, height=48, num_frames=clip.num_frames,
            num_track_samples=64, max_intersections=1 << 14,
            arap_sample_num=64,
            optim=optim.OptimConfig(max_steps=14),
            densify=density.DensifyConfig(densify_start_iter=10**9),
        )
        ckpt = hooks_lib.CheckPointHook(every=7)
        fit.fit_clip(clip, fcfg, tcfg, hooks=[ckpt], out_dir=str(tmp_path))
        assert (tmp_path / "ckpt_000007").exists(), "every=7 checkpoint missing"
        assert (tmp_path / "ckpt_000014").exists()
