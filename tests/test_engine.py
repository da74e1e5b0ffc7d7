"""Generic multi-view engine: fit a known scene from perspective views.

Ground truth comes from rendering a fixed Gaussian cluster with the
package's own perspective path; the engine must then recover it from
scratch (random init) through the full loop — jitted step, progressive SH,
densify/prune, validation, test export."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatter_a_video_tpu.data import readers
from splatter_a_video_tpu.models import camera as camera_lib
from splatter_a_video_tpu.models import gaussians
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.train import engine as engine_lib
from splatter_a_video_tpu.train import hooks as hooks_lib

W, H = 64, 48


def _orbit_camera(angle, radius=2.5):
    pos = np.array(
        [radius * np.sin(angle), 0.3 * np.sin(2 * angle), -radius * np.cos(angle)],
        np.float32,
    )
    R = camera_lib.look_at_rotation(pos, np.zeros(3))
    return camera_lib.Camera(width=W, height=H, R=R, t=-R @ pos)


def _gt_scene():
    rng = np.random.RandomState(0)
    n = 48
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    col = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    cap = 64
    pos_full = np.concatenate([pos, np.full((cap - n, 3), 50.0, np.float32)])
    col_full = np.concatenate([col, np.zeros((cap - n, 3), np.float32)])
    scfg = gaussians.SceneConfig(capacity=cap, num_frames=1, traj="static")
    scene = gaussians.create_scene(scfg, pos_full, col_full, init_opacity=0.9)
    alive = np.zeros(cap, bool)
    alive[:n] = True
    aux = dict(scene.aux)
    aux["alive"] = jnp.asarray(alive)
    # chunky blobs so views overlap
    params = dict(scene.params)
    params["scaling"] = jnp.full((cap, 3), np.log(0.09))
    return scene.replace(params=params, aux=aux)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Render 10 orbit views of the GT scene -> SceneFrames on disk."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("mv")
    gt = _gt_scene()
    rcfg = rasterize.RasterizeConfig(
        width=W, height=H, ortho=False, max_intersections=1 << 14, nearest=0.2
    )
    cams, paths = [], []
    for i in range(10):
        cam = _orbit_camera(2 * np.pi * i / 10)
        out = rasterize.render_gaussians(
            gt.get_position(0.0), gt.get_scaling(), gt.get_rotation(0.0),
            gt.get_opacity(), gt.get_shs(), jnp.asarray(cam.extrinsic), rcfg,
            intr=jnp.asarray(cam.intrinsic), bg_color=0.0, view_dir_z=False,
        )
        img = np.clip(np.asarray(out.features["rgb"]), 0, 1)
        path = str(root / f"v{i:02d}.png")
        imageio.imwrite(path, (img * 255).astype(np.uint8))
        cams.append(cam)
        paths.append(path)
    train = readers.SceneFrames(
        cameras=tuple(cams[:8]),
        image_paths=tuple(paths[:8]),
        backgrounds=tuple(0.0 for _ in range(8)),
    )
    val = readers.SceneFrames(
        cameras=tuple(cams[8:]),
        image_paths=tuple(paths[8:]),
        backgrounds=(0.0, 0.0),
    )
    return train, val


def _small_cfg(**kw):
    from splatter_a_video_tpu.train import density, optim

    defaults = dict(
        width=W,
        height=H,
        capacity=256,
        max_steps=400,
        val_interval=100,
        sh_degree_interval=50,
        max_intersections=1 << 14,
        random_init_points=128,
        densify=density.DensifyConfig(
            percent_dense=0.01,
            densify_start_iter=30,
            densify_stop_iter=300,
            duplicate_interval=60,
            prune_interval=60,
            opacity_reset_interval=10_000,
            min_opacity=0.005,
        ),
        optim=optim.OptimConfig(
            max_steps=400,
            lrs=tuple(sorted(engine_lib.ENGINE_LRS.items())),
            schedules=tuple(sorted(engine_lib.ENGINE_SCHEDULES.items())),
        ),
    )
    defaults.update(kw)
    return engine_lib.EngineConfig(**defaults)


class TestEngine:
    @pytest.mark.slow
    def test_fit_recovers_scene(self, dataset, tmp_path):
        train_frames, val_frames = dataset
        eng = engine_lib.Engine(
            _small_cfg(), train_frames, val_frames,
            out_dir=str(tmp_path / "out"), seed=0,
        )
        # spatial lr scaling picked up the camera extent
        assert eng.cfg.optim.spatial_lr_scale > 1.0

        eng.train(num_steps=5)
        loss0 = eng.metrics["loss"]
        eng.train(num_steps=195)
        assert eng.metrics["loss"] < 0.6 * loss0, (loss0, eng.metrics["loss"])
        assert np.isfinite(eng.metrics["loss"])

        vm = eng.validation()
        assert vm["psnr"] > 14.0, vm
        assert 0.0 < vm["ssim"] <= 1.0

        # density control engaged and kept the population alive
        assert "num_alive" in eng.metrics
        assert eng.metrics["num_alive"] > 0

    def test_progressive_sh_schedule(self, dataset, tmp_path):
        train_frames, val_frames = dataset
        eng = engine_lib.Engine(
            _small_cfg(), train_frames, None, out_dir=str(tmp_path / "o2")
        )
        assert eng.active_sh_degree(0) == 0
        assert eng.active_sh_degree(49) == 0
        assert eng.active_sh_degree(50) == 1
        assert eng.active_sh_degree(10_000) == 3

    def test_sh_degree_mask(self):
        m = np.asarray(engine_lib._sh_degree_mask(jnp.asarray(1), 3))
        assert m.shape == (16,)
        np.testing.assert_array_equal(m[:4], 1.0)  # degree 0 (1) + degree 1 (3)
        np.testing.assert_array_equal(m[4:], 0.0)
        m3 = np.asarray(engine_lib._sh_degree_mask(jnp.asarray(3), 3))
        np.testing.assert_array_equal(m3, 1.0)

    def test_test_exports_views(self, dataset, tmp_path):
        train_frames, val_frames = dataset
        out = str(tmp_path / "o3")
        eng = engine_lib.Engine(_small_cfg(), train_frames, val_frames, out_dir=out)
        eng.train(num_steps=3)
        metrics = eng.test(novel_views=3)
        assert "psnr" in metrics
        assert os.path.exists(os.path.join(out, "test_000.png"))
        assert os.path.exists(os.path.join(out, "test_001.png"))
        assert os.path.exists(os.path.join(out, "novel_002.png"))

    def test_hooks_lifecycle(self, dataset, tmp_path):
        train_frames, val_frames = dataset

        calls = []

        class Probe(hooks_lib.Hook):
            def before_train(self, ctx):
                calls.append("before_train")

            def after_train_iter(self, ctx):
                calls.append("after_train_iter")

            def after_val(self, ctx):
                calls.append("after_val")

            def after_train(self, ctx):
                calls.append("after_train")

        eng = engine_lib.Engine(
            _small_cfg(val_interval=2), train_frames, val_frames,
            out_dir=str(tmp_path / "o4"), hooks=[Probe()],
        )
        eng.train(num_steps=4)
        assert calls[0] == "before_train" and calls[-1] == "after_train"
        assert calls.count("after_train_iter") == 4
        assert calls.count("after_val") == 2

    def test_checkpoint_hook_saves(self, dataset, tmp_path):
        """Engine must put state+hooks on the ctx so CheckPointHook's
        `ctx.state is not None` guard passes and peers get
        before_save_checkpoint."""
        train_frames, val_frames = dataset
        out = tmp_path / "o6"

        notified = []

        class Peer(hooks_lib.Hook):
            def before_save_checkpoint(self, ctx):
                notified.append(ctx.step)

        eng = engine_lib.Engine(
            _small_cfg(), train_frames, val_frames, out_dir=str(out),
            hooks=[hooks_lib.CheckPointHook(every=2), Peer()],
        )
        eng.train(num_steps=4)
        # steps are 0-based: every=2 fires at it=0 and it=2; after_train
        # saves the final state at it=3
        assert (out / "ckpt_000002").exists(), "every=2 checkpoint missing"
        assert (out / "ckpt_000003").exists(), "final after_train save missing"
        assert 2 in notified

    def test_mismatched_camera_size_raises(self, dataset, tmp_path):
        train_frames, _ = dataset
        with pytest.raises(ValueError, match="uniform sizes"):
            engine_lib.Engine(
                _small_cfg(width=32, height=32), train_frames, None,
                out_dir=str(tmp_path / "o5"),
            )


class TestEngineFromDataset:
    @pytest.mark.slow
    def test_nerf_synthetic_composition(self, tmp_path):
        """engine_from_dataset over a NeRF-synthetic layout on disk."""
        from test_readers import TestNerfSynthetic

        root = str(tmp_path)
        TestNerfSynthetic()._make(root, {"train": 3, "test": 1})
        eng = engine_lib.engine_from_dataset(
            root, "NerfReFormat",
            cfg=_small_cfg(width=40, height=32, capacity=128,
                           random_init_points=64),
            out_dir=str(tmp_path / "out"),
        )
        assert eng.bg == 1.0  # white background dataset
        assert len(eng.train_batches) == 3 and len(eng.val_batches) == 1
        eng.train(num_steps=2)
        assert np.isfinite(eng.metrics["loss"])
