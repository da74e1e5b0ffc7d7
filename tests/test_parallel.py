"""Multi-device tests on the virtual 8-CPU mesh (conftest sets
jax_num_cpu_devices=8): data-parallel training step and depth-slab
model-parallel rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.parallel import dp, mesh as mesh_lib, render_shard
from splatter_a_video_tpu.train import optim, trainer


def _scene(N=2048, W=128, H=96, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.concatenate(
        [rng.uniform(-0.9, 0.9, (N, 2)), rng.uniform(0.6, 1.8, (N, 1))], 1
    ).astype(np.float32)
    scfg = gaussians.SceneConfig(capacity=N, num_frames=4)
    return gaussians.create_scene(
        scfg, pos, rng.rand(N, 3).astype(np.float32), init_opacity=0.7
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
class TestShardedRender:
    def test_matches_single_chip(self):
        W, H = 128, 96
        scene = _scene(W=W, H=H)
        cam = camera.canonical_camera(W, H)
        rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=1 << 16)
        m = render_shard.make_render_mesh(8)
        out = render_shard.render_gaussians_sharded(
            scene.get_position(0.0), scene.get_scaling(), scene.get_rotation(0.0),
            scene.get_opacity(), scene.get_shs(), jnp.eye(3, 4), rcfg, m,
        )
        ref = rasterize.render_gaussians(
            scene.get_position(0.0), scene.get_scaling(), scene.get_rotation(0.0),
            scene.get_opacity(), scene.get_shs(), jnp.eye(3, 4), rcfg,
        )
        # exact up to fold associativity + slab-local early termination
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref.features["rgb"]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["final_T"][..., 0]), np.asarray(ref.final_T), atol=2e-3
        )

    def test_opaque_front_slab_occludes(self):
        # a fully-opaque near wall must hide everything in rear slabs
        W, H = 64, 64
        N = 1024
        rng = np.random.RandomState(1)
        pos = np.concatenate(
            [rng.uniform(-0.5, 0.5, (N, 2)), rng.uniform(1.0, 1.8, (N, 1))], 1
        ).astype(np.float32)
        # near wall; depths spaced above the packed sort key's 21-bit
        # depth quantization (~1.2e-4 at z=0.6) — quantized ties have
        # ill-defined order that differs between the slab argsort and the
        # packed binning sort (documented deviation #1 in PARITY.md)
        pos[:128, 2] = 0.6 + np.arange(128) * 1e-3
        scfg = gaussians.SceneConfig(capacity=N, num_frames=4)
        scene = gaussians.create_scene(
            scfg, pos, rng.rand(N, 3).astype(np.float32), init_opacity=0.99
        )
        rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=1 << 15)
        m = render_shard.make_render_mesh(8)
        out = render_shard.render_gaussians_sharded(
            scene.get_position(0.0), scene.get_scaling(), scene.get_rotation(0.0),
            scene.get_opacity(), scene.get_shs(), jnp.eye(3, 4), rcfg, m,
        )
        assert np.isfinite(np.asarray(out["rgb"])).all()
        ref = rasterize.render_gaussians(
            scene.get_position(0.0), scene.get_scaling(), scene.get_rotation(0.0),
            scene.get_opacity(), scene.get_shs(), jnp.eye(3, 4), rcfg,
        )
        # single-chip early termination truncates the post-crossing tail
        # at residual T up to 1e-4/(1-0.99) = 1e-2; the sharded render
        # composites it (closer to exact compositing) — tolerance is that
        # bound, see render_shard.py docstring
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref.features["rgb"]), atol=1.2e-2
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestDataParallelStep:
    @pytest.mark.slow
    def test_dp_step_runs_and_reduces(self):
        W, H, T = 96, 64, 8
        rng = np.random.RandomState(0)
        scene = _scene(N=1024, W=W, H=H)
        tcfg = trainer.TrainerConfig(
            width=W, height=H, num_frames=T, num_track_samples=64,
            max_intersections=1 << 15, optim=optim.OptimConfig(max_steps=100),
        )
        cam = camera.canonical_camera(W, H)
        m = mesh_lib.make_mesh(8)
        step = dp.make_dp_train_step(tcfg, np.asarray(cam.extrinsic), m)
        state = trainer.init_train_state(tcfg, scene)
        B = 8
        qp = rng.uniform(0, [W - 1, H - 1], (B, 64, 2)).astype(np.float32)
        batch = trainer.Batch(
            t1=jnp.zeros((B,), jnp.int32),
            t2=jnp.full((B,), 4, jnp.int32),
            rgb1=jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
            depth1=jnp.asarray(rng.rand(B, H, W).astype(np.float32) + 0.5),
            query_px=jnp.asarray(qp),
            target_tracks=jnp.asarray(
                np.concatenate([qp, -5 * np.ones((B, 64, 2))], -1).astype(np.float32)
            ),
            track_valid=jnp.ones((B, 64), bool),
        )
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        moved = jax.tree_util.tree_reduce(
            lambda a, kv: a or bool(kv),
            jax.tree_util.tree_map(
                lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
                state.scene.params, state2.scene.params,
            ),
            False,
        )
        assert moved

    @pytest.mark.slow
    def test_dp_attribute_losses_match_single_chip(self):
        """--distributed must train the same objective as single-chip for
        the same flags: the mask/dino/fg-layer capability losses reduce to
        identical loss values when every chip sees the same pair."""
        W, H, T = 96, 64, 8
        N = 1024
        rng = np.random.RandomState(2)
        pos = np.concatenate(
            [rng.uniform(-0.9, 0.9, (N, 2)), rng.uniform(0.6, 1.8, (N, 1))], 1
        ).astype(np.float32)
        scfg = gaussians.SceneConfig(
            capacity=N, num_frames=T,
            render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
        )
        scene = gaussians.create_scene(
            scfg, pos, rng.rand(N, 3).astype(np.float32), init_opacity=0.7
        )
        tcfg = trainer.TrainerConfig(
            width=W, height=H, num_frames=T, num_track_samples=64,
            max_intersections=1 << 15, optim=optim.OptimConfig(max_steps=100),
            mask_attr_weight=20.0, dino_attr_weight=20.0,
            fg_layer_weight=20.0, fg_layer_start_iter=0,
        )
        cam = camera.canonical_camera(W, H)
        qp = rng.uniform(0, [W - 1, H - 1], (64, 2)).astype(np.float32)
        pair = trainer.Batch(
            t1=jnp.zeros((), jnp.int32),
            t2=jnp.full((), 4, jnp.int32),
            rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
            depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
            query_px=jnp.asarray(qp),
            target_tracks=jnp.asarray(
                np.concatenate([qp, -5 * np.ones((64, 2))], -1).astype(np.float32)
            ),
            track_valid=jnp.ones((64,), bool),
            mask1=jnp.asarray((rng.rand(H, W) > 0.5).astype(np.float32)),
            dino1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        )
        # single-chip reference step
        sstep, _, _ = trainer.make_train_step(tcfg, np.asarray(cam.extrinsic))
        state = trainer.init_train_state(tcfg, scene)
        # step>fg_layer_start_iter so the fg term engages in both paths
        state = state._replace(step=jnp.ones((), jnp.int32))
        _, m_single = sstep(state, pair)
        # dp step: the same pair replicated on all 8 chips
        m = mesh_lib.make_mesh(8)
        dstep = dp.make_dp_train_step(tcfg, np.asarray(cam.extrinsic), m)
        rep = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (8,) + jnp.shape(x)), pair
        )
        _, m_dp = dstep(state, rep)
        for k in ("loss_mask_attr", "loss_dino_attr", "loss_rgb_fg",
                  "loss_mask_fg"):
            assert k in m_dp, f"distributed step dropped {k}"
            np.testing.assert_allclose(
                float(m_dp[k]), float(m_single[k]), rtol=1e-5, err_msg=k
            )
        np.testing.assert_allclose(
            float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
class TestDataParallelAtlasStep:
    """DP multi-atlas step must train the single-chip objective: same pair
    replicated on all chips => identical metrics AND identical per-atlas
    parameter updates (grads pmean over identical values is the identity)."""

    def test_matches_single_chip(self):
        from splatter_a_video_tpu.models.atlas import AtlasModel
        from splatter_a_video_tpu.train import atlas_trainer

        W, H, T = 96, 64, 6
        rng = np.random.RandomState(0)

        def mk(n, traj, seed):
            r = np.random.RandomState(seed)
            pos = np.concatenate(
                [r.uniform(-0.8, 0.8, (n, 2)), r.uniform(0.6, 1.8, (n, 1))], 1
            ).astype(np.float32)
            scfg = gaussians.SceneConfig(capacity=n, num_frames=T, traj=traj)
            kw = {}
            if traj == "cubic_spline":
                kw["track_seq"] = np.repeat(pos[None], T, axis=0)
            return gaussians.create_scene(
                scfg, pos, r.rand(n, 3).astype(np.float32),
                init_opacity=0.6, **kw,
            )

        model = AtlasModel(atlases={
            "gs_base": mk(512, "cubic_spline", 0),
            "gs_fg": mk(256, "poly_fourier", 1),
        })
        tcfg = trainer.TrainerConfig(
            width=W, height=H, num_frames=T, num_track_samples=64,
            max_intersections=1 << 15, optim=optim.OptimConfig(max_steps=100),
        )
        cam = camera.canonical_camera(W, H)
        qp = rng.uniform(0, [W - 1, H - 1], (64, 2)).astype(np.float32)
        pair = trainer.Batch(
            t1=jnp.asarray(0), t2=jnp.asarray(3),
            rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
            depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
            query_px=jnp.asarray(qp),
            target_tracks=jnp.asarray(
                np.concatenate([qp, -5 * np.ones((64, 2))], 1).astype(np.float32)
            ),
            track_valid=jnp.ones((64,), bool),
        )
        st0 = atlas_trainer.init_atlas_train_state(tcfg, model)
        sstep, _, _ = atlas_trainer.make_atlas_train_step(tcfg, cam.extrinsic)
        st_s, m_s = sstep(st0, pair)

        m8 = mesh_lib.make_mesh(8)
        dstep = dp.make_dp_atlas_step(tcfg, np.asarray(cam.extrinsic), m8)
        rep = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (8,) + jnp.shape(x)), pair
        )
        st_d, m_d = dstep(st0, rep)

        np.testing.assert_allclose(
            float(m_d["loss"]), float(m_s["loss"]), rtol=1e-5
        )
        for n in ("gs_base", "gs_fg"):
            for k in ("position", "opacity"):
                np.testing.assert_allclose(
                    np.asarray(st_d.model.atlases[n].params[k]),
                    np.asarray(st_s.model.atlases[n].params[k]),
                    atol=1e-6, err_msg=f"{n}.{k}",
                )
            # densify stats reduce (vis=any, radii=max, grads=sum over 8
            # identical pairs -> 8x the single-chip grad accumulator)
            np.testing.assert_allclose(
                np.asarray(st_d.densify_states[n].pos_grad_accum),
                8.0 * np.asarray(st_s.densify_states[n].pos_grad_accum),
                rtol=1e-4, atol=1e-6, err_msg=f"{n} grad_accum",
            )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
class TestDataParallelJointCameraStep:
    """DP camera-refine joint step: replicated pair => metrics, scene
    params AND camera twists match the single-chip joint step."""

    def test_matches_single_chip(self):
        from splatter_a_video_tpu.train import camera_refine

        W, H, T = 96, 64, 8
        rng = np.random.RandomState(1)
        scene = _scene(N=1024, W=W, H=H)
        tcfg = trainer.TrainerConfig(
            width=W, height=H, num_frames=T, num_track_samples=64,
            max_intersections=1 << 15, optim=optim.OptimConfig(max_steps=100),
        )
        cam = camera.canonical_camera(W, H)
        qp = rng.uniform(0, [W - 1, H - 1], (64, 2)).astype(np.float32)
        pair = trainer.Batch(
            t1=jnp.asarray(0, jnp.int32), t2=jnp.asarray(4, jnp.int32),
            rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
            depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
            query_px=jnp.asarray(qp),
            target_tracks=jnp.asarray(
                np.concatenate([qp, -5 * np.ones((64, 2))], 1).astype(np.float32)
            ),
            track_valid=jnp.ones((64,), bool),
        )
        kw = dict(cam_lr=1e-3, cam_prior_weight=1e-2, cam_warmup_iters=2)
        st0 = camera_refine.init_cam_train_state(
            tcfg, scene, cam_lr=1e-3, cam_warmup_iters=2
        )
        sstep = camera_refine.make_joint_train_step(
            tcfg, np.asarray(cam.extrinsic), **kw
        )
        st_s, m_s = sstep(st0, pair)

        m8 = mesh_lib.make_mesh(8)
        dstep = dp.make_dp_joint_step(
            tcfg, np.asarray(cam.extrinsic), m8, **kw
        )
        rep = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (8,) + jnp.shape(x)), pair
        )
        st_d, m_d = dstep(st0, rep)

        np.testing.assert_allclose(
            float(m_d["loss"]), float(m_s["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_d.cam_xi), np.asarray(st_s.cam_xi), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(st_d.base.scene.params["position"]),
            np.asarray(st_s.base.scene.params["position"]), atol=1e-6,
        )
        assert np.any(np.asarray(st_d.cam_xi) != 0.0), (
            "camera twists did not move: joint grads not flowing"
        )
