"""Multi-atlas (FragModel-equivalent) training: concat render, per-atlas
optimizers, per-atlas density control."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.models.atlas import AtlasModel
from splatter_a_video_tpu.train import atlas_trainer, optim, trainer

W, H, T = 96, 64, 6


def _mk(n, traj, seed):
    rng = np.random.RandomState(seed)
    pos = np.concatenate(
        [rng.uniform(-0.8, 0.8, (n, 2)), rng.uniform(0.6, 1.8, (n, 1))], 1
    ).astype(np.float32)
    scfg = gaussians.SceneConfig(capacity=n, num_frames=T, traj=traj)
    if traj == "cubic_spline":
        track_seq = np.repeat(pos[None], T, axis=0)
        return gaussians.create_scene(
            scfg, pos, rng.rand(n, 3).astype(np.float32),
            init_opacity=0.6, track_seq=track_seq,
        )
    return gaussians.create_scene(
        scfg, pos, rng.rand(n, 3).astype(np.float32), init_opacity=0.6
    )


def _setup():
    model = AtlasModel(atlases={
        "gs_base": _mk(512, "cubic_spline", 0),
        "gs_fg": _mk(256, "poly_fourier", 1),
    })
    tcfg = trainer.TrainerConfig(
        width=W, height=H, num_frames=T, num_track_samples=64,
        max_intersections=1 << 15, optim=optim.OptimConfig(max_steps=100),
    )
    cam = camera.canonical_camera(W, H)
    rng = np.random.RandomState(3)
    qp = rng.uniform(0, [W - 1, H - 1], (64, 2)).astype(np.float32)
    batch = trainer.Batch(
        t1=jnp.asarray(0), t2=jnp.asarray(3),
        rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
        depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
        query_px=jnp.asarray(qp),
        target_tracks=jnp.asarray(
            np.concatenate([qp, -5 * np.ones((64, 2))], 1).astype(np.float32)
        ),
        track_valid=jnp.ones((64,), bool),
    )
    return model, tcfg, cam, batch


@pytest.mark.slow
class TestAtlasTrainer:
    def test_mixed_trajectory_atlases_train(self):
        model, tcfg, cam, batch = _setup()
        step, dstep, oreset = atlas_trainer.make_atlas_train_step(
            tcfg, cam.extrinsic
        )
        st = atlas_trainer.init_atlas_train_state(tcfg, model)
        losses = []
        for _ in range(10):
            st, m = step(st, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # both atlases' params moved
        for n in ("gs_base", "gs_fg"):
            before = model.atlases[n].params["position"]
            after = st.model.atlases[n].params["position"]
            assert np.any(np.asarray(before) != np.asarray(after)), n

    def test_per_atlas_density_and_reset(self):
        model, tcfg, cam, batch = _setup()
        step, dstep, oreset = atlas_trainer.make_atlas_train_step(
            tcfg, cam.extrinsic
        )
        st = atlas_trainer.init_atlas_train_state(tcfg, model)
        for _ in range(3):
            st, m = step(st, batch)
        st, infos = dstep(st)
        assert set(infos.keys()) == {"gs_base", "gs_fg"}
        st = oreset(st)
        st, m = step(st, batch)
        assert np.isfinite(float(m["loss"]))
