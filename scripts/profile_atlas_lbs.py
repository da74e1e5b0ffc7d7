"""Profile the multi-atlas and LBS train steps at production capacity.

VERDICT r2 weak #6: `atlas_trainer` / LBS were only exercised at toy scale;
this measures both at the flagship shape (480p, 131k total capacity, all
losses) next to the single-atlas poly_fourier baseline from
`scripts/bench_train.py` (34.6 ms, VALIDATION_r03.json).

Run on the TPU chip: `python -u scripts/profile_atlas_lbs.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu.models import atlas as atlas_lib
from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.train import atlas_trainer, density, optim, trainer

W, H, T = 854, 480, 80
NTRACK = 4096
rng = np.random.RandomState(0)
cam = camera.canonical_camera(W, H)

qp = rng.uniform(0, [W - 1, H - 1], (NTRACK, 2)).astype(np.float32)
batch = trainer.Batch(
    t1=jnp.asarray(3, jnp.int32),
    t2=jnp.asarray(40, jnp.int32),
    rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
    depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
    query_px=jnp.asarray(qp),
    target_tracks=jnp.asarray(
        np.concatenate([qp + rng.randn(NTRACK, 2), -5 * np.ones((NTRACK, 2))],
                       axis=1).astype(np.float32)
    ),
    track_valid=jnp.ones((NTRACK,), bool),
)


def make_scene(cap, n0, traj="poly_fourier", seed=0):
    r = np.random.RandomState(seed)
    pos = np.concatenate(
        [r.uniform(-1, 1, (n0, 2)), r.uniform(0.5, 2.0, (n0, 1))], axis=1
    ).astype(np.float32)
    scfg = gaussians.SceneConfig(capacity=cap, num_frames=T, traj=traj)
    return gaussians.create_scene(scfg, pos, r.rand(n0, 3).astype(np.float32),
                                  init_opacity=0.5)


def tcfg(max_steps=20000):
    return trainer.TrainerConfig(
        width=W, height=H, num_frames=T, num_track_samples=NTRACK,
        max_intersections=1 << 19,
        optim=optim.OptimConfig(max_steps=max_steps),
        densify=density.DensifyConfig(),
    )


def bench(label, step_fn, state, reps=20):
    t0 = time.time()
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label}: {dt:.1f} ms/step (compile {compile_s:.0f}s, "
          f"loss={float(metrics['loss']):.3f})", flush=True)
    return dt


results = {}

# single-atlas poly_fourier baseline (the bench_train flagship, minus
# render_attributes so all three variants carry identical loss terms)
cfg = tcfg()
scene = make_scene(1 << 17, 100_000)
step, _, _ = trainer.make_train_step(cfg, cam.extrinsic)
state = trainer.init_train_state(cfg, scene)
results["single_poly_fourier_ms"] = bench("single-atlas poly_fourier", step, state)

# LBS trajectory family at the same capacity
scene_lbs = make_scene(1 << 17, 100_000, traj="lbs")
step_lbs, _, _ = trainer.make_train_step(cfg, cam.extrinsic)
state_lbs = trainer.init_train_state(cfg, scene_lbs)
results["single_lbs_ms"] = bench("single-atlas lbs", step_lbs, state_lbs)

# 2-atlas FragModel step, same total capacity. Both atlases use the
# default poly_fourier trajectory — this measures the ATLAS-SPLIT cost
# (two scenes, two optimizers, one fused render), not a mixed-trajectory
# model; single_lbs_ms above covers the alternative family's step cost.
model = atlas_lib.AtlasModel(atlases={
    "gs_base": make_scene(1 << 16, 50_000, seed=1),
    "gs_fg": make_scene(1 << 16, 50_000, seed=2),
})
astep, _, _ = atlas_trainer.make_atlas_train_step(cfg, cam.extrinsic)
astate = atlas_trainer.init_atlas_train_state(cfg, model)
results["two_atlas_ms"] = bench("2-atlas (2 x 64k cap)", astep, astate)

results["hardware"] = jax.devices()[0].device_kind
print(json.dumps(results), flush=True)
