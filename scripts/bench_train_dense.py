"""Bench the train step vs REALIZED intersection count, not init-scene count.

bench_train.py times the step on a freshly initialized scene (tiny 3-NN
footprints -> few hundred k intersections). The flagship e2e run realizes
~684k true intersections once footprints grow (`scripts/e2e_480p.py:49-53`)
and averaged ~102 ms/step vs the 50.6 ms init-scene number (/tmp/bt20.log)
— this script isolates whether that gap is data-dependent device time by
sweeping a multiplicative footprint factor through ONE compiled step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.train import density, optim, trainer

W, H, T = 854, 480, 48
CAP = 1 << 17
N0 = 100_000

rng = np.random.RandomState(0)
pos = np.concatenate(
    [rng.uniform(-1, 1, (N0, 2)), rng.uniform(0.5, 2.0, (N0, 1))], axis=1
).astype(np.float32)
colors = rng.rand(N0, 3).astype(np.float32)
scfg = gaussians.SceneConfig(capacity=CAP, num_frames=T)
scene = gaussians.create_scene(scfg, pos, colors, init_opacity=0.5)

tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T,
    num_track_samples=4096,
    max_intersections=int(os.environ.get("BT_MAXINT", 1 << 20)),
    optim=optim.OptimConfig(max_steps=20000),
    densify=density.DensifyConfig(),
)
cam = camera.canonical_camera(W, H)
train_step, density_step, opacity_reset = trainer.make_train_step(tcfg, cam.extrinsic)

qp = rng.uniform(0, [W - 1, H - 1], (4096, 2)).astype(np.float32)
batch = trainer.Batch(
    t1=jnp.asarray(3, jnp.int32),
    t2=jnp.asarray(40, jnp.int32),
    rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
    depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
    query_px=jnp.asarray(qp),
    target_tracks=jnp.asarray(
        np.concatenate([qp + rng.randn(4096, 2), -5 * np.ones((4096, 2))], axis=1)
        .astype(np.float32)
    ),
    track_valid=jnp.ones((4096,), bool),
)

base_scaling = scene.params["scaling"]
for f in [float(x) for x in os.environ.get("BT_FACTORS", "1,2,3,4,6").split(",")]:
    sc = scene.replace(params={**scene.params,
                               "scaling": base_scaling + np.log(f)})
    state = trainer.init_train_state(tcfg, sc)
    t0 = time.time()
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    warm = time.time() - t0
    t0 = time.time()
    REPS = 15
    for _ in range(REPS):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / REPS
    nint = int(metrics["num_intersections"])
    print(f"factor {f:>4}: n_int={nint:>8} "
          f"({nint/tcfg.max_intersections*100:5.1f}% of budget) "
          f"step {dt*1e3:6.1f} ms  (20k = {20000*dt/60:.1f} min; warm0 {warm:.1f}s)",
          flush=True)
