"""Benchmark the full jitted train step at production scale on TPU.

Reference budget: 20k iterations in ~30 min => 11 it/s (BASELINE.md).
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

W, H, T = 854, 480, 80
CAP = 1 << 17  # 131k capacity (reference starts at 100k)
N0 = 100_000

rng = np.random.RandomState(0)
pos = np.concatenate(
    [rng.uniform(-1, 1, (N0, 2)), rng.uniform(0.5, 2.0, (N0, 1))], axis=1
).astype(np.float32)
colors = rng.rand(N0, 3).astype(np.float32)
scfg = gaussians.SceneConfig(
    capacity=CAP, num_frames=T,
    render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
)
scene = gaussians.create_scene(scfg, pos, colors, init_opacity=0.5)

tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T,
    num_track_samples=4096,
    max_intersections=int(os.environ.get("BT_MAXINT", 1 << 19)),
    block_x=int(os.environ.get("BT_BX", 16)),
    block_y=int(os.environ.get("BT_BY", 16)),
    optim=optim.OptimConfig(max_steps=20000),
    densify=density.DensifyConfig(),
)
cam = camera.canonical_camera(W, H)
train_step, density_step, opacity_reset = trainer.make_train_step(tcfg, cam.extrinsic)
state = trainer.init_train_state(tcfg, scene)

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

print("compiling train step...", flush=True)
t0 = time.time()
state, metrics = train_step(state, batch)
jax.block_until_ready(metrics)
print(f"compiled+ran in {time.time()-t0:.1f}s loss={float(metrics['loss']):.4f}", flush=True)

t0 = time.time()
REPS = 20
for _ in range(REPS):
    state, metrics = train_step(state, batch)
jax.block_until_ready(metrics)
dt = (time.time() - t0) / REPS
print(f"train step: {dt*1e3:.1f} ms  ({1/dt:.2f} it/s; 20k steps = {20000*dt/60:.1f} min)", flush=True)

print("compiling density step...", flush=True)
t0 = time.time()
state2, info = density_step(state)
jax.block_until_ready(info)
print(f"density step compiled+ran {time.time()-t0:.1f}s alive={int(info.num_alive)}", flush=True)
t0 = time.time()
for _ in range(5):
    state2, info = density_step(state)
jax.block_until_ready(info)
print(f"density step: {(time.time()-t0)/5*1e3:.1f} ms (every 100 steps)", flush=True)
