"""Device-profile the full train step at production scale."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.train import density, optim, trainer

W, H, T = 854, 480, 80
CAP = 1 << 17
N0 = 100_000

rng = np.random.RandomState(0)
pos = np.concatenate(
    [rng.uniform(-1, 1, (N0, 2)), rng.uniform(0.5, 2.0, (N0, 1))], axis=1
).astype(np.float32)
scfg = gaussians.SceneConfig(
    capacity=CAP, num_frames=T,
    render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
)
scene = gaussians.create_scene(scfg, pos, rng.rand(N0, 3).astype(np.float32), init_opacity=0.5)
tcfg = trainer.TrainerConfig(
    width=W, height=H, num_frames=T, num_track_samples=4096,
    max_intersections=int(os.environ.get("BT_MAXINT", 1 << 19)),
    block_x=int(os.environ.get("BT_BX", 16)), block_y=int(os.environ.get("BT_BY", 16)),
    optim=optim.OptimConfig(max_steps=20000),
)
cam = camera.canonical_camera(W, H)
train_step, _, _ = trainer.make_train_step(tcfg, cam.extrinsic)
state = trainer.init_train_state(tcfg, scene)
qp = rng.uniform(0, [W - 1, H - 1], (4096, 2)).astype(np.float32)
batch = trainer.Batch(
    t1=jnp.asarray(3, jnp.int32), t2=jnp.asarray(40, jnp.int32),
    rgb1=jnp.asarray(rng.rand(H, W, 3).astype(np.float32)),
    depth1=jnp.asarray(rng.rand(H, W).astype(np.float32) + 0.5),
    query_px=jnp.asarray(qp),
    target_tracks=jnp.asarray(
        np.concatenate([qp, -5 * np.ones((4096, 2))], 1).astype(np.float32)
    ),
    track_valid=jnp.ones((4096,), bool),
)

state, m = train_step(state, batch)
jax.block_until_ready(m)
t0 = time.time()
for _ in range(10):
    state, m = train_step(state, batch)
jax.block_until_ready(m)
print(f"steady {(time.time()-t0)/10*1e3:.1f} ms/step", flush=True)

os.system("rm -rf /tmp/jax_trace_train")
with jax.profiler.trace("/tmp/jax_trace_train"):
    for _ in range(3):
        state, m = train_step(state, batch)
    jax.block_until_ready(m)

files = glob.glob("/tmp/jax_trace_train/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)
pid_names = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
agg = defaultdict(float)
for e in trace.get("traceEvents", []):
    if e.get("ph") == "X" and e.get("dur", 0) > 0:
        pn = pid_names.get(e["pid"], "")
        if "TPU" in pn or "/device" in pn.lower():
            agg[e["name"]] += e["dur"]
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
    print(f"{dur/1e3/3:9.2f} ms/iter  {name[:100]}", flush=True)
