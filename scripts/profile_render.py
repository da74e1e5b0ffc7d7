"""Capture a device profile of the full render and dump per-op stats."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from splatter_a_video_tpu.models import camera
from splatter_a_video_tpu.ops import quaternion, rasterize

W, H, N = 854, 480, 100_000
cfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=3 << 17, block_x=32, block_y=16)
key = jax.random.PRNGKey(0)
k = jax.random.split(key, 6)
xyz = jnp.concatenate(
    [
        jax.random.uniform(k[0], (N, 2), minval=-1, maxval=1),
        jax.random.uniform(k[1], (N, 1), minval=0.5, maxval=2),
    ],
    axis=1,
)
scale = jnp.exp(jax.random.uniform(k[2], (N, 3), minval=-5.5, maxval=-4.0))
quat = quaternion.quat_normalize(jax.random.normal(k[3], (N, 4)))
opacity = jax.random.uniform(k[4], (N,), minval=0.3, maxval=0.95)
shs = jax.random.normal(k[5], (N, 16, 3)) * 0.3
extr = jnp.eye(3, 4)


@jax.jit
def render(xyz, scale, quat, opacity, shs):
    out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, cfg)
    return out.features["rgb"]


print("compiling...", flush=True)
rgb = render(xyz, scale, quat, opacity, shs)
rgb.block_until_ready()
print("compiled; timing...", flush=True)
t0 = time.time()
for _ in range(10):
    rgb = render(xyz, scale, quat, opacity, shs)
rgb.block_until_ready()
print(f"steady {(time.time()-t0)/10*1e3:.1f} ms", flush=True)

trace_dir = "/tmp/jax_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        rgb = render(xyz, scale, quat, opacity, shs)
    rgb.block_until_ready()
print("trace captured", flush=True)

# parse the .trace.json.gz for top device ops
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
if files:
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [
        e
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur", 0) > 0
    ]
    # keep device-side events (pid names containing TPU / device)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    from collections import defaultdict

    agg = defaultdict(float)
    for e in events:
        pname = pid_names.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
            agg[e["name"]] += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    total = sum(agg.values())
    print(f"total device-op time: {total/1e3:.1f} ms over 3 iters", flush=True)
    for name, dur in top:
        print(f"{dur/1e3/3:9.2f} ms/iter  {name[:110]}", flush=True)

# map hot fusion names to HLO ops
c = render.lower(xyz, scale, quat, opacity, shs).compile()
hlo = c.as_text()
import re
for fname in ["fusion.2", "fusion.1", "slice_reduce_fusion", "fusion.71", "fusion.77"]:
    m = re.search(rf"^\s*%?{re.escape(fname)} (.*?)^\s*}}", hlo, re.M | re.S)
    if m:
        body = m.group(0)
        ops = re.findall(r"= (?:\w+\[[^\]]*\]\{?[^ ]*\}?\s+)?(\w+)\(", body)
        from collections import Counter
        print(fname, "->", Counter(ops).most_common(8), flush=True)
    else:
        # fallback: find the fusion instruction line referencing a computation
        m2 = re.search(rf"{re.escape(fname)} = [^\n]*calls=([\w.\-]+)", hlo)
        print(fname, "calls", m2.group(1) if m2 else "?", flush=True)
        if m2:
            comp = m2.group(1)
            m3 = re.search(rf"^%?{re.escape(comp)} [^\n]*{{(.*?)^}}", hlo, re.M | re.S)
            if m3:
                from collections import Counter
                ops = re.findall(r"= (?:[\w\[\],\{\}\/]+\s+)?(\w[\w\-]*)\(", m3.group(1))
                print("   ops:", Counter(ops).most_common(10), flush=True)
