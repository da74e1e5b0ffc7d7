"""Profile candidate binning primitives via device traces (trustworthy)."""
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

M = 1 << 19  # 512k — realistic intersection budget
N = 100_000
NCH = 14

key = jax.random.PRNGKey(0)
sortkey = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)
chans = [jax.random.uniform(jax.random.fold_in(key, i), (M,)) for i in range(NCH)]
gid = jax.random.randint(jax.random.fold_in(key, 99), (M,), 0, N, dtype=jnp.int32)
attrs = jax.random.uniform(jax.random.fold_in(key, 100), (N, NCH))
marks_idx = jnp.sort(jax.random.randint(jax.random.fold_in(key, 101), (N,), 0, M, dtype=jnp.int32))
vals = jax.random.uniform(jax.random.fold_in(key, 102), (N, NCH))


def prof(name, fn, *args, iters=5):
    c = jax.jit(fn).lower(*args).compile()
    jax.block_until_ready(c(*args))
    tdir = f"/tmp/prof_{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            r = c(*args)
        jax.block_until_ready(r)
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            if "jit_" in e.get("name", ""):
                agg["TOTAL"] += e["dur"]
    print(f"{name}: {agg['TOTAL']/1e3/iters:.2f} ms/iter", flush=True)


# A: variadic sort carrying 14 channels + gid
prof(
    "sort_carry16",
    lambda k, g, *cs: jax.lax.sort((k, g) + cs, num_keys=1),
    sortkey, gid, *chans,
)

# B: single-key sort of (key, gid) then gather 14 channels by gid
def sort_then_gather(k, g, attrs):
    sk, sg = jax.lax.sort((k, g), num_keys=1)
    return attrs[sg], sk


prof("sort2_then_gather", sort_then_gather, sortkey, gid, attrs)

# C: associative-scan fill-forward of [M, 16]
def fill_forward(marks_idx, vals):
    marks = jnp.zeros((M,), bool).at[marks_idx].set(True, mode="drop")
    buf = jnp.zeros((M, NCH)).at[marks_idx].set(vals, mode="drop")

    def op(a, b):
        am, av = a
        bm, bv = b
        return am | bm, jnp.where(bm[:, None], bv, av)

    m, v = jax.lax.associative_scan(op, (marks, buf))
    return v


prof("fill_forward_scan", fill_forward, marks_idx, vals)

# D: cumsum-based gaussian-id recovery (marks -> cumsum)
def marks_cumsum(marks_idx):
    marks = jnp.zeros((M,), jnp.int32).at[marks_idx].add(1, mode="drop")
    g = jnp.cumsum(marks) - 1
    start = jax.lax.cummax(jnp.where(marks > 0, jnp.arange(M, dtype=jnp.int32), -1))
    return g, start


prof("marks_cumsum_cummax", marks_cumsum, marks_idx)

# E: the raw scatter cost (100k rows into M x 16)
prof(
    "scatter_100k_rows",
    lambda vals: jnp.zeros((M, NCH)).at[marks_idx].set(vals, mode="drop"),
    vals,
)

# F: segmented reduce: sort grads by gid then cumsum+diff
def seg_reduce(g, *cs):
    sg, *scs = jax.lax.sort((g,) + cs, num_keys=1)
    mat = jnp.stack(scs, axis=1)  # [M, NCH]
    csum = jnp.cumsum(mat, axis=0)
    edges = jnp.searchsorted(sg, jnp.arange(N + 1, dtype=jnp.int32)).astype(jnp.int32)
    tot = csum[jnp.clip(edges[1:] - 1, 0, M - 1)] - jnp.where(
        edges[:-1] > 0, csum[jnp.clip(edges[:-1] - 1, 0, M - 1)], 0.0
    )
    return tot


prof("segreduce_sort_cumsum", seg_reduce, gid, *chans)
print("done", flush=True)
