"""Profile remaining primitives: marks+cumsum, scatters, segreduce."""
import glob, gzip, json, os, sys
from collections import defaultdict
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
from splatter_a_video_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

M = 1 << 19
N = 100_000
NCH = 14
key = jax.random.PRNGKey(0)
gid = jax.random.randint(jax.random.fold_in(key, 99), (M,), 0, N, dtype=jnp.int32)
chans = [jax.random.uniform(jax.random.fold_in(key, i), (M,)) for i in range(NCH)]
marks_idx = jnp.sort(jax.random.randint(jax.random.fold_in(key, 101), (N,), 0, M, dtype=jnp.int32))
grads = jax.random.uniform(jax.random.fold_in(key, 102), (M, NCH))

def prof(name, fn, *args, iters=5):
    c = jax.jit(fn).lower(*args).compile()
    jax.block_until_ready(c(*args))
    tdir = f"/tmp/prof2_{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            r = c(*args)
        jax.block_until_ready(r)
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    tot = sum(e["dur"] for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "jit_" in e.get("name", ""))
    print(f"{name}: {tot/1e3/iters:.2f} ms/iter", flush=True)

def marks_cumsum(marks_idx):
    marks = jnp.zeros((M,), jnp.int32).at[marks_idx].add(1, mode="drop")
    g = jnp.cumsum(marks) - 1
    start = jax.lax.cummax(jnp.where(marks > 0, jnp.arange(M, dtype=jnp.int32), -1))
    return g, start
prof("marks_cumsum_cummax", marks_cumsum, marks_idx)

# pack-gather transpose: scatter-add M x NCH rows into N x NCH
def scatter_add(g, grads):
    return jnp.zeros((N, NCH)).at[g].add(grads, mode="drop")
prof("scatter_add_512k_rows", scatter_add, gid, grads)

# segreduce via sort+cumsum+boundary-diff
def seg_reduce(g, grads):
    ops = (g,) + tuple(grads[:, i] for i in range(NCH))
    s = jax.lax.sort(ops, num_keys=1)
    sg = s[0]
    mat = jnp.stack(s[1:], axis=1)
    csum = jnp.cumsum(mat, axis=0)
    # boundaries via small scatter + cumsum would need counts; use searchsorted
    # over N+1 queries (100k-scale, the risky one) for an honest comparison
    edges = jnp.searchsorted(sg, jnp.arange(N + 1, dtype=jnp.int32)).astype(jnp.int32)
    lo = jnp.clip(edges[:-1] - 1, 0, M - 1)
    hi = jnp.clip(edges[1:] - 1, 0, M - 1)
    return csum[hi] - jnp.where((edges[:-1] > 0)[:, None], csum[lo], 0.0)
prof("segreduce_sort_cumsum", seg_reduce, gid, grads)
print("done", flush=True)
