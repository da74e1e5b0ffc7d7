"""Synchronous per-call timing with value verification."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

M = 1 << 21
key = jax.random.PRNGKey(0)
xs = [jax.random.uniform(jax.random.PRNGKey(s), (M,)) for s in range(6)]
jax.block_until_ready(xs)

f = jax.jit(lambda x: jnp.sort(x))
print("compiling sort...", flush=True)
t0 = time.time()
c = f.lower(xs[0]).compile()
print(f"compiled {time.time()-t0:.1f}s", flush=True)
r = jax.block_until_ready(c(xs[0]))
for i in range(6):
    t0 = time.time()
    r = c(xs[i])
    r.block_until_ready()
    print(f"call {i}: {(time.time()-t0)*1e3:.2f} ms sum={float(r[:100].sum()):.4f} max={float(r[-1]):.6f}", flush=True)

# compare with a reduction of equal memory traffic
g = jax.jit(lambda x: x * 2.0 + 1.0)
cg = g.lower(xs[0]).compile()
r = jax.block_until_ready(cg(xs[0]))
for i in range(3):
    t0 = time.time()
    r = cg(xs[i])
    r.block_until_ready()
    print(f"elementwise {i}: {(time.time()-t0)*1e3:.2f} ms", flush=True)
