#!/bin/bash
# One-shot TPU validation pipeline (run after kernel/binning changes or a
# relay outage): quality e2e -> render bench -> train-step bench.
#
# ALWAYS run this (at minimum the bench.py stage) before ending a round if
# ANY compute-path code changed: it pre-warms .jax_cache so the driver's
# end-of-round bench doesn't pay 10-15 min remote compiles inside its own
# budget (that's how BENCH_r02/r03 were lost).
# Expected (deterministic) e2e numbers: recon PSNR 31.05 SSIM 0.9739;
# tapvid AJ 69.57 delta 85.46 OA 86.55 TC 0.2.
# (Goldens moved 2026-08-19: size-prune is now gated on
#  step > opacity_reset_interval like gs_optimizer.py:361-372 — the old
#  unconditional prune was eating large legitimate gaussians; AJ 48.41->69.57.)
set -u
cd "$(dirname "$0")/.."
echo "== probe =="
timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe ok', float(jax.jit(lambda x: (x@x.T).sum())(jnp.ones((777,333)))))
" || { echo "RELAY DOWN — aborting"; exit 1; }
echo "== e2e (quality) =="
timeout 1800 python -u scripts/e2e_tpu.py 2>&1 | tail -4
echo "== bench (render) =="
timeout 1200 python -u bench.py
echo "== bench_train (train step) =="
timeout 1200 python -u scripts/bench_train.py 2>&1 | tail -5
