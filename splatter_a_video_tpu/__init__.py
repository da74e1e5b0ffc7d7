"""splatter_a_video_tpu — a TPU-native video Gaussian representation framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
"Splatter a Video: Video Gaussian Representation for Versatile Processing"
(NeurIPS 2024). A monocular video is represented as one set of dynamic 3D
Gaussians under a fixed canonical camera; centers/rotations follow learned
polynomial + Fourier (or cubic-spline) trajectories; a differentiable
tile-based rasterizer alpha-blends arbitrary per-Gaussian feature channels
(RGB, depth, tracks, masks, DINO features) which powers rendering, point
tracking, segmentation propagation, editing, interpolation, stereo and NVS.

Layer map (TPU-first redesign of the reference layer map, SURVEY.md §1):

  ops/      pure-jnp math + Pallas TPU kernels (projection, EWA, binning,
            sorted alpha compositing fwd/bwd, SH, knn, ssim)
  models/   Gaussian scene pytrees, trajectory bases, cameras, multi-atlas model
  train/    losses, per-attribute optimizers + schedules, static-capacity
            density control, the jitted train step / Trainer
  data/     video clip loading (DAVIS layout), 2D->3D track lifting, samplers
  parallel/ jax.sharding Mesh helpers + data-parallel train step
  eval/     PSNR/SSIM/LPIPS-proxy + Tap-Vid tracking metrics
  apps/     CLI entry points (train / render / track / edit / nvs)
"""

__version__ = "0.1.0"

# F32 MATMUL PRECISION IS LOAD-BEARING, PIN IT EXPLICITLY.
#
# On TPU an f32 x f32 matmul lowers to 1, 3 or 6 bf16 MXU passes
# depending on `precision`; the DEFAULT is toolchain-dependent. The
# 2026-08-20 relay toolchain update changed the effective default from a
# multi-pass mode to single-pass bf16 (measured: max relative error
# 7.6e+02 on a 512x512 f32 matmul vs 4.3e-02 at HIGHEST), which silently
# degraded every f32 dot_general in the framework — the Pallas blend
# kernels' triangular-matmul transmittance scans and feature
# accumulation, the backward reductions, MXU brute-force KNN (ARAP
# neighborhoods), and SSIM — and collapsed flagship training (PSNR
# 26.5 -> 10, METRICS_480p_r4code artifact) while unit tests and the
# small synthetic e2e still passed. Training dynamics here sit on
# compounded products of ~1e-4..1 alpha terms; they need true f32.
#
# Set the global default rather than per-call annotations so every dot
# in the package (and in user code driving it) is covered; the hot
# kernels that can afford reduced passes opt in deliberately (e.g. the
# `bf16x2` scan impl, which is a 2-pass hi+lo split with ~2^-18 error).
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
