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
