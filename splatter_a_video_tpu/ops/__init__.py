"""Compute ops: pure-jnp math + Pallas TPU kernels for the splatting pipeline."""

from . import binning, projection, quaternion, rasterize, rasterize_ref, rasterize_tpu, sh

__all__ = [
    "binning",
    "projection",
    "quaternion",
    "rasterize",
    "rasterize_ref",
    "rasterize_tpu",
    "sh",
]
