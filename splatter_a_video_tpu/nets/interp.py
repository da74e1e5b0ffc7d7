"""Image resizing with torch `F.interpolate` semantics, as dense matmuls.

The preprocessing networks (`nets/`) need bilinear (both align_corners
modes) and bicubic (a=-0.75) resizes that match torch bit-for-bit-ish —
`jax.image.resize` differs (Catmull-Rom cubic a=-0.5, no align_corners).
Feature-map resizes are separable, so each axis becomes one [out, in]
weight matrix built host-side in numpy and applied as a matmul — exact,
static, and MXU-shaped instead of gather-heavy.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _source_coords(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    o = np.arange(n_out, dtype=np.float64)
    if align_corners:
        if n_out == 1:
            return np.zeros(1)
        return o * (n_in - 1) / (n_out - 1)
    return (o + 0.5) * (n_in / n_out) - 0.5


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights (torch uses Keys a=-0.75)."""
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def resize_matrix(
    n_in: int, n_out: int, mode: str = "bilinear", align_corners: bool = False
) -> np.ndarray:
    """[n_out, n_in] float32 interpolation matrix (border-replicate)."""
    x = _source_coords(n_in, n_out, align_corners)
    if mode == "bilinear":
        if not align_corners:
            # torch clamps the source index at 0 for linear modes
            x = np.maximum(x, 0.0)
        i0 = np.floor(x).astype(np.int64)
        f = x - i0
        idx = np.stack([i0, i0 + 1], axis=1)          # [out, 2]
        wts = np.stack([1.0 - f, f], axis=1)
    elif mode == "bicubic":
        i0 = np.floor(x).astype(np.int64)
        f = x - i0
        offs = np.array([-1, 0, 1, 2])
        idx = i0[:, None] + offs[None, :]             # [out, 4]
        wts = _cubic_kernel(f[:, None] - offs[None, :])
    else:
        raise ValueError(f"unknown mode {mode}")
    idx = np.clip(idx, 0, n_in - 1)
    M = np.zeros((n_out, n_in), np.float64)
    np.add.at(M, (np.repeat(np.arange(n_out), idx.shape[1]), idx.ravel()), wts.ravel())
    return M.astype(np.float32)


def interp2d(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., out_h, out_w, C], torch semantics."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    Mh = jnp.asarray(resize_matrix(h, out_h, mode, align_corners))
    Mw = jnp.asarray(resize_matrix(w, out_w, mode, align_corners))
    y = jnp.einsum("oh,...hwc->...owc", Mh, x)
    return jnp.einsum("pw,...owc->...opc", Mw, y)
