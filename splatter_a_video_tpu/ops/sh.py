"""Spherical-harmonics color evaluation (pure jnp, autodiff'd).

TPU-native equivalent of the reference CUDA ops `compute_sh` /
`compute_sh_free` (`/root/reference/src/submodules/dptr/dptr/gs/src/
compute_sh.cu`, `compute_sh_free.cu`) and of the torch oracle
`eval_sh` (`/root/reference/src/pointrix/utils/sh_utils.py:57-111`).
Point-wise over Gaussians -> plain jnp; XLA fuses it into the render.

`eval_sh` adds the +0.5 DC offset and clamps negatives to zero (ReLU) like
`compute_sh.cu:74-79`; JAX's `maximum(x, 0)` subgradient matches the CUDA
backward's clamp masking exactly. `eval_sh_free` skips offset+clamp like
`compute_sh_free.cu`.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(deg: int) -> int:
    return (deg + 1) ** 2


def _eval_sh_basis(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Raw SH polynomial evaluation.

    Args:
      deg: static int in [0, 3].
      sh:  [..., K, C] coefficients with K >= (deg+1)^2 (extra ignored).
      dirs: [..., 3] unit view directions.
    Returns: [..., C].
    """
    if not 0 <= deg <= 3:
        raise ValueError(f"deg must be in [0,3], got {deg}")
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :] - SH_C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray, visible=None) -> jnp.ndarray:
    """SH -> clamped RGB, parity with `compute_sh` (`compute_sh.cu:33-80`).

    Args:
      deg: static degree in [0,3].
      sh:  [N, K, C] coefficients (K >= (deg+1)^2), C typically 3.
      dirs: [N, 3] view directions (the production renderer uses the fixed
            +z direction, `dptr_ortho_enhanced.py:270-272`).
      visible: optional [N]/[N,1] bool; invisible rows output zero.
    Returns: [N, C] colors in [0, inf) (ReLU-clamped after +0.5 offset).
    """
    colors = jnp.maximum(_eval_sh_basis(deg, sh, dirs) + 0.5, 0.0)
    if visible is not None:
        vis = jnp.reshape(visible, (sh.shape[0], 1)).astype(colors.dtype)
        colors = colors * vis
    return colors


def eval_sh_free(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray, visible=None) -> jnp.ndarray:
    """Unclamped/offset-free SH evaluation — parity with `compute_sh_free`
    (`compute_sh_free.cu`), used for non-color feature fields."""
    out = _eval_sh_basis(deg, sh, dirs)
    if visible is not None:
        vis = jnp.reshape(visible, (sh.shape[0], 1)).astype(out.dtype)
        out = out * vis
    return out


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> DC SH coefficient (`sh_utils.py:114`)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (inverse of `rgb_to_sh`)."""
    return sh * SH_C0 + 0.5
