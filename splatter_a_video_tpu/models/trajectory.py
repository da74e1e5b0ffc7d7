"""Per-Gaussian trajectory bases: polynomial + Fourier, and cubic splines.

TPU-native equivalents of the reference motion models:
  * poly+Fourier centers/rotations: `DynamicGaussianPointCloud.get_position`
    / `.get_rotation` (`/root/reference/src/dynamic_gaussian_points.py:138-186`),
    including the reference's deliberate quirks: the rotation delta terms are
    *detached* before normalization (`:150-151`), and `detach_pos` stops the
    gradient of the base position only (`:181-182`);
  * per-point cubic splines over lifted 3D tracks:
    `DynamicGaussianWithBasePointCloud.get_position`
    (`/root/reference/src/dynamic_gaussian_with_base_point_cloud.py:236-250`)
    with knots every 5 frames (`:66-68`) fitted by scipy CubicSpline on the
    *delta* from the first-frame base positions (`:69-78`).

All evaluators take a scalar (traced) time and are pure jnp, so XLA fuses
trajectory evaluation straight into the render — time never forces a
recompile and frame interpolation at fractional t is free
(`trainer_fragGS.py:1584` `get_interpolation_result`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

POLY_DIM = 4       # reference poly_feature_dim (dynamic_gaussian_points.py:91)
FOURIER_DIM = 8    # reference fourier_feature_dim = 4*2 (:92)


def poly_fourier_basis(t_norm: jnp.ndarray, poly_dim: int = POLY_DIM,
                       fourier_dim: int = FOURIER_DIM):
    """Evaluate the shared time bases at normalized time t in [0, 1].

    Returns (poly [poly_dim], fourier [fourier_dim]) with the reference's
    layout: poly_k = t^k; fourier = [cos(l pi t)..., sin(l pi t)...] for
    l = 1..fourier_dim/2 (`dynamic_gaussian_points.py:141-147`).
    """
    t_norm = jnp.asarray(t_norm, jnp.float32)
    k = jnp.arange(poly_dim, dtype=jnp.float32)
    poly = jnp.power(t_norm, k)
    l = jnp.arange(fourier_dim // 2, dtype=jnp.float32) + 1.0
    fourier = jnp.concatenate([jnp.cos(t_norm * l * jnp.pi), jnp.sin(t_norm * l * jnp.pi)])
    return poly, fourier


def poly_fourier_offset(
    poly_feat: jnp.ndarray,
    fourier_feat: jnp.ndarray,
    t_norm: jnp.ndarray,
) -> jnp.ndarray:
    """Sum_k poly_k t^k + sum_l (a_l cos + b_l sin) — [N, P, C]+[N, F, C] -> [N, C]."""
    poly, fourier = poly_fourier_basis(t_norm, poly_feat.shape[1], fourier_feat.shape[1])
    return jnp.einsum("npc,p->nc", poly_feat, poly) + jnp.einsum(
        "nfc,f->nc", fourier_feat, fourier
    )


def position_poly_fourier(
    position: jnp.ndarray,
    pos_poly_feat: jnp.ndarray,
    pos_fourier_feat: jnp.ndarray,
    t_norm: jnp.ndarray,
    detach_pos: bool = False,
) -> jnp.ndarray:
    """Center trajectory — parity with `get_position`
    (`dynamic_gaussian_points.py:170-186`)."""
    base = jax.lax.stop_gradient(position) if detach_pos else position
    return base + poly_fourier_offset(pos_poly_feat, pos_fourier_feat, t_norm)


def rotation_poly_fourier(
    rotation: jnp.ndarray,
    rot_poly_feat: jnp.ndarray,
    rot_fourier_feat: jnp.ndarray,
    t_norm: jnp.ndarray,
) -> jnp.ndarray:
    """Rotation trajectory (unnormalized quaternion) — parity with
    `get_rotation` (`dynamic_gaussian_points.py:138-152`): the time-varying
    delta is stop-gradiented like the reference's `.detach()`, so only the
    base quaternion trains through the render. Callers normalize."""
    delta = poly_fourier_offset(rot_poly_feat, rot_fourier_feat, t_norm)
    return rotation + jax.lax.stop_gradient(delta)


def position_lbs(
    position: jnp.ndarray,
    skin_logits: jnp.ndarray,
    bone_poly: jnp.ndarray,
    bone_fourier: jnp.ndarray,
    t_norm: jnp.ndarray,
    detach_pos: bool = False,
) -> jnp.ndarray:
    """Linear-blend-skinned center trajectory (translation bones).

    The model family the reference gestures at with its dead
    `SingleAtlasLBSModel` (`frag_model.py:140`, import removed upstream),
    made real: K shared bones each carry a poly+Fourier translation
    trajectory; every gaussian blends them with softmax skinning weights:

        x_i(t) = x_i + sum_k softmax(w_i)_k * bone_k(t)

    Cost is T-independent like the per-point bases but with K*(P+F)*3
    shared motion parameters instead of N*(P+F)*3 — a strong low-rank
    motion prior (K << N), and the blend is one [N,K]@[K,3] MXU matmul.

    Args:
      skin_logits: [N, K] per-gaussian bone logits.
      bone_poly/bone_fourier: [K, poly_dim, 3] / [K, fourier_dim, 3].
    """
    base = jax.lax.stop_gradient(position) if detach_pos else position
    bone_off = poly_fourier_offset(bone_poly, bone_fourier, t_norm)  # [K, 3]
    w = jax.nn.softmax(skin_logits, axis=-1)
    return base + w @ bone_off


# --------------------------------------------------------------------------
# cubic splines
# --------------------------------------------------------------------------


def spline_knots(num_frames: int, frames_per_knot: int = 5) -> np.ndarray:
    """Normalized knot positions — parity with
    `dynamic_gaussian_with_base_point_cloud.py:66-68`: `interval_num =
    ceil(T/5)` intervals whose integer frame indices come from a truncated
    linspace (hence slightly non-uniform)."""
    interval_num = -(-num_frames // frames_per_knot)
    idx = np.linspace(0, num_frames - 1, interval_num + 1).astype(np.int64)
    return (idx / (num_frames - 1)).astype(np.float32)


def fit_cubic_spline(
    track_seq: np.ndarray, frames_per_knot: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit per-point cubic splines to 3D track sequences (init-time, host).

    Args:
      track_seq: [T, N, 3] per-frame positions (frame 0 = base positions).
    Returns:
      (coeff [N, 4, M, 3], knots [M+1]) where coeff[:, k, i] multiplies
      (t - knot_i)^(3-k) — scipy's `CubicSpline.c` layout, matching the
      reference's trainable `pos_cubic_node` (`...base_point_cloud.py:69-78`).
    """
    from scipy.interpolate import CubicSpline

    T, N, _ = track_seq.shape
    base = track_seq[0]
    delta = track_seq - base[None]
    knots = spline_knots(T, frames_per_knot)
    idx = np.linspace(0, T - 1, len(knots)).astype(np.int64)
    yy = delta[idx]  # [M+1, N, 3]
    cs = CubicSpline(knots, yy, axis=0)
    # cs.c has shape [4, M, N, 3]; reorder to [N, 4, M, 3]
    coeff = np.transpose(cs.c, (2, 0, 1, 3)).astype(np.float32)
    return coeff, knots


def position_cubic_spline(
    position: jnp.ndarray,
    coeff: jnp.ndarray,
    knots: jnp.ndarray,
    t_norm: jnp.ndarray,
    detach_pos: bool = False,
) -> jnp.ndarray:
    """Evaluate the spline trajectory at normalized time t in [0, 1].

    Parity with `get_position` (`...base_point_cloud.py:236-250`): interval
    via searchsorted(t - 1e-7) clamped at 0, cubic Horner on the offset.

    Args:
      position: [N, 3] base positions.
      coeff: [N, 4, M, 3] spline coefficients (highest power first).
      knots: [M+1] normalized knot positions.
    """
    t_norm = jnp.asarray(t_norm, jnp.float32)
    i = jnp.clip(jnp.searchsorted(knots, t_norm - 1e-7, side="left") - 1, 0, coeff.shape[2] - 1)
    d = t_norm - knots[i]
    c = coeff[:, :, i, :]  # [N, 4, 3]
    offset = ((c[:, 0] * d + c[:, 1]) * d + c[:, 2]) * d + c[:, 3]
    base = jax.lax.stop_gradient(position) if detach_pos else position
    return base + offset
