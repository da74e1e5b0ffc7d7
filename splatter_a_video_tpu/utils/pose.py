"""SE(3)/SO(3) exponential maps and pose helpers (pure jnp).

Parity with the reference pose utilities
(`/root/reference/src/pointrix/utils/pose.py:8-296`): so3/se3 exp maps (the
machinery behind `TrainableCamera`'s se3 pose parameterization,
`src/pointrix/camera/camera.py:390-515`) and quaternion/rotmat conversions
(`qvec2rotmat`). Differentiable — cameras can be optimized by exposing the
6-vector se3 parameter to the optimizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quaternion import quat_to_rotmat, rotmat_to_quat  # re-export path


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _exp_coeffs(theta2: jnp.ndarray):
    """Rodrigues coefficients A = sinθ/θ, B = (1−cosθ)/θ², C = (θ−sinθ)/θ³
    on the UNNORMALIZED skew matrix, with Taylor branches near θ = 0 so the
    map (and its gradient) is smooth at the identity — pose refinement
    starts at xi = 0, where a w/max(θ,eps) normalization has a 1/eps-scale
    gradient blowup."""
    small = theta2 < 1e-8
    th2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(th2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / th2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (th2_safe * theta)
    )
    return A, B, C


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3].
    Smoothly differentiable at w = 0 (Taylor-branched coefficients)."""
    del eps  # kept for API compatibility
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    A, B, _ = _exp_coeffs(theta2)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + A * K + B * (K @ K)


def se3_exp(xi: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """se(3) twist [..., 6] = (v, w) -> [..., 4, 4] rigid transform.
    Smoothly differentiable at xi = 0 (Taylor-branched coefficients)."""
    del eps
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    A, B, C = _exp_coeffs(theta2)
    K = hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye + A * K + B * K2
    V = eye + B * K + C * K2
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def qvec2rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """COLMAP-convention quaternion (w,x,y,z) -> rotation matrix."""
    return quat_to_rotmat(q)


def rotmat2qvec(R: jnp.ndarray) -> jnp.ndarray:
    return rotmat_to_quat(R)


def apply_se3_to_extrinsic(extr: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-compose a twist onto a [3,4] world->camera extrinsic — the
    `TrainableCamera` update rule (pose refinement)."""
    T = se3_exp(xi)
    E = jnp.concatenate([extr, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    return (T @ E)[:3]
