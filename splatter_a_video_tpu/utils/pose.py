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


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    K = hat(w / theta)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def se3_exp(xi: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """se(3) twist [..., 6] = (v, w) -> [..., 4, 4] rigid transform."""
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), eps)
    K = hat(w / theta)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye + s * K + (1.0 - c) * (K @ K)
    V = eye + ((1.0 - c) / th) * K + ((th - s) / th) * (K @ K)
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
