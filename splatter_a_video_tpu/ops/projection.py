"""Camera projection + EWA covariance projection (pure jnp, autodiff'd).

TPU-native equivalents of:
  - orthographic projection: `DPTROrthoEnhancedRender.project_point`
    (`/root/reference/src/pointrix/renderer/dptr_ortho_enhanced.py:145-202`)
  - orthographic EWA + tile counting: `ewa_project_torch_impl`
    (`dptr_ortho_enhanced.py:18-111`)
  - perspective projection: `project_point.cu:13-57`
  - perspective EWA: `ewa_project.cu:16-84`

All of this is point-wise over the Gaussian axis, so jnp + XLA fusion is the
right TPU implementation; gradients come from autodiff (the reference hand
writes CUDA backwards). Culled Gaussians are zeroed rather than compacted so
every shape stays static under jit.

Conventions: `extr` is the 3x4 world->camera matrix [R|t]; `intr` is
(fx, fy, cx, cy); `uv` is in pixel coordinates with the reference's -0.5
offset; tiles are BLOCK x BLOCK pixels (16 by default, `config.h:7-10`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

BLOCK = 16  # default tile edge; parity with BLOCK_X=BLOCK_Y=16. All tile
# helpers also accept an (bx, by) tuple — wider-than-tall tiles (e.g. 32x16)
# cut kernel program count and duplicate intersections on TPU.


def _block_xy(block) -> Tuple[int, int]:
    if isinstance(block, tuple):
        return block
    return (block, block)


class Projection(NamedTuple):
    """Per-Gaussian screen-space quantities feeding the rasterizer."""

    uv: jnp.ndarray        # [N, 2] pixel coords (culled rows -> 0)
    depth: jnp.ndarray     # [N] camera-space depth (culled rows -> 0)
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] int32 3-sigma pixel radius (0 if culled)
    tiles: jnp.ndarray     # [N] int32 number of tiles overlapped
    rect_min: jnp.ndarray  # [N, 2] int32 inclusive tile rect min (tx, ty)
    rect_max: jnp.ndarray  # [N, 2] int32 exclusive tile rect max (tx, ty)


def tile_grid(W: int, H: int, block=BLOCK) -> Tuple[int, int]:
    """Number of tiles along (x, y)."""
    bx, by = _block_xy(block)
    return (-(-W // bx), -(-H // by))


def project_ortho(
    xyz: jnp.ndarray,
    extr: jnp.ndarray,
    W: int,
    H: int,
    nearest: float = 0.01,
    extent: float = 1.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthographic projection of the canonical-frustum points.

    uv = ((R x + t)_{xy} + 1) * (W, H) / 2 - 0.5, depth = (R x + t)_z.
    Culling (depth <= nearest, or uv outside `extent` times the image
    half-size around the center) zeroes uv and depth — parity with
    `dptr_ortho_enhanced.py:177-202`. `visible` is depth != 0.

    Returns: (uv [N,2], depth [N]).
    """
    R = extr[:3, :3]
    t = extr[:3, 3]
    pt_cam = xyz @ R.T + t  # [N, 3]
    depth = pt_cam[:, 2]
    wh = jnp.array([W, H], dtype=xyz.dtype)
    uv = (pt_cam[:, :2] + 1.0) * wh * 0.5 - 0.5

    depth = jnp.nan_to_num(depth)
    near_mask = depth <= nearest
    lo = (1.0 - extent) * wh * 0.5
    hi = (1.0 + extent) * wh * 0.5
    extent_mask = jnp.any((uv < lo) | (uv > hi), axis=-1)
    culled = near_mask | extent_mask

    uv = jnp.where(culled[:, None], 0.0, uv)
    depth = jnp.where(culled, 0.0, depth)
    return uv, depth


def project_persp(
    xyz: jnp.ndarray,
    intr: jnp.ndarray,
    extr: jnp.ndarray,
    W: int,
    H: int,
    nearest: float = 0.2,
    extent: float = 1.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole projection — parity with `project_point.cu:13-57`.

    uv = (fx x/z + cx - 0.5, fy y/z + cy - 0.5), depth = z, with the same
    near/extent culling-to-zero convention as the CUDA kernel (which leaves
    culled outputs at their zero initialization).
    """
    R = extr[:3, :3]
    t = extr[:3, 3]
    pt_cam = xyz @ R.T + t
    z = pt_cam[:, 2]
    inv_z = 1.0 / (z + 1e-7)
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = fx * pt_cam[:, 0] * inv_z + cx - 0.5
    v = fy * pt_cam[:, 1] * inv_z + cy - 0.5
    uv = jnp.stack([u, v], axis=-1)

    near_mask = (z <= nearest) if nearest > 0 else jnp.zeros_like(z, dtype=bool)
    wh = jnp.array([W, H], dtype=xyz.dtype)
    lo = (1.0 - extent) * wh * 0.5
    hi = (1.0 + extent) * wh * 0.5
    extent_mask = jnp.any((uv < lo) | (uv > hi), axis=-1) if extent > 0 else jnp.zeros_like(near_mask)
    culled = near_mask | extent_mask

    uv = jnp.where(culled[:, None], 0.0, uv)
    depth = jnp.where(culled, 0.0, z)
    return uv, depth


def max_radius_for_tile_cap(max_tiles: int, block) -> float:
    """Largest pixel radius whose tile rect is guaranteed <= max_tiles.

    The rect spans at most floor(2r/b) + 2 tiles per axis, so a square
    budget of floor(sqrt(max_tiles)) tiles per axis gives
    r <= (span - 2) * b / 2.
    """
    bx, by = _block_xy(block)
    span = int(max(max_tiles, 9) ** 0.5)
    return max((span - 2) * min(bx, by) / 2.0, float(min(bx, by)))


def _finish_cov2d(
    cov2d_00, cov2d_01, cov2d_11, uv, W: int, H: int, visible, block: int,
    max_radius=None, rect_mode: str = "tight", opacity=None,
):
    """Shared tail of both EWA paths: blur, conic, radius, tile rect.

    Parity with `ewa_project_torch_impl` (`dptr_ortho_enhanced.py:49-111`)
    and `ewa_project.cu:57-84`: +0.3 px low-pass on the diagonal, eigenvalue
    discriminant clamped at 0.1, radius = ceil(3 sqrt(lambda_max)), tile rect
    from uv +- radius clamped to the tile grid.

    `rect_mode` selects the tile footprint (deviation #11, PARITY.md):
      - "disc" (reference parity): square rect of half-size `radius`
        (`ewa_project.cu:70-74`, `dptr_ortho_enhanced.py:95-103`).
      - "tight" (default): the exact axis-aligned bounding box of the
        3-sigma ellipse of the BLURRED covariance, rx = ceil(3 sqrt(Sigma00)),
        ry = ceil(3 sqrt(Sigma11)). Strictly contained in the disc rect, so
        the only dropped contributions have power < -4.5, i.e.
        alpha < 0.011 * opacity — below any visible threshold and on par
        with the reference's own alpha < 1/255 skip. For anisotropic
        Gaussians this cuts the intersection count 1.5-2x, which is the
        rasterizer's main cost axis on TPU (binning scales with slots).

    `max_radius` (pixels) clamps oversized footprints SYMMETRICALLY (per
    axis in "tight" mode) so they stay within the binning's static
    per-Gaussian tile cap — without it, the cap would truncate a huge
    Gaussian to the top rows of its rect, producing banding artifacts and
    runaway-growth gradients (the reference has no cap; its optimizer
    prunes world-size > 0.1*extent instead, `gs_optimizer.py:364-366`,
    which still applies here on top).
    """
    a = cov2d_00 + 0.3
    b = cov2d_01
    c = cov2d_11 + 0.3
    det = a * c - b * b
    det_mask = det != 0.0
    det_safe = jnp.where(det_mask, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    if max_radius is not None:
        radius = jnp.minimum(radius, max_radius)

    if rect_mode == "tight":
        # Opacity-aware EXACT support bound: the blend kernel skips any
        # slot with alpha = op * exp(power) < 1/255, so only the superlevel
        # set {power >= ln(1/(255*op))} can contribute — an ellipse whose
        # AABB half-extents are t * sqrt(Sigma_axis) with
        # t = sqrt(2 ln(255*op)), clamped to the 3-sigma bound. Pixels
        # outside it are skipped in-kernel either way (gradients included),
        # so shrinking the footprint to it changes nothing but the slot
        # count — which collapses for the near-transparent Gaussians that
        # dominate training after opacity resets (`gs_optimizer.py:184-195`).
        t_fac = 3.0
        if opacity is not None:
            t_fac = jnp.minimum(
                3.0,
                jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * opacity), 0.0)),
            )
        rx = jnp.ceil(t_fac * jnp.sqrt(jnp.maximum(a, 0.0)))
        ry = jnp.ceil(t_fac * jnp.sqrt(jnp.maximum(c, 0.0)))
        if max_radius is not None:
            rx = jnp.minimum(rx, max_radius)
            ry = jnp.minimum(ry, max_radius)
        r2 = jnp.stack([rx, ry], axis=-1)
    elif rect_mode == "disc":
        r2 = radius[:, None]
    else:
        raise ValueError(f"rect_mode must be 'tight' or 'disc', got {rect_mode!r}")

    bx, by = _block_xy(block)
    tgx, tgy = tile_grid(W, H, block)
    tb = jnp.array([tgx, tgy], dtype=jnp.int32)
    bvec = jnp.array([bx, by], dtype=uv.dtype)
    tile_min = jnp.clip(jnp.floor((uv - r2) / bvec).astype(jnp.int32), 0, tb)
    tile_max = jnp.clip(
        jnp.floor((uv + r2 + (bvec - 1)) / bvec).astype(jnp.int32), 0, tb
    )
    span = tile_max - tile_min
    tiles = span[:, 0] * span[:, 1]

    mask = (tiles != 0) & det_mask & visible
    conic = jnp.nan_to_num(conic) * mask[:, None]
    radius = (jnp.nan_to_num(radius) * mask).astype(jnp.int32)
    tiles = (tiles * mask).astype(jnp.int32)
    tile_min = tile_min * mask[:, None]
    tile_max = tile_max * mask[:, None]
    return conic, radius, tiles, tile_min, tile_max


def ewa_ortho(
    cov3d: jnp.ndarray,
    extr: jnp.ndarray,
    uv: jnp.ndarray,
    W: int,
    H: int,
    visible: jnp.ndarray,
    block: int = BLOCK,
    max_radius=None,
    rect_mode: str = "tight",
    opacity=None,
):
    """Orthographic EWA: cov2d = (J R) Sigma (J R)^T with J = diag(W/2, H/2).

    Parity oracle: `ewa_project_torch_impl` (`dptr_ortho_enhanced.py:18-111`).

    Args:
      cov3d: [N, 6] upper-triangle covariances.
      extr:  [3, 4] world->camera.
      uv:    [N, 2] projected pixel centers.
      visible: [N] bool.
    Returns: (conic [N,3], radius [N] i32, tiles [N] i32,
              tile_min [N,2] i32, tile_max [N,2] i32).
    """
    R = extr[:3, :3]
    # T = J @ R where J = [[W/2,0,0],[0,H/2,0]] -> rows are scaled R rows.
    t0 = (W / 2.0) * R[0]  # [3]
    t1 = (H / 2.0) * R[1]  # [3]

    def quad(u, v):
        # u^T Sigma v for 6-vector Sigma
        return (
            u[0] * v[0] * cov3d[:, 0]
            + (u[0] * v[1] + u[1] * v[0]) * cov3d[:, 1]
            + (u[0] * v[2] + u[2] * v[0]) * cov3d[:, 2]
            + u[1] * v[1] * cov3d[:, 3]
            + (u[1] * v[2] + u[2] * v[1]) * cov3d[:, 4]
            + u[2] * v[2] * cov3d[:, 5]
        )

    c00 = quad(t0, t0)
    c01 = quad(t0, t1)
    c11 = quad(t1, t1)
    return _finish_cov2d(c00, c01, c11, uv, W, H, visible, block, max_radius, rect_mode, opacity)


def ewa_persp(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    intr: jnp.ndarray,
    extr: jnp.ndarray,
    uv: jnp.ndarray,
    W: int,
    H: int,
    visible: jnp.ndarray,
    block: int = BLOCK,
    max_radius=None,
    rect_mode: str = "tight",
    opacity=None,
):
    """Perspective EWA — parity with `ewa_project.cu:16-84`.

    J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]] evaluated at the
    camera-space point (no FoV clamping, matching the reference kernel).
    """
    R = extr[:3, :3]
    t = extr[:3, 3]
    p = xyz @ R.T + t
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    z = jnp.where(z == 0, 1e-7, z)
    fx, fy = intr[0], intr[1]
    rz = 1.0 / z
    rz2 = rz * rz

    # Rows of T = J @ R, per Gaussian: [N, 3]
    t0 = fx * rz[:, None] * R[0][None, :] - (fx * x * rz2)[:, None] * R[2][None, :]
    t1 = fy * rz[:, None] * R[1][None, :] - (fy * y * rz2)[:, None] * R[2][None, :]

    def quad(u, v):
        return (
            u[:, 0] * v[:, 0] * cov3d[:, 0]
            + (u[:, 0] * v[:, 1] + u[:, 1] * v[:, 0]) * cov3d[:, 1]
            + (u[:, 0] * v[:, 2] + u[:, 2] * v[:, 0]) * cov3d[:, 2]
            + u[:, 1] * v[:, 1] * cov3d[:, 3]
            + (u[:, 1] * v[:, 2] + u[:, 2] * v[:, 1]) * cov3d[:, 4]
            + u[:, 2] * v[:, 2] * cov3d[:, 5]
        )

    c00 = quad(t0, t0)
    c01 = quad(t0, t1)
    c11 = quad(t1, t1)
    return _finish_cov2d(c00, c01, c11, uv, W, H, visible, block, max_radius, rect_mode, opacity)
