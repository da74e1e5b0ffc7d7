"""Reference (oracle) alpha-compositing blender — slow, exact, differentiable.

Pure-jnp re-statement of the CUDA tile blender semantics
(`/root/reference/src/submodules/dptr/dptr/gs/src/alpha_blending_enhanced.cu:
16-134`), vectorized over pixels and scanned sequentially over depth-sorted
Gaussians. O(N * H * W) — use only for tests and tiny scenes; the production
path is the Pallas kernel in `rasterize_tpu.py`, which must match this
bit-for-bit on un-truncated scenes (same skip rules, same early-termination
rule, same first-K id capture).

Semantics reproduced exactly (per pixel, front-to-back over depth):
  * inclusion: Gaussian participates iff the pixel's 16x16 tile lies inside
    the Gaussian's EWA tile rect and radius > 0 (what binning would emit);
  * vec = uv - pixel;  power = -0.5(a vx^2 + c vy^2) - b vx vy;
  * skip if power > 0;  alpha = min(0.99, opacity * exp(power));
  * skip if alpha < 1/255;  terminate *without applying* when
    T * (1 - alpha) < 1e-4;
  * F += feature * alpha * T;  out = F + T_final * bg;
  * first `K_idx` applied Gaussian ids recorded per pixel (-1 padded), and
    ncontrib = number of applied Gaussians (deviation: the CUDA kernel
    reports the 1-based in-tile index of the last contributor, which counts
    skipped entries; we report the applied count, which is what the entropy
    loss actually consumes).

Gradient conventions also match the CUDA backward
(`alpha_blending_enhanced.cu:136-273`) except that autodiff applies the
exact subgradient of the 0.99 alpha clamp (the CUDA backward ignores the
clamp); keep test opacities below the clamp for gradient comparisons.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def splat_reference_with_bias(
    uv, conic, opacity, features, depth, radius, rect_min, rect_max,
    W, H, bg, opacity_bias, K_idx=0, block=16,
):
    """`alpha_blending_with_bias` parity: alpha = min(0.99, op*exp(power) +
    bias_g) per Gaussian (`/root/reference/src/submodules/dptr/dptr/gs/
    alpha_blending_with_bias.py`, unused by the production trainer —
    provided at oracle level for API completeness; differentiable via
    autodiff including d/d bias)."""
    return _splat_impl(
        uv, conic, opacity, features, depth, radius, rect_min, rect_max,
        W, H, bg, K_idx, block, opacity_bias,
    )


class SplatOutput(NamedTuple):
    image: jnp.ndarray      # [H, W, C] blended features (+ T * bg)
    final_T: jnp.ndarray    # [H, W] final transmittance
    ncontrib: jnp.ndarray   # [H, W] int32 applied-contribution count
    gs_idx: Optional[jnp.ndarray]  # [H, W, K] int32 first-K ids or None


@partial(jax.jit, static_argnames=("W", "H", "K_idx", "block"))
def splat_reference(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    W: int,
    H: int,
    bg: jnp.ndarray,
    K_idx: int = 0,
    block: int = 16,
) -> SplatOutput:
    """Blend all Gaussians into an [H, W, C] image, oracle path.

    Args:
      uv: [N,2] pixel positions.  conic: [N,3].  opacity: [N] activated.
      features: [N,C].  depth: [N] (sort key; 0 = culled).
      radius/rect_min/rect_max: EWA outputs controlling inclusion.
      bg: [C] background (broadcast against channels).
      K_idx: if > 0, record the first K applied ids per pixel.
    """
    return _splat_impl(
        uv, conic, opacity, features, depth, radius, rect_min, rect_max,
        W, H, bg, K_idx, block, None,
    )


@partial(jax.jit, static_argnames=("W", "H", "K_idx", "block"))
def _splat_impl(
    uv, conic, opacity, features, depth, radius, rect_min, rect_max,
    W: int, H: int, bg, K_idx: int, block, opacity_bias,
):
    N, C = features.shape

    order = jnp.argsort(depth, stable=True)  # ties resolved by gaussian id,
    # matching the stable (tile, depth) sort in binning.

    bx, by = block if isinstance(block, tuple) else (block, block)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)  # [P,2] (x,y)
    ptx = px[:, 0] // bx
    pty = px[:, 1] // by
    pxf = px.astype(jnp.float32)
    P = pxf.shape[0]

    def body(carry, gi):
        T, F, done, cnt, gs_idx = carry
        uv_g = uv[gi]
        con = conic[gi]
        op = opacity[gi]
        f = features[gi]
        inc = (
            (radius[gi] > 0)
            & (ptx >= rect_min[gi, 0])
            & (ptx < rect_max[gi, 0])
            & (pty >= rect_min[gi, 1])
            & (pty < rect_max[gi, 1])
        )
        vec = uv_g[None, :] - pxf  # [P,2]
        power = -0.5 * (con[0] * vec[:, 0] ** 2 + con[2] * vec[:, 1] ** 2) - con[1] * vec[:, 0] * vec[:, 1]
        raw = op * jnp.exp(power)
        if opacity_bias is not None:
            raw = raw + opacity_bias[gi]
        alpha = jnp.minimum(ALPHA_MAX, raw)
        valid = inc & (power <= 0) & (alpha >= ALPHA_MIN) & (~done)
        next_T = T * (1.0 - alpha)
        terminate = valid & (next_T < T_EPS)
        applied = valid & (next_T >= T_EPS)

        w = jnp.where(applied, alpha * T, 0.0)
        F = F + w[:, None] * f[None, :]
        T = jnp.where(applied, next_T, T)
        done = done | terminate
        if gs_idx is not None:
            K = gs_idx.shape[-1]
            slot = jnp.clip(cnt, 0, K - 1)
            write = applied & (cnt < K)
            gs_idx = jnp.where(
                write[:, None] & (jnp.arange(K)[None, :] == slot[:, None]),
                gi,
                gs_idx,
            )
        cnt = cnt + applied.astype(jnp.int32)
        return (T, F, done, cnt, gs_idx), None

    T0 = jnp.ones((P,), jnp.float32)
    F0 = jnp.zeros((P, C), jnp.float32)
    done0 = jnp.zeros((P,), bool)
    cnt0 = jnp.zeros((P,), jnp.int32)
    gs0 = jnp.full((P, K_idx), -1, jnp.int32) if K_idx > 0 else None

    (T, F, done, cnt, gs_idx), _ = jax.lax.scan(body, (T0, F0, done0, cnt0, gs0), order)

    bg = jnp.asarray(bg, jnp.float32)
    img = (F + T[:, None] * bg[None, :]).reshape(H, W, C)
    return SplatOutput(
        image=img,
        final_T=T.reshape(H, W),
        ncontrib=cnt.reshape(H, W),
        gs_idx=gs_idx.reshape(H, W, K_idx) if gs_idx is not None else None,
    )
