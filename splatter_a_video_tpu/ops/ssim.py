"""SSIM / D-SSIM (windowed Gaussian blur, MXU-matmul form).

Parity target: the reference's `ssim` / `_ssim`
(`/root/reference/src/pointrix/model/loss.py:57-113`): 11x11 Gaussian window
(sigma 1.5), same-padding (zero-pad) depthwise conv, C1=0.01^2, C2=0.03^2.

TPU note: an 11x11 depthwise conv over a 3-channel image is a pathological
MXU shape (3 of 128 lanes busy) — profiled at ~4 ms per conv at 854x480, and
SSIM fwd+bwd needs 8 of them (~32 ms/train-step). The window is separable
(outer(g, g)), and a zero-padded 1-D conv along an image axis is exactly a
banded-matrix multiply, so we express the blur as two dense matmuls
(B_H[H,H] @ img @ B_W[W,W]^T). Both matmuls and their transposes (the VJP)
ride the MXU; the whole SSIM stack drops to ~1 ms.

Convention: images are channel-last [..., H, W, C] (this framework's native
layout; the reference uses NCHW torch tensors).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded blur matrix: row i holds the 1-D Gaussian centered at i,
    truncated at the borders (== zero-padded same conv)."""
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    b = np.zeros((n, n), np.float32)
    half = window_size // 2
    for off, w in zip(range(-half, half + 1), g):
        b += np.diag(np.full(n - abs(off), w, np.float32), k=off)
    return b


def _blur(img: jnp.ndarray, window_size: int, sigma: float = 1.5) -> jnp.ndarray:
    """[N, H, W, C] separable same-padded Gaussian blur via two matmuls.

    Precision.HIGHEST is load-bearing: at the MXU's default bf16 precision
    the blur carries ~0.2% error, and SSIM's variance terms
    (blur(img^2) - mu^2) are catastrophic cancellations of O(1) values down
    to O(1e-3) — bf16 noise swamps them and the SSIM *gradient* becomes
    garbage (training PSNR regressed 30 -> 18 before this was pinned).
    HIGHEST (bf16x6 passes ~ f32) restores <1e-6 error at negligible cost.
    """
    _, H, W, _ = img.shape
    bh = jnp.asarray(_band_matrix(H, window_size, sigma))
    bw = jnp.asarray(_band_matrix(W, window_size, sigma))
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("hH,nHwc->nhwc", bh, img, precision=hp)
    return jnp.einsum("wW,nhWc->nhwc", bw, out, precision=hp)


def _depthwise_conv(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] same-padded depthwise conv with a [kh,kw] kernel (kept as the
    cross-check path for non-separable kernels; unused on the hot path)."""
    C = img.shape[-1]
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, C))
    return jax.lax.conv_general_dilated(
        img,
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """Structural similarity of channel-last images.

    Args:
      img1, img2: [H, W, C] or [N, H, W, C], values nominally in [0, 1].
    Returns: scalar mean SSIM (or per-batch [N] if size_average=False).
    """
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    blur = partial(_blur, window_size=window_size)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    C1 = 0.01**2
    C2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def d_ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM, the structural dissimilarity loss term."""
    return 1.0 - ssim(img1, img2)
