"""Image-quality metrics: PSNR / SSIM / MS-SSIM / optional LPIPS.

Parity targets: `psnr`/`ssim` (`/root/reference/src/pointrix/model/loss.py`),
ms-ssim via pytorch_msssim and the vendored LPIPS
(`src/pointrix/model/lpips_pytorch/`, commented out of the reference's own
metrics, `base_model.py:148-152`). LPIPS requires pretrained VGG weights;
in this offline environment it is exposed but returns None when torchvision
weights are unavailable (callers should report it as n/a, not 0).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.ssim import ssim as _ssim
from ..train.losses import psnr as _psnr


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_psnr(jnp.asarray(pred), jnp.asarray(gt)))


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_ssim(jnp.asarray(pred), jnp.asarray(gt)))


def ms_ssim(pred: np.ndarray, gt: np.ndarray, levels: int = 3) -> float:
    """Multi-scale SSIM (downsample-by-2 pyramid, uniform level weights —
    a simplified version of pytorch_msssim's default)."""
    p = jnp.asarray(pred)
    g = jnp.asarray(gt)
    vals = []
    for _ in range(levels):
        vals.append(float(_ssim(p, g)))
        if min(p.shape[0], p.shape[1]) < 22:
            break
        p = (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
        g = (g[0::2, 0::2] + g[1::2, 0::2] + g[0::2, 1::2] + g[1::2, 1::2]) / 4.0
    return float(np.mean(vals))


def lpips(pred: np.ndarray, gt: np.ndarray) -> float:
    """LPIPS (VGG16 trunk + linear heads) — the pure-JAX implementation in
    `eval/lpips.py`, matching the reference's vendored `lpips_pytorch`
    architecture (`modules/networks.py:88-96`). Uses pretrained weights when
    an `.npz` is available ($SPLAT_LPIPS_WEIGHTS or weights/lpips_vgg.npz);
    otherwise a deterministic random trunk — a meaningful relative distance
    but NOT comparable to published numbers; check `lpips_is_pretrained()`
    before quoting it against the paper's 0.2283."""
    from . import lpips as _lpips

    return _lpips.lpips_distance(pred, gt)


def lpips_is_pretrained() -> bool:
    from . import lpips as _lpips

    return _lpips.lpips_is_pretrained()


def vgg_perceptual_loss(
    pred: np.ndarray, gt: np.ndarray, mask: Optional[np.ndarray] = None
) -> Optional[float]:
    """VGG16 perceptual loss — parity with `VGGLoss`
    (`/root/reference/src/criterion.py:307-355`; GAN-editing path only):
    masked L1 on the normalized inputs plus layer-weighted masked L1 on
    relu1_2/relu2_2/relu3_3/relu4_3 features (weights 1/16, 1/8, 1/4, 1,
    the reference's vgg16 branch). Returns None if pretrained weights are
    unavailable locally (same gating as `lpips`).

    pred/gt: [H, W, 3] in [0, 1]; mask: optional [H, W] weights.
    """
    import jax

    from . import lpips as _lpips

    model = _lpips.get_model()

    # ImageNet normalization (the reference's VGGLoss preprocessing)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xa = jnp.asarray((np.asarray(pred, np.float32) - mean) / std)[None]
    xb = jnp.asarray((np.asarray(gt, np.float32) - mean) / std)[None]

    def masked_l1(a, b, m):
        d = jnp.abs(a - b)
        if m is None:
            return jnp.mean(d)
        h, w = d.shape[1:3]
        m_r = jax.image.resize(m, (h, w), "bilinear")[None, :, :, None]
        return jnp.sum(d * m_r) / (jnp.sum(m_r) * d.shape[-1] + 1e-8)

    m = jnp.asarray(mask, jnp.float32) if mask is not None else None
    # relu1_2/relu2_2/relu3_3/relu4_3 taps, weights 1/16, 1/8, 1/4, 1
    # (`criterion.py:240-272`); relu5_3 unused by the reference's vgg16 path
    weights = [1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]
    fa = _lpips.vgg_raw_taps(model.params, xa)
    fb = _lpips.vgg_raw_taps(model.params, xb)
    loss = float(masked_l1(xa, xb, m))
    for wgt, a, b in zip(weights, fa[:4], fb[:4]):
        loss += wgt * float(masked_l1(a, b, m))
    return loss
