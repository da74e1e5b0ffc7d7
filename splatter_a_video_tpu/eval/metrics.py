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


_lpips_model = None
_lpips_failed = False


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS (VGG) if pretrained weights are available locally; else None."""
    global _lpips_model, _lpips_failed
    if _lpips_failed:
        return None
    if _lpips_model is None:
        try:
            import torch
            import torchvision

            vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
            _lpips_model = vgg
        except Exception:
            _lpips_failed = True
            return None
    import torch

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return (t - mean) / std

    layers = {3, 8, 15, 22, 29}
    with torch.no_grad():
        xa, xb = prep(pred), prep(gt)
        dist = 0.0
        for i, layer in enumerate(_lpips_model):
            xa, xb = layer(xa), layer(xb)
            if i in layers:
                fa = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                fb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist += float(((fa - fb) ** 2).mean())
    return dist


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
    global _lpips_model, _lpips_failed
    if _lpips_failed:
        return None
    if _lpips_model is None:
        try:
            import torchvision

            _lpips_model = (
                torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
            )
        except Exception:
            _lpips_failed = True
            return None
    import torch

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return (t - mean) / std

    def masked_l1(a, b, m):
        d = (a - b).abs()
        if m is None:
            return d.mean()
        m = torch.nn.functional.interpolate(
            m, size=d.shape[-2:], mode="bilinear", align_corners=True
        )
        return (d * m).sum() / (m.sum() * d.shape[1] + 1e-8)

    # Vgg16 slices end AFTER relu1_2/relu2_2/relu3_3/relu4_3
    # (`criterion.py:240-272`): feature indices 3, 8, 15, 22
    taps = {3: 0, 8: 1, 15: 2, 22: 3}
    weights = [1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]
    with torch.no_grad():
        xa, xb = prep(pred), prep(gt)
        m = (
            torch.from_numpy(np.asarray(mask, np.float32))[None, None]
            if mask is not None
            else None
        )
        loss = float(masked_l1(xa, xb, m))
        for i, layer in enumerate(_lpips_model):
            xa, xb = layer(xa), layer(xb)
            if i in taps:
                loss += weights[taps[i]] * float(masked_l1(xa, xb, m))
            if i >= 22:
                break
    return loss
