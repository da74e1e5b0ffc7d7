"""LPIPS (Learned Perceptual Image Patch Similarity) in pure JAX.

TPU-native reimplementation of the reference's vendored `lpips_pytorch`
(`/root/reference/src/pointrix/model/lpips_pytorch/modules/{lpips,networks,
utils}.py`): a VGG16 conv trunk tapped after relu1_2/relu2_2/relu3_3/
relu4_3/relu5_3, channel-unit-normalized activations, squared diffs passed
through per-stage 1x1 linear heads, spatially averaged and summed. The
input z-score constants (shift [-.030,-.088,-.188], scale [.458,.448,.450])
and tap points match `networks.py:40-63,88-96` exactly; inputs are in the
standard LPIPS [-1, 1] range.

Weights: the published metric needs torchvision's VGG16 ImageNet trunk +
the LPIPS v0.1 linear heads, neither of which can be downloaded in this
offline environment (the reference downloads both at runtime,
`modules/utils.py:12-21`). The loading order is:

  1. an `.npz` at `$SPLAT_LPIPS_WEIGHTS` or `weights/lpips_vgg.npz`
     under the package root (keys documented in `save_params`);
  2. a torch checkpoint convertible via `params_from_torch_state_dict`
     (works with a torchvision `vgg16().features` state_dict plus the
     LPIPS `vgg.pth` linear weights);
  3. `random_params(seed)` — a DETERMINISTIC He-initialized trunk.
     Random-feature LPIPS is a meaningful *relative* perceptual distance
     (Zhang et al. 2018 report random nets far above pixel metrics on
     perceptual tests) but is NOT comparable to published LPIPS numbers;
     `LpipsModel.pretrained` tells callers which one they got.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 `features` layout (torchvision indexing): conv channels per stage,
# 'M' = 2x2/2 maxpool. Taps are AFTER the relu closing each stage.
VGG16_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512)
TAP_CHANNELS: Tuple[int, ...] = (64, 128, 256, 512, 512)
# z-score constants (networks.py:40-44); applied to [-1, 1] inputs
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclass(frozen=True)
class LpipsModel:
    params: Dict[str, jnp.ndarray]
    pretrained: bool

    def __hash__(self):  # params identity is enough for jit cache keys
        return id(self.params)


def _conv_names() -> List[str]:
    names, i = [], 0
    for c in VGG16_CFG:
        if c != "M":
            names.append(f"conv{i}")
            i += 1
    return names


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic He-initialized VGG16 trunk + |N(0,1)|/sqrt(C) heads."""
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {}
    cin = 3
    i = 0
    for c in VGG16_CFG:
        if c == "M":
            continue
        fan_in = cin * 9
        params[f"conv{i}_w"] = (
            rng.randn(3, 3, cin, c) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros((c,), np.float32)
        cin = c
        i += 1
    for s, c in enumerate(TAP_CHANNELS):
        params[f"lin{s}_w"] = (
            np.abs(rng.randn(c)) / np.sqrt(c)
        ).astype(np.float32)
    return params


def load_torch_params(vgg_features_sd, lin_sd=None) -> Dict[str, np.ndarray]:
    """Convert torch weights to our layout (HWIO conv kernels).

    vgg_features_sd: state_dict of `torchvision.models.vgg16().features`
      (keys `{idx}.weight` [Cout, Cin, 3, 3] / `{idx}.bias`, with torch
      layer indices counting conv/relu/pool modules).
    lin_sd: LPIPS v0.1 linear-head state_dict (keys `{s}.1.weight`
      [1, C, 1, 1], the rename done by the reference's `get_state_dict`,
      `modules/utils.py:23-30`). None => uniform 1/C heads.
    """
    params: Dict[str, np.ndarray] = {}
    conv_i = 0
    torch_layer = 0
    for c in VGG16_CFG:
        if c == "M":
            torch_layer += 1
            continue
        w = np.asarray(vgg_features_sd[f"{torch_layer}.weight"], np.float32)
        b = np.asarray(vgg_features_sd[f"{torch_layer}.bias"], np.float32)
        if w.shape[0] != c or w.shape[2:] != (3, 3):
            raise ValueError(f"unexpected shape {w.shape} for conv{conv_i}")
        params[f"conv{conv_i}_w"] = np.transpose(w, (2, 3, 1, 0))  # OIHW->HWIO
        params[f"conv{conv_i}_b"] = b
        conv_i += 1
        torch_layer += 2  # conv + relu
    for s, c in enumerate(TAP_CHANNELS):
        if lin_sd is not None:
            lw = np.asarray(lin_sd[f"{s}.1.weight"], np.float32).reshape(c)
            params[f"lin{s}_w"] = np.maximum(lw, 0.0)  # LPIPS heads are >= 0
        else:
            params[f"lin{s}_w"] = np.full((c,), 1.0 / c, np.float32)
    return params


def save_params(path: str, params: Dict[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def _default_weight_paths() -> List[str]:
    cands = []
    env = os.environ.get("SPLAT_LPIPS_WEIGHTS")
    if env:
        cands.append(env)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands.append(os.path.join(pkg_root, "weights", "lpips_vgg.npz"))
    return cands


_MODEL: Optional[LpipsModel] = None


def get_model(seed: int = 0) -> LpipsModel:
    """Load pretrained weights if present, else the deterministic random
    trunk. Cached per process."""
    global _MODEL
    if _MODEL is not None:
        return _MODEL
    for path in _default_weight_paths():
        if os.path.exists(path):
            with np.load(path) as z:
                params = {k: jnp.asarray(z[k]) for k in z.files}
            _MODEL = LpipsModel(params=params, pretrained=True)
            return _MODEL
    params = {k: jnp.asarray(v) for k, v in random_params(seed).items()}
    _MODEL = LpipsModel(params=params, pretrained=False)
    return _MODEL


def _vgg_forward(params, x: jnp.ndarray, normalize: bool) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] -> the 5 stage-tap activations, channel-unit-
    normalized when `normalize` (`BaseNet.forward`, networks.py:55-63)."""
    taps = []
    conv_i = 0
    stage_last = {1, 3, 6, 9, 12}  # conv index closing each stage
    for c in VGG16_CFG:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{conv_i}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{conv_i}_b"]
        x = jax.nn.relu(x)
        if conv_i in stage_last:
            if normalize:
                norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
                x_t = x / (norm + 1e-10)  # normalize_activation, utils.py:6-8
            else:
                x_t = x
            taps.append(x_t)
        conv_i += 1
    return taps


def _vgg_taps(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    return _vgg_forward(params, x, normalize=True)


@jax.jit
def vgg_raw_taps(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Raw (un-normalized) stage activations on an already-preprocessed
    input — the `VGGLoss` feature extractor (`criterion.py:240-272`)."""
    return _vgg_forward(params, x, normalize=False)


@partial(jax.jit, static_argnames=())
def _lpips_pair(params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: [N, H, W, 3] in [-1, 1]. Returns [N] distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    xz = (x - shift) / scale
    yz = (y - shift) / scale
    fx = _vgg_taps(params, xz)
    fy = _vgg_taps(params, yz)
    total = 0.0
    for s, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2                               # [N, h, w, C]
        head = params[f"lin{s}_w"]                     # [C]
        total = total + jnp.mean(
            jnp.sum(d * head, axis=-1), axis=(1, 2)
        )                                              # lpips.py:34-36
    return total


def lpips_distance(
    pred: np.ndarray, gt: np.ndarray, model: Optional[LpipsModel] = None
) -> float:
    """LPIPS between two [H, W, 3] images in [0, 1] (converted to the
    [-1, 1] LPIPS convention internally)."""
    model = model or get_model()
    x = jnp.asarray(pred, jnp.float32)[None] * 2.0 - 1.0
    y = jnp.asarray(gt, jnp.float32)[None] * 2.0 - 1.0
    return float(_lpips_pair(model.params, x, y)[0])


def lpips_is_pretrained() -> bool:
    return get_model().pretrained
