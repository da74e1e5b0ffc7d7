"""Depth-Anything (V1/V2) relative-depth estimation in pure JAX.

The reference's monocular-depth preprocessing stage runs the HF
`depth-estimation` pipeline over `Depth-Anything-V2-Large-hf`
(`/root/reference/src/data_preparation/compute_depth.py:20-63`). This
module reimplements that inference TPU-natively: DINOv2 trunk
(`nets/vit.py`) -> DPT neck (reassemble + feature fusion) -> depth head,
matching `transformers.models.depth_anything.modeling_depth_anything`
layer for layer so converted checkpoints reproduce the torch outputs.

TPU idioms: every `F.interpolate` becomes a dense-matmul resize
(`nets/interp.py`); the stride==kernel transposed convs in the reassemble
stage are einsum + reshape (subpixel scatter); convs run channels-last
through `lax.conv_general_dilated`.

Weights: converted `.npz` at `$SPLAT_DEPTH_ANYTHING_WEIGHTS` or
`weights/depth_anything.npz` (see `save_params` / `params_from_torch`);
absent weights -> `get_model()` returns None and the preprocessing stage
stays gated, as in round 1.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import vit as _vit
from .interp import interp2d

# ImageNet normalization used by the DPT image processor
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class DepthAnythingConfig:
    """Defaults = the HF small config (`configuration_depth_anything.py`)."""

    backbone: _vit.ViTConfig = field(default_factory=_vit.ViTConfig)
    out_indices: Tuple[int, ...] = (9, 10, 11, 12)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    neck_hidden_sizes: Tuple[int, ...] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    patch_size: int = 14


def _conv(x, w, b=None, stride: int = 1):
    """NHWC conv, SAME-style padding matching torch padding=k//2."""
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def _deconv_factor(x, w, b, factor: int):
    """ConvTranspose2d with kernel==stride==factor: each input pixel emits
    a factor x factor block — an einsum + interleave reshape, no scatter."""
    B, H, W, _ = x.shape
    # w: [kH, kW, out, in] (converted layout); y[b,h,dy,w,dx,o]
    y = jnp.einsum("bhwc,pqoc->bhpwqo", x, w)
    y = y.reshape(B, H * factor, W * factor, w.shape[2])
    return y + b


def random_params(cfg: DepthAnythingConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    C = cfg.backbone.hidden_size
    F = cfg.fusion_hidden_size

    def conv(k, cin, cout, bias=True, tag=None):
        w = (rng.randn(k, k, cin, cout) / math.sqrt(k * k * cin)).astype(np.float32)
        return (w, np.zeros(cout, np.float32)) if bias else (w,)

    p = dict(_vit.random_params(cfg.backbone, seed))
    for i, (ch, f) in enumerate(zip(cfg.neck_hidden_sizes, cfg.reassemble_factors)):
        w, b = conv(1, C, ch)
        p[f"re{i}.proj_w"], p[f"re{i}.proj_b"] = w, b
        if f > 1:
            k = int(f)
            p[f"re{i}.resize_w"] = (
                rng.randn(k, k, ch, ch) / math.sqrt(k * k * ch)
            ).astype(np.float32)
            p[f"re{i}.resize_b"] = np.zeros(ch, np.float32)
        elif f < 1:
            w, b = conv(3, ch, ch)
            p[f"re{i}.resize_w"], p[f"re{i}.resize_b"] = w, b
        (p[f"neckconv{i}_w"],) = conv(3, ch, F, bias=False)
    for i in range(len(cfg.neck_hidden_sizes)):
        w, b = conv(1, F, F)
        p[f"fu{i}.proj_w"], p[f"fu{i}.proj_b"] = w, b
        for r in (1, 2):
            for c in (1, 2):
                w, b = conv(3, F, F)
                p[f"fu{i}.res{r}.conv{c}_w"] = w
                p[f"fu{i}.res{r}.conv{c}_b"] = b
    w, b = conv(3, F, F // 2)
    p["head.conv1_w"], p["head.conv1_b"] = w, b
    w, b = conv(3, F // 2, cfg.head_hidden_size)
    p["head.conv2_w"], p["head.conv2_b"] = w, b
    w, b = conv(1, cfg.head_hidden_size, 1)
    p["head.conv3_w"], p["head.conv3_b"] = w, b
    return p


def params_from_torch(sd, strict: bool = False) -> Dict[str, np.ndarray]:
    """Convert a `DepthAnythingForDepthEstimation` torch state_dict.
    strict=True errors on any unconsumed key (upstream-rename detector);
    DINOv2's `mask_token` is the one key legitimately unused at
    inference."""
    from .convert_util import RecordingStateDict, check_consumed

    orig_sd = sd
    sd = RecordingStateDict(sd)

    def g(name):
        v = sd[name]
        return np.asarray(getattr(v, "numpy", lambda: v)()).astype(np.float32)

    def cw(name):  # conv OIHW -> HWIO
        return g(name).transpose(2, 3, 1, 0)

    p = dict(_vit.params_from_torch(sd, prefix="backbone."))
    i = 0
    while f"neck.reassemble_stage.layers.{i}.projection.weight" in sd:
        base = f"neck.reassemble_stage.layers.{i}."
        p[f"re{i}.proj_w"] = cw(base + "projection.weight")
        p[f"re{i}.proj_b"] = g(base + "projection.bias")
        if base + "resize.weight" in sd:
            # one permutation serves both: ConvTranspose2d [in,out,k,k] ->
            # [k,k,out,in] (deconv layout) and Conv2d [out,in,k,k] ->
            # [k,k,in,out] (HWIO)
            p[f"re{i}.resize_w"] = g(base + "resize.weight").transpose(2, 3, 1, 0)
            p[f"re{i}.resize_b"] = g(base + "resize.bias")
        p[f"neckconv{i}_w"] = cw(f"neck.convs.{i}.weight")
        i += 1
    j = 0
    while f"neck.fusion_stage.layers.{j}.projection.weight" in sd:
        base = f"neck.fusion_stage.layers.{j}."
        p[f"fu{j}.proj_w"] = cw(base + "projection.weight")
        p[f"fu{j}.proj_b"] = g(base + "projection.bias")
        for r in (1, 2):
            for c in (1, 2):
                p[f"fu{j}.res{r}.conv{c}_w"] = cw(
                    base + f"residual_layer{r}.convolution{c}.weight"
                )
                p[f"fu{j}.res{r}.conv{c}_b"] = g(
                    base + f"residual_layer{r}.convolution{c}.bias"
                )
        j += 1
    for name in ("conv1", "conv2", "conv3"):
        p[f"head.{name}_w"] = cw(f"head.{name}.weight")
        p[f"head.{name}_b"] = g(f"head.{name}.bias")
    if strict:
        check_consumed(
            orig_sd, sd.used, ignore=(r"embeddings\.mask_token$",)
        )
    return p


def _residual_unit(p, pre, x):
    h = jax.nn.relu(x)
    h = _conv(h, p[pre + ".conv1_w"], p[pre + ".conv1_b"])
    h = jax.nn.relu(h)
    h = _conv(h, p[pre + ".conv2_w"], p[pre + ".conv2_b"])
    return h + x


def forward(
    cfg: DepthAnythingConfig, p: Dict[str, jnp.ndarray], images: jnp.ndarray
) -> jnp.ndarray:
    """[B, H, W, 3] normalized images (H, W multiples of patch) ->
    [B, H, W] relative inverse depth (disparity)."""
    B, H, W, _ = images.shape
    P = cfg.patch_size
    ph, pw = H // P, W // P

    taps = _vit.forward(cfg.backbone, p, images, cfg.out_indices)

    # reassemble (DepthAnythingReassembleStage): drop cls, reshape, project,
    # resize by the per-stage factor
    feats: List[jnp.ndarray] = []
    for i, (t, f) in enumerate(zip(taps, cfg.reassemble_factors)):
        x = t[:, 1:].reshape(B, ph, pw, -1)
        x = _conv(x, p[f"re{i}.proj_w"], p[f"re{i}.proj_b"])
        if f > 1:
            x = _deconv_factor(x, p[f"re{i}.resize_w"], p[f"re{i}.resize_b"], int(f))
        elif f < 1:
            x = _conv(x, p[f"re{i}.resize_w"], p[f"re{i}.resize_b"],
                      stride=int(round(1.0 / f)))
        x = _conv(x, p[f"neckconv{i}_w"])
        feats.append(x)

    # fusion (DepthAnythingFeatureFusionStage): deepest first; each step
    # upsamples to the next-shallower grid (align_corners=True)
    rev = feats[::-1]
    fused = None
    for idx, x in enumerate(rev):
        layer = f"fu{idx}"
        if fused is None:
            h = x
        else:
            if x.shape[1:3] != fused.shape[1:3]:
                x = interp2d(x, fused.shape[1], fused.shape[2],
                             "bilinear", align_corners=False)
            h = fused + _residual_unit(p, layer + ".res1", x)
        h = _residual_unit(p, layer + ".res2", h)
        if idx != len(rev) - 1:
            size = rev[idx + 1].shape[1:3]
        else:
            size = (h.shape[1] * 2, h.shape[2] * 2)
        h = interp2d(h, size[0], size[1], "bilinear", align_corners=True)
        fused = _conv(h, p[f"fu{idx}.proj_w"], p[f"fu{idx}.proj_b"])

    # head (DepthAnythingDepthEstimationHead)
    h = _conv(fused, p["head.conv1_w"], p["head.conv1_b"])
    h = interp2d(h, ph * P, pw * P, "bilinear", align_corners=True)
    h = _conv(h, p["head.conv2_w"], p["head.conv2_b"])
    h = jax.nn.relu(h)
    h = _conv(h, p["head.conv3_w"], p["head.conv3_b"])
    h = jax.nn.relu(h)
    return h[..., 0]


# ---------------------------------------------------------------------------
# Inference driver (pipeline parity: compute_depth.py:46-63)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DepthAnythingModel:
    cfg: DepthAnythingConfig
    params: Dict[str, jnp.ndarray]
    pretrained: bool

    def __hash__(self):
        return id(self.params)


def _fit_size(h: int, w: int, target: int = 518, multiple: int = 14) -> Tuple[int, int]:
    """DPT processor sizing (`image_processing_dpt.get_resize_output_image_size`
    with keep_aspect_ratio=True): take the scale closer to 1 ("scale as
    little as possible"), round both sides to a multiple of the patch."""
    scale_h, scale_w = target / h, target / w
    scale = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h

    def rnd(v):
        return max(multiple, int(round(v / multiple)) * multiple)

    return rnd(h * scale), rnd(w * scale)


def prepare_image(img: np.ndarray, target: int = 518) -> jnp.ndarray:
    """[H, W, 3] uint8/float [0,1] -> normalized [1, H', W', 3]."""
    x = jnp.asarray(img, jnp.float32)
    if img.dtype == np.uint8:
        x = x / 255.0
    nh, nw = _fit_size(x.shape[0], x.shape[1], target)
    x = interp2d(x[None], nh, nw, "bicubic", align_corners=False)
    x = jnp.clip(x, 0.0, 1.0)
    return (x - _MEAN) / _STD


@partial(jax.jit, static_argnames=("model", "out_h", "out_w"))
def _infer(model: DepthAnythingModel, x: jnp.ndarray, out_h: int, out_w: int):
    d = forward(model.cfg, model.params, x)
    # pipeline postprocess: bicubic resize back to the source resolution
    # (compute_depth.py:53-56), align_corners=False
    return interp2d(d[..., None], out_h, out_w, "bicubic", False)[0, ..., 0]


def infer_disparity(model: DepthAnythingModel, img: np.ndarray) -> np.ndarray:
    """Relative disparity at the input resolution — `get_depth_anything_disp`
    (`compute_depth.py:46-63`) without the uint16 quantization."""
    x = prepare_image(img)
    return np.asarray(_infer(model, x, img.shape[0], img.shape[1]))


def save_params(
    path: str,
    params: Dict[str, np.ndarray],
    num_heads: int = 6,
    out_indices: Sequence[int] = (9, 10, 11, 12),
) -> None:
    """Save a converted checkpoint. Everything else about the architecture
    is inferable from parameter shapes; `num_heads` and `out_indices` are
    stored as metadata arrays."""
    np.savez(
        path,
        _meta_num_heads=np.asarray(num_heads),
        _meta_out_indices=np.asarray(list(out_indices)),
        **{k: np.asarray(v) for k, v in params.items()},
    )


def config_from_params(
    params: Dict[str, np.ndarray],
    num_heads: int,
    out_indices: Sequence[int],
) -> DepthAnythingConfig:
    """Reconstruct the architecture from parameter shapes (supports the
    small/base/large checkpoint family)."""
    hidden = int(np.asarray(params["cls_token"]).shape[-1])
    patch = int(np.asarray(params["patch_w"]).shape[0])
    n_layers = 0
    while f"l{n_layers}.ln1_w" in params:
        n_layers += 1
    n_pos = int(np.asarray(params["pos_embed"]).shape[1]) - 1
    image_size = int(round(math.sqrt(n_pos))) * patch
    mlp_ratio = int(np.asarray(params["l0.fc1_w"]).shape[1]) // hidden
    neck_sizes = []
    factors = []
    i = 0
    while f"re{i}.proj_w" in params:
        neck_sizes.append(int(np.asarray(params[f"re{i}.proj_w"]).shape[-1]))
        if f"re{i}.resize_w" not in params:
            factors.append(1)
        else:
            k = int(np.asarray(params[f"re{i}.resize_w"]).shape[0])
            factors.append(0.5 if k == 3 else k)  # k=3 conv downsample; else deconv
        i += 1
    return DepthAnythingConfig(
        backbone=_vit.ViTConfig(
            hidden_size=hidden, num_layers=n_layers, num_heads=num_heads,
            mlp_ratio=mlp_ratio, patch_size=patch, image_size=image_size,
        ),
        out_indices=tuple(int(v) for v in out_indices),
        reassemble_factors=tuple(factors),
        neck_hidden_sizes=tuple(neck_sizes),
        fusion_hidden_size=int(np.asarray(params["fu0.proj_w"]).shape[-1]),
        head_hidden_size=int(np.asarray(params["head.conv2_w"]).shape[-1]),
        patch_size=patch,
    )


def _default_weight_paths() -> List[str]:
    paths = []
    env = os.environ.get("SPLAT_DEPTH_ANYTHING_WEIGHTS")
    if env:
        paths.append(env)
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths.append(os.path.join(pkg, "weights", "depth_anything.npz"))
    return paths


def get_model(cfg: Optional[DepthAnythingConfig] = None) -> Optional[DepthAnythingModel]:
    """Load a converted checkpoint if present; None otherwise (the
    preprocessing stage then stays gated — weights are not downloadable
    offline). The architecture is inferred from the checkpoint unless an
    explicit cfg is given."""
    for path in _default_weight_paths():
        if os.path.exists(path):
            raw = dict(np.load(path).items())
            num_heads = int(raw.pop("_meta_num_heads", 6))
            out_indices = raw.pop("_meta_out_indices", np.array([9, 10, 11, 12]))
            if cfg is None:
                cfg = config_from_params(raw, num_heads, out_indices.tolist())
            params = {k: jnp.asarray(v) for k, v in raw.items()}
            return DepthAnythingModel(cfg=cfg, params=params, pretrained=True)
    return None
