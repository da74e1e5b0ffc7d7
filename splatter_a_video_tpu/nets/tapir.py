"""TAPIR / BootsTAPIR point tracking in pure JAX (inference path).

The reference's dense-tracking preprocessing runs a vendored torch port of
DeepMind's TAPIR (`/root/reference/src/data_preparation/tapnet_torch/`,
driver `compute_tracks_torch.py:101-166`). This module reimplements the
model TPU-natively: ResNet-v2 (instance-norm) feature extractor, cost-
volume initialization with soft-argmax, and the PIPs depthwise-conv MLP-
mixer refinement — matching the torch port layer for layer so converted
checkpoints reproduce its outputs (parity-tested with random weights in
`tests/test_tapir.py`).

TPU idioms: all sampling (`grid_sample` equivalents) is explicit gather +
lerp at pixel coordinates (the torch normalized-grid dance reduces to
`coord - 0.5` with border/zeros handling); frame features run under
`lax.map` chunks to bound memory like the torch `feature_extractor_chunk_
size`; everything jits with static video/query shapes.

Deviation (documented): the torch port normalizes BOTH grid-sample axes by
the feature height (`utils.map_coordinates_2d: y = 2*(y/h)-1`), which is
only correct for square grids; we normalize per-axis (as the original JAX
tapnet does). Identical on the production path — TAPIR always runs at
square resolutions (256x256 driver, square refinement levels).

Weights: converted `.npz` at `$SPLAT_TAPIR_WEIGHTS` or
`weights/tapir.npz` (`scripts/convert_tapir.py`); absent -> `get_model()`
returns None and `data/preprocess.compute_tracks` stays gated.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interp import interp2d

_EPS = 1e-12


@dataclass(frozen=True)
class TapirConfig:
    num_pips_iter: int = 4
    pyramid_level: int = 1
    softmax_temperature: float = 20.0
    initial_resolution: Tuple[int, int] = (256, 256)
    highres_dim: int = 128
    lowres_dim: int = 256
    blocks_per_group: Tuple[int, ...] = (2, 2, 2, 2)
    channels_per_group: Tuple[int, ...] = (64, 128, 256, 256)
    strides: Tuple[int, ...] = (1, 2, 2, 1)
    mixer_hidden_dim: int = 512
    num_mixer_blocks: int = 12
    extra_convs: int = 5            # ExtraConvs layers (0 = disabled)
    frame_chunk: int = 8            # feature-extractor lax.map chunk

    @property
    def feat_dim(self) -> int:
        return self.highres_dim + self.lowres_dim  # 384

    @property
    def mixer_out_dim(self) -> int:
        return 4 + self.feat_dim                    # 388

    @property
    def mixer_in_dim(self) -> int:
        # pos(2) + occ(1) + expd(1) + feats(384) + 49 correlations per level
        return self.mixer_out_dim + (self.pyramid_level + 2) * 49


# ---------------------------------------------------------------------------
# Parameter construction / conversion
# ---------------------------------------------------------------------------


def random_params(cfg: TapirConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)

    def conv(k, cin, cout):
        return (rng.randn(k, k, cin, cout) / math.sqrt(k * k * cin)).astype(np.float32)

    def lin(cin, cout):
        return (rng.randn(cin, cout) / math.sqrt(cin)).astype(np.float32)

    def zeros(c):
        return np.zeros(c, np.float32)

    def ones(c):
        return np.ones(c, np.float32)

    p: Dict[str, np.ndarray] = {"initial_conv_w": conv(7, 3, cfg.channels_per_group[0])}
    cin = cfg.channels_per_group[0]
    for g, (nb, cout) in enumerate(zip(cfg.blocks_per_group, cfg.channels_per_group)):
        for b in range(nb):
            pre = f"r{g}.{b}."
            c_in_b = cin if b == 0 else cout
            p[pre + "bn0_w"], p[pre + "bn0_b"] = ones(c_in_b), zeros(c_in_b)
            p[pre + "conv0_w"] = conv(3, c_in_b, cout)
            p[pre + "bn1_w"], p[pre + "bn1_b"] = ones(cout), zeros(cout)
            p[pre + "conv1_w"] = conv(3, cout, cout)
            if b == 0:
                p[pre + "proj_w"] = conv(1, c_in_b, cout)
        cin = cout
    C = cfg.lowres_dim
    for i in range(cfg.extra_convs):
        pre = f"ec{i}."
        p[pre + "ln_w"], p[pre + "ln_b"] = ones(C), zeros(C)
        p[pre + "conv0_w"], p[pre + "conv0_b"] = conv(3, C, C * 4), zeros(C * 4)
        p[pre + "conv1_w"], p[pre + "conv1_b"] = conv(3, C * 4, C), zeros(C)
    p.update(
        {
            "cv.hid1_w": conv(3, 1, 16), "cv.hid1_b": zeros(16),
            "cv.hid2_w": conv(3, 16, 1), "cv.hid2_b": zeros(1),
            "cv.hid3_w": conv(3, 16, 32), "cv.hid3_b": zeros(32),
            "cv.hid4_w": lin(32, 16), "cv.hid4_b": zeros(16),
            "cv.occ_w": lin(16, 2), "cv.occ_b": zeros(2),
        }
    )
    H = cfg.mixer_hidden_dim
    p["mx.in_w"], p["mx.in_b"] = lin(cfg.mixer_in_dim, H), zeros(H)
    for i in range(cfg.num_mixer_blocks):
        pre = f"mx{i}."
        p[pre + "ln_w"] = ones(H)
        # depthwise conv1d kernels, stored [k, 1, out] for feature groups
        p[pre + "up1_w"] = (rng.randn(3, 1, H * 4) / math.sqrt(3)).astype(np.float32)
        p[pre + "up1_b"] = zeros(H * 4)
        p[pre + "up2_w"] = (rng.randn(3, 1, H * 4) / math.sqrt(3)).astype(np.float32)
        p[pre + "up2_b"] = zeros(H * 4)
        p[pre + "ln1_w"] = ones(H)
        p[pre + "mlp_up_w"], p[pre + "mlp_up_b"] = lin(H, H * 4), zeros(H * 4)
        p[pre + "mlp_down_w"], p[pre + "mlp_down_b"] = lin(H * 4, H), zeros(H)
    p["mx.ln_w"] = ones(H)
    p["mx.out_w"], p["mx.out_b"] = lin(H, cfg.mixer_out_dim), zeros(cfg.mixer_out_dim)
    return p


def params_from_torch(sd, strict: bool = False) -> Dict[str, np.ndarray]:
    """Convert the torch TAPIR state_dict (`tapnet_torch/tapir_model.py`
    naming: resnet_torch / torch_cost_volume_track_mods / torch_pips_mixer /
    extra_convs). strict=True additionally errors on any key the converter
    did not consume — catches upstream renames of the block-pattern keys
    that the `while ... in sd` discovery loops would silently skip."""
    from .convert_util import RecordingStateDict, check_consumed

    orig_sd = sd
    sd = RecordingStateDict(sd)

    def g(name):
        v = sd[name]
        return np.asarray(getattr(v, "numpy", lambda: v)()).astype(np.float32)

    def cw(name):  # conv OIHW -> HWIO
        return g(name).transpose(2, 3, 1, 0)

    p: Dict[str, np.ndarray] = {"initial_conv_w": cw("resnet_torch.initial_conv.weight")}
    gi = 0
    while f"resnet_torch.block_groups.{gi}.blocks.0.conv_0.weight" in sd:
        bi = 0
        while f"resnet_torch.block_groups.{gi}.blocks.{bi}.conv_0.weight" in sd:
            src = f"resnet_torch.block_groups.{gi}.blocks.{bi}."
            dst = f"r{gi}.{bi}."
            p[dst + "bn0_w"] = g(src + "bn_0.weight")
            p[dst + "bn0_b"] = g(src + "bn_0.bias")
            p[dst + "conv0_w"] = cw(src + "conv_0.weight")
            p[dst + "bn1_w"] = g(src + "bn_1.weight")
            p[dst + "bn1_b"] = g(src + "bn_1.bias")
            p[dst + "conv1_w"] = cw(src + "conv_1.weight")
            if src + "proj_conv.weight" in sd:
                p[dst + "proj_w"] = cw(src + "proj_conv.weight")
            bi += 1
        gi += 1
    i = 0
    while f"extra_convs.blocks.{i}.conv.weight" in sd:
        src = f"extra_convs.blocks.{i}."
        p[f"ec{i}.ln_w"] = g(src + "layer_norm.weight")
        p[f"ec{i}.ln_b"] = g(src + "layer_norm.bias")
        p[f"ec{i}.conv0_w"] = cw(src + "conv.weight")
        p[f"ec{i}.conv0_b"] = g(src + "conv.bias")
        p[f"ec{i}.conv1_w"] = cw(src + "conv_1.weight")
        p[f"ec{i}.conv1_b"] = g(src + "conv_1.bias")
        i += 1
    cv = "torch_cost_volume_track_mods."
    p.update(
        {
            "cv.hid1_w": cw(cv + "hid1.weight"), "cv.hid1_b": g(cv + "hid1.bias"),
            "cv.hid2_w": cw(cv + "hid2.weight"), "cv.hid2_b": g(cv + "hid2.bias"),
            "cv.hid3_w": cw(cv + "hid3.weight"), "cv.hid3_b": g(cv + "hid3.bias"),
            "cv.hid4_w": g(cv + "hid4.weight").T, "cv.hid4_b": g(cv + "hid4.bias"),
            "cv.occ_w": g(cv + "occ_out.weight").T, "cv.occ_b": g(cv + "occ_out.bias"),
        }
    )
    mx = "torch_pips_mixer."
    p["mx.in_w"], p["mx.in_b"] = g(mx + "linear.weight").T, g(mx + "linear.bias")
    p["mx.ln_w"] = g(mx + "layer_norm.weight")
    p["mx.out_w"], p["mx.out_b"] = g(mx + "linear_1.weight").T, g(mx + "linear_1.bias")
    i = 0
    while mx + f"blocks.{i}.mlp1_up.weight" in sd:
        src = mx + f"blocks.{i}."
        dst = f"mx{i}."
        p[dst + "ln_w"] = g(src + "layer_norm.weight")
        # torch depthwise Conv1d weight [out, 1, k] -> [k, 1, out]
        p[dst + "up1_w"] = g(src + "mlp1_up.weight").transpose(2, 1, 0)
        p[dst + "up1_b"] = g(src + "mlp1_up.bias")
        p[dst + "up2_w"] = g(src + "mlp1_up_1.weight").transpose(2, 1, 0)
        p[dst + "up2_b"] = g(src + "mlp1_up_1.bias")
        p[dst + "ln1_w"] = g(src + "layer_norm_1.weight")
        p[dst + "mlp_up_w"] = g(src + "conv_channels_mixer.mlp2_up.weight").T
        p[dst + "mlp_up_b"] = g(src + "conv_channels_mixer.mlp2_up.bias")
        p[dst + "mlp_down_w"] = g(src + "conv_channels_mixer.mlp2_down.weight").T
        p[dst + "mlp_down_b"] = g(src + "conv_channels_mixer.mlp2_down.bias")
        i += 1
    if strict:
        check_consumed(orig_sd, sd.used)
    return p


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _conv(x, w, b=None, stride=1, padding=((1, 1), (1, 1))):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def _instance_norm(x, w, b, eps=1e-5):
    """Per-sample per-channel spatial normalization (affine InstanceNorm2d)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _layernorm(x, w, b=None, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * w
    return y if b is None else y + b


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _sample_frames_bilinear(
    feats: jnp.ndarray, xy: jnp.ndarray, border: bool
) -> jnp.ndarray:
    """Bilinear sample per-frame feature maps at pixel-center coords.

    Args:
      feats: [T, H, W, C]; xy: [..., T, S, 2] as (y, x) in grid units (the
        torch `grid_sample(align_corners=False)` convention -> sample at
        coord - 0.5 pixels).
      border: clamp out-of-range (border padding) vs zero contribution.
    Returns: [..., T, S, C].
    """
    T, H, W, C = feats.shape
    y = xy[..., 0] - 0.5
    x = xy[..., 1] - 0.5
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0

    def corner(dy, dx):
        yi = y0.astype(jnp.int32) + dy
        xi = x0.astype(jnp.int32) + dx
        if border:
            valid = jnp.ones(yi.shape, feats.dtype)
        else:
            valid = (
                (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            ).astype(feats.dtype)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        t = jnp.arange(T).reshape((1,) * (yi.ndim - 2) + (T, 1))
        t = jnp.broadcast_to(t, yi.shape)
        vals = feats[t, yi, xi]                       # [..., T, S, C]
        wy = (1 - fy) if dy == 0 else fy
        wx = (1 - fx) if dx == 0 else fx
        return vals * (wy * wx * valid)[..., None]

    return corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)


def _sample_trilinear(feats: jnp.ndarray, tyx: jnp.ndarray) -> jnp.ndarray:
    """`map_coordinates_3d`: trilinear sample of [T, H, W, C] at [N, 3]
    (t, y, x) coords — t at frame centers (+0.5 then -0.5), y/x at
    coord-0.5, border clamped."""
    T, H, W, C = feats.shape
    t = tyx[:, 0]
    t0 = jnp.floor(t)
    ft = t - t0

    def at_frame(dt):
        ti = jnp.clip(t0.astype(jnp.int32) + dt, 0, T - 1)
        fr = feats[ti]                                 # [N, H, W, C]
        y = tyx[:, 1] - 0.5
        x = tyx[:, 2] - 0.5
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = jnp.clip(y0.astype(jnp.int32) + dy, 0, H - 1)
                xi = jnp.clip(x0.astype(jnp.int32) + dx, 0, W - 1)
                wy = (1 - fy) if dy == 0 else fy
                wx = (1 - fx) if dx == 0 else fx
                out = out + fr[jnp.arange(tyx.shape[0]), yi, xi] * (wy * wx)[:, None]
        return out

    return at_frame(0) * (1 - ft)[:, None] + at_frame(1) * ft[:, None]


# ---------------------------------------------------------------------------
# Feature extractor
# ---------------------------------------------------------------------------


def _resnet_block(p, pre, x, stride, has_proj):
    h = _instance_norm(x, p[pre + "bn0_w"], p[pre + "bn0_b"])
    h = jax.nn.relu(h)
    shortcut = x
    if has_proj:
        shortcut = _conv(h, p[pre + "proj_w"], stride=stride, padding=((0, 0), (0, 0)))
    # JAX-SAME asymmetric padding reproduced from the torch port
    # (`nets.py BlockV2`: stride1 -> (1,1),(1,1); stride2 -> (0,2),(0,2))
    pad = ((1, 1), (1, 1)) if stride == 1 else ((0, 2), (0, 2))
    h = _conv(h, p[pre + "conv0_w"], stride=stride, padding=pad)
    h = _instance_norm(h, p[pre + "bn1_w"], p[pre + "bn1_b"])
    h = jax.nn.relu(h)
    h = _conv(h, p[pre + "conv1_w"], stride=1, padding=((1, 1), (1, 1)))
    return h + shortcut


def resnet_forward(cfg: TapirConfig, p, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B, H, W, 3] -> {'unit1': stride-4 128ch, 'unit3': stride-8 256ch}."""
    out = _conv(x, p["initial_conv_w"], stride=2, padding=((2, 4), (2, 4)))
    res = {}
    for g, (nb, stride) in enumerate(zip(cfg.blocks_per_group, cfg.strides)):
        for b in range(nb):
            out = _resnet_block(
                p, f"r{g}.{b}.", out,
                stride=(stride if b == 0 else 1),
                has_proj=(b == 0),
            )
        res[f"unit{g}"] = out
    return res


def extra_convs_forward(cfg: TapirConfig, p, x: jnp.ndarray) -> jnp.ndarray:
    for i in range(cfg.extra_convs):
        pre = f"ec{i}."
        h = _layernorm(x, p[pre + "ln_w"], p[pre + "ln_b"])
        r = _conv(h, p[pre + "conv0_w"], p[pre + "conv0_b"])
        r = _gelu_tanh(r)
        x = h + _conv(r, p[pre + "conv1_w"], p[pre + "conv1_b"])
    return x


def _l2_normalize(x):
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), _EPS)
    )


def get_feature_grids(cfg: TapirConfig, p, video: jnp.ndarray):
    """[T, H, W, 3] in [-1, 1] -> (lowres [T,h8,w8,256], hires [T,h4,w4,128])
    at the initial resolution (the production driver always runs square
    256x256, so one grid serves init + refinement)."""
    T = video.shape[0]
    ih, iw = cfg.initial_resolution
    if video.shape[1:3] != (ih, iw):
        video = interp2d(video, ih, iw, "bilinear", align_corners=False)

    chunk = max(1, cfg.frame_chunk)
    pad_t = (-T) % chunk
    vid = jnp.concatenate([video, jnp.zeros((pad_t,) + video.shape[1:])], 0) \
        if pad_t else video

    def run_chunk(frames):
        r = resnet_forward(cfg, p, frames)
        return r["unit3"], r["unit1"]

    lo, hi = jax.lax.map(run_chunk, vid.reshape((-1, chunk) + vid.shape[1:]))
    lo = lo.reshape((-1,) + lo.shape[2:])[:T]
    hi = hi.reshape((-1,) + hi.shape[2:])[:T]
    if cfg.extra_convs:
        lo = extra_convs_forward(cfg, p, lo)
    return _l2_normalize(lo), _l2_normalize(hi)


# ---------------------------------------------------------------------------
# Track initialization from the cost volume
# ---------------------------------------------------------------------------


def _soft_argmax_heatmap(softmaxed: jnp.ndarray, threshold: float = 5.0):
    """[..., h, w] -> [..., 2] (x+0.5, y+0.5) weighted mean within
    `threshold` px of the argmax (`utils.soft_argmax_heatmap_batched`)."""
    h, w = softmaxed.shape[-2:]
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = jnp.stack([xx + 0.5, yy + 0.5], axis=-1).astype(softmaxed.dtype)
    flat = softmaxed.reshape(softmaxed.shape[:-2] + (h * w,))
    am = jnp.argmax(flat, axis=-1)
    pos = coords.reshape(h * w, 2)[am]                     # [..., 2]
    d2 = jnp.sum(
        jnp.square(coords - pos[..., None, None, :]), axis=-1
    )
    valid = (d2 < threshold**2).astype(softmaxed.dtype)
    wsum = jnp.sum(coords * (valid * softmaxed)[..., None], axis=(-3, -2))
    den = jnp.maximum(jnp.sum(valid * softmaxed, axis=(-2, -1)), _EPS)
    return wsum / den[..., None]


def tracks_from_cost_volume(
    cfg: TapirConfig, p,
    query_feats: jnp.ndarray,       # [N, 256]
    feature_grid: jnp.ndarray,      # [T, h, w, 256]
    query_points: Optional[jnp.ndarray],  # [N, 3] (t,y,x) in initial res
):
    """TAP-Net style init (`tapir_model.tracks_from_cost_volume`)."""
    T, h, w, _ = feature_grid.shape
    N = query_feats.shape[0]
    cost = jnp.einsum("nc,thwc->tnhw", query_feats, feature_grid)
    x = cost.reshape(T * N, h, w, 1)
    occ = jax.nn.relu(_conv(x, p["cv.hid1_w"], p["cv.hid1_b"]))
    pos = _conv(occ, p["cv.hid2_w"], p["cv.hid2_b"])       # [T*N, h, w, 1]

    pos = pos.reshape(T, N, h, w).transpose(1, 0, 2, 3)    # [N, T, h, w]
    sm = jax.nn.softmax(
        pos.reshape(N, T, -1) * cfg.softmax_temperature, axis=-1
    ).reshape(N, T, h, w)
    points = _soft_argmax_heatmap(sm)                      # [N, T, 2] (x, y)
    ih, iw = cfg.initial_resolution
    points = points * jnp.array([iw / w, ih / h])
    if query_points is not None:
        # snap the query frame to the exact query position
        qf = jnp.round(query_points[:, 0])
        is_q = (qf[:, None] == jnp.arange(T)[None, :])[..., None]
        q_xy = query_points[:, ::-1][:, :2][:, None, :]    # (x, y)
        points = jnp.where(is_q, q_xy, points)

    # occlusion / uncertainty head: pad (0,2),(0,2), stride-2 conv, spatial
    # mean, two linears
    o = jnp.pad(occ, ((0, 0), (0, 2), (0, 2), (0, 0)))
    o = jax.nn.relu(_conv(o, p["cv.hid3_w"], p["cv.hid3_b"], stride=2,
                          padding=((0, 0), (0, 0))))
    o = jnp.mean(o, axis=(1, 2))
    o = jax.nn.relu(o @ p["cv.hid4_w"] + p["cv.hid4_b"])
    o = o @ p["cv.occ_w"] + p["cv.occ_b"]                  # [T*N, 2]
    o = o.reshape(T, N, 2).transpose(1, 0, 2)
    return points, o[..., 0], o[..., 1]


# ---------------------------------------------------------------------------
# PIPs mixer refinement
# ---------------------------------------------------------------------------


def _depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      groups: int) -> jnp.ndarray:
    """[B, T, C_in] * [k, 1, C_out] -> [B, T, C_out], padding 1, grouped by
    feature (C_out = 4*C_in for up1, C_out = C_in(=4H) for up2)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    ) + b


def mixer_forward(cfg: TapirConfig, p, x: jnp.ndarray) -> jnp.ndarray:
    """PIPSMLPMixer: [B, T, in_dim] -> [B, T, out_dim]."""
    H = cfg.mixer_hidden_dim
    x = x @ p["mx.in_w"] + p["mx.in_b"]
    for i in range(cfg.num_mixer_blocks):
        pre = f"mx{i}."
        skip = x
        h = _layernorm(x, p[pre + "ln_w"])
        h = _depthwise_conv1d(h, p[pre + "up1_w"], p[pre + "up1_b"], groups=H)
        h = _gelu_tanh(h)
        h = _depthwise_conv1d(h, p[pre + "up2_w"], p[pre + "up2_b"], groups=H * 4)
        # sum each group of 4 back to H channels (torch: x[...,0::4]+...)
        h = h.reshape(h.shape[:-1] + (H, 4)).sum(-1)
        x = h + skip
        skip = x
        h = _layernorm(x, p[pre + "ln1_w"])
        h = _gelu_tanh(h @ p[pre + "mlp_up_w"] + p[pre + "mlp_up_b"])
        h = h @ p[pre + "mlp_down_w"] + p[pre + "mlp_down_b"]
        x = h + skip
    x = _layernorm(x, p["mx.ln_w"])
    return x @ p["mx.out_w"] + p["mx.out_b"]


_CTX = np.stack(
    np.meshgrid(np.arange(-3, 4), np.arange(-3, 4), indexing="ij"), -1
).reshape(-1, 2)  # [49, 2] (dy, dx)


def refine_pips(
    cfg: TapirConfig, p,
    queries: Sequence[jnp.ndarray],     # per level [N, C]
    pyramid: Sequence[jnp.ndarray],     # per level [T, h, w, C]
    points: jnp.ndarray,                # [N, T, 2] (x, y) in initial res
    occ: jnp.ndarray,                   # [N, T]
    expd: jnp.ndarray,                  # [N, T]
    last_iter: Optional[jnp.ndarray],   # [N, T, 384] or None
):
    ih, iw = cfg.initial_resolution
    corrs = []
    for lvl, (query, grid) in enumerate(zip(queries, pyramid)):
        T, h, w, C = grid.shape
        coords = points * jnp.array([w / iw, h / ih])       # (x, y) grid units
        coords = coords[..., ::-1]                          # (y, x)
        ctx = jnp.asarray(_CTX, coords.dtype)
        coords2 = coords[:, :, None, :] + ctx[None, None]   # [N, T, 49, 2]
        neighborhood = _sample_frames_bilinear(grid, coords2, border=False)
        if last_iter is None:
            patches = jnp.einsum("ntsc,nc->nts", neighborhood, query)
        else:
            lq = (
                last_iter[..., : cfg.highres_dim]
                if lvl == 0
                else last_iter[..., cfg.highres_dim:]
            )
            patches = jnp.einsum("ntsc,ntc->nts", neighborhood, lq)
        corrs.append(patches)
    corrs = jnp.concatenate(corrs, axis=-1)                 # [N, T, 49*L]

    T = corrs.shape[1]
    if last_iter is None:
        both = jnp.concatenate([queries[0], queries[1]], axis=-1)  # [N, 384]
        feats_in = jnp.broadcast_to(both[:, None], (both.shape[0], T, both.shape[1]))
    else:
        feats_in = last_iter

    mlp_input = jnp.concatenate(
        [
            jnp.zeros_like(points),          # pos zeroed (torch does the same)
            occ[..., None],
            expd[..., None],
            feats_in,
            corrs,
        ],
        axis=-1,
    )
    res = mixer_forward(cfg, p, mlp_input)                  # [N, T, 388]
    # refinement grid == initial resolution on the production path
    return (
        points + res[..., :2],
        occ + res[..., 2],
        expd + res[..., 3],
        res[..., 4:] + feats_in,
    )


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def _avg_pool_hw(x: jnp.ndarray) -> jnp.ndarray:
    T, h, w, C = x.shape
    return x[:, : h // 2 * 2, : w // 2 * 2].reshape(
        T, h // 2, 2, w // 2, 2, C
    ).mean(axis=(2, 4))


def forward(
    cfg: TapirConfig, p,
    video: jnp.ndarray,          # [T, H, W, 3] in [-1, 1]
    query_points: jnp.ndarray,   # [N, 3] (t, y, x) in video raster coords
) -> Dict[str, jnp.ndarray]:
    """Track query points through the video — `TAPIR.forward` for the
    production configuration (square inference resolution, single feature
    grid reused for init + 4 PIPs iterations)."""
    T, H, W, _ = video.shape
    ih, iw = cfg.initial_resolution
    lowres, hires = get_feature_grids(cfg, p, video)
    lh, lw = lowres.shape[1:3]
    hh, hw = hires.shape[1:3]

    # query features (convert video coords -> grid coords, +0.5 frame center)
    q_lo = _sample_trilinear(
        lowres, query_points * jnp.array([1.0, lh / H, lw / W])
    )
    q_hi = _sample_trilinear(
        hires, query_points * jnp.array([1.0, hh / H, hw / W])
    )

    # init from the cost volume, with queries snapped
    q_init = query_points * jnp.array([1.0, ih / H, iw / W])
    points, occ, expd = tracks_from_cost_volume(cfg, p, q_lo, lowres, q_init)

    queries = [q_hi, q_lo] + [q_lo] * cfg.pyramid_level
    pyramid = [hires, lowres]
    for _ in range(cfg.pyramid_level):
        pyramid.append(_avg_pool_hw(pyramid[-1]))

    mixer_feats = None
    for i in range(cfg.num_pips_iter):
        points, occ, expd, mixer_feats = refine_pips(
            cfg, p, queries, pyramid, points, occ, expd, mixer_feats
        )

    scale = jnp.array([W / iw, H / ih])
    return {
        "tracks": points * scale,     # [N, T, 2] (x, y) video raster coords
        "occlusion": occ,             # [N, T] logits (higher = occluded)
        "expected_dist": expd,        # [N, T] uncertainty logits
    }


# ---------------------------------------------------------------------------
# Model loading (weights gated, same pattern as depth_anything)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TapirModel:
    cfg: TapirConfig
    params: Dict[str, jnp.ndarray]
    pretrained: bool

    def __hash__(self):
        return id(self.params)


def save_params(path: str, params: Dict[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def _default_weight_paths() -> List[str]:
    paths = []
    env = os.environ.get("SPLAT_TAPIR_WEIGHTS")
    if env:
        paths.append(env)
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths.append(os.path.join(pkg, "weights", "tapir.npz"))
    return paths


def get_model(cfg: Optional[TapirConfig] = None) -> Optional[TapirModel]:
    cfg = cfg or TapirConfig()
    for path in _default_weight_paths():
        if os.path.exists(path):
            raw = dict(np.load(path).items())
            params = {k: jnp.asarray(v) for k, v in raw.items()}
            return TapirModel(cfg=cfg, params=params, pretrained=True)
    return None


@partial(jax.jit, static_argnames=("model",))
def _infer(model: TapirModel, video, query_points):
    return forward(model.cfg, model.params, video, query_points)


def track_points(
    model: TapirModel, video_u8: np.ndarray, query_points: np.ndarray,
    chunk: int = 128,
) -> Dict[str, np.ndarray]:
    """Driver: uint8 video [T, H, W, 3] + (t, y, x) queries -> tracks in the
    ORIGINAL video raster (`compute_tracks_torch.py` main-loop contract).
    Queries are chunked and padded to a fixed size so one compiled graph
    serves every chunk."""
    video = jnp.asarray(video_u8, jnp.float32) / 255.0 * 2.0 - 1.0
    n = query_points.shape[0]
    outs: Dict[str, List[np.ndarray]] = {"tracks": [], "occlusion": [],
                                         "expected_dist": []}
    for s in range(0, n, chunk):
        q = query_points[s : s + chunk].astype(np.float32)
        pad = chunk - q.shape[0]
        if pad:
            q = np.concatenate([q, np.zeros((pad, 3), np.float32)])
        res = _infer(model, video, jnp.asarray(q))
        keep = chunk - pad
        for k in outs:
            outs[k].append(np.asarray(res[k])[:keep])
    return {k: np.concatenate(v, axis=0) for k, v in outs.items()}
