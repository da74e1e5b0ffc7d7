"""Training orchestration: the jitted train step + host-side schedule.

TPU-native equivalent of `FragTrainer`
(`/root/reference/src/trainer_fragGS.py:107-997`). The reference runs an
eager torch loop (forward -> backward -> optimizer surgery -> python-side
logging); here the whole step — both frame forwards, the fused multi-channel
render, every production loss, the gradients, and the Adam update — is ONE
jitted function, with density control as a second jitted function invoked on
its (host-known, static) schedule, mirroring the reference's
`duplicate_interval`/`prune_interval`/`opacity_reset_interval` cadence.

Production loss assembly parity (`compute_all_losses`,
`trainer_fragGS.py:466-724`):

    loss = loss_rgb_weight * [(1-0.2) L1 + 0.2 (1-SSIM)]     (:575-583)
         + loss_flow_weight * tracking_loss                   (:528-569)
         + depth_loss_dpt(depth, gt_depth)                    (:598-601)
         + arap_loss / 1000                                   (:671-675)

with `track_gs` = the *other* frame's Gaussian positions blended into this
frame's rasterization (:506-533), rendered together with the configured
extra attributes in a single fused kernel launch (the reference uses three
CUDA launches; see `ops/rasterize_tpu.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianScene, SceneConfig
from ..ops import rasterize as _raster
from . import density as _density
from . import losses as _losses
from . import optim as _optim


@dataclass(frozen=True)
class TrainerConfig:
    """Static trainer configuration (hashable; every field shapes the jit)."""

    width: int
    height: int
    num_frames: int
    # loss weights (CLI defaults: configs/config.txt:loss_rgb_weight=10,
    # loss_flow_weight=2; src/config.py)
    loss_rgb_weight: float = 10.0
    loss_flow_weight: float = 2.0
    lambda_dssim: float = 0.2
    depth_loss_weight: float = 1.0
    # background value of the blended depth channel. The reference hardcodes
    # 1.0 (its marigold depths live in ~[0,1], `dptr_ortho_enhanced.py:353`);
    # our lifted-depth convention is [0.5, 2.0] (video_flow depth_range), so
    # empty pixels must read as FAR (2.0) or the depth loss drags geometry
    # toward a phantom mid-depth background.
    depth_bg: float = 2.0
    arap_weight: float = 1e-3          # rigid_error / 1000 (:674)
    arap_sample_num: int = 512
    arap_knn: int = 5
    num_track_samples: int = 4096      # fixed per-step track batch (padded)
    track_quantile: float = 0.98
    # blend the configured extra attributes (mask/dino/poly) during TRAINING
    # renders. The reference renders them every step but its production
    # losses on them are disabled (`trainer_fragGS.py:629-642` are
    # `if False:`), so they receive no gradient — skipping them halves the
    # blend channel count (C 23 -> 7) and the backward reduce cost. Enable
    # when adding mask/dino supervision.
    train_render_attributes: bool = False
    # attribute supervision — the reference's hand-switched capabilities
    # (`trainer_fragGS.py:631-642`: MSE * 20 on the rendered mask/dino
    # channels vs the fg mask / DINO feature image) promoted to config.
    # Non-zero weights imply attribute rendering and require Batch.mask1 /
    # Batch.dino1.
    mask_attr_weight: float = 0.0      # reference's hand value: 20
    dino_attr_weight: float = 0.0      # reference's hand value: 20
    # fg-layer re-render supervision (`trainer_fragGS.py:645-668`, also
    # hand-switched there): gaussians whose detached mask attribute > 0.5
    # re-rendered alone on black; MSE vs the masked GT rgb and the fg mask,
    # both at this weight, engaged after fg_layer_start_iter steps.
    fg_layer_weight: float = 0.0       # reference's hand value: 20
    fg_layer_start_iter: int = 100     # reference: `self.step > 100`
    # rasterizer
    max_intersections: int = 1 << 19
    max_tiles_per_gaussian: int = 64
    # Near-plane cull for TRAINING renders — keep the reference's
    # production value 0.01 (`dptr_ortho_enhanced.py:287`). A tempting
    # "fix" during the 2026-08-20 collapse hunt was the projector's own
    # 0.2 default (`dptr_ortho.py:150`) to close the near-camera floater
    # zone; MEASURED RESULT: 0.2 actively destabilizes the textured
    # flagship (identical seeds diverge by step 1500: PSNR 20.4 at 0.01
    # vs 18.7-then-collapse at 0.2) — gaussians drifting below the cull
    # lose the photometric gradient that would pull them back and become
    # abandoned mass the ARAP/depth terms still see. Do not raise this
    # without re-running the flagship A/B (/tmp/e480_final3 vs final4,
    # 2026-08-20).
    nearest: float = 0.01
    block_x: int = 16                  # rasterizer tile: 16x16 measured
    block_y: int = 16                  # best for TRAINING (device 36.6 vs
    #                                    38.6 ms at (32,16): the backward's
    #                                    512-px chunks cost more than the
    #                                    smaller grad scatter saves); pure
    #                                    rendering prefers (32, 16)
    white_bg: bool = True
    # schedule
    max_steps: int = 20000
    optim: _optim.OptimConfig = field(default_factory=_optim.OptimConfig)
    densify: _density.DensifyConfig = field(default_factory=_density.DensifyConfig)

    def raster_cfg(self, K_idx: int = 0) -> _raster.RasterizeConfig:
        return _raster.RasterizeConfig(
            width=self.width,
            height=self.height,
            max_intersections=self.max_intersections,
            max_tiles_per_gaussian=self.max_tiles_per_gaussian,
            block_x=self.block_x,
            block_y=self.block_y,
            K_idx=K_idx,
            nearest=self.nearest,
        )


class TrainState(NamedTuple):
    scene: GaussianScene
    opt_state: Any
    densify_state: _density.DensifyState
    step: jnp.ndarray
    key: jax.Array


class Batch(NamedTuple):
    """One (t1, t2) frame-pair sample — the `GSSimpleDataset` contract
    (`src/loaders/gs_data2.py:50-88`) plus the per-pair TAPIR supervision
    that the reference loads from disk inside the step
    (`trainer_fragGS.py:537-538`; here it arrives device-resident)."""

    t1: jnp.ndarray               # [] int32
    t2: jnp.ndarray               # [] int32
    # rgb1/depth1 (and mask1/dino1 below) may be None when the heavy
    # per-frame tensors live in a device-resident `FrameStore` instead of
    # the per-step batch — the step gathers them by t1 on device, so the
    # host->device traffic per step is a few KB of track data instead of
    # ~8 MB of frames (which dominated wall time at 480p: 357 ms/step wall
    # vs 34.6 ms device).
    rgb1: Optional[jnp.ndarray] = None    # [H, W, 3] float32 in [0,1]
    depth1: Optional[jnp.ndarray] = None  # [H, W] float32 (aligned mono-depth)
    query_px: Optional[jnp.ndarray] = None      # [P, 2] float32 query pixels in t1
    target_tracks: Optional[jnp.ndarray] = None  # [P, 4] (x, y, occ, dist) at t2
    track_valid: Optional[jnp.ndarray] = None    # [P] bool (padding mask)
    # optional attribute supervision (required iff the corresponding
    # TrainerConfig weight is non-zero): binary fg mask and per-pixel
    # feature target for frame t1 (`trainer_fragGS.py:632-642`)
    mask1: Optional[jnp.ndarray] = None   # [H, W] float32 in {0, 1}
    dino1: Optional[jnp.ndarray] = None   # [H, W, 3] float32


class FrameStore(NamedTuple):
    """Device-resident per-frame supervision tensors, uploaded ONCE.

    The reference reads each frame's rgb/depth/mask from its DataLoader
    every step (`gs_data2.py:50-88`); shipping them over the TPU relay per
    step costs ~8 MB/step at 480p. Stacked [T, ...] device arrays + an
    on-device gather by the traced t1 make the per-step transfer O(track
    batch) instead.

    mask/dino are optional — only needed when the corresponding attribute
    supervision weight is non-zero."""

    rgb: jnp.ndarray                      # [T, H, W, 3] float32
    depth: jnp.ndarray                    # [T, H, W] float32
    mask: Optional[jnp.ndarray] = None    # [T, H, W] float32
    dino: Optional[jnp.ndarray] = None    # [T, H, W, C] float32


def resolve_batch(frames: Optional[FrameStore], batch: Batch) -> Batch:
    """Fill a slim Batch's per-frame tensors from the device store (no-op
    for full batches / when no store is configured)."""
    if frames is None or batch.rgb1 is not None:
        return batch
    return batch._replace(
        rgb1=frames.rgb[batch.t1],
        depth1=frames.depth[batch.t1],
        mask1=batch.mask1 if frames.mask is None else frames.mask[batch.t1],
        dino1=batch.dino1 if frames.dino is None else frames.dino[batch.t1],
    )


def scene_render_inputs(scene: GaussianScene, t) -> Dict[str, jnp.ndarray]:
    """Gather activated per-Gaussian render inputs at time t — parity with
    `SingleAtlasWithBaseModel.forward` (`frag_model.py:99-137`)."""
    out = {
        "position": scene.get_position(t),
        "opacity": scene.get_opacity(),
        "scaling": scene.get_scaling(),
        "rotation": scene.get_rotation(t),
        "shs": scene.get_shs(),
    }
    for name in ("mask_attribute", "dino_attribute"):
        if name in scene.params:
            out[name] = scene.get_render_attribute(name)
    out["pos_poly_feat"] = scene.params["pos_poly_feat"].reshape(
        scene.params["pos_poly_feat"].shape[0], -1
    )
    return out


def compute_losses(cfg: TrainerConfig, rcfg, scene, batch: Batch, sub,
                   step, params, uv_sink, abs_sink, extr_t1,
                   pos2_transform=None):
    """The full production loss assembly for one (t1, t2) pair — shared by
    `make_train_step` (fixed canonical camera) and
    `camera_refine.make_joint_train_step` (per-frame refined extrinsics,
    which passes `pos2_transform` to express the t2 positions in the
    refined t2 camera frame before they are splatted as the `track_gs`
    feature). Returns (loss, (metrics, radius))."""
    sc = GaussianScene(params=params, aux=scene.aux, cfg=scene.cfg)
    inp1 = scene_render_inputs(sc, batch.t1)
    pos2 = sc.get_position(batch.t2)
    if pos2_transform is not None:
        pos2 = pos2_transform(pos2)
    extra = {"track_gs": pos2}
    if (cfg.train_render_attributes or cfg.mask_attr_weight
            or cfg.dino_attr_weight):
        for name in ("mask_attribute", "pos_poly_feat", "dino_attribute"):
            if name in inp1:
                extra[name] = inp1[name]
    out = _render_with_sinks(
        inp1, extr_t1, rcfg, extra, cfg.white_bg, uv_sink, abs_sink,
        depth_bg=cfg.depth_bg,
    )
    pred_rgb = out.features["rgb"]
    pred_depth = out.features["depth"][..., 0]
    track_map = out.features["track_gs"]

    loss_rgb = _losses.rgb_loss(pred_rgb, batch.rgb1, cfg.lambda_dssim)
    vis, _, conf = _losses.parse_tapir_track_info(
        batch.target_tracks[:, 2], batch.target_tracks[:, 3]
    )
    interval = jnp.abs(batch.t2 - batch.t1).astype(jnp.float32)
    loss_flow = _losses.tracking_loss(
        track_map, batch.query_px, batch.target_tracks[:, :2],
        vis & batch.track_valid, conf, interval,
        cfg.num_frames, cfg.height, cfg.width,
        quantile=cfg.track_quantile,
    )
    loss_depth = _losses.depth_loss_dpt(pred_depth, batch.depth1)
    # zero-weight terms are skipped entirely (0 * NaN would still
    # poison the sum) — weights are static config
    loss_arap = (
        _losses.arap_loss(
            inp1["position"], pos2, sub,
            k=cfg.arap_knn, sample_num=cfg.arap_sample_num,
            alive=sc.alive,
        )
        if cfg.arap_weight
        else jnp.zeros(())
    )
    loss = cfg.loss_rgb_weight * loss_rgb
    if cfg.loss_flow_weight:
        loss = loss + cfg.loss_flow_weight * loss_flow
    if cfg.depth_loss_weight:
        loss = loss + cfg.depth_loss_weight * loss_depth
    if cfg.arap_weight:
        loss = loss + cfg.arap_weight * loss_arap
    extra_metrics = {}
    if cfg.mask_attr_weight:
        # MSE on the detached-opacity-blended mask channel vs the
        # binary fg mask (`trainer_fragGS.py:632-636`)
        loss_mask = jnp.mean(
            (out.features["mask_attribute"][..., 0] - batch.mask1) ** 2
        )
        loss = loss + cfg.mask_attr_weight * loss_mask
        extra_metrics["loss_mask_attr"] = loss_mask
    if cfg.dino_attr_weight:
        # MSE on the rendered feature channels vs the per-pixel
        # DINO target image (`trainer_fragGS.py:638-642`)
        loss_dino = jnp.mean(
            (out.features["dino_attribute"] - batch.dino1) ** 2
        )
        loss = loss + cfg.dino_attr_weight * loss_dino
        extra_metrics["loss_dino_attr"] = loss_dino
    if cfg.fg_layer_weight:
        # fg-only layer re-render (`trainer_fragGS.py:645-668`).
        # Zero-opacity masking equals the reference's boolean
        # gaussian slicing: alpha < 1/255 contributors are skipped
        # identically by the blend. The sinks are stop-gradded so
        # this render doesn't pollute densification statistics
        # (the reference's optimizer also reads only the first
        # render's viewspace grads).
        fg_sel = jax.lax.stop_gradient(
            inp1["mask_attribute"][:, 0] > 0.5
        )
        inp_fg = {
            **inp1,
            "opacity": jnp.where(fg_sel, inp1["opacity"], 0.0),
        }
        out_fg = _render_with_sinks(
            inp_fg, extr_t1, rcfg,
            {"mask_attribute": inp1["mask_attribute"]},
            False,  # bg_color 0 (`trainer_fragGS.py:658`)
            jax.lax.stop_gradient(uv_sink),
            jax.lax.stop_gradient(abs_sink),
            depth_bg=cfg.depth_bg,
        )
        gt_mask1 = batch.mask1[..., None]
        loss_rgb_fg = jnp.mean(
            (out_fg.features["rgb"] - batch.rgb1 * gt_mask1) ** 2
        )
        loss_mask_fg = jnp.mean(
            (out_fg.features["mask_attribute"] - gt_mask1) ** 2
        )
        w_fg = jnp.where(
            step > cfg.fg_layer_start_iter,
            cfg.fg_layer_weight, 0.0,
        )
        loss = loss + w_fg * (loss_rgb_fg + loss_mask_fg)
        extra_metrics["loss_rgb_fg"] = loss_rgb_fg
        extra_metrics["loss_mask_fg"] = loss_mask_fg
    metrics = {
        **extra_metrics,
        "loss": loss,
        "loss_rgb": loss_rgb,
        "loss_flow": loss_flow,
        "loss_depth": loss_depth,
        "loss_arap": loss_arap,
        "psnr": _losses.psnr(pred_rgb, batch.rgb1),
        "num_intersections": out.num_intersections,
    }
    return loss, (metrics, out.radius)


def make_train_step(cfg: TrainerConfig, extr: np.ndarray,
                    frames: Optional[FrameStore] = None):
    """Build the jitted train step for a fixed canonical camera.

    With `frames`, per-step batches may be slim (rgb1/depth1/mask1/dino1
    None) — the step gathers them from the device store by t1."""
    rcfg = cfg.raster_cfg()
    extr_j = jnp.asarray(extr, jnp.float32)

    optimizer = _optim.make_optimizer(cfg.optim)

    # `frames` must arrive as a traced argument, NOT a closure constant:
    # closed-over device arrays are baked into the HLO as literals, and at
    # 480p the stacked frame tensors are ~300 MB — the axon relay rejects
    # the remote-compile request body (HTTP 413).
    @jax.jit
    def _train_step(state: TrainState, batch: Batch, frames_arg):
        batch = resolve_batch(frames_arg, batch)
        key, sub = jax.random.split(state.key)
        scene = state.scene

        def loss_fn_with_sinks(params, uv_sink, abs_sink):
            return compute_losses(
                cfg, rcfg, scene, batch, sub, state.step, params,
                uv_sink, abs_sink, extr_j,
            )

        N = scene.alive.shape[0]
        uv0 = jnp.zeros((N, 2))
        (grads, duv, dabs), (metrics, radius) = jax.grad(
            loss_fn_with_sinks, argnums=(0, 1, 2), has_aux=True
        )(scene.params, uv0, uv0)

        updates, opt_state = optimizer.update(grads, state.opt_state, scene.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, scene.params, updates
        )
        new_scene = scene.replace(params=new_params)

        # densification statistics: ndc-scale grad norms
        # (alpha_blending_enhanced.py:121-129 — duv * (W/2, H/2))
        dstate = _density.accumulate_stats(
            state.densify_state, radius > 0, radius,
            viewspace_grad_norm(cfg, duv),
        )

        return (
            TrainState(new_scene, opt_state, dstate, state.step + 1, key),
            metrics,
        )

    def train_step(state: TrainState, batch: Batch):
        return _train_step(state, batch, frames)

    @partial(jax.jit, static_argnames=())
    def density_step(state: TrainState):
        key, sub = jax.random.split(state.key)
        scene, opt_state, dstate, info = _density.densify_and_prune(
            state.scene, state.opt_state, state.densify_state,
            state.step, cfg.densify, sub,
        )
        return TrainState(scene, opt_state, dstate, state.step, key), info

    @jax.jit
    def opacity_reset_step(state: TrainState):
        scene, opt_state = _density.reset_opacity(state.scene, state.opt_state)
        return TrainState(scene, opt_state, state.densify_state, state.step, state.key)

    return train_step, density_step, opacity_reset_step


def viewspace_grad_norm(cfg: TrainerConfig, duv: "jnp.ndarray") -> "jnp.ndarray":
    """ndc-scale viewspace grad norms for densification
    (alpha_blending_enhanced.py:121-129 — duv * (W/2, H/2))."""
    ndc_grad = duv * jnp.array([cfg.width / 2.0, cfg.height / 2.0])
    return jnp.linalg.norm(ndc_grad, axis=-1)



def _render_with_sinks(inp, extr, rcfg, extra, white_bg, uv_sink, abs_sink,
                       depth_bg=2.0):
    """render_gaussians with the uv/abs gradient-sink dummies injected —
    the reference's `ndc` / `abs_ndc` retain_grad trick
    (`dptr_ortho_enhanced.py:331-338`) done the functional way."""
    from ..ops import rasterize as R
    from ..ops import projection as P
    from ..ops import quaternion as Q
    from ..ops import sh as S

    position = inp["position"]
    N = position.shape[0]
    dirs = jnp.concatenate(
        [jnp.zeros((N, 2), position.dtype), jnp.ones((N, 1), position.dtype)], axis=1
    )
    uv, depth = P.project_ortho(position, extr, rcfg.width, rcfg.height,
                                rcfg.nearest, rcfg.extent)
    uv = uv + uv_sink  # signed viewspace-grad capture
    visible = depth != 0
    rgb = S.eval_sh(rcfg.sh_degree, inp["shs"], dirs, visible)
    cov3d = Q.build_cov3d(inp["scaling"], inp["rotation"], visible)
    max_r = P.max_radius_for_tile_cap(rcfg.max_tiles_per_gaussian, rcfg.block)
    conic, radius, tiles, rect_min, rect_max = P.ewa_ortho(
        cov3d, extr, uv, rcfg.width, rcfg.height, visible, rcfg.block, max_r
    )
    groups = {
        "rgb": (rgb, 1.0 if white_bg else 0.0, True),
        "depth": (depth[:, None], depth_bg, True),
    }
    for k, v in extra.items():
        groups[k] = (v, 0.0, False)
    return R.rasterize(
        uv, depth, conic, radius, tiles, rect_min, rect_max,
        inp["opacity"], groups, rcfg, abs_sink=abs_sink,
    )


def init_train_state(
    cfg: TrainerConfig, scene: GaussianScene, seed: int = 0
) -> TrainState:
    optimizer = _optim.make_optimizer(cfg.optim)
    opt_state = optimizer.init(scene.params)
    return TrainState(
        scene=scene,
        opt_state=opt_state,
        densify_state=_density.init_state(scene.alive.shape[0]),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def should_densify(cfg: TrainerConfig, step: int) -> bool:
    """Host-side schedule — parity with `update_structure`/`densification`
    (`gs_optimizer.py:110-184`)."""
    d = cfg.densify
    return (
        d.densify_start_iter < step < d.densify_stop_iter
        and step % d.duplicate_interval == 0
    )


def should_reset_opacity(cfg: TrainerConfig, step: int) -> bool:
    """One-step-deferred opacity reset (`gs_optimizer.py:127-133`)."""
    d = cfg.densify
    return step > 1 and step % d.opacity_reset_interval == 1
