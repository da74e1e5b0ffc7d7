"""Multi-atlas training — the FragModel + AtlasGaussianSplattingOptimizer
path (SURVEY.md §7 milestone 7).

TPU-native equivalent of training `FragModel` with per-atlas optimizers
(`/root/reference/src/frag_model.py:273-343`,
`src/pointrix/optimizer/atlas_gs_optimizer.py`): atlases' activated render
inputs are concatenated along the gaussian axis for ONE fused
rasterization; viewspace (uv/abs sink) gradients come back for the full
concatenated axis and are split per atlas by static capacity offsets
(`get_point_num_sep`, `frag_model.py:319-324`) to drive per-atlas density
control; each atlas keeps its own optax state (`prepare_optimizer_dict`,
`frag_model.py:326-343`).

The production config trains a single `gs_base` atlas — that path lives in
`trainer.py`; this module is the multi-atlas generalization (e.g. separate
fg/bg atlases for editing workflows). Atlases may mix trajectory types
(spline `gs_base` + poly/fourier overlays) since each keeps its own
`SceneConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.atlas import AtlasModel
from ..models.gaussians import GaussianScene
from . import density as _density
from . import losses as _losses
from . import optim as _optim
from .trainer import Batch, TrainerConfig, _render_with_sinks, scene_render_inputs


class AtlasTrainState(NamedTuple):
    model: AtlasModel
    opt_states: Dict[str, Any]
    densify_states: Dict[str, _density.DensifyState]
    step: jnp.ndarray
    key: jax.Array


def init_atlas_train_state(
    cfg: TrainerConfig, model: AtlasModel, seed: int = 0
) -> AtlasTrainState:
    optimizer = _optim.make_optimizer(cfg.optim)
    opt_states = {n: optimizer.init(s.params) for n, s in model.atlases.items()}
    dstates = {
        n: _density.init_state(s.alive.shape[0])
        for n, s in model.atlases.items()
    }
    return AtlasTrainState(
        model, opt_states, dstates,
        jnp.zeros((), jnp.int32), jax.random.PRNGKey(seed),
    )


def _concat_inputs(scenes: Dict[str, GaussianScene], t1, t2):
    inps = [scene_render_inputs(s, t1) for s in scenes.values()]
    keys = ("position", "opacity", "scaling", "rotation", "shs")
    inp = {k: jnp.concatenate([d[k] for d in inps], axis=0) for k in keys}
    pos2 = jnp.concatenate(
        [s.get_position(t2) for s in scenes.values()], axis=0
    )
    alive = jnp.concatenate([s.alive for s in scenes.values()])
    return inp, pos2, alive


def make_atlas_grad_fn(cfg: TrainerConfig, extr: np.ndarray):
    """Per-pair gradient computation for the multi-atlas objective —
    shared between the single-chip `make_atlas_train_step` and the
    data-parallel wrapper (`parallel.dp.make_dp_atlas_step`), which
    pmean/psum/pmax-reduces its outputs over the mesh before the update.

    Returns grad_fn(model, batch, sub) -> (grads, duv, radius, metrics)."""
    rcfg = cfg.raster_cfg()
    extr_j = jnp.asarray(extr, jnp.float32)

    def grad_fn(model: AtlasModel, batch: Batch, sub):
        names = model.names
        offs = model.point_num_sep()

        def loss_fn(params_dict, uv_sink, abs_sink):
            scenes = {
                n: GaussianScene(
                    params=params_dict[n],
                    aux=model.atlases[n].aux,
                    cfg=model.atlases[n].cfg,
                )
                for n in names
            }
            inp, pos2, alive = _concat_inputs(scenes, batch.t1, batch.t2)
            extra = {"track_gs": pos2}
            out = _render_with_sinks(
                inp, extr_j, rcfg, extra, cfg.white_bg, uv_sink, abs_sink,
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
            loss_arap = (
                _losses.arap_loss(
                    inp["position"], pos2, sub,
                    k=cfg.arap_knn, sample_num=cfg.arap_sample_num, alive=alive,
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
            metrics = {
                "loss": loss,
                "loss_rgb": loss_rgb,
                "loss_flow": loss_flow,
                "loss_depth": loss_depth,
                "loss_arap": loss_arap,
                "psnr": _losses.psnr(pred_rgb, batch.rgb1),
                "num_intersections": out.num_intersections,
            }
            return loss, (metrics, out.radius)

        params_dict = {n: model.atlases[n].params for n in names}
        total = offs[-1]
        uv0 = jnp.zeros((total, 2))
        (grads, duv, dabs), (metrics, radius) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params_dict, uv0, uv0)
        return grads, duv, radius, metrics

    return grad_fn


def make_atlas_apply_fn(cfg: TrainerConfig):
    """(state, grads, duv, radius, metrics, key) -> (new_state, metrics):
    per-atlas optimizer update + densification-stat split — the
    reduction-independent half of the train step."""
    optimizer = _optim.make_optimizer(cfg.optim)

    def apply_fn(state: AtlasTrainState, grads, duv, radius, metrics, key):
        model = state.model
        names = model.names
        offs = model.point_num_sep()
        params_dict = {n: model.atlases[n].params for n in names}

        # per-atlas optimizer update (FragModel keeps one optimizer per
        # atlas; pytree grads already arrive split by atlas)
        new_atlases = {}
        new_opt_states = {}
        for n in names:
            updates, ost = optimizer.update(
                grads[n], state.opt_states[n], params_dict[n]
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params_dict[n], updates
            )
            new_atlases[n] = model.atlases[n].replace(params=new_params)
            new_opt_states[n] = ost

        # viewspace-grad stats split per atlas by the static offsets
        # (`prepare_optimizer_dict`, frag_model.py:326-343)
        ndc_grad = duv * jnp.array([cfg.width / 2.0, cfg.height / 2.0])
        gnorm = jnp.linalg.norm(ndc_grad, axis=-1)
        new_dstates = {}
        for i, n in enumerate(names):
            lo, hi = offs[i], offs[i + 1]
            new_dstates[n] = _density.accumulate_stats(
                state.densify_states[n],
                radius[lo:hi] > 0, radius[lo:hi], gnorm[lo:hi],
            )

        return (
            AtlasTrainState(
                AtlasModel(atlases=new_atlases), new_opt_states, new_dstates,
                state.step + 1, key,
            ),
            metrics,
        )

    return apply_fn


def make_atlas_train_step(cfg: TrainerConfig, extr: np.ndarray):
    """Jitted multi-atlas train step (+ per-atlas density/opacity steps)."""
    # the atlas optimizer prunes by size unconditionally
    # (`atlas_gs_optimizer.py:362`), unlike the gated single-atlas one
    _atlas_dcfg = dataclasses.replace(cfg.densify, size_prune_always=True)
    grad_fn = make_atlas_grad_fn(cfg, extr)
    apply_fn = make_atlas_apply_fn(cfg)

    @jax.jit
    def train_step(state: AtlasTrainState, batch: Batch):
        key, sub = jax.random.split(state.key)
        grads, duv, radius, metrics = grad_fn(state.model, batch, sub)
        return apply_fn(state, grads, duv, radius, metrics, key)

    @jax.jit
    def density_step(state: AtlasTrainState):
        key = state.key
        new_atlases, new_opts, new_dstates, infos = {}, {}, {}, {}
        for n in state.model.names:
            key, sub = jax.random.split(key)
            scene, ost, dst, info = _density.densify_and_prune(
                state.model.atlases[n], state.opt_states[n],
                state.densify_states[n], state.step, _atlas_dcfg, sub,
            )
            new_atlases[n] = scene
            new_opts[n] = ost
            new_dstates[n] = dst
            infos[n] = info
        return (
            AtlasTrainState(
                AtlasModel(atlases=new_atlases), new_opts, new_dstates,
                state.step, key,
            ),
            infos,
        )

    @jax.jit
    def opacity_reset_step(state: AtlasTrainState):
        new_atlases, new_opts = {}, {}
        for n in state.model.names:
            scene, ost = _density.reset_opacity(
                state.model.atlases[n], state.opt_states[n]
            )
            new_atlases[n] = scene
            new_opts[n] = ost
        return AtlasTrainState(
            AtlasModel(atlases=new_atlases), new_opts, state.densify_states,
            state.step, state.key,
        )

    return train_step, density_step, opacity_reset_step
