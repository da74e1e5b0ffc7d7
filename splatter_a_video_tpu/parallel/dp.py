"""Data-parallel training over frame pairs (shard_map + psum over ICI).

The reference's `--distributed` flag sets up NCCL DDP that never wraps the
model (`/root/reference/src/train.py:210-213`, SURVEY.md §2.12) — its real
batch axis is the (t1, t2) frame-pair sample. The TPU-native design:

  * params/optimizer state replicated on every chip;
  * a batch of B frame pairs sharded over the "dp" mesh axis;
  * each chip renders + differentiates its own pair inside `shard_map`
    (the Pallas rasterizer runs per-chip on local shapes — no cross-chip
    communication inside the renderer);
  * gradients and metrics `pmean`/`pmax` over ICI; the Adam update is
    computed redundantly per chip on identical reduced grads (standard DP);
  * densification statistics reduce like the reference's `render_batch`
    (visibility = any, radii = max, `dptr_ortho_enhanced.py:428-433`;
    grad norms sum over the batch like `accumulate_viewspace_grad`).

Gaussian-axis sharding of the splat itself is deliberately NOT used:
front-to-back compositing is order-dependent across shards, so DP over
pairs (matching the reference's batch semantics) is the communication-free
scaling axis; a clip fits one chip (reference: 10 GB).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gaussians import GaussianScene
from ..train import density as _density
from ..train import losses as _losses
from ..train import optim as _optim
from ..train import trainer as _trainer


def make_dp_train_step(cfg: _trainer.TrainerConfig, extr: np.ndarray, mesh: Mesh):
    """Build the data-parallel train step.

    Returns a function (state, batch) -> (state, metrics) where every batch
    leaf has a leading axis of size mesh.devices.size (one frame pair per
    chip), state is replicated.
    """
    rcfg = cfg.raster_cfg()
    extr_j = jnp.asarray(extr, jnp.float32)
    optimizer = _optim.make_optimizer(cfg.optim)
    ndev = mesh.devices.size

    def per_pair_loss(params, aux, scene_cfg, batch: _trainer.Batch, key, step):
        scene = GaussianScene(params=params, aux=aux, cfg=scene_cfg)

        def inner(params2, uv_sink, abs_sink):
            sc = GaussianScene(params=params2, aux=aux, cfg=scene_cfg)
            inp = _trainer.scene_render_inputs(sc, batch.t1)
            p2 = sc.get_position(batch.t2)
            ex = {"track_gs": p2}
            if (cfg.train_render_attributes or cfg.mask_attr_weight
                    or cfg.dino_attr_weight):
                for name in ("mask_attribute", "pos_poly_feat", "dino_attribute"):
                    if name in inp:
                        ex[name] = inp[name]
            out = _trainer._render_with_sinks(
                inp, extr_j, rcfg, ex, cfg.white_bg, uv_sink, abs_sink,
                depth_bg=cfg.depth_bg,
            )
            pred_rgb = out.features["rgb"]
            loss_rgb = _losses.rgb_loss(pred_rgb, batch.rgb1, cfg.lambda_dssim)
            vis, _, conf = _losses.parse_tapir_track_info(
                batch.target_tracks[:, 2], batch.target_tracks[:, 3]
            )
            interval = jnp.abs(batch.t2 - batch.t1).astype(jnp.float32)
            loss_flow = _losses.tracking_loss(
                out.features["track_gs"], batch.query_px,
                batch.target_tracks[:, :2], vis & batch.track_valid, conf,
                interval, cfg.num_frames, cfg.height, cfg.width,
                quantile=cfg.track_quantile,
            )
            loss_depth = _losses.depth_loss_dpt(
                out.features["depth"][..., 0], batch.depth1
            )
            loss_arap = _losses.arap_loss(
                inp["position"], p2, key,
                k=cfg.arap_knn, sample_num=cfg.arap_sample_num, alive=sc.alive,
            )
            loss = (
                cfg.loss_rgb_weight * loss_rgb
                + cfg.loss_flow_weight * loss_flow
                + cfg.depth_loss_weight * loss_depth
                + cfg.arap_weight * loss_arap
            )
            metrics = {
                "loss": loss,
                "loss_rgb": loss_rgb,
                "psnr": _losses.psnr(pred_rgb, batch.rgb1),
            }
            # Capability attribute losses — same terms as the single-chip
            # step (train/trainer.py) so --distributed trains the same
            # objective for the same flags.
            if cfg.mask_attr_weight:
                loss_mask = jnp.mean(
                    (out.features["mask_attribute"][..., 0] - batch.mask1) ** 2
                )
                loss = loss + cfg.mask_attr_weight * loss_mask
                metrics["loss_mask_attr"] = loss_mask
            if cfg.dino_attr_weight:
                loss_dino = jnp.mean(
                    (out.features["dino_attribute"] - batch.dino1) ** 2
                )
                loss = loss + cfg.dino_attr_weight * loss_dino
                metrics["loss_dino_attr"] = loss_dino
            if cfg.fg_layer_weight:
                fg_sel = jax.lax.stop_gradient(inp["mask_attribute"][:, 0] > 0.5)
                inp_fg = {
                    **inp,
                    "opacity": jnp.where(fg_sel, inp["opacity"], 0.0),
                }
                out_fg = _trainer._render_with_sinks(
                    inp_fg, extr_j, rcfg,
                    {"mask_attribute": inp["mask_attribute"]},
                    False,
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
                    step > cfg.fg_layer_start_iter, cfg.fg_layer_weight, 0.0
                )
                loss = loss + w_fg * (loss_rgb_fg + loss_mask_fg)
                metrics["loss_rgb_fg"] = loss_rgb_fg
                metrics["loss_mask_fg"] = loss_mask_fg
            metrics["loss"] = loss
            return loss, (metrics, out.radius)

        N = scene.alive.shape[0]
        z = jnp.zeros((N, 2))
        (grads, duv, _), (metrics, radius) = jax.grad(
            inner, argnums=(0, 1, 2), has_aux=True
        )(params, z, z)
        return grads, duv, radius, metrics

    from .mesh import shard_map_nocheck

    def _shmap(f):
        return jax.jit(shard_map_nocheck(
            f, mesh, in_specs=(P(), P("dp")), out_specs=(P(), P())
        ))

    @_shmap
    def dp_step(state: _trainer.TrainState, batch: _trainer.Batch):
        # local batch has leading dim 1 (one pair per chip)
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        key, sub = jax.random.split(state.key)
        grads, duv, radius, metrics = per_pair_loss(
            state.scene.params, state.scene.aux, state.scene.cfg, local, sub,
            state.step,
        )
        # ICI reductions
        grads = jax.lax.pmean(grads, "dp")
        metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        duv = jax.lax.psum(duv, "dp")                    # grad-norm sums
        radius_max = jax.lax.pmax(radius, "dp")          # radii = max
        vis_any = jax.lax.pmax((radius > 0).astype(jnp.int32), "dp") > 0

        updates, opt_state = optimizer.update(grads, state.opt_state, state.scene.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.scene.params, updates)
        new_scene = state.scene.replace(params=new_params)

        ndc_grad = duv * jnp.array([cfg.width / 2.0, cfg.height / 2.0])
        dstate = _density.accumulate_stats(
            state.densify_state, vis_any, radius_max,
            jnp.linalg.norm(ndc_grad, axis=-1),
        )
        return (
            _trainer.TrainState(new_scene, opt_state, dstate, state.step + 1, key),
            metrics,
        )

    return dp_step


def stack_batches(batches) -> _trainer.Batch:
    """Stack B host batches into the [B, ...] device batch for dp_step."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def make_dp_atlas_step(cfg: _trainer.TrainerConfig, extr: np.ndarray,
                       mesh: Mesh):
    """Data-parallel multi-atlas train step: one frame pair per chip,
    per-atlas grads pmean'd over ICI, redundant per-atlas Adam updates.
    Reuses the exact single-chip objective + update
    (`train.atlas_trainer.make_atlas_grad_fn` / `make_atlas_apply_fn`);
    viewspace-grad stats reduce like the single-atlas DP step (visibility
    = any, radii = max, grad norms summed — `dptr_ortho_enhanced.py:
    428-433`)."""
    from ..train import atlas_trainer as _atlas

    grad_fn = _atlas.make_atlas_grad_fn(cfg, extr)
    apply_fn = _atlas.make_atlas_apply_fn(cfg)

    @jax.jit
    @_partial_shmap(mesh)
    def dp_step(state, batch):
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        key, sub = jax.random.split(state.key)
        grads, duv, radius, metrics = grad_fn(state.model, local, sub)
        grads = jax.lax.pmean(grads, "dp")
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, "dp"), metrics)
        duv = jax.lax.psum(duv, "dp")
        radius = jax.lax.pmax(radius, "dp")
        return apply_fn(state, grads, duv, radius, metrics, key)

    return dp_step


def make_dp_joint_step(cfg: _trainer.TrainerConfig, extr: np.ndarray,
                       mesh: Mesh, cam_lr: float = 1e-4,
                       cam_prior_weight: float = 1e-2,
                       cam_warmup_iters: int = 0,
                       cam_lr_warmup_scale: float = 10.0,
                       cam_decay_steps: int = 0,
                       frames=None):
    """Data-parallel camera-refine joint step: scene AND per-frame camera
    twist gradients pmean'd over the mesh (each chip differentiates its
    own (t1, t2) pair's twist rows; averaging matches the single-chip
    expectation over pairs). Reuses `train.camera_refine.make_joint_grad_fn`
    / `make_joint_apply_fn` so --distributed --refine_camera trains the
    identical objective."""
    from ..train import camera_refine as _cam

    grad_fn = _cam.make_joint_grad_fn(cfg, extr, cam_prior_weight)
    apply_fn = _cam.make_joint_apply_fn(
        cfg, cam_lr, cam_warmup_iters, cam_lr_warmup_scale, cam_decay_steps
    )

    @jax.jit
    @_partial_shmap(mesh, n_array_args=2)
    def dp_step(state, batch, frames_arg):
        # strip the sharded leading axis FIRST, then fill per-frame tensors
        # from the replicated device store (otherwise resolve_batch would
        # gather [1, H, W, ...] frames against the local [1]-shaped t1)
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        local = _trainer.resolve_batch(frames_arg, local)
        key, sub = jax.random.split(state.base.key)
        gp, gxi, duv, radius, metrics = grad_fn(state, local, sub)
        gp = jax.lax.pmean(gp, "dp")
        gxi = jax.lax.pmean(gxi, "dp")
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, "dp"), metrics)
        duv = jax.lax.psum(duv, "dp")
        radius = jax.lax.pmax(radius, "dp")
        return apply_fn(state, gp, gxi, duv, radius, metrics, key)

    def step(state, batch):
        return dp_step(state, batch, frames)

    return step


def _partial_shmap(mesh: Mesh, n_array_args: int = 1):
    """shard_map decorator: state replicated, first batch arg sharded on
    "dp", any further args replicated."""
    from .mesh import shard_map_nocheck

    def deco(f):
        in_specs = (P(), P("dp")) + (P(),) * (n_array_args - 1)
        return shard_map_nocheck(f, mesh, in_specs=in_specs,
                                 out_specs=(P(), P()))

    return deco
