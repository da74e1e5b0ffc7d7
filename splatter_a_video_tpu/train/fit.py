"""High-level clip fitting: data -> scene init -> training loop.

TPU-native equivalent of `FragTrainer.__init__` + `read_data_simple` +
the `train.py` main loop (`/root/reference/src/trainer_fragGS.py:136-339`,
`src/train.py:54-215`): lift fg/bg 3D tracks from the clip, build the
spline-based `gs_base` scene, then run the jitted step on a prefetched
frame-pair stream with density control on the reference cadence.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pairs import (
    BatchBuilder,
    PairSampler,
    PairSamplerConfig,
    batch_stream,
    dp_batch_stream,
)
from ..data.video_flow import VideoFlowData
from ..models import camera as _camera
from ..models.gaussians import GaussianScene, SceneConfig, create_scene
from . import losses as _losses
from . import trainer as _trainer


@dataclass(frozen=True)
class FitConfig:
    """End-to-end fit configuration (reference defaults)."""

    num_iters: int = 20000                   # configs/config.txt:17
    num_fg_samples: int = 10000              # read_data_simple tracks (fg)
    num_bg_samples: int = 10000              # and bg (trainer_fragGS.py:256-339)
    capacity_factor: float = 2.0             # slack over initial points
    # bg border-grid extension: margin fraction + the reference's derived
    # grid size 64/(margin/0.25) (`trainer_fragGS.py:328-329`)
    video_flow_margin: float = 0.25
    init_opacity: float = 0.5                # spline cloud init (:125)
    traj: str = "cubic_spline"
    render_attributes: Tuple[Tuple[str, int], ...] = (
        ("mask_attribute", 1),
        ("dino_attribute", 3),
    )
    num_track_samples: int = 4096
    log_every: int = 100
    seed: int = 0
    # Top the lifted-track init up to this many points with depth-unprojected
    # static points (positions through the same normalize_xy + renormalized
    # depth convention as `_lift_query`; colors sampled from the source
    # frame). The reference's flagship YAML requests 100k init points
    # (`frag_gs_v10.yaml:18`); its `positive_Z_random` initializer
    # (`pointrix/point_cloud/utils.py:32-37`) is the depth-blind variant of
    # this. 0 = tracks only (the `read_data_simple` WithBase behavior).
    init_num_points: int = 0
    # NaN guard — the reference drops into pdb on a NaN loss
    # (`trainer_fragGS.py:754-755`); here a non-finite loss at a log
    # boundary raises with the offending step's metrics so a crashed run
    # fails loudly instead of training on garbage.
    nan_guard: bool = True
    # capture a jax.profiler device trace for steps [start, start+count)
    # into this directory (None = off)
    profile_dir: Optional[str] = None
    profile_start: int = 200
    profile_count: int = 5
    # error-map resampling loop closure: every this many steps, render all
    # frames, write per-frame photometric error to `out_dir/flow_error.txt`
    # and bias the pair sampler's id1 draw by it — the mechanism
    # `GSSimpleDataset` reads (`gs_data2.py:60-66`) but whose writer the
    # reference never shipped (nothing creates flow_error.txt there; we
    # close the loop; cadence mirrors `--i_cache`, config.py:88). 0 = off.
    error_resample_every: int = 0
    # data-parallel training over a device mesh: one frame pair per chip,
    # grads pmean'd over ICI (`parallel/dp.py`). Replaces the reference's
    # never-finished NCCL DDP scaffolding (`src/train.py:210-213`).
    distributed: bool = False
    # periodic validation pass: render `val_frames` evenly-spaced frames,
    # compute PSNR/SSIM and fire the before/after_val(_iter) hook sites
    # (the pointrix validation path, `log_hook.py:66-158`). 0 = off.
    val_every: int = 0
    val_frames: int = 4
    # joint scene + per-frame camera refinement: optimize se(3) pose
    # twists alongside the scene (`camera_refine.make_joint_train_step`).
    # Exceeds the reference, whose `TrainableCamera`
    # (`src/pointrix/camera/camera.py:390-515`) is never wired into its
    # trainer. Refined twists are written to `out_dir/camera_xi.npy`.
    refine_camera: bool = False
    camera_lr: float = 1e-4
    # L2 prior anchoring twists to the canonical pose (gauge fixing —
    # see `make_joint_train_step`)
    camera_prior: float = 1e-2
    # BARF-style pose-only warmup: scene gradients are zeroed and the
    # camera lr is boosted 10x for the first K steps, so initial pose
    # error is recovered before the (gauge-free) scene can absorb it
    camera_warmup: int = 0
    # initial per-frame twists [T, 6] (warm start / perturbation tests)
    camera_init_xi: Optional[np.ndarray] = None


def _depth_topup_points(
    data: VideoFlowData, need: int, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray]:
    """[need, 3] static canonical-frustum points sampled from random pixels
    of random frames, unprojected with the renormalized lifting depth, plus
    their [need, 3] source-frame colors."""
    from ..data.video_flow import bilinear_sample, normalize_xy

    H, W = data.image_size
    fs = rng.randint(0, data.num_frames, size=need)
    xy = np.stack(
        [rng.uniform(0, W - 1, need), rng.uniform(0, H - 1, need)], axis=1
    ).astype(np.float32)
    pts = np.zeros((need, 3), np.float32)
    cols = np.zeros((need, 3), np.float32)
    pts[:, :2] = normalize_xy(xy, W, H)
    for f in np.unique(fs):
        m = fs == f
        pts[m, 2] = bilinear_sample(data.get_depth(int(f)), xy[m])
        cols[m] = bilinear_sample(
            np.asarray(data.frames[int(f)], np.float32), xy[m]
        )
    return pts, cols


def build_scene_from_clip(
    data: VideoFlowData, cfg: FitConfig
) -> Tuple[GaussianScene, SceneConfig]:
    """Lift tracks and initialize the spline `gs_base` scene — parity with
    `read_data_simple` (`trainer_fragGS.py:256-339`): fg tracks + bg tracks
    + bg border extension, colors from the query frames, spline fit on the
    combined sequence."""
    rng = np.random.RandomState(cfg.seed)
    fg_tracks, *_, fg_colors = data.get_tracks_3d(
        cfg.num_fg_samples, extract_fg=True, rng=rng
    )
    bg_tracks, *_, bg_colors = data.get_tracks_3d(
        cfg.num_bg_samples, extract_fg=False, rng=rng
    )
    ext_tracks, ext_colors = data.extend_track3d(
        bg_tracks,
        grid_size=int(64 / (cfg.video_flow_margin / 0.25)),
        margin=cfg.video_flow_margin,
    )

    tracks = np.concatenate([fg_tracks, bg_tracks, ext_tracks], axis=0)  # [N,T,3]
    colors = np.concatenate([fg_colors, bg_colors, ext_colors], axis=0)
    # drop any nan tracks (reference filters nan rows,
    # dynamic_gaussian_with_base_point_cloud.py:56)
    ok = ~np.isnan(tracks).any(axis=(1, 2))
    tracks, colors = tracks[ok], colors[ok]

    if cfg.init_num_points and tracks.shape[0] < cfg.init_num_points:
        need = cfg.init_num_points - tracks.shape[0]
        pts, cols = _depth_topup_points(data, need, rng)
        tracks = np.concatenate(
            [tracks, np.repeat(pts[:, None, :], tracks.shape[1], axis=1)], 0
        )
        colors = np.concatenate([colors, cols], 0)

    track_seq = np.swapaxes(tracks, 0, 1)  # [T, N, 3]
    N = track_seq.shape[1]
    capacity = int(np.ceil(N * cfg.capacity_factor / 128) * 128)
    scfg = SceneConfig(
        capacity=capacity,
        num_frames=data.num_frames,
        traj=cfg.traj,
        render_attributes=cfg.render_attributes,
    )
    scene = create_scene(
        scfg,
        track_seq[0],
        colors,
        init_opacity=cfg.init_opacity,
        track_seq=track_seq if cfg.traj == "cubic_spline" else None,
    )
    return scene, scfg


def _make_frame_error_fn(data: VideoFlowData, tcfg: _trainer.TrainerConfig, cam):
    """One jitted lax.map over all frames -> per-frame mean |rgb error|,
    the error-map signal `flow_error.txt` carries (`gs_data2.py:60-66`)."""
    from ..ops import rasterize as _raster

    rcfg = tcfg.raster_cfg()
    extr_j = jnp.asarray(cam.extrinsic, jnp.float32)
    gts = jnp.asarray(
        np.stack([np.asarray(data.frames[i], np.float32)
                  for i in range(data.num_frames)])
    )
    ts = jnp.arange(data.num_frames, dtype=jnp.float32)

    @jax.jit
    def frame_errors(scene: GaussianScene) -> jnp.ndarray:
        def one(args):
            t, gt = args
            out = _raster.render_gaussians(
                scene.get_position(t), scene.get_scaling(),
                scene.get_rotation(t), scene.get_opacity(), scene.get_shs(),
                extr_j, rcfg,
            )
            return jnp.mean(jnp.abs(out.features["rgb"] - gt))

        return jax.lax.map(one, (ts, gts))

    return frame_errors


def _make_panel_fn(data: VideoFlowData, tcfg: _trainer.TrainerConfig, cam):
    """Per-frame observability panels — the reference's in-training image
    logging (`trainer_fragGS.py:847-879`: rendered rgb, gt, colorized
    depth, error map, track overlay)."""
    from .. import inference
    from ..utils import vis as _vis

    rcfg = tcfg.raster_cfg()
    extr = jnp.asarray(cam.extrinsic, jnp.float32)

    def panels(scene, t: int):
        t = int(t)
        out = inference.render_frame(scene, jnp.float32(t), extr, rcfg)
        rgb = np.clip(np.asarray(out.features["rgb"]), 0, 1)
        depth = np.asarray(out.features["depth"][..., 0])
        gt = np.asarray(data.frames[t], np.float32)
        imgs = {
            "rgb_pred": rgb,
            "rgb_gt": gt,
            "depth": _vis.colorize_depth(depth),
            "error": np.repeat(
                np.abs(rgb - gt).mean(-1, keepdims=True), 3, axis=-1
            ),
        }
        try:
            tr3d = inference.gaussian_trajectories(
                scene, list(range(t + 1)), sample=128
            )
            px = np.asarray(
                _losses.denormalize_coords(
                    jnp.asarray(tr3d[..., :2]), tcfg.height, tcfg.width
                )
            )
            imgs["tracks"] = _vis.draw_tracks_2d(rgb, px)
        except Exception:
            pass  # overlay is best-effort; panels above always ship
        return imgs

    return panels


def _run_validation(data, scene, render_panels, val_frames, hooks, ctx):
    """PSNR/SSIM over evenly-spaced frames + the four val hook sites."""
    from ..eval import metrics as _metrics
    from .hooks import run_hooks

    run_hooks(hooks, "before_val", ctx)
    T = data.num_frames
    ts = np.unique(
        np.linspace(0, T - 1, min(val_frames, T)).astype(int)
    )
    psnrs, ssims = [], []
    for t in ts:
        run_hooks(hooks, "before_val_iter", ctx)
        imgs = render_panels(scene, int(t))
        gt = np.asarray(data.frames[int(t)], np.float32)
        psnrs.append(_metrics.psnr(imgs["rgb_pred"], gt))
        ssims.append(_metrics.ssim(imgs["rgb_pred"], gt))
        run_hooks(hooks, "after_val_iter", ctx)
    ctx.val_metrics = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "num_frames": float(len(ts)),
    }
    run_hooks(hooks, "after_val", ctx)


def _save_cam_refine(cs: Dict, out_dir: str) -> None:
    """Persist the camera twists + their Adam state next to the orbax
    checkpoints. CheckPointHook saves only the base TrainState, so without
    this a crashed/resumed refine_camera run would silently restart xi at
    zero against a scene that already absorbed the refined poses."""
    leaves = jax.tree_util.tree_leaves(cs["opt"])
    np.savez(
        os.path.join(out_dir, "camera_refine.npz"),
        xi=np.asarray(cs["xi"]),
        **{f"opt_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def _restore_cam_refine(cs: Dict, out_dir: str) -> bool:
    path = os.path.join(out_dir, "camera_refine.npz")
    if not os.path.exists(path):
        return False
    z = np.load(path)
    cs["xi"] = jnp.asarray(z["xi"])
    treedef = jax.tree_util.tree_structure(cs["opt"])
    cs["opt"] = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(z[f"opt_{i}"]) for i in range(treedef.num_leaves)],
    )
    return True


def fit_clip(
    data: VideoFlowData,
    fit_cfg: Optional[FitConfig] = None,
    trainer_cfg: Optional[_trainer.TrainerConfig] = None,
    callback: Optional[Callable[[int, Dict], None]] = None,
    hooks: Optional[List] = None,
    out_dir: Optional[str] = None,
    resume: bool = False,
    sampler=None,
) -> Tuple[_trainer.TrainState, List[Dict]]:
    """Fit one clip end-to-end. Returns (final state, metric history).

    hooks: `train.hooks.Hook` list run at the reference's lifecycle sites
    (before_train / after_train_iter / after_train) with a `HookContext`.
    resume=True restores the latest orbax checkpoint under `out_dir` and
    continues from its step — the `load_from_ckpt` auto-resume behavior
    (`trainer_fragGS.py:968-997`)."""
    t_fit0 = time.time()
    fit_cfg = fit_cfg or FitConfig()
    H, W = data.image_size
    if trainer_cfg is None:
        trainer_cfg = _trainer.TrainerConfig(
            width=W, height=H, num_frames=data.num_frames,
            num_track_samples=fit_cfg.num_track_samples,
            max_steps=fit_cfg.num_iters,
        )

    scene, scfg = build_scene_from_clip(data, fit_cfg)
    cam = _camera.canonical_camera(W, H)
    # Device-resident frame store: upload every per-frame supervision
    # tensor ONCE and gather by t1 inside the jitted step. The per-step
    # host->device transfer drops from ~8 MB (480p rgb+depth+mask) to the
    # few-KB track batch — measured 357 ms/step wall vs 34.6 ms device
    # without it over the TPU relay. The dp stream keeps full batches
    # (each chip consumes a different t1 from a stacked batch).
    frames = None
    if not fit_cfg.distributed:
        need_mask = (trainer_cfg.mask_attr_weight > 0
                     or trainer_cfg.fg_layer_weight > 0)
        need_dino = trainer_cfg.dino_attr_weight > 0
        dinos = ([data.get_dino(t) for t in range(data.num_frames)]
                 if need_dino else [None])
        frames = _trainer.FrameStore(
            rgb=jnp.asarray(np.stack(
                [np.asarray(f, np.float32) for f in data.frames])),
            depth=jnp.asarray(np.stack(
                [np.asarray(data.get_loss_depth(t), np.float32)
                 for t in range(data.num_frames)])),
            mask=jnp.asarray(np.stack(
                [np.asarray(m, np.float32) for m in data.masks_raw]))
            if need_mask else None,
            dino=jnp.asarray(np.stack(
                [np.asarray(d, np.float32) for d in dinos]))
            if need_dino and dinos[0] is not None else None,
        )
    train_step, density_step, opacity_reset = _trainer.make_train_step(
        trainer_cfg, cam.extrinsic, frames=frames
    )
    cam_refine_state = None
    if fit_cfg.refine_camera:
        if fit_cfg.distributed:
            raise ValueError(
                "refine_camera is not supported with distributed=True "
                "(per-frame twists would need cross-chip reduction)"
            )
        from . import camera_refine as _cam_refine

        # cosine-decay the camera lr to 0 over the post-warmup iters:
        # bounds the gauge drift of the twists (see camera_refine.py)
        cam_decay = max(fit_cfg.num_iters - fit_cfg.camera_warmup, 1)
        _joint_step = _cam_refine.make_joint_train_step(
            trainer_cfg, cam.extrinsic, cam_lr=fit_cfg.camera_lr,
            cam_prior_weight=fit_cfg.camera_prior,
            cam_warmup_iters=fit_cfg.camera_warmup,
            cam_decay_steps=cam_decay,
            frames=frames,
        )
        xi0 = (
            jnp.asarray(fit_cfg.camera_init_xi, jnp.float32)
            if fit_cfg.camera_init_xi is not None
            else jnp.zeros((trainer_cfg.num_frames, 6), jnp.float32)
        )
        cam_refine_state = {
            "xi": xi0,
            "opt": _cam_refine.make_cam_optimizer(
                fit_cfg.camera_lr, fit_cfg.camera_warmup,
                decay_steps=cam_decay,
            ).init(xi0),
        }

        def train_step(state, batch, _js=_joint_step, _cs=cam_refine_state):
            cs, metrics = _js(
                _cam_refine.CamTrainState(state, _cs["xi"], _cs["opt"]), batch
            )
            _cs["xi"], _cs["opt"] = cs.cam_xi, cs.cam_opt_state
            metrics = dict(metrics)
            metrics["cam_xi_norm"] = jnp.linalg.norm(cs.cam_xi)
            return cs.base, metrics

    ndev = 1
    if fit_cfg.distributed:
        from ..parallel import dp as _dp
        from ..parallel import mesh as _mesh_lib

        ndev = len(jax.devices())
        if ndev > 1:
            dp_mesh = _mesh_lib.make_mesh(ndev)
            train_step = _dp.make_dp_train_step(
                trainer_cfg, cam.extrinsic, dp_mesh
            )
        else:
            ndev = 1  # single device: plain step (DP would only add noise)
    from .hooks import HookContext, run_hooks

    hooks = hooks or []
    ctx = HookContext(out_dir or ".", cfg=trainer_cfg)
    ctx.hooks = hooks
    run_hooks(hooks, "before_run", ctx)

    state = _trainer.init_train_state(trainer_cfg, scene, seed=fit_cfg.seed)
    start_step = 0
    if resume and out_dir is not None:
        from ..utils import checkpoint as _ckpt

        restored, ck_step = _ckpt.restore_checkpoint(out_dir, state)
        if restored is not None:
            state, start_step = restored, int(ck_step)
            print(f"resumed from {out_dir} at step {start_step}", flush=True)
            ctx.state = state
            ctx.step = start_step
            if cam_refine_state is not None and _restore_cam_refine(
                cam_refine_state, out_dir
            ):
                print("resumed camera twists from camera_refine.npz",
                      flush=True)
            run_hooks(hooks, "after_load_checkpoint", ctx)

    ctx.state = state
    run_hooks(hooks, "before_train", ctx)

    # image-panel cadence: the max image_every any hook requests
    image_every = max(
        [getattr(h, "image_every", 0) or 0 for h in hooks], default=0
    )
    # after_train_iter must also fire on every hook's own cadence — a
    # CheckPointHook(every=250) with log_every=100 would otherwise only
    # save at multiples of 500 (lcm) while appearing configured correctly
    hook_cadences = sorted(
        {
            c
            for h in hooks
            for c in (
                getattr(h, "every", 0),
                getattr(h, "print_every", 0),
                getattr(h, "image_every", 0),
            )
            if c
        }
    )
    render_panels = None
    if image_every > 0 or fit_cfg.val_every > 0:
        render_panels = _make_panel_fn(data, trainer_cfg, cam)

    if sampler is None:
        sampler = PairSampler(
            PairSamplerConfig(num_frames=data.num_frames, seed=fit_cfg.seed)
        )
    builder = BatchBuilder(data, fit_cfg.num_track_samples,
                           seed=fit_cfg.seed, slim=frames is not None)

    frame_errors = None
    if fit_cfg.error_resample_every > 0:
        frame_errors = _make_frame_error_fn(data, trainer_cfg, cam)

    history: List[Dict] = []
    densify_totals = {"cloned": 0, "split": 0, "pruned": 0, "dropped": 0,
                      "events": 0}
    densify_stopped = False
    t_start = time.time()
    t_first_step = None  # wall after step 1 completes (compile included)
    profiling = False
    if ndev > 1:
        stream = dp_batch_stream(
            sampler, builder, fit_cfg.num_iters, ndev, start_step=start_step
        )
    else:
        stream = batch_stream(
            sampler, builder, fit_cfg.num_iters, start_step=start_step
        )
    for step, batch in enumerate(stream, start=start_step + 1):
        ctx.step = step
        run_hooks(hooks, "before_train_iter", ctx)
        if fit_cfg.profile_dir is not None:
            if step == fit_cfg.profile_start:
                jax.profiler.start_trace(fit_cfg.profile_dir)
                profiling = True
            elif profiling and step == fit_cfg.profile_start + fit_cfg.profile_count:
                jax.block_until_ready(state.scene.params["position"])
                jax.profiler.stop_trace()
                profiling = False
        state, metrics = train_step(state, batch)
        if t_first_step is None:
            # one deliberate pipeline bubble: separates compile time from
            # the steady-state rate in the returned timing breakdown
            jax.block_until_ready(metrics)
            t_first_step = time.time()
        if _trainer.should_densify(trainer_cfg, step) and not densify_stopped:
            state, dinfo = density_step(state)
            # capacity accounting: the reference grows unboundedly
            # (`points.py:281-395`); our static-capacity design drops
            # candidates that find no free slot. That cap must never be
            # silent (SURVEY §7) — accumulate and surface in history.
            densify_totals["cloned"] += int(dinfo.num_cloned)
            densify_totals["split"] += int(dinfo.num_split)
            densify_totals["pruned"] += int(dinfo.num_pruned)
            densify_totals["dropped"] += int(dinfo.dropped)
            densify_totals["events"] += 1
            if int(dinfo.dropped) > 0:
                print(
                    f"# densify step {step}: {int(dinfo.dropped)} candidates"
                    f" dropped (capacity {int(state.scene.cfg.capacity)},"
                    f" alive {int(dinfo.num_alive)})", flush=True,
                )
            # saturation latch: a full scene cannot grow — further events
            # are pure prune-and-refill churn, measured as the collapse
            # agent on the 480p textured harness (density.DensifyConfig.
            # saturation_stop). Permanent for the run, reported loudly.
            sat_stop = getattr(trainer_cfg.densify, "saturation_stop", 0.0)
            if sat_stop and (
                int(dinfo.num_alive)
                >= sat_stop * state.scene.cfg.capacity
            ):
                densify_stopped = True
                densify_totals["stopped_at_step"] = step
                print(
                    f"# densify stopped at step {step}: saturation "
                    f"{int(dinfo.num_alive)}/{int(state.scene.cfg.capacity)}"
                    f" >= {sat_stop:.2f} (churn guard)", flush=True,
                )
        if _trainer.should_reset_opacity(trainer_cfg, step):
            state = opacity_reset(state)
        if (
            frame_errors is not None
            and step % fit_cfg.error_resample_every == 0
            and step < fit_cfg.num_iters
        ):
            errs = np.maximum(np.asarray(frame_errors(state.scene)), 1e-8)
            sampler.cfg.error_weights = errs  # biases subsequent id1 draws
            if out_dir is not None:
                np.savetxt(os.path.join(out_dir, "flow_error.txt"), errs)
        fire_log = step % fit_cfg.log_every == 0 or step == fit_cfg.num_iters
        if fire_log or any(step % c == 0 for c in hook_cadences):
            m = {k: float(v) for k, v in metrics.items()}
            m["step"] = step
            m["alive"] = int(state.scene.num_alive)
            m["capacity"] = int(state.scene.cfg.capacity)
            m["saturation"] = round(m["alive"] / max(m["capacity"], 1), 4)
            if densify_totals["events"]:
                m["densify"] = dict(densify_totals)
            m["wall_s"] = time.time() - t_start
            if fire_log:
                history.append(m)
                if fit_cfg.nan_guard and not np.isfinite(m.get("loss", 0.0)):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {m} "
                        "(reference behavior: pdb trap, trainer_fragGS.py:754)"
                    )
                if callback:
                    callback(step, m)
            ctx.step = step
            ctx.metrics = m
            ctx.state = state
            if cam_refine_state is not None:
                ctx.camera_xi = np.asarray(cam_refine_state["xi"])
                if out_dir is not None:
                    _save_cam_refine(cam_refine_state, out_dir)
            if (
                render_panels is not None
                and image_every
                and step % image_every == 0
            ):
                ctx.images = render_panels(state.scene, step % data.num_frames)
            run_hooks(hooks, "after_train_iter", ctx)
        if fit_cfg.val_every and step % fit_cfg.val_every == 0:
            ctx.step = step
            ctx.state = state
            _run_validation(
                data, state.scene, render_panels, fit_cfg.val_frames,
                hooks, ctx,
            )
    if profiling:
        jax.profiler.stop_trace()
    # phase breakdown: `train_minutes`-style totals hide where the wall
    # went (the r3 flagship artifact read 34 min while the steady step was
    # ~50 ms = 17 min); history[-1]["timing"] makes the split citable
    if history:
        # close the async stream: without this, in-flight device work on
        # the last step is partially excluded from the measurement
        jax.block_until_ready(state.scene.params["position"])
        t_end = time.time()
        timing = {"setup_s": round(t_start - t_fit0, 2)}
        if t_first_step is not None:
            timing["first_step_s"] = round(t_first_step - t_start, 2)
            n_steady = int(state.step) - start_step - 1
            if n_steady > 0:
                # NOTE: steady_ms averages the whole post-compile loop —
                # densify events, logging, validation, panel renders and
                # checkpoint hooks included. It is run telemetry, not a
                # per-step device time (use scripts/bench_train_dense.py
                # for the closed kernel-level number).
                timing["steady_ms"] = round(
                    (t_end - t_first_step) / n_steady * 1e3, 3
                )
                timing["steady_includes_hooks"] = True
        timing["total_s"] = round(t_end - t_fit0, 2)
        history[-1]["timing"] = timing
        if densify_totals["events"]:
            history[-1]["densify_totals"] = dict(densify_totals)
    ctx.step = int(state.step)
    ctx.state = state
    if cam_refine_state is not None:
        xi = np.asarray(cam_refine_state["xi"])
        ctx.camera_xi = xi
        if out_dir is not None:
            np.save(os.path.join(out_dir, "camera_xi.npy"), xi)
    run_hooks(hooks, "after_train", ctx)
    run_hooks(hooks, "after_run", ctx)
    return state, history
