"""Generic multi-view 3DGS training engine (static scenes, perspective).

TPU-native equivalent of the reference's pointrix engine
(`/root/reference/src/pointrix/engine/default_trainer.py:22-212`) — the
general-purpose Gaussian-splatting trainer that the video product
(`FragTrainer`) bypasses but the framework ships: dataset readers ->
static Gaussian scene -> perspective render -> L1+D-SSIM -> per-attribute
Adam + density control -> validation + test/novel-view export, with the
same hook lifecycle.

TPU idioms (vs the reference's eager torch loop):
  * ONE jitted train step taking the per-frame camera (extrinsic [3,4],
    intrinsic [4]) and ground-truth image as device arrays — no recompile
    across viewpoints;
  * progressive SH (`update_sh_degree`, `dptr_ortho_enhanced.py:435-443`)
    implemented by *masking* SH coefficients above the active degree with
    a traced scalar — numerically identical to evaluating a lower degree
    (unused coeffs are zero and get zero gradients) without a recompile
    per degree;
  * density control under static capacity (`train/density.py`), the Adam
    state zeroed at recycled slots.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import readers as _readers
from ..models import camera as _camera
from ..models.gaussians import GaussianScene, SceneConfig, create_scene
from ..ops import projection as _projection
from ..ops import quaternion as _quaternion
from ..ops import rasterize as _raster
from ..ops import sh as _sh
from ..ops.ssim import ssim as _ssim
from . import density as _density
from . import hooks as _hooks
from . import losses as _losses
from . import optim as _optim

# Classic 3DGS learning rates used by the generic engine (the reference's
# pointrix optimizer YAML surface, `parse_optimizer` param groups); the
# video product uses the frag_gs_v10 values in `optim.DEFAULT_LRS`.
ENGINE_LRS: Dict[str, float] = {
    "position": 0.00016,
    "features_dc": 0.0025,
    "features_rest": 0.000125,
    "scaling": 0.005,
    "rotation": 0.001,
    "opacity": 0.05,
}
ENGINE_SCHEDULES: Dict[str, Tuple[float, float]] = {
    "position": (0.00016, 0.0000016),
}


@dataclass(frozen=True)
class EngineConfig:
    """Static engine configuration — mirror of `DefaultTrainer.Config`
    (`default_trainer.py:35-58`) minus the torch DataLoader knobs."""

    width: int
    height: int
    capacity: int = 1 << 17
    max_steps: int = 30000
    val_interval: int = 2000
    sh_degree_interval: int = 1000       # update_sh_degree cadence
    max_sh_degree: int = 3
    lambda_dssim: float = 0.2
    init_opacity: float = 0.1
    spatial_lr_scale: bool = True        # scale position lr by scene radius
    random_init_points: int = 100_000    # fallback when the reader has no cloud
    # rasterizer
    max_intersections: int = 1 << 19
    max_tiles_per_gaussian: int = 64
    block_x: int = 16
    block_y: int = 16
    nearest: float = 0.2                 # perspective near cull
    densify: _density.DensifyConfig = field(
        default_factory=lambda: _density.DensifyConfig(
            percent_dense=0.01,
            densify_start_iter=500,
            densify_stop_iter=15000,
            min_opacity=0.005,
        )
    )
    optim: _optim.OptimConfig = field(
        default_factory=lambda: _optim.OptimConfig(
            max_steps=30000,
            lrs=tuple(sorted(ENGINE_LRS.items())),
            schedules=tuple(sorted(ENGINE_SCHEDULES.items())),
        )
    )

    def raster_cfg(self) -> _raster.RasterizeConfig:
        return _raster.RasterizeConfig(
            width=self.width,
            height=self.height,
            max_intersections=self.max_intersections,
            max_tiles_per_gaussian=self.max_tiles_per_gaussian,
            block_x=self.block_x,
            block_y=self.block_y,
            nearest=self.nearest,
            ortho=False,
            sh_degree=self.max_sh_degree,
        )


class EngineState(NamedTuple):
    scene: GaussianScene
    opt_state: Any
    densify_state: _density.DensifyState
    step: jnp.ndarray
    key: jax.Array


class FrameBatch(NamedTuple):
    """One training view, device-resident. The background intensity is a
    per-dataset constant (the reference's `datapipeline.white_bg`), baked
    statically into the compiled step rather than carried per frame."""

    extr: jnp.ndarray     # [3, 4]
    intr: jnp.ndarray     # [4] (fx, fy, cx, cy)
    rgb: jnp.ndarray      # [H, W, 3]


def _sh_degree_mask(active_degree: jnp.ndarray, max_degree: int) -> jnp.ndarray:
    """[ (max_degree+1)^2 ] 0/1 mask keeping coefficients of degree <=
    active_degree. Zeroing coeffs == evaluating the truncated SH basis."""
    K = (max_degree + 1) ** 2
    idx = jnp.arange(K)
    degree_of = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (degree_of <= active_degree).astype(jnp.float32)


def _render_persp_with_sinks(scene, rcfg, batch: FrameBatch, active_sh,
                             uv_sink, abs_sink, bg: float):
    """Perspective render with viewspace gradient sinks (the `ndc` /
    `abs_ndc` retain_grad capture, `dptr_ortho_enhanced.py:331-338`) and
    camera-centered SH view directions (`dptr.py` render path)."""
    position = scene.get_position(0.0)
    cam_center = -batch.extr[:3, :3].T @ batch.extr[:3, 3]
    d = position - cam_center
    dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

    uv, depth = _projection.project_persp(
        position, batch.intr, batch.extr, rcfg.width, rcfg.height,
        rcfg.nearest, rcfg.extent,
    )
    uv = uv + uv_sink
    visible = depth != 0

    shs = scene.get_shs() * _sh_degree_mask(active_sh, rcfg.sh_degree)[None, :, None]
    rgb = _sh.eval_sh(rcfg.sh_degree, shs, dirs, visible)
    cov3d = _quaternion.build_cov3d(scene.get_scaling(), scene.get_rotation(0.0), visible)
    max_r = _projection.max_radius_for_tile_cap(rcfg.max_tiles_per_gaussian, rcfg.block)
    conic, radius, tiles, rect_min, rect_max = _projection.ewa_persp(
        position, cov3d, batch.intr, batch.extr, uv, rcfg.width, rcfg.height,
        visible, rcfg.block, max_r, rcfg.rect_mode,
        jax.lax.stop_gradient(scene.get_opacity()),
    )
    groups = {
        "rgb": (rgb, float(bg), True),
        "depth": (depth[:, None], 0.0, True),
    }
    return _raster.rasterize(
        uv, depth, conic, radius, tiles, rect_min, rect_max,
        scene.get_opacity(), groups, rcfg, abs_sink=abs_sink,
    )


def make_engine_train_step(cfg: EngineConfig, bg: float = 0.0):
    """Jitted (state, batch, active_sh) -> (state, metrics)."""
    rcfg = cfg.raster_cfg()
    optimizer = _optim.make_optimizer(cfg.optim)

    @jax.jit
    def train_step(state: EngineState, batch: FrameBatch, active_sh):
        scene0 = state.scene

        def loss_fn(params, uv_sink, abs_sink):
            sc = GaussianScene(params=params, aux=scene0.aux, cfg=scene0.cfg)
            out = _render_persp_with_sinks(sc, rcfg, batch, active_sh,
                                           uv_sink, abs_sink, bg)
            pred = out.features["rgb"]
            loss = _losses.rgb_loss(pred, batch.rgb, cfg.lambda_dssim)
            metrics = {
                "loss": loss,
                "psnr": _losses.psnr(pred, batch.rgb),
                "num_intersections": out.num_intersections,
            }
            return loss, (metrics, out.radius)

        N = scene0.alive.shape[0]
        uv0 = jnp.zeros((N, 2))
        (grads, duv, _dabs), (metrics, radius) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(scene0.params, uv0, uv0)

        updates, opt_state = optimizer.update(grads, state.opt_state, scene0.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, scene0.params, updates)

        ndc_grad = duv * jnp.array([cfg.width / 2.0, cfg.height / 2.0])
        dstate = _density.accumulate_stats(
            state.densify_state, radius > 0, radius,
            jnp.linalg.norm(ndc_grad, axis=-1),
        )
        return (
            EngineState(scene0.replace(params=new_params), opt_state, dstate,
                        state.step + 1, state.key),
            metrics,
        )

    @jax.jit
    def density_step(state: EngineState):
        key, sub = jax.random.split(state.key)
        scene, opt_state, dstate, info = _density.densify_and_prune(
            state.scene, state.opt_state, state.densify_state,
            state.step, cfg.densify, sub,
        )
        return EngineState(scene, opt_state, dstate, state.step, key), info

    @jax.jit
    def opacity_reset_step(state: EngineState):
        scene, opt_state = _density.reset_opacity(state.scene, state.opt_state)
        return EngineState(scene, opt_state, state.densify_state,
                           state.step, state.key)

    @jax.jit
    def eval_step(state: EngineState, batch: FrameBatch):
        out = _render_persp_with_sinks(
            state.scene, rcfg, batch,
            jnp.asarray(cfg.max_sh_degree),
            jnp.zeros((state.scene.alive.shape[0], 2)),
            jnp.zeros((state.scene.alive.shape[0], 2)),
            bg,
        )
        pred = jnp.clip(out.features["rgb"], 0.0, 1.0)
        return pred, {
            "psnr": _losses.psnr(pred, batch.rgb),
            "ssim": _ssim(pred, batch.rgb),
            "l1": _losses.l1_loss(pred, batch.rgb),
        }

    return train_step, density_step, opacity_reset_step, eval_step


def _frames_to_device(frames: _readers.SceneFrames) -> List[FrameBatch]:
    return [
        FrameBatch(
            extr=jnp.asarray(cam.extrinsic),
            intr=jnp.asarray(cam.intrinsic),
            rgb=jnp.asarray(frames.load_image(i)),
        )
        for i, cam in enumerate(frames.cameras)
    ]


class Engine:
    """Host-side orchestration: `DefaultTrainer.train_loop` equivalent
    (`default_trainer.py:146-167`) over jitted steps."""

    def __init__(
        self,
        cfg: EngineConfig,
        train_frames: _readers.SceneFrames,
        val_frames: Optional[_readers.SceneFrames] = None,
        out_dir: str = "output",
        hooks: Optional[Sequence[_hooks.Hook]] = None,
        seed: int = 0,
    ):
        for cam in train_frames.cameras:
            if (cam.width, cam.height) != (cfg.width, cfg.height):
                raise ValueError(
                    f"camera {cam.width}x{cam.height} != engine "
                    f"{cfg.width}x{cfg.height} (uniform sizes required)"
                )
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

        extent = train_frames.camera_extent()
        if cfg.spatial_lr_scale:
            cfg = self.cfg = _replace_dataclass(
                cfg,
                optim=_replace_dataclass(cfg.optim, spatial_lr_scale=extent),
                densify=_replace_dataclass(cfg.densify, cameras_extent=extent),
            )

        pcd = train_frames.pointcloud
        rng = np.random.RandomState(seed)
        if pcd is not None:
            positions, colors = pcd.positions, pcd.colors
        else:
            # random init within the camera-extent cube (reference
            # `points_init` random mode, `point_cloud/utils.py:23-50`)
            n = min(cfg.random_init_points, cfg.capacity)
            positions = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
            colors = rng.uniform(0.25, 0.75, (n, 3)).astype(np.float32)
        if positions.shape[0] > cfg.capacity:
            sel = rng.choice(positions.shape[0], cfg.capacity, replace=False)
            positions, colors = positions[sel], colors[sel]

        scfg = SceneConfig(
            capacity=cfg.capacity, num_frames=1,
            max_sh_degree=cfg.max_sh_degree, traj="static",
        )
        scene = create_scene(scfg, positions, colors,
                             init_opacity=cfg.init_opacity)
        optimizer = _optim.make_optimizer(cfg.optim)
        self.state = EngineState(
            scene=scene,
            opt_state=optimizer.init(scene.params),
            densify_state=_density.init_state(cfg.capacity),
            step=jnp.zeros((), jnp.int32),
            key=jax.random.PRNGKey(seed),
        )
        self.bg = float(train_frames.backgrounds[0]) if train_frames.backgrounds else 0.0
        self.train_batches = _frames_to_device(train_frames)
        self.val_batches = _frames_to_device(val_frames) if val_frames else []
        (self._train_step, self._density_step, self._opacity_reset,
         self._eval_step) = make_engine_train_step(cfg, self.bg)
        self.hooks = list(hooks) if hooks else []
        self.ctx = _hooks.HookContext(out_dir, cfg)
        self._rng = rng
        self._order: List[int] = []
        self.metrics: Dict[str, float] = {}
        self.val_metrics: Dict[str, float] = {}

    # -- scheduling --------------------------------------------------------

    def _next_view(self) -> FrameBatch:
        """Random-without-replacement viewpoint stack (the reference pops
        from a shuffled camera list per epoch)."""
        if not self._order:
            self._order = list(self._rng.permutation(len(self.train_batches)))
        return self.train_batches[self._order.pop()]

    def active_sh_degree(self, step: int) -> int:
        return min(step // self.cfg.sh_degree_interval, self.cfg.max_sh_degree)

    # -- loops -------------------------------------------------------------

    def train(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total = num_steps if num_steps is not None else cfg.max_steps
        _hooks.run_hooks(self.hooks, "before_train", self.ctx)
        start = int(self.state.step)
        for it in range(start, start + total):
            _hooks.run_hooks(self.hooks, "before_train_iter", self.ctx)
            batch = self._next_view()
            sh = jnp.asarray(self.active_sh_degree(it))
            self.state, metrics = self._train_step(self.state, batch, sh)

            d = cfg.densify
            if d.densify_start_iter < it < d.densify_stop_iter and it > 0 \
                    and it % d.duplicate_interval == 0:
                self.state, info = self._density_step(self.state)
                self.metrics["num_alive"] = int(info.num_alive)
            if it > 1 and it % d.opacity_reset_interval == 1:
                self.state = self._opacity_reset(self.state)

            self.metrics.update({k: float(v) for k, v in metrics.items()})
            self.ctx.step = it
            self.ctx.metrics = self.metrics
            # state/hooks must be on the ctx or a CheckPointHook is a
            # silent no-op (its guard is `ctx.state is not None`)
            self.ctx.state = self.state
            self.ctx.hooks = self.hooks
            _hooks.run_hooks(self.hooks, "after_train_iter", self.ctx)

            if self.val_batches and (it + 1) % cfg.val_interval == 0:
                self.validation()
        _hooks.run_hooks(self.hooks, "after_train", self.ctx)
        return self.metrics

    def validation(self) -> Dict[str, float]:
        """`DefaultTrainer.validation` (`default_trainer.py:121-131`)."""
        _hooks.run_hooks(self.hooks, "before_val", self.ctx)
        acc: Dict[str, float] = {}
        for batch in self.val_batches:
            _hooks.run_hooks(self.hooks, "before_val_iter", self.ctx)
            _, m = self._eval_step(self.state, batch)
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            _hooks.run_hooks(self.hooks, "after_val_iter", self.ctx)
        n = max(len(self.val_batches), 1)
        self.val_metrics = {k: v / n for k, v in acc.items()}
        self.ctx.val_metrics = self.val_metrics
        _hooks.run_hooks(self.hooks, "after_val", self.ctx)
        return self.val_metrics

    def render_view(self, batch: FrameBatch) -> np.ndarray:
        pred, _ = self._eval_step(self.state, batch)
        return np.asarray(pred)

    def test(self, novel_views: int = 0) -> Dict[str, float]:
        """Render validation views (+ optional spiral novel path) to
        `out_dir` — `DefaultTrainer.test` / `test_view_render` +
        `novel_view_render` (`exporter/novel_view.py:20-128`)."""
        import imageio.v2 as imageio

        metrics = self.validation() if self.val_batches else {}
        for i, batch in enumerate(self.val_batches):
            img = (self.render_view(batch) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(self.out_dir, f"test_{i:03d}.png"), img)
        if novel_views:
            base = _camera.Camera(
                width=self.cfg.width, height=self.cfg.height,
            )
            if self.val_batches:
                b = self.val_batches[0]
                extr = np.asarray(b.extr)
                base = base.with_pose(extr[:3, :3], extr[:3, 3])
            for i, cam in enumerate(
                _camera.spiral_path(base, novel_views)
            ):
                nb = FrameBatch(
                    extr=jnp.asarray(cam.extrinsic),
                    intr=jnp.asarray(cam.intrinsic),
                    rgb=jnp.zeros((self.cfg.height, self.cfg.width, 3)),
                )
                img = (self.render_view(nb) * 255).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(self.out_dir, f"novel_{i:03d}.png"), img
                )
        return metrics


def _replace_dataclass(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


def engine_from_dataset(
    data_root: str,
    data_format: str,
    cfg: Optional[EngineConfig] = None,
    out_dir: str = "output",
    **engine_kw,
) -> Engine:
    """Build an Engine from a registered dataset format — the
    `parse_data_pipeline` -> `DefaultTrainer` composition."""
    reader = _readers.parse_data_format(data_format)
    train_frames = reader(data_root, "train")
    try:
        val_frames = reader(data_root, "val")
    except (FileNotFoundError, KeyError):
        val_frames = None
    if cfg is None:
        cam = train_frames.cameras[0]
        cfg = EngineConfig(width=cam.width, height=cam.height)
    return Engine(cfg, train_frames, val_frames, out_dir=out_dir, **engine_kw)
