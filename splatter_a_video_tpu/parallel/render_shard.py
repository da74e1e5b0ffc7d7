"""Gaussian-sharded (model-parallel) rendering over a device mesh.

The reference has no multi-GPU rendering at all (SURVEY.md §2.12); this is
the TPU-native capability that replaces it for beyond-single-chip scenes:

  1. gaussians are depth-sorted for the target frame (one global
     `lax.sort` — cheap, and already the binning currency);
  2. the sorted arrays are sharded into per-device contiguous DEPTH SLABS
     over a 1-D mesh axis (`shard_map`);
  3. every device runs the full single-chip rasterizer on its slab with
     bg=0, producing a partial image and its slab transmittance;
  4. slabs combine with the associative alpha-compositing operator
         (o1, T1) ⊕ (o2, T2) = (o1 + T1 * o2, T1 * T2)
     which is EXACT (not approximate) because the slabs partition depth:
     any pixel's gaussians are fully ordered within a slab and slabs are
     ordered front-to-back. The combine is a log-depth `ppermute` fold
     over ICI; background is applied once at the end.

Per-device early termination still applies within a slab; termination
cannot propagate across devices (a fully-occluded rear slab still renders
— the price of parallelism, bounded by 1/n of the work).

Exactness caveat: per-pixel blend order equals the single-chip order, so
results match the one-device render up to (a) float associativity of the
fold and (b) early-termination semantics. The single-chip kernel (like
the reference CUDA) stops BEFORE the gaussian that would push T below
1e-4 — dropping the tail at a residual transmittance as high as
1e-4/(1-alpha_max) (~1e-2 for alpha 0.99). A rear slab cannot see the
global T, so it composites that tail; the sharded result is therefore
CLOSER to exact alpha compositing, and per-pixel differences vs the
single-chip render are bounded by that residual (measured max ~8e-3 on
an opaque-wall scene, ~3e-4 on typical scenes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import shard_map_nocheck

from ..ops import projection as _projection
from ..ops import quaternion as _quaternion
from ..ops import rasterize as _raster
from ..ops import rasterize_tpu as _rt
from ..ops import sh as _sh


def _composite_fold(img: jnp.ndarray, T: jnp.ndarray, axis: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back fold of per-slab (img, T) partials over the mesh axis.

    Uses an all_gather + ordered fold (n is tiny — the mesh axis length);
    the operator is associative so a log-depth ppermute scan would also
    work, but at n<=64 the gather is simpler and bandwidth-equal.
    """
    imgs = jax.lax.all_gather(img, axis)      # [n, H, W, C]
    Ts = jax.lax.all_gather(T, axis)          # [n, H, W, 1]
    n = imgs.shape[0]

    def body(carry, x):
        acc, Tacc = carry
        im, t = x
        return (acc + Tacc * im, Tacc * t), None

    (out, Tout), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(imgs[0]), jnp.ones_like(Ts[0])),
        (imgs, Ts),
    )
    return out, Tout


def render_gaussians_sharded(
    position: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    extr: jnp.ndarray,
    cfg: _raster.RasterizeConfig,
    mesh: Mesh,
    axis: str = "mp",
    bg_color: float = 1.0,
):
    """Depth-slab model-parallel render of activated gaussians.

    Inputs are replicated [N, ...] arrays (N divisible by the mesh axis
    size). Returns (rgb [H,W,3], final_T [H,W,1]) replicated.
    """
    N = position.shape[0]
    n_dev = mesh.shape[axis]
    if N % n_dev:
        raise ValueError(f"N={N} not divisible by mesh axis {axis}={n_dev}")

    @partial(
        shard_map_nocheck,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
    )
    def _run(pos, scl, rot, op, sh):
        # ---- global depth-slab assignment (replicated prologue) --------
        uv, depth = _projection.project_ortho(
            pos, extr, cfg.width, cfg.height, cfg.nearest, cfg.extent
        )
        # culled gaussians (depth 0) sort to the front of slab 0 and are
        # dropped by the rasterizer's visibility handling
        order = jnp.argsort(depth)
        idx = jax.lax.dynamic_slice_in_dim(
            order, jax.lax.axis_index(axis) * (N // n_dev), N // n_dev
        )
        # ---- local slab render (the stock single-chip pipeline) --------
        lpos, lscl, lrot = pos[idx], scl[idx], rot[idx]
        lop, lsh = op[idx], sh[idx]
        luv, ldepth = _projection.project_ortho(
            lpos, extr, cfg.width, cfg.height, cfg.nearest, cfg.extent
        )
        lvis = ldepth != 0
        cov6 = _quaternion.build_cov3d(lscl, _quaternion.quat_normalize(lrot), lvis)
        max_r = _projection.max_radius_for_tile_cap(
            cfg.max_tiles_per_gaussian, cfg.block
        )
        conic, radius, tiles, rmin, rmax = _projection.ewa_ortho(
            cov6, extr, luv, cfg.width, cfg.height, lvis, cfg.block, max_r
        )
        dirs = jnp.concatenate(
            [jnp.zeros_like(lpos[:, :2]), jnp.ones_like(lpos[:, :1])], axis=1
        )
        rgb = _sh.eval_sh(cfg.sh_degree, lsh, dirs, lvis)
        feats = jnp.concatenate([rgb, ldepth[:, None]], axis=1)
        img, finalT, _, _, _ = _rt.splat_scene(
            luv, conic, lop * lvis.astype(lop.dtype), feats,
            jnp.zeros((idx.shape[0], 2)),
            ldepth, tiles, rmin, rmax,
            C=4, W=cfg.width, H=cfg.height,
            bg=(0.0, 0.0, 0.0, 0.0),        # slabs composite over nothing
            alpha_grad_mask=None, K_idx=0,
            # FULL budget per slab: intersections do NOT split evenly
            # across depth slabs (one slab can hold all the big
            # gaussians) — dividing by n_dev silently truncated splats
            # (probed: 0.39 max pixel error on a 4-way mesh)
            max_intersections=cfg.max_intersections,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            sort_mode=cfg.sort_mode, block=cfg.block,
        )
        # ---- exact front-to-back combine over ICI -----------------------
        out, Tout = _composite_fold(img, finalT[..., None], axis)
        return out, Tout

    out, Tout = _run(position, scaling, rotation, opacity, shs)
    rgb = out[..., :3] + Tout * bg_color
    depth_img = out[..., 3:4] + Tout * 1.0
    return {"rgb": rgb, "depth": depth_img, "final_T": Tout}


def make_render_mesh(n_devices: Optional[int] = None, axis: str = "mp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
