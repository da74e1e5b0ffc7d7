"""Public differentiable rasterization API.

Composes the full pipeline the reference runs as five CUDA ops
(`/root/reference/src/submodules/dptr/dptr/gs/__init__.py:28-100` and
`DPTROrthoEnhancedRender.render_iter`, `dptr_ortho_enhanced.py:205-383`):

    SH eval -> projection -> cov3d -> EWA -> tile binning/sort ->
    multi-channel alpha blending (one fused Pallas launch instead of the
    reference's three: RGB + depth(bg=1) + detached-opacity attributes).

Everything here runs under one jit; gradients flow through JAX autodiff for
the point-wise stages and through the custom-vjp Pallas pair for blending.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import binning as _binning
from . import projection as _projection
from . import quaternion as _quaternion
from . import sh as _sh
from . import rasterize_tpu as _rtpu


@dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer configuration (all fields shape the compiled graph)."""

    width: int
    height: int
    max_intersections: int = 1 << 20
    max_tiles_per_gaussian: int = 64
    chunk: int = 128
    block_x: int = 16               # pixel tile width (reference parity: 16)
    block_y: int = 16               # pixel tile height; (32, 16) is faster
    #                                 on TPU (fewer programs + duplicates)

    @property
    def block(self):
        return (self.block_x, self.block_y)
    nearest: float = 0.01           # ortho near-cull (dptr_ortho_enhanced.py:287)
    extent: float = 1.3             # frustum-extent cull factor
    ortho: bool = True              # production path is orthographic
    sh_degree: int = 3              # render_iter always evaluates degree 3
    K_idx: int = 0                  # per-pixel first-K id capture (0 = off)
    sort_mode: str = "packed"       # "packed" (fast) | "exact" (parity tests)
    rect_mode: str = "tight"        # "tight" ellipse AABB | "disc" (reference
    #                                 parity rect; see projection._finish_cov2d)
    scan_impl: str = "matmul"       # in-kernel transmittance scan: "matmul"
    #                                 (MXU triangular) | "roll" (VPU lane shifts)
    edges_mode: str = "search"      # per-tile range derivation: "search"
    #                                 (binary search on the sorted stream) |
    #                                 "matmul" (MXU coverage counts; render-
    #                                 only win, regresses the train step)
    expand_mode: str = "auto"       # ragged expansion: "auto" -> "pallas"
    #                                 (monotone-window kernel, no scatter;
    #                                 bit-identical) | "fill" (XLA scatter +
    #                                 segmented fill-forward)
    interpret: Optional[bool] = None


class RenderOutput(NamedTuple):
    features: Dict[str, jnp.ndarray]   # name -> [H, W, c] rendered channels
    final_T: jnp.ndarray               # [H, W]
    ncontrib: jnp.ndarray              # [H, W] int32
    gs_idx: Optional[jnp.ndarray]      # [H, W, K] int32 or None
    uv: jnp.ndarray                    # [N, 2] screen positions
    depth: jnp.ndarray                 # [N] camera depths
    radius: jnp.ndarray                # [N] int32 (visibility = radius > 0)
    num_intersections: jnp.ndarray     # [] int32 diagnostics (saturation)


def rasterize(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    conic: jnp.ndarray,
    radius: jnp.ndarray,
    tiles: jnp.ndarray,
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    opacity: jnp.ndarray,
    feature_groups: Dict[str, Tuple[jnp.ndarray, float, bool]],
    cfg: RasterizeConfig,
    abs_sink: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Bin, sort and blend pre-projected Gaussians.

    Args:
      uv/depth/conic/radius/tiles/rect_min/rect_max: EWA outputs.
      opacity: [N] activated opacities.
      feature_groups: ordered name -> (values [N,c], bg, opacity_grad) where
        `bg` is the per-group background scalar and `opacity_grad=False`
        reproduces the reference's `opacity.detach()` blend for extra
        attributes (`dptr_ortho_enhanced.py:372-376`).
      abs_sink: optional [N,2] zeros whose gradient collects |d uv| stats
        (reference's `abs_ndc`); created internally when None.
    """
    N = opacity.shape[0]
    names = list(feature_groups.keys())
    feats = jnp.concatenate([feature_groups[k][0] for k in names], axis=1)
    C = feats.shape[1]
    bg: list = []
    mask: list = []
    for k in names:
        vals, b, og = feature_groups[k]
        bg.extend([float(b)] * vals.shape[1])
        mask.extend([1.0 if og else 0.0] * vals.shape[1])

    if abs_sink is None:
        abs_sink = jnp.zeros((N, 2), feats.dtype)
    img, finalT, ncontrib, gs_idx, nint = _rtpu.splat_scene(
        uv, conic, opacity, feats, abs_sink, depth, tiles, rect_min, rect_max,
        C=C,
        W=cfg.width,
        H=cfg.height,
        bg=tuple(bg),
        alpha_grad_mask=tuple(mask),
        K_idx=cfg.K_idx,
        chunk=cfg.chunk,
        max_intersections=cfg.max_intersections,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        sort_mode=cfg.sort_mode,
        block=cfg.block,
        interpret=cfg.interpret,
        scan_impl=cfg.scan_impl,
        edges_mode=cfg.edges_mode,
        expand_mode=cfg.expand_mode,
    )

    out: Dict[str, jnp.ndarray] = {}
    off = 0
    for k in names:
        c = feature_groups[k][0].shape[1]
        out[k] = img[..., off : off + c]
        off += c
    return RenderOutput(
        features=out,
        final_T=finalT,
        ncontrib=ncontrib,
        gs_idx=gs_idx,
        uv=uv,
        depth=depth,
        radius=radius,
        num_intersections=nint,
    )


def render_gaussians(
    position: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    extr: jnp.ndarray,
    cfg: RasterizeConfig,
    intr: Optional[jnp.ndarray] = None,
    extra_features: Optional[Dict[str, jnp.ndarray]] = None,
    bg_color: float = 1.0,
    abs_sink: Optional[jnp.ndarray] = None,
    view_dir_z: bool = True,
) -> RenderOutput:
    """Full render of activated 3D Gaussians — parity with `render_iter`
    (`dptr_ortho_enhanced.py:205-383`).

    Args:
      position [N,3], scaling [N,3] (activated), rotation [N,4] (normalized
        or raw), opacity [N] (activated), shs [N,K,3].
      extr: [3,4] world->camera; intr: (fx,fy,cx,cy) for the perspective path.
      extra_features: name -> [N,c] blended with bg=0 and detached opacity
        (the reference's `render_attributes_list` path). A "depth" channel
        (bg=1, attached opacity) is always rendered like the reference.
      bg_color: RGB background (reference uses white=1).
      view_dir_z: fixed +z SH view direction (`dptr_ortho_enhanced.py:270`).
    """
    N = position.shape[0]
    if view_dir_z:
        dirs = jnp.concatenate(
            [jnp.zeros((N, 2), position.dtype), jnp.ones((N, 1), position.dtype)],
            axis=1,
        )
    else:
        cam_center = -extr[:3, :3].T @ extr[:3, 3]
        d = position - cam_center
        dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

    if cfg.ortho:
        uv, depth = _projection.project_ortho(
            position, extr, cfg.width, cfg.height, cfg.nearest, cfg.extent
        )
    else:
        uv, depth = _projection.project_persp(
            position, intr, extr, cfg.width, cfg.height, cfg.nearest, cfg.extent
        )
    visible = depth != 0

    rgb = _sh.eval_sh(cfg.sh_degree, shs, dirs, visible)
    cov3d = _quaternion.build_cov3d(scaling, rotation, visible)

    max_r = _projection.max_radius_for_tile_cap(cfg.max_tiles_per_gaussian, cfg.block)
    if cfg.ortho:
        conic, radius, tiles, rect_min, rect_max = _projection.ewa_ortho(
            cov3d, extr, uv, cfg.width, cfg.height, visible, cfg.block, max_r,
            cfg.rect_mode, jax.lax.stop_gradient(opacity),
        )
    else:
        conic, radius, tiles, rect_min, rect_max = _projection.ewa_persp(
            position, cov3d, intr, extr, uv, cfg.width, cfg.height, visible,
            cfg.block, max_r, cfg.rect_mode, jax.lax.stop_gradient(opacity),
        )

    groups: Dict[str, Tuple[jnp.ndarray, float, bool]] = {
        "rgb": (rgb, float(bg_color), True),
        "depth": (depth[:, None], 1.0, True),
    }
    if extra_features:
        for k, v in extra_features.items():
            groups[k] = (v, 0.0, False)

    return rasterize(
        uv, depth, conic, radius, tiles, rect_min, rect_max,
        opacity, groups, cfg, abs_sink=abs_sink,
    )
