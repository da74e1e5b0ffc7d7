"""Legacy Gaussian-splatting renderer surface (INRIA-backend parity).

The reference keeps a lazily-imported legacy renderer around
(`GaussianSplattingRender`, `/root/reference/src/pointrix/renderer/
base_splatting.py:21-237`, selected via `parse_renderer`'s special case,
`renderer/__init__.py:15-16`) built on the external
`diff_gaussian_rasterization` CUDA package: a perspective, fov-driven
camera parametrization (`render_iter(FovX, FovY, world_view_transform,
full_proj_transform, camera_center, ...)`) returning the classic
{render, viewspace_points, visibility, radii} dict. Production never
selects it — `frag_gs_v10.yaml` names `DPTROrthoEnhancedRender` — but the
API surface exists, so this module provides it on top of the same Pallas
pipeline (`ops/rasterize.render_gaussians` with `ortho=False`): one
backend, two camera parametrizations, instead of a second native
rasterizer.

Legacy conventions honored:
  * `world_view_transform` is stored TRANSPOSED (row-vector convention,
    `camera.py:141+`): extrinsic = world_view_transform.T[:3].
  * focal lengths derive from the fovs: fx = W / (2 tan(FovX/2)).
  * `scaling_modifier` multiplies activated scales.
  * `update_sh_degree` ramps the active degree every 1000 steps
    (`base_splatting.py:229-232`).
  * SH view directions point from the camera center to each gaussian
    (unlike the enhanced ortho renderer's fixed +z).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax.numpy as jnp

from ..ops import rasterize as _rasterize


@dataclass
class LegacySplattingConfig:
    """Mirrors `GaussianSplattingRender.Config` (`base_splatting.py:23-28`)."""

    update_sh_iter: int = 1000
    max_sh_degree: int = 3
    white_bg: bool = True


class GaussianSplattingRender:
    """Drop-in equivalent of the legacy renderer class."""

    def __init__(self, cfg: LegacySplattingConfig = LegacySplattingConfig()):
        self.cfg = cfg
        self.active_sh_degree = 0

    def update_sh_degree(self, step: int) -> None:
        """Raise the active SH degree every `update_sh_iter` steps
        (`base_splatting.py:229-232`)."""
        if step % self.cfg.update_sh_iter == 0:
            if self.active_sh_degree < self.cfg.max_sh_degree:
                self.active_sh_degree += 1

    def render_iter(
        self,
        FovX: float,
        FovY: float,
        height: int,
        width: int,
        world_view_transform: jnp.ndarray,
        full_proj_transform: Optional[jnp.ndarray],  # unused: projection is
        #   rebuilt from the fovs (the legacy backend consumed both)
        camera_center: jnp.ndarray,
        position: jnp.ndarray,
        opacity: jnp.ndarray,
        scaling: jnp.ndarray,
        rotation: jnp.ndarray,
        shs: jnp.ndarray,
        scaling_modifier: float = 1.0,
        **kwargs,
    ) -> Dict[str, jnp.ndarray]:
        """One perspective render (`base_splatting.py:50-190`).

        Returns {"rgb", "depth", "viewspace_points"(=uv), "visibility",
        "radii"} — the legacy dict's gradient-capture dummy tensor is
        unnecessary here (viewspace grads flow through `abs_sink`/`uv`
        functionally; see `ops/rasterize.py`).
        """
        W, H = int(width), int(height)
        fx = W / (2.0 * math.tan(float(FovX) / 2.0))
        fy = H / (2.0 * math.tan(float(FovY) / 2.0))
        intr = jnp.asarray([fx, fy, W / 2.0, H / 2.0], jnp.float32)
        extr = jnp.asarray(world_view_transform).T[:3, :4]

        rcfg = _rasterize.RasterizeConfig(
            width=W, height=H, ortho=False,
            sh_degree=self.active_sh_degree,
        )
        out = _rasterize.render_gaussians(
            position,
            scaling * scaling_modifier,
            rotation,
            opacity,
            shs,
            extr,
            rcfg,
            intr=intr,
            bg_color=1.0 if self.cfg.white_bg else 0.0,
            view_dir_z=False,  # legacy: dirs from camera_center to points
        )
        return {
            "rgb": out.features["rgb"],
            "depth": out.features["depth"],
            "viewspace_points": out.uv,
            "visibility": out.radius > 0,
            "radii": out.radius,
        }

    def render_batch(self, render_dict: Dict, batch: list) -> Dict:
        """Loop cameras and stack features; visibility reduces with any(),
        radii with max() (`base_splatting.py:192-227`)."""
        images, depths, visibilities, radiis = [], [], [], []
        for b in batch:
            r = self.render_iter(**render_dict, **b)
            images.append(r["rgb"])
            depths.append(r["depth"])
            visibilities.append(r["visibility"])
            radiis.append(r["radii"])
        return {
            "images": jnp.stack(images),
            "depths": jnp.stack(depths),
            "visibility": jnp.any(jnp.stack(visibilities), axis=0),
            "radii": jnp.max(jnp.stack(radiis), axis=0),
        }
