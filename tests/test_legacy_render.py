"""Legacy fov-parametrized renderer surface (models/legacy_render.py)."""

import math

import numpy as np
import jax.numpy as jnp


def _scene(n=64, seed=0):
    from splatter_a_video_tpu.ops.quaternion import quat_normalize

    rng = np.random.RandomState(seed)
    pos = np.concatenate(
        [rng.uniform(-0.3, 0.3, (n, 2)), rng.uniform(1.5, 2.5, (n, 1))], axis=1
    ).astype(np.float32)
    scale = np.full((n, 3), 0.05, np.float32)
    quat = np.asarray(
        quat_normalize(jnp.asarray(rng.randn(n, 4).astype(np.float32)))
    )
    op = rng.uniform(0.4, 0.9, n).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.rand(n, 3)
    return pos, scale, quat, op, shs


class TestLegacyRender:
    W, H = 96, 64

    def _render(self, render):
        pos, scale, quat, op, shs = _scene()
        fovx = math.pi / 2
        fovy = 2 * math.atan(math.tan(fovx / 2) * self.H / self.W)
        wvt = np.eye(4, dtype=np.float32)  # identity pose, stored transposed
        return render.render_iter(
            FovX=fovx, FovY=fovy, height=self.H, width=self.W,
            world_view_transform=jnp.asarray(wvt),
            full_proj_transform=None,
            camera_center=jnp.zeros(3),
            position=jnp.asarray(pos), opacity=jnp.asarray(op),
            scaling=jnp.asarray(scale), rotation=jnp.asarray(quat),
            shs=jnp.asarray(shs),
        )

    def test_render_iter_outputs(self):
        from splatter_a_video_tpu.models import legacy_render

        r = legacy_render.GaussianSplattingRender()
        out = self._render(r)
        rgb = np.asarray(out["rgb"])
        assert rgb.shape == (self.H, self.W, 3)
        # white background, centered content darker than the border
        assert rgb[0, 0].mean() > 0.95
        center = rgb[self.H // 2 - 8 : self.H // 2 + 8,
                     self.W // 2 - 8 : self.W // 2 + 8]
        assert center.mean() < rgb[0, 0].mean()
        assert np.asarray(out["visibility"]).sum() > 0
        assert np.asarray(out["radii"]).max() > 0

    def test_sh_degree_ramp(self):
        from splatter_a_video_tpu.models import legacy_render

        r = legacy_render.GaussianSplattingRender()
        assert r.active_sh_degree == 0
        for step in (0, 1000, 2000, 3000, 4000):
            r.update_sh_degree(step)
        assert r.active_sh_degree == 3  # capped at max (base_splatting.py:231)

    def test_scaling_modifier_shrinks_footprint(self):
        from splatter_a_video_tpu.models import legacy_render

        r = legacy_render.GaussianSplattingRender()
        pos, scale, quat, op, shs = _scene()
        kw = dict(
            FovX=math.pi / 2, FovY=math.pi / 2, height=64, width=64,
            world_view_transform=jnp.eye(4), full_proj_transform=None,
            camera_center=jnp.zeros(3),
            position=jnp.asarray(pos), opacity=jnp.asarray(op),
            scaling=jnp.asarray(scale), rotation=jnp.asarray(quat),
            shs=jnp.asarray(shs),
        )
        big = r.render_iter(**kw, scaling_modifier=1.0)
        small = r.render_iter(**kw, scaling_modifier=0.25)
        assert np.asarray(small["radii"]).max() < np.asarray(big["radii"]).max()
