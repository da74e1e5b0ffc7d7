"""Unit tests for quaternion/cov3d/SH/projection math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.ops import projection, quaternion, sh


def rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


class TestQuaternion:
    def test_rotmat_orthonormal(self):
        q = rand(jax.random.PRNGKey(0), 64, 4)
        R = quaternion.quat_to_rotmat(quaternion.quat_normalize(q))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(quaternion.quat_to_rotmat(q)[0], np.eye(3), atol=1e-7)

    def test_known_z_rotation(self):
        # 90 deg about z: w = cos(45), z = sin(45)
        c = np.cos(np.pi / 4)
        q = jnp.array([[c, 0, 0, c]])
        R = np.asarray(quaternion.quat_to_rotmat(q)[0])
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_roundtrip(self):
        q = quaternion.quat_normalize(rand(jax.random.PRNGKey(1), 128, 4))
        R = quaternion.quat_to_rotmat(q)
        q2 = quaternion.rotmat_to_quat(R)
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_cov3d_matches_matrix_form(self):
        key = jax.random.PRNGKey(2)
        s = jnp.exp(rand(key, 32, 3) * 0.3)
        q = rand(jax.random.PRNGKey(3), 32, 4)
        cov6 = quaternion.build_cov3d(s, q)
        R = quaternion.quat_to_rotmat(quaternion.quat_normalize(q))
        M = R * s[:, None, :]
        sigma = M @ jnp.swapaxes(M, 1, 2)
        full = quaternion.cov6_to_mat(cov6)
        np.testing.assert_allclose(full, sigma, atol=1e-5)
        # PSD check
        eig = np.linalg.eigvalsh(np.asarray(sigma))
        assert (eig > -1e-5).all()

    def test_cov3d_visible_gate(self):
        s = jnp.ones((4, 3))
        q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1))
        vis = jnp.array([True, False, True, False])
        cov6 = quaternion.build_cov3d(s, q, vis)
        assert np.asarray(cov6[1]).sum() == 0
        assert np.asarray(cov6[0]).sum() > 0


class TestSH:
    def test_deg0_constant(self):
        shs = rand(jax.random.PRNGKey(0), 16, 1, 3)
        dirs = rand(jax.random.PRNGKey(1), 16, 3)
        out = sh.eval_sh(0, shs, dirs)
        expected = np.maximum(sh.SH_C0 * np.asarray(shs[:, 0]) + 0.5, 0.0)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_rgb_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_clamping(self):
        shs = -10.0 * jnp.ones((4, 1, 3))
        out = sh.eval_sh(0, shs, jnp.zeros((4, 3)))
        assert (np.asarray(out) == 0).all()
        free = sh.eval_sh_free(0, shs, jnp.zeros((4, 3)))
        assert (np.asarray(free) < 0).all()

    def test_deg3_uses_all_coeffs(self):
        key = jax.random.PRNGKey(5)
        shs = rand(key, 8, 16, 3)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
        out3 = sh.eval_sh(3, shs, dirs)
        out0 = sh.eval_sh(0, shs, dirs)
        assert not np.allclose(out3, out0)

    def test_visible_gate(self):
        shs = rand(jax.random.PRNGKey(6), 4, 1, 3)
        vis = jnp.array([True, False, True, True])
        out = sh.eval_sh(0, shs, jnp.zeros((4, 3)), vis)
        assert np.asarray(out[1]).sum() == 0


class TestProjection:
    W, H = 64, 48

    def test_ortho_center(self):
        # point at origin with z=1 projects to image center
        xyz = jnp.array([[0.0, 0.0, 1.0]])
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, self.W, self.H)
        np.testing.assert_allclose(uv[0], [self.W / 2 - 0.5, self.H / 2 - 0.5], atol=1e-5)
        np.testing.assert_allclose(depth[0], 1.0)

    def test_ortho_near_cull(self):
        xyz = jnp.array([[0.0, 0.0, 0.005], [0.0, 0.0, 1.0]])
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, self.W, self.H, nearest=0.01)
        assert depth[0] == 0 and (uv[0] == 0).all()
        assert depth[1] == 1

    def test_ortho_extent_cull(self):
        xyz = jnp.array([[2.0, 0.0, 1.0]])  # x=2 -> uv_x = 1.5*W-0.5 > 1.15*W
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, self.W, self.H, extent=1.3)
        assert depth[0] == 0

    def test_persp_center(self):
        xyz = jnp.array([[0.0, 0.0, 2.0]])
        extr = jnp.eye(3, 4)
        intr = jnp.array([50.0, 50.0, self.W / 2, self.H / 2])
        uv, depth = projection.project_persp(xyz, intr, extr, self.W, self.H)
        np.testing.assert_allclose(uv[0], [self.W / 2 - 0.5, self.H / 2 - 0.5], atol=1e-4)
        np.testing.assert_allclose(depth[0], 2.0)

    def test_ewa_ortho_isotropic(self):
        # isotropic gaussian: conic diagonal, radius = ceil(3*sqrt(var+0.3))
        s = 0.05
        var_pix = (s * self.W / 2) ** 2  # sigma in pixels^2 along x
        cov6 = jnp.array([[s * s, 0, 0, s * s, 0, s * s]], dtype=jnp.float32)
        uv = jnp.array([[self.W / 2, self.H / 2]], dtype=jnp.float32)
        extr = jnp.eye(3, 4)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, self.W, self.H, jnp.array([True])
        )
        a = var_pix + 0.3
        c = (s * self.H / 2) ** 2 + 0.3
        np.testing.assert_allclose(conic[0], [1 / a, 0, 1 / c], rtol=1e-5)
        lam = max(a, c)
        expected_radius = np.ceil(3 * np.sqrt(max(lam, (a + c) / 2 + np.sqrt(0.1))))
        assert radius[0] == expected_radius
        assert tiles[0] > 0
        assert (rmax[0] > rmin[0]).all()

    def test_ewa_culled_zeroed(self):
        cov6 = jnp.ones((1, 6)) * 0.01
        uv = jnp.zeros((1, 2))
        extr = jnp.eye(3, 4)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, self.W, self.H, jnp.array([False])
        )
        assert radius[0] == 0 and tiles[0] == 0
        assert (np.asarray(conic[0]) == 0).all()

    def test_tile_rect_consistency(self):
        """Tile counts equal the rect areas."""
        key = jax.random.PRNGKey(7)
        xyz = jax.random.uniform(key, (100, 3), minval=-0.8, maxval=0.8) + jnp.array([0, 0, 1.5])
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, self.W, self.H)
        s = jnp.full((100, 3), 0.03)
        q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (100, 1))
        from splatter_a_video_tpu.ops.quaternion import build_cov3d

        cov6 = build_cov3d(s, q, depth != 0)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, self.W, self.H, depth != 0
        )
        span = np.asarray(rmax - rmin)
        np.testing.assert_array_equal(np.asarray(tiles), span[:, 0] * span[:, 1])


class TestTightRects:
    """rect_mode='tight' (PARITY.md deviation #11): the opacity-aware
    ellipse AABB must cover every pixel the blend kernel would not skip."""

    W, H = 128, 96

    def _ewa(self, cov6, uv, op, mode):
        import jax.numpy as jnp
        from splatter_a_video_tpu.ops import projection

        extr = jnp.eye(3, 4)
        return projection.ewa_ortho(
            cov6, extr, uv, self.W, self.H, jnp.ones(uv.shape[0], bool),
            16, None, mode, op if mode == "tight" else None,
        )

    def _random_scene(self, n=64, seed=0):
        import jax
        import jax.numpy as jnp
        from splatter_a_video_tpu.ops.quaternion import build_cov3d, quat_normalize

        k = jax.random.split(jax.random.PRNGKey(seed), 5)
        uv = jax.random.uniform(
            k[0], (n, 2), minval=10.0, maxval=self.W - 10.0
        ) * jnp.array([1.0, (self.H - 20) / (self.W - 20)])
        scale = jnp.exp(jax.random.uniform(k[1], (n, 3), minval=-4.0, maxval=-2.5))
        quat = quat_normalize(jax.random.normal(k[2], (n, 4)))
        op = jax.random.uniform(k[3], (n,), minval=0.002, maxval=0.99)
        cov6 = build_cov3d(scale * 60.0, quat, jnp.ones(n, bool))
        return cov6, uv, op

    def test_tight_subset_of_disc(self):
        import numpy as np

        cov6, uv, op = self._random_scene()
        _, _, _, tmin, tmax = self._ewa(cov6, uv, op, "tight")
        _, _, _, dmin, dmax = self._ewa(cov6, uv, op, "disc")
        assert (np.asarray(tmin) >= np.asarray(dmin)).all()
        assert (np.asarray(tmax) <= np.asarray(dmax)).all()

    def test_tight_covers_kernel_support(self):
        """Every pixel with alpha >= 1/255 lies inside the tight rect."""
        import numpy as np

        cov6, uv, op = self._random_scene(seed=3)
        conic, _, tiles, tmin, tmax = self._ewa(cov6, uv, op, "tight")
        conic = np.asarray(conic)
        uvn = np.asarray(uv)
        opn = np.asarray(op)
        ys, xs = np.mgrid[0 : self.H, 0 : self.W]
        for i in range(uvn.shape[0]):
            vx = xs - uvn[i, 0]
            vy = ys - uvn[i, 1]
            a, b, c = conic[i]
            power = -0.5 * (a * vx * vx + c * vy * vy) - b * vx * vy
            alpha = opn[i] * np.exp(np.minimum(power, 0.0))
            contributing = (alpha >= 1.0 / 255.0) & (power <= 0.0)
            if not contributing.any():
                continue
            py, px = np.nonzero(contributing)
            tx0, ty0 = np.asarray(tmin)[i]
            tx1, ty1 = np.asarray(tmax)[i]
            assert px.min() // 16 >= tx0 and px.max() // 16 < tx1
            assert py.min() // 16 >= ty0 and py.max() // 16 < ty1

    def test_transparent_gaussian_zero_tiles_effect(self):
        """op < 1/255 collapses the footprint; the render ignores it."""
        import jax.numpy as jnp
        import numpy as np
        from splatter_a_video_tpu.ops import rasterize
        from splatter_a_video_tpu.ops.quaternion import quat_normalize

        cfg = rasterize.RasterizeConfig(
            width=self.W, height=self.H, max_intersections=1 << 12
        )
        pos = jnp.array([[0.0, 0.0, 1.0], [0.1, 0.1, 1.2]])
        scale = jnp.full((2, 3), 0.05)
        quat = quat_normalize(jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)))
        shs = jnp.zeros((2, 16, 3)).at[:, 0, :].set(1.0)
        extr = jnp.eye(3, 4)
        op_vis = jnp.array([0.9, 1.0 / 400.0])
        out = rasterize.render_gaussians(pos, scale, quat, op_vis, shs, extr, cfg)
        out_ref = rasterize.render_gaussians(
            pos, scale, quat, jnp.array([0.9, 0.0]), shs, extr, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out.features["rgb"]), np.asarray(out_ref.features["rgb"]),
            atol=1e-6,
        )

    def test_render_tight_close_to_disc(self):
        """Dropped contributions are below alpha=0.011 -> sub-LSB images."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from splatter_a_video_tpu.ops import rasterize
        from splatter_a_video_tpu.ops.quaternion import quat_normalize

        k = jax.random.split(jax.random.PRNGKey(5), 5)
        n = 200
        pos = jnp.concatenate(
            [jax.random.uniform(k[0], (n, 2), minval=-0.7, maxval=0.7),
             jax.random.uniform(k[1], (n, 1), minval=0.6, maxval=1.9)], axis=1,
        )
        scale = jnp.exp(jax.random.uniform(k[2], (n, 3), minval=-4.5, maxval=-3.0))
        quat = quat_normalize(jax.random.normal(k[3], (n, 4)))
        op = jax.random.uniform(k[4], (n,), minval=0.05, maxval=0.95)
        shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(0.8)
        extr = jnp.eye(3, 4)
        cfg_t = rasterize.RasterizeConfig(
            width=self.W, height=self.H, max_intersections=1 << 14,
            rect_mode="tight",
        )
        cfg_d = dataclasses.replace(cfg_t, rect_mode="disc")
        rgb_t = rasterize.render_gaussians(pos, scale, quat, op, shs, extr, cfg_t)
        rgb_d = rasterize.render_gaussians(pos, scale, quat, op, shs, extr, cfg_d)
        diff = np.abs(
            np.asarray(rgb_t.features["rgb"]) - np.asarray(rgb_d.features["rgb"])
        )
        assert diff.max() < 0.05, diff.max()
