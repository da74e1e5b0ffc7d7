"""Tests: trajectory bases, cubic splines, scene init, cameras, knn, ssim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.models import camera, gaussians, trajectory
from splatter_a_video_tpu.ops import knn, ssim


class TestTrajectory:
    def test_poly_fourier_at_zero(self):
        """At t=0: poly basis = [1,0,0,0] so offset = poly_0 coefficient."""
        N = 8
        key = jax.random.PRNGKey(0)
        pos = jax.random.normal(key, (N, 3))
        poly = jax.random.normal(jax.random.fold_in(key, 1), (N, 4, 3))
        four = jax.random.normal(jax.random.fold_in(key, 2), (N, 8, 3))
        out = trajectory.position_poly_fourier(pos, poly, four, 0.0)
        # fourier at t=0: cos terms = 1, sin = 0 -> sum of a_l coefficients
        expected = pos + poly[:, 0] + four[:, :4].sum(axis=1)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_rotation_delta_detached(self):
        N = 4
        base = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (N, 1))
        poly = jnp.ones((N, 4, 4))
        four = jnp.ones((N, 8, 4))

        def f(poly, four, base):
            return jnp.sum(trajectory.rotation_poly_fourier(base, poly, four, 0.3) ** 2)

        gp, gf, gb = jax.grad(f, argnums=(0, 1, 2))(poly, four, base)
        # the reference detaches the delta terms (dynamic_gaussian_points.py:150-151)
        assert np.abs(np.asarray(gp)).sum() == 0
        assert np.abs(np.asarray(gf)).sum() == 0
        assert np.abs(np.asarray(gb)).sum() > 0

    def test_detach_pos(self):
        N = 4
        pos = jnp.ones((N, 3))
        poly = jnp.ones((N, 4, 3))
        four = jnp.zeros((N, 8, 3))

        def f(pos, detach):
            return jnp.sum(trajectory.position_poly_fourier(pos, poly, four, 0.5, detach))

        g = jax.grad(lambda p: f(p, True))(pos)
        assert np.abs(np.asarray(g)).sum() == 0
        g = jax.grad(lambda p: f(p, False))(pos)
        assert np.abs(np.asarray(g)).sum() > 0

    def test_cubic_spline_interpolates_knots(self):
        """The fitted spline passes through the track at knot frames."""
        T, N = 21, 10
        rng = np.random.RandomState(0)
        track = rng.randn(T, N, 3).astype(np.float32).cumsum(axis=0) * 0.1
        coeff, knots = trajectory.fit_cubic_spline(track)
        base = jnp.asarray(track[0])
        for f_idx in np.linspace(0, T - 1, len(knots)).astype(int):
            t_norm = f_idx / (T - 1)
            pos = trajectory.position_cubic_spline(
                base, jnp.asarray(coeff), jnp.asarray(knots), t_norm
            )
            np.testing.assert_allclose(
                np.asarray(pos), track[f_idx], atol=1e-4,
                err_msg=f"frame {f_idx}",
            )

    def test_cubic_spline_smooth_between_knots(self):
        """Mid-interval evaluation stays close to a densely-sampled track."""
        T, N = 26, 5
        tt = np.linspace(0, 1, T)[:, None, None]
        track = np.sin(2 * np.pi * tt + np.arange(N)[None, :, None]).astype(np.float32)
        track = np.repeat(track, 3, axis=2) * 0.3
        coeff, knots = trajectory.fit_cubic_spline(track)
        base = jnp.asarray(track[0])
        errs = []
        for f_idx in range(T):
            pos = trajectory.position_cubic_spline(
                base, jnp.asarray(coeff), jnp.asarray(knots), f_idx / (T - 1)
            )
            errs.append(np.abs(np.asarray(pos) - track[f_idx]).max())
        assert max(errs) < 0.05, max(errs)


class TestScene:
    def _make(self, traj="poly_fourier", N=50, cap=64, T=12):
        cfg = gaussians.SceneConfig(
            capacity=cap, num_frames=T, traj=traj,
            render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
        )
        rng = np.random.RandomState(0)
        pos = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32) + [0, 0, 1.0]
        colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
        track = None
        if traj == "cubic_spline":
            track = pos[None] + 0.05 * rng.randn(T, N, 3).astype(np.float32).cumsum(0)
            track[0] = pos
        return gaussians.create_scene(cfg, pos, colors, track_seq=track), pos, colors

    def test_create_poly_fourier(self):
        scene, pos, colors = self._make()
        assert int(scene.num_alive) == 50
        np.testing.assert_allclose(
            np.asarray(scene.get_position(0))[:50], pos, atol=1e-5
        )
        op = np.asarray(scene.get_opacity())
        np.testing.assert_allclose(op[:50], 0.01, atol=1e-5)
        np.testing.assert_allclose(op[50:], 0.0, atol=1e-7)  # dead slots gated
        # shs reproduce the init colors at deg 0
        from splatter_a_video_tpu.ops import sh as shmod

        rgb = shmod.eval_sh(0, scene.get_shs()[:50], jnp.zeros((50, 3)))
        np.testing.assert_allclose(np.asarray(rgb), colors, atol=1e-5)
        assert scene.params["mask_attribute"].shape == (64, 1)
        assert scene.params["dino_attribute"].shape == (64, 3)

    def test_create_spline(self):
        scene, pos, colors = self._make(traj="cubic_spline")
        p0 = np.asarray(scene.get_position(0))[:50]
        np.testing.assert_allclose(p0, pos, atol=1e-4)
        # positions at t follow the track at knots by construction
        assert "pos_cubic_coeff" in scene.params

    def test_pytree_roundtrip(self):
        scene, _, _ = self._make()
        leaves, treedef = jax.tree_util.tree_flatten(scene)
        scene2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert scene2.cfg == scene.cfg
        np.testing.assert_array_equal(
            np.asarray(scene2.params["position"]), np.asarray(scene.params["position"])
        )

    def test_scene_jits(self):
        scene, _, _ = self._make()

        @jax.jit
        def f(scene, t):
            return scene.get_position(t).sum()

        a = f(scene, 3.0)
        b = f(scene, 7.0)  # same compiled fn, traced t
        assert np.isfinite(a) and np.isfinite(b)


class TestKnn:
    def test_knn_vs_numpy(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(200, 3).astype(np.float32)
        d, idx = knn.knn(jnp.asarray(pts), jnp.asarray(pts), k=4, chunk=64)
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        exp_idx = np.argsort(full, axis=1)[:, :4]
        exp_d = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.asarray(d), exp_d, atol=1e-4)
        # indices may tie-break differently; compare distances only plus self
        assert (np.asarray(idx)[:, 0] == np.arange(200)).all()

    def test_mean_knn3(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(100, 3).astype(np.float32)
        out = np.asarray(knn.mean_knn3_sq_dist(jnp.asarray(pts), chunk=32))
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        exp = np.sort(full, axis=1)[:, 1:4].mean(axis=1)
        np.testing.assert_allclose(out, exp, atol=1e-4)


class TestSsim:
    def test_identical(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 40, 3), jnp.float32)
        assert float(ssim.ssim(img, img)) > 0.999

    def test_noise_lowers(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(32, 40, 3), jnp.float32)
        noisy = img + jnp.asarray(rng.randn(32, 40, 3) * 0.2, jnp.float32)
        s = float(ssim.ssim(img, noisy))
        assert 0.0 < s < 0.9

    def test_matches_torch_reference(self):
        """Cross-check against an equivalent torch implementation."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(2)
        a = rng.rand(1, 3, 24, 28).astype(np.float32)
        b = np.clip(a + rng.randn(1, 3, 24, 28).astype(np.float32) * 0.1, 0, 1)

        # torch-side: same gaussian window conv
        from splatter_a_video_tpu.ops.ssim import _gaussian_window

        win = torch.from_numpy(_gaussian_window(11, 1.5)).expand(3, 1, 11, 11).contiguous()
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        mu1 = F.conv2d(ta, win, padding=5, groups=3)
        mu2 = F.conv2d(tb, win, padding=5, groups=3)
        s1 = F.conv2d(ta * ta, win, padding=5, groups=3) - mu1**2
        s2 = F.conv2d(tb * tb, win, padding=5, groups=3) - mu2**2
        s12 = F.conv2d(ta * tb, win, padding=5, groups=3) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        tmap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
        )
        expected = float(tmap.mean())

        got = float(ssim.ssim(jnp.asarray(a[0].transpose(1, 2, 0)), jnp.asarray(b[0].transpose(1, 2, 0))))
        assert abs(got - expected) < 1e-4


class TestCamera:
    def test_canonical(self):
        cam = camera.canonical_camera(64, 48)
        np.testing.assert_allclose(cam.extrinsic, np.eye(3, 4), atol=1e-7)
        assert abs(cam.fovx - np.pi / 2) < 1e-7
        np.testing.assert_allclose(cam.intrinsic[0], 32.0, atol=1e-4)  # fx = W/2 at fovx=90

    def test_look_at(self):
        R = camera.look_at_rotation(np.array([0.0, 0, -1]), at=np.array([0.0, 0, 1]))
        # camera looks along +z
        np.testing.assert_allclose(R @ np.array([0, 0, 1.0]), [0, 0, 1.0], atol=1e-6)

    def test_orbit_and_stereo(self):
        base = camera.canonical_camera(64, 48)
        cams = camera.orbit_cameras(base, 8)
        assert len(cams) == 8
        left, right = camera.stereo_cameras(base)
        assert not np.allclose(left.extrinsic, right.extrinsic)
        # both eyes look at the scene center
        for c in (left, right):
            center_cam = c.R @ (np.array([0, 0, 1.0]) - c.camera_center)
            assert center_cam[2] > 0.9


class TestCameraPaths:
    def test_dolly_zoom_spiral(self):
        base = camera.canonical_camera(64, 48)
        d = camera.dolly_path(base, 5)
        z = camera.zoom_path(base, 5)
        s = camera.spiral_path(base, 5)
        assert len(d) == len(z) == len(s) == 5
        # dolly moves along z
        assert d[0].t[2] != d[-1].t[2]
        # zoom narrows fov
        assert z[-1].fovx < z[0].fovx
        # spiral orbits
        assert not np.allclose(s[0].camera_center, s[2].camera_center)


class TestInitPoints:
    def test_positive_z_random(self):
        from splatter_a_video_tpu.models import init_points

        pts = init_points.positive_z_random(100, radius=1.0, z_shift=1.0)
        assert pts.shape == (100, 3)
        assert (np.abs(pts[:, :2]) <= 1.0).all()
        assert (pts[:, 2] >= 0.5).all() and (pts[:, 2] <= 1.5).all()

    def test_depth_to_points(self):
        from splatter_a_video_tpu.models import init_points

        depth = np.ones((20, 30), np.float32)
        img = np.random.RandomState(0).rand(20, 30, 3).astype(np.float32)
        pts, cols = init_points.depth_to_points(depth, img, stride=3)
        assert pts.shape[0] == cols.shape[0] > 0
        assert np.allclose(pts[:, 2], 1.1)  # depth + default shift
        assert np.abs(pts[:, :2]).max() <= 1.0


class TestPose:
    def test_se3_exp_identity(self):
        from splatter_a_video_tpu.utils import pose
        import jax.numpy as jnp

        T = np.asarray(pose.se3_exp(jnp.zeros(6) + 1e-12))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)

    def test_so3_exp_rotation(self):
        from splatter_a_video_tpu.utils import pose
        import jax.numpy as jnp

        R = np.asarray(pose.so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    def test_apply_se3(self):
        from splatter_a_video_tpu.utils import pose
        import jax.numpy as jnp

        extr = jnp.eye(3, 4)
        xi = jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0])
        out = np.asarray(pose.apply_se3_to_extrinsic(extr, xi))
        np.testing.assert_allclose(out[:, 3], [0.1, 0, 0], atol=1e-6)


class TestLBS:
    """traj='lbs': the model family the reference's dead SingleAtlasLBSModel
    gestures at (`frag_model.py:140`) — K shared translation bones blended
    with softmax skinning weights."""

    def _scene(self, cap=128, n=64, K=4):
        cfg = gaussians.SceneConfig(
            capacity=cap, num_frames=8, traj="lbs", num_bones=K
        )
        rng = np.random.RandomState(0)
        pos = np.concatenate(
            [rng.uniform(-0.5, 0.5, (n, 2)), rng.uniform(0.8, 1.2, (n, 1))],
            axis=1,
        ).astype(np.float32)
        return gaussians.create_scene(cfg, pos, rng.rand(n, 3).astype(np.float32))

    def test_identity_at_init_and_blend(self):
        sc = self._scene()
        p0 = sc.get_position(0.0)
        p5 = sc.get_position(5.0)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p5), atol=1e-6)
        # a single bone translation moves every gaussian by its blend weight
        params = dict(sc.params)
        params["lbs_bone_poly"] = params["lbs_bone_poly"].at[0, 1, 0].set(1.0)
        sc2 = sc.replace(params=params)
        import jax

        w = np.asarray(jax.nn.softmax(params["pos_lbs_logits"], axis=-1))[:, 0]
        moved = np.asarray(sc2.get_position(7.0)) - np.asarray(p0)
        np.testing.assert_allclose(moved[:, 0], w * (7.0 / 7.0), atol=1e-5)
        np.testing.assert_allclose(moved[:, 1:], 0.0, atol=1e-6)

    def test_gradients_reach_bones_and_weights(self):
        import jax
        import jax.numpy as jnp

        sc = self._scene()

        def loss(params):
            s = sc.replace(params=params)
            return jnp.sum(s.get_position(3.0) ** 2)

        g = jax.grad(loss)(sc.params)
        assert np.isfinite(np.asarray(g["lbs_bone_poly"])).all()
        assert np.abs(np.asarray(g["position"])).max() > 0

    def test_density_leaves_global_bones_untouched(self):
        from splatter_a_video_tpu.train import density, optim

        import jax
        import jax.numpy as jnp

        sc = self._scene()
        params = dict(sc.params)
        params["lbs_bone_poly"] = params["lbs_bone_poly"].at[1, 2, 1].set(0.7)
        sc = sc.replace(params=params)
        opt = optim.make_optimizer(optim.OptimConfig())
        opt_state = opt.init(sc.params)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((128,)),
            pos_grad_accum=jnp.zeros((128,)).at[:5].set(1.0),
            denom=jnp.ones((128,)),
        )
        cfg = density.DensifyConfig(densify_grad_threshold=0.1, percent_dense=10.0)
        sc2, *_ , info = density.densify_and_prune(
            sc, opt_state, dstate, jnp.asarray(100), cfg, jax.random.PRNGKey(0)
        )
        assert int(info.num_cloned) == 5
        np.testing.assert_array_equal(
            np.asarray(sc2.params["lbs_bone_poly"]),
            np.asarray(sc.params["lbs_bone_poly"]),
        )
        # per-gaussian skinning logits DID get cloned rows
        assert sc2.params["pos_lbs_logits"].shape == (128, 4)
