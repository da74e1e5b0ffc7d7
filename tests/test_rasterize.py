"""Parity + gradient tests: Pallas tile rasterizer vs the sequential oracle.

The oracle (`rasterize_ref.splat_reference`) restates the CUDA blender
semantics exactly; the Pallas path (binning + packing + splat kernel) must
match it on scenes with no truncation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.ops import binning, projection, quaternion, rasterize, rasterize_ref, rasterize_tpu

W, H = 64, 48


def make_scene(key, n=120, opacity_max=0.9):
    """Random gaussians inside the canonical ortho frustum."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xyz = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-0.9, maxval=0.9),
            jax.random.uniform(k2, (n, 1), minval=0.5, maxval=2.0),
        ],
        axis=1,
    )
    scale = jnp.exp(jax.random.uniform(k3, (n, 3), minval=-3.5, maxval=-2.0))
    quat = quaternion.quat_normalize(jax.random.normal(k4, (n, 4)))
    opacity = jax.random.uniform(k5, (n,), minval=0.1, maxval=opacity_max)
    feats = jax.random.uniform(jax.random.fold_in(key, 9), (n, 3))
    return xyz, scale, quat, opacity, feats


def project_scene(xyz, scale, quat):
    extr = jnp.eye(3, 4)
    uv, depth = projection.project_ortho(xyz, extr, W, H)
    visible = depth != 0
    cov6 = quaternion.build_cov3d(scale, quat, visible)
    conic, radius, tiles, rmin, rmax = projection.ewa_ortho(cov6, extr, uv, W, H, visible)
    return uv, depth, conic, radius, tiles, rmin, rmax


def pallas_render(uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats,
                  bg=(1.0, 1.0, 1.0), K_idx=0, alpha_grad_mask=None,
                  abs_sink=None, sort_mode="exact"):
    # exact sort: these tests assert bit-parity with the sequential oracle
    if abs_sink is None:
        abs_sink = jnp.zeros((uv.shape[0], 2))
    img, finalT, ncontrib, gs_idx, nint = rasterize_tpu.splat_scene(
        uv, conic, opacity, feats, abs_sink, depth, tiles, rmin, rmax,
        C=feats.shape[1], W=W, H=H, bg=bg,
        alpha_grad_mask=alpha_grad_mask, K_idx=K_idx,
        max_intersections=1 << 14, sort_mode=sort_mode,
    )
    return img, finalT, ncontrib, gs_idx


class TestBinning:
    def test_counts_and_order(self):
        key = jax.random.PRNGKey(0)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        channels = jnp.concatenate(
            [uv, conic, opacity[:, None], feats, jnp.zeros((uv.shape[0], 2))],
            axis=1,
        )
        b = binning.bin_sort_pack(
            depth, tiles, rmin, rmax, channels, W, H,
            max_intersections=1 << 14, sort_mode="exact",
        )
        gid = np.asarray(b.gid)
        edges = np.asarray(b.edges)
        packed = np.asarray(b.packed)
        tgx, tgy = projection.tile_grid(W, H)
        depth_np = np.asarray(depth)
        rmin_np, rmax_np = np.asarray(rmin), np.asarray(rmax)
        radius_np = np.asarray(radius)
        uv_np = np.asarray(uv)

        total_expected = int(np.asarray(tiles).sum())
        assert int(b.num_intersections) == total_expected
        assert edges[-1] == total_expected  # all real entries before sentinels

        for t in range(tgx * tgy):
            ty, tx = divmod(t, tgx)
            seg = gid[edges[t] : edges[t + 1]]
            # brute-force expectation: all gaussians whose rect covers tile t
            exp = [
                i
                for i in range(len(depth_np))
                if radius_np[i] > 0
                and rmin_np[i, 0] <= tx < rmax_np[i, 0]
                and rmin_np[i, 1] <= ty < rmax_np[i, 1]
            ]
            assert sorted(seg.tolist()) == sorted(exp), f"tile {t}"
            # depth-ascending order
            d = depth_np[seg]
            assert (np.diff(d) >= 0).all(), f"tile {t} not depth sorted"
            # packed channels match the owning gaussians (uv rows)
            np.testing.assert_allclose(
                packed[0, edges[t] : edges[t + 1]], uv_np[seg, 0], atol=1e-6
            )

        # chunk_base covers each tile's chunk count (+1 for aligned-down walk)
        counts = edges[1:] - edges[:-1]
        cb = np.asarray(b.chunk_base)
        astart = (edges[:-1] // 128) * 128
        expected = np.where(counts > 0, -(-(edges[1:] - astart) // 128), 0)
        np.testing.assert_array_equal(np.diff(cb), expected)


    def test_edges_matmul_parity(self):
        """edges_mode="matmul" (MXU coverage counts) == "search" on the
        full Binning output, including tile-cap clamping (partial rows)."""
        key = jax.random.PRNGKey(3)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        channels = jnp.concatenate(
            [uv, conic, opacity[:, None], feats, jnp.zeros((uv.shape[0], 2))],
            axis=1,
        )
        for presort in (False, True):
            for cap in (64, 4):  # 4 forces partial-row clamping
                a = binning.bin_sort_pack(
                    depth, tiles, rmin, rmax, channels, W, H,
                    max_intersections=1 << 14, presort=presort,
                    max_tiles_per_gaussian=cap, edges_mode="search",
                )
                b = binning.bin_sort_pack(
                    depth, tiles, rmin, rmax, channels, W, H,
                    max_intersections=1 << 14, presort=presort,
                    max_tiles_per_gaussian=cap, edges_mode="matmul",
                )
                tag = f"presort={presort} cap={cap}"
                np.testing.assert_array_equal(
                    np.asarray(a.edges), np.asarray(b.edges), err_msg=tag
                )
                np.testing.assert_array_equal(
                    np.asarray(a.chunk_base), np.asarray(b.chunk_base), err_msg=tag
                )
                np.testing.assert_array_equal(
                    np.asarray(a.gid), np.asarray(b.gid), err_msg=tag
                )
                np.testing.assert_allclose(
                    np.asarray(a.packed), np.asarray(b.packed), err_msg=tag
                )


class TestSplatParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_forward_matches_oracle(self, seed):
        key = jax.random.PRNGKey(seed)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        img, finalT, ncontrib, _ = pallas_render(
            uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats
        )
        ref = rasterize_ref.splat_reference(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)),
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(finalT), np.asarray(ref.final_T), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ncontrib), np.asarray(ref.ncontrib))

    def test_gs_idx_matches_oracle(self):
        key = jax.random.PRNGKey(3)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        img, _, _, gs_idx = pallas_render(
            uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats, K_idx=8
        )
        ref = rasterize_ref.splat_reference(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)), K_idx=8,
        )
        np.testing.assert_array_equal(np.asarray(gs_idx), np.asarray(ref.gs_idx))

    def test_planar_primal_matches_vjp_fwd_bitexact(self):
        """The no-grad primal renders via planar [C,H,W] output blocks
        (rasterize_tpu.fwd_pallas planar=True) while the vjp fwd keeps the
        tile layout for its backward residuals. custom_vjp requires the two
        to agree; the layouts must not change a single bit."""
        key = jax.random.PRNGKey(11)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)

        def primal():
            return pallas_render(
                uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats
            )

        def via_grad():
            def f(op):
                img, finalT, ncontrib, _ = pallas_render(
                    uv, depth, conic, radius, tiles, rmin, rmax, op, feats
                )
                return jnp.sum(img), (img, finalT, ncontrib)

            (_, aux), _ = jax.value_and_grad(f, has_aux=True)(opacity)
            return aux

        img_p, finalT_p, ncontrib_p, _ = primal()
        img_g, finalT_g, ncontrib_g = via_grad()
        np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_g))
        np.testing.assert_array_equal(np.asarray(finalT_p), np.asarray(finalT_g))
        np.testing.assert_array_equal(np.asarray(ncontrib_p), np.asarray(ncontrib_g))

    def test_opaque_early_termination(self):
        """Opacities near 1 exercise the T<1e-4 termination rule."""
        key = jax.random.PRNGKey(4)
        xyz, scale, quat, opacity, feats = make_scene(key, n=200, opacity_max=0.989)
        opacity = jnp.clip(opacity * 1.1, 0.0, 0.989)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        img, finalT, ncontrib, _ = pallas_render(
            uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats
        )
        ref = rasterize_ref.splat_reference(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)),
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(finalT), np.asarray(ref.final_T), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ncontrib), np.asarray(ref.ncontrib))


class TestSplatGradients:
    def _loss_pallas(self, params, key_data):
        uv, depth, conic, radius, tiles, rmin, rmax, tgt = key_data
        opacity, feats, uv_p, conic_p = params
        img, _, _, _ = pallas_render(
            uv_p, depth, conic_p, radius, tiles, rmin, rmax, opacity, feats
        )
        return jnp.sum((img - tgt) ** 2)

    def _loss_oracle(self, params, key_data):
        uv, depth, conic, radius, tiles, rmin, rmax, tgt = key_data
        opacity, feats, uv_p, conic_p = params
        ref = rasterize_ref.splat_reference(
            uv_p, conic_p, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)),
        )
        return jnp.sum((ref.image - tgt) ** 2)

    def test_grads_match_oracle(self):
        key = jax.random.PRNGKey(5)
        # keep opacities < 0.9 so the 0.99-clamp subgradient difference
        # (CUDA ignores the clamp; the oracle's autodiff doesn't) is inactive
        xyz, scale, quat, opacity, feats = make_scene(key, opacity_max=0.85)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        tgt = jnp.zeros((H, W, 3))
        data = (uv, depth, conic, radius, tiles, rmin, rmax, tgt)
        params = (opacity, feats, uv, conic)

        g_p = jax.grad(self._loss_pallas)(params, data)
        g_o = jax.grad(self._loss_oracle)(params, data)
        for a, b, name in zip(g_p, g_o, ["opacity", "feats", "uv", "conic"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=2e-3,
                err_msg=f"grad mismatch: {name}",
            )

    def test_abs_sink_grads(self):
        """The abs-sink rows receive summed |duv| (densify statistics)."""
        key = jax.random.PRNGKey(6)
        xyz, scale, quat, opacity, feats = make_scene(key, opacity_max=0.85)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)

        def loss(abs_sink, uv):
            img, _, _, _ = pallas_render(
                uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats,
                abs_sink=abs_sink,
            )
            return jnp.sum(img**2)

        zero_sink = jnp.zeros((uv.shape[0], 2))
        g_abs, g_uv = jax.grad(loss, argnums=(0, 1))(zero_sink, uv)
        g_abs, g_uv = np.asarray(g_abs), np.asarray(g_uv)
        # |sum of grads| <= sum of |grads| with equality when one tile only
        assert (g_abs >= np.abs(g_uv) - 1e-5).all()
        assert g_abs.sum() > 0

    def test_alpha_grad_mask_blocks_opacity(self):
        """Channels with mask=0 reproduce the reference's opacity.detach()."""
        key = jax.random.PRNGKey(7)
        xyz, scale, quat, opacity, feats = make_scene(key, opacity_max=0.85)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)

        def loss(opacity, mask):
            img, _, _, _ = pallas_render(
                uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats,
                bg=(0.0, 0.0, 0.0), alpha_grad_mask=mask,
            )
            return jnp.sum(img**2)

        g_on = jax.grad(lambda o: loss(o, (1.0, 1.0, 1.0)))(opacity)
        g_off = jax.grad(lambda o: loss(o, (0.0, 0.0, 0.0)))(opacity)
        assert np.abs(np.asarray(g_on)).sum() > 0
        np.testing.assert_allclose(np.asarray(g_off), 0.0, atol=1e-7)


class TestPackedSort:
    def test_packed_matches_exact_image(self):
        """The packed int32 sort key must reproduce the exact-sort image
        (up to depth ties below 20-bit precision, absent in random data)."""
        key = jax.random.PRNGKey(11)
        xyz, scale, quat, opacity, feats = make_scene(key)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)

        imgs = {}
        for mode in ("exact", "packed"):
            img, _, _, _ = pallas_render(
                uv, depth, conic, radius, tiles, rmin, rmax, opacity, feats,
                sort_mode=mode,
            )
            imgs[mode] = np.asarray(img)
        np.testing.assert_allclose(imgs["packed"], imgs["exact"], atol=1e-5)


class TestMonotoneExpand:
    """The Pallas monotone-window expansion must be BIT-IDENTICAL to the
    XLA scatter + fill-forward path on every Binning field — it is the
    default (`expand_mode="auto"`) on the presorted pipeline, so any
    deviation is a rendering-correctness bug, not a perf nuance."""

    def _random_binning_inputs(self, seed, n, frac_dead, tile_cap=16):
        rng = np.random.RandomState(seed)
        depth = np.abs(rng.randn(n).astype(np.float32)) + 0.01
        depth[rng.rand(n) < frac_dead] = 0.0
        tgx, tgy = projection.tile_grid(W, H)
        rmx = rng.randint(0, max(tgx - 3, 1), n)
        rmy = rng.randint(0, max(tgy - 3, 1), n)
        rw = rng.randint(1, 4, n)
        rh = rng.randint(1, 4, n)
        tiles = np.where(depth > 0, rw * rh, 0).astype(np.int32)
        rect_min = np.stack([rmx, rmy], 1).astype(np.int32)
        rect_max = np.stack([rmx + rw, rmy + rh], 1).astype(np.int32)
        channels = rng.randn(n, 8).astype(np.float32)
        return depth, tiles, rect_min, rect_max, channels

    @pytest.mark.parametrize(
        "seed,n,frac_dead,mi",
        [
            (0, 700, 0.3, 1 << 13),
            (1, 64, 0.0, 1 << 10),
            (2, 300, 0.95, 1 << 12),   # nearly all dead
            (3, 900, 0.2, 1 << 11),    # saturated budget (overflow path)
        ],
    )
    def test_bit_identical_to_fill(self, seed, n, frac_dead, mi):
        depth, tiles, rect_min, rect_max, channels = (
            self._random_binning_inputs(seed, n, frac_dead)
        )
        kw = dict(
            W=W, H=H, max_intersections=mi, max_tiles_per_gaussian=16,
            chunk=128, sort_mode="packed", presort=True, carry_prepos=True,
        )
        outs = {}
        for mode in ("fill", "pallas"):
            outs[mode] = binning.bin_sort_pack(
                jnp.asarray(depth), jnp.asarray(tiles), jnp.asarray(rect_min),
                jnp.asarray(rect_max), jnp.asarray(channels),
                expand_mode=mode, interpret=True, **kw
            )
        for f in ("packed", "gid", "edges", "chunk_base",
                  "num_intersections", "prepos"):
            np.testing.assert_array_equal(
                np.asarray(getattr(outs["fill"], f)),
                np.asarray(getattr(outs["pallas"], f)),
                err_msg=f,
            )

    def test_all_dead_scene(self):
        depth, tiles, rect_min, rect_max, channels = (
            self._random_binning_inputs(4, 128, 1.0)
        )
        b = binning.bin_sort_pack(
            jnp.asarray(depth), jnp.asarray(tiles), jnp.asarray(rect_min),
            jnp.asarray(rect_max), jnp.asarray(channels),
            W=W, H=H, max_intersections=1 << 10, max_tiles_per_gaussian=16,
            chunk=128, sort_mode="packed", presort=True,
            expand_mode="pallas", interpret=True,
        )
        assert int(b.num_intersections) == 0
        assert (np.asarray(b.gid) == -1).all()


class TestWideTiles:
    def test_32x16_matches_oracle(self):
        """Rectangular (32, 16) tiles must reproduce the oracle exactly
        (different tile rects => different inclusion sets, so the oracle
        runs with the same block)."""
        key = jax.random.PRNGKey(13)
        xyz, scale, quat, opacity, feats = make_scene(key)
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, W, H)
        visible = depth != 0
        cov6 = quaternion.build_cov3d(scale, quat, visible)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, W, H, visible, block=(32, 16)
        )
        img, finalT, ncontrib, _, _ = rasterize_tpu.splat_scene(
            uv, conic, opacity, feats, jnp.zeros((uv.shape[0], 2)),
            depth, tiles, rmin, rmax,
            C=3, W=W, H=H, bg=(1.0, 1.0, 1.0),
            max_intersections=1 << 14, sort_mode="exact", block=(32, 16),
        )
        ref = rasterize_ref.splat_reference(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)), block=(32, 16),
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ncontrib), np.asarray(ref.ncontrib))

    def test_32x16_gradients(self):
        key = jax.random.PRNGKey(14)
        xyz, scale, quat, opacity, feats = make_scene(key, opacity_max=0.85)
        extr = jnp.eye(3, 4)
        uv, depth = projection.project_ortho(xyz, extr, W, H)
        visible = depth != 0
        cov6 = quaternion.build_cov3d(scale, quat, visible)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, W, H, visible, block=(32, 16)
        )

        def loss_p(op):
            img, *_ = rasterize_tpu.splat_scene(
                uv, conic, op, feats, jnp.zeros((uv.shape[0], 2)),
                depth, tiles, rmin, rmax,
                C=3, W=W, H=H, bg=(1.0, 1.0, 1.0),
                max_intersections=1 << 14, sort_mode="exact", block=(32, 16),
            )
            return jnp.sum(img**2)

        def loss_o(op):
            ref = rasterize_ref.splat_reference(
                uv, conic, op, feats, depth, radius, rmin, rmax, W, H,
                bg=jnp.ones((3,)), block=(32, 16),
            )
            return jnp.sum(ref.image**2)

        gp = jax.grad(loss_p)(opacity)
        go = jax.grad(loss_o)(opacity)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(go), atol=3e-4, rtol=2e-3)


class TestWithBias:
    def test_bias_raises_alpha(self):
        """alpha_blending_with_bias parity (oracle level)."""
        key = jax.random.PRNGKey(21)
        xyz, scale, quat, opacity, feats = make_scene(key, n=50)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        bias = jnp.full((50,), 0.3)
        base = rasterize_ref.splat_reference(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.zeros((3,)),
        )
        biased = rasterize_ref.splat_reference_with_bias(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.zeros((3,)), opacity_bias=bias,
        )
        # higher alpha => lower final transmittance somewhere
        assert float(biased.final_T.mean()) < float(base.final_T.mean())
        # zero bias reproduces the plain blend
        zb = rasterize_ref.splat_reference_with_bias(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.zeros((3,)), opacity_bias=jnp.zeros((50,)),
        )
        np.testing.assert_allclose(np.asarray(zb.image), np.asarray(base.image), atol=1e-6)

    def test_bias_gradient(self):
        key = jax.random.PRNGKey(22)
        xyz, scale, quat, opacity, feats = make_scene(key, n=30, opacity_max=0.6)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)

        def loss(bias):
            out = rasterize_ref.splat_reference_with_bias(
                uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
                bg=jnp.zeros((3,)), opacity_bias=bias,
            )
            return jnp.sum(out.image**2)

        g = np.asarray(jax.grad(loss)(jnp.zeros((30,))))
        assert np.isfinite(g).all() and np.abs(g).sum() > 0


    @pytest.mark.slow
    def test_device_path_matches_oracle(self):
        """The Pallas with-bias path == the sequential oracle (fwd) and its
        gradients, including dL/dbias, match the oracle autodiff."""
        key = jax.random.PRNGKey(23)
        n = 40
        xyz, scale, quat, opacity, feats = make_scene(key, n=n, opacity_max=0.6)
        uv, depth, conic, radius, tiles, rmin, rmax = project_scene(xyz, scale, quat)
        bias = jax.random.uniform(jax.random.PRNGKey(7), (n,), minval=0.0,
                                  maxval=0.25)

        img, finalT, _, _, _ = rasterize_tpu.splat_scene(
            uv, conic, opacity, feats, jnp.zeros((n, 2)), depth, tiles,
            rmin, rmax, C=3, W=W, H=H, bg=(0.0, 0.0, 0.0),
            max_intersections=1 << 14, sort_mode="exact",
            opacity_bias=bias,
        )
        ref = rasterize_ref.splat_reference_with_bias(
            uv, conic, opacity, feats, depth, radius, rmin, rmax, W, H,
            bg=jnp.zeros((3,)), opacity_bias=bias,
        )
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref.image), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(finalT), np.asarray(ref.final_T), atol=2e-5
        )

        def loss_dev(params):
            op, fe, bi = params
            out, *_ = rasterize_tpu.splat_scene(
                uv, conic, op, fe, jnp.zeros((n, 2)), depth, tiles,
                rmin, rmax, C=3, W=W, H=H, bg=(0.0, 0.0, 0.0),
                max_intersections=1 << 14, sort_mode="exact",
                opacity_bias=bi,
            )
            return jnp.sum(out**2)

        def loss_ref(params):
            op, fe, bi = params
            out = rasterize_ref.splat_reference_with_bias(
                uv, conic, op, fe, depth, radius, rmin, rmax, W, H,
                bg=jnp.zeros((3,)), opacity_bias=bi,
            )
            return jnp.sum(out.image**2)

        gd = jax.grad(loss_dev)((opacity, feats, bias))
        gr = jax.grad(loss_ref)((opacity, feats, bias))
        for a, b, name in zip(gd, gr, ["opacity", "feats", "bias"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=3e-3,
                err_msg=f"bias-path grad mismatch: {name}",
            )
        assert np.abs(np.asarray(gd[2])).sum() > 0  # dbias is live


class TestRadiusClamp:
    def test_big_gaussian_renders_symmetrically(self):
        """A gaussian larger than the tile cap must render a CENTERED
        clipped footprint, not the top rows of its rect (the asymmetric
        truncation caused training collapse)."""
        n = 1
        uv = jnp.array([[W / 2, H / 2]], jnp.float32)
        depth = jnp.ones((n,))
        # giant isotropic gaussian: radius >> image
        cov6 = jnp.array([[4.0, 0, 0, 4.0, 0, 4.0]], jnp.float32)
        from splatter_a_video_tpu.ops.projection import ewa_ortho, max_radius_for_tile_cap

        max_r = max_radius_for_tile_cap(12, 16)
        conic, radius, tiles, rmin, rmax = ewa_ortho(
            cov6, jnp.eye(3, 4), uv, W, H, jnp.array([True]), 16, max_r
        )
        assert int(tiles[0]) <= 12
        img, finalT, _, _ = pallas_render(
            uv, depth, conic, radius, tiles, rmin, rmax,
            jnp.array([0.9]), jnp.array([[1.0, 0.0, 0.0]]), bg=(0.0, 0.0, 0.0),
        )
        T = np.asarray(finalT)
        cy, cx = H // 2, W // 2
        # footprint is centered: coverage symmetric about the center
        assert T[cy, cx] < 0.5
        left = T[cy, : cx].mean()
        right = T[cy, cx + 1 :].mean()
        top = T[: cy, cx].mean()
        bot = T[cy + 1 :, cx].mean()
        assert abs(top - bot) < 0.2, (top, bot)
        assert abs(left - right) < 0.2, (left, right)


@pytest.mark.slow
class TestEqualDepthDeterminism:
    """All-equal depths (a 2D-fitting scene, examples/gs_2d.py) must blend
    in gaussian-index order — the reference's stable radix-sort tie
    behavior — and identically under eager and jit (regression: an
    unstable 1-key sort once ordered ties differently per compilation)."""

    def _scene(self, n=300):
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 5)
        xyz = jnp.concatenate(
            [
                jax.random.uniform(ks[0], (n, 2), minval=-0.8, maxval=0.8),
                jnp.ones((n, 1)),  # IDENTICAL depth for every gaussian
            ],
            axis=1,
        )
        scale = jnp.exp(jax.random.uniform(ks[1], (n, 3), minval=-3.5, maxval=-2.5))
        quat = quaternion.quat_normalize(jax.random.normal(ks[2], (n, 4)))
        op = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
        shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.4
        return xyz, scale, quat, op, shs

    def test_eager_matches_jit_and_oracle(self):
        xyz, scale, quat, op, shs = self._scene()
        extr = jnp.eye(3, 4)
        cfg = rasterize.RasterizeConfig(
            width=W, height=H, max_intersections=1 << 14
        )

        def render(xyz, scale, quat, op, shs):
            return rasterize.render_gaussians(
                xyz, scale, quat, op, shs, extr, cfg
            ).features["rgb"]

        eager = np.asarray(render(xyz, scale, quat, op, shs))
        jitted = np.asarray(jax.jit(render)(xyz, scale, quat, op, shs))
        # eager and jit are different XLA programs: fusion may reorder
        # float ops by ~1 ulp, so tolerance is rounding-level, not exact
        np.testing.assert_allclose(eager, jitted, atol=1e-5)

        # index order == the sequential oracle's order (it blends slots in
        # gaussian order for equal depths)
        uv, depth = projection.project_ortho(xyz, extr, W, H)
        visible = depth != 0
        cov6 = quaternion.build_cov3d(scale, quat, visible)
        conic, radius, tiles, rmin, rmax = projection.ewa_ortho(
            cov6, extr, uv, W, H, visible, 16, None, "tight",
            jax.lax.stop_gradient(op),
        )
        from splatter_a_video_tpu.ops import sh as _sh

        dirs = jnp.concatenate(
            [jnp.zeros((xyz.shape[0], 2)), jnp.ones((xyz.shape[0], 1))], axis=1
        )
        rgb = _sh.eval_sh(3, shs, dirs, visible)
        ref = rasterize_ref.splat_reference(
            uv, conic, op, rgb, depth, radius, rmin, rmax, W, H,
            bg=jnp.ones((3,)),
        )
        np.testing.assert_allclose(eager, np.asarray(ref.image), atol=2e-5)


class TestScanReduction:
    """Scan-vs-scatter A/B for the backward's segmented grad reduction
    (formerly the AB_REDUCE env-gated debug block inside
    `rasterize_tpu.reduce_to_gaussians`): the bounded-run Hillis-Steele
    suffix-sum over per-slot gradients must equal a plain scatter-add."""

    def _scan_reduce(self, dgrad, gid, offs, tiles, cap, N):
        """Standalone replica of the production scan reduction (post-sort
        layout: each gaussian's slots are one contiguous run <= cap)."""
        nrows, M = dgrad.shape
        x = jnp.asarray(dgrad)
        gidp = jnp.asarray(gid) + 2
        shift = 1
        while shift < max(cap, 2):
            xs = jnp.concatenate(
                [x[:, shift:], jnp.zeros((nrows, shift), jnp.float32)], axis=1
            )
            gs = jnp.concatenate(
                [gidp[shift:], jnp.full((shift,), -2, jnp.int32)]
            )
            x = x + jnp.where((gs == gidp)[None, :], xs, 0.0)
            shift *= 2
        safe_off = jnp.clip(jnp.asarray(offs), 0, M - 1)
        per_g = jnp.take(x, safe_off, axis=1)
        per_g = jnp.where((jnp.asarray(tiles) > 0)[None, :], per_g, 0.0)
        return np.asarray(per_g.T)

    def test_matches_scatter_add(self):
        rng = np.random.RandomState(11)
        N, cap, nrows = 64, 8, 5
        tiles = rng.randint(0, cap + 1, N).astype(np.int32)
        offs = np.concatenate([[0], np.cumsum(tiles)[:-1]]).astype(np.int32)
        total = int(tiles.sum())
        M = total + 16
        gid = np.full(M, -1, np.int32)
        for g in range(N):
            gid[offs[g] : offs[g] + tiles[g]] = g
        dgrad = rng.randn(nrows, M).astype(np.float32)
        dgrad[:, total:] = rng.randn(nrows, M - total).astype(np.float32)

        got = self._scan_reduce(dgrad, gid, offs, tiles, cap, N)

        want = np.zeros((N, nrows), np.float64)
        for s in range(total):
            if gid[s] >= 0:
                want[gid[s]] += dgrad[:, s]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
