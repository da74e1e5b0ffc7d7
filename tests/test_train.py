"""End-to-end training tests: losses, optimizer, density control, fit smoke.

The fit smoke test replicates the reference's implicit convergence check
(the dptr `gs_2d.py` tutorial pattern, `dptr/README.md:143-269`): fit random
Gaussians to a target image and require a PSNR gain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.models import camera, gaussians
from splatter_a_video_tpu.train import density, losses, optim, trainer

W, H, T = 64, 48, 8
CAP = 256


def make_scene(n=200, key=0, traj="poly_fourier"):
    cfg = gaussians.SceneConfig(
        capacity=CAP, num_frames=T, traj=traj,
        render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
    )
    rng = np.random.RandomState(key)
    pos = np.concatenate(
        [rng.uniform(-0.8, 0.8, (n, 2)), rng.uniform(0.8, 1.4, (n, 1))], axis=1
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scene = gaussians.create_scene(cfg, pos, colors, init_opacity=0.3)
    # widen points so they cover pixels
    scene.params["scaling"] = jnp.full((CAP, 3), np.log(0.05))
    return scene


def tcfg(**kw):
    defaults = dict(
        width=W, height=H, num_frames=T,
        max_intersections=1 << 13, num_track_samples=16,
        arap_sample_num=32,
        optim=optim.OptimConfig(max_steps=200),
        densify=density.DensifyConfig(
            densify_start_iter=2, duplicate_interval=5, prune_interval=5,
            min_opacity=0.01,
        ),
    )
    defaults.update(kw)
    return trainer.TrainerConfig(**defaults)


def make_batch(rng, target):
    qp = np.stack(
        [rng.randint(0, W, 16), rng.randint(0, H, 16)], axis=1
    ).astype(np.float32)
    tt = np.concatenate(
        [qp + rng.randn(16, 2), -5 * np.ones((16, 1)), -5 * np.ones((16, 1))], axis=1
    ).astype(np.float32)  # occ/dist logits very negative -> visible, confident
    return trainer.Batch(
        t1=jnp.asarray(0, jnp.int32),
        t2=jnp.asarray(3, jnp.int32),
        rgb1=jnp.asarray(target),
        depth1=jnp.ones((H, W)),
        query_px=jnp.asarray(qp),
        target_tracks=jnp.asarray(tt),
        track_valid=jnp.ones((16,), bool),
    )


class TestFrameStore:
    @pytest.mark.slow  # compiles two full train steps (~40 s each on CPU)
    def test_slim_batch_matches_full_batch(self):
        """A slim batch + device FrameStore must produce bit-identical
        results to the legacy full batch (the store only relocates the
        per-frame tensors; the math is unchanged)."""
        scene = make_scene()
        cfg = tcfg(densify=density.DensifyConfig(densify_start_iter=10**9))
        cam = camera.canonical_camera(W, H)
        rng = np.random.RandomState(0)
        targets = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
        depths = rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32)
        full = make_batch(np.random.RandomState(1), targets[0])
        full = full._replace(depth1=jnp.asarray(depths[0]))
        slim = trainer.Batch(
            t1=full.t1, t2=full.t2, query_px=full.query_px,
            target_tracks=full.target_tracks, track_valid=full.track_valid,
        )
        store = trainer.FrameStore(
            rgb=jnp.asarray(targets), depth=jnp.asarray(depths)
        )
        step_full, _, _ = trainer.make_train_step(cfg, cam.extrinsic)
        step_slim, _, _ = trainer.make_train_step(
            cfg, cam.extrinsic, frames=store
        )
        st_f, m_f = step_full(trainer.init_train_state(cfg, scene), full)
        st_s, m_s = step_slim(trainer.init_train_state(cfg, scene), slim)
        for k in m_f:
            np.testing.assert_array_equal(
                np.asarray(m_f[k]), np.asarray(m_s[k]), err_msg=k
            )
        for k in st_f.scene.params:
            np.testing.assert_array_equal(
                np.asarray(st_f.scene.params[k]),
                np.asarray(st_s.scene.params[k]), err_msg=k,
            )


class TestTrainStep:
    @pytest.mark.slow
    def test_step_runs_and_loss_finite(self):
        scene = make_scene()
        cfg = tcfg()
        cam = camera.canonical_camera(W, H)
        train_step, density_step, opacity_reset = trainer.make_train_step(cfg, cam.extrinsic)
        state = trainer.init_train_state(cfg, scene)
        rng = np.random.RandomState(0)
        target = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        batch = make_batch(rng, target)
        state, metrics = train_step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        assert int(state.step) == 1
        # grads actually moved params
        assert not np.allclose(
            np.asarray(state.scene.params["opacity"]),
            np.asarray(scene.params["opacity"]),
        )

    @pytest.mark.slow
    def test_fit_improves_psnr(self):
        """Photometric-only fit: PSNR must improve over 30 steps."""
        scene = make_scene(n=220, key=1)
        cfg = tcfg(loss_flow_weight=0.0, depth_loss_weight=0.0, arap_weight=0.0,
                   loss_rgb_weight=10.0)
        cam = camera.canonical_camera(W, H)
        train_step, _, _ = trainer.make_train_step(cfg, cam.extrinsic)
        state = trainer.init_train_state(cfg, scene)
        rng = np.random.RandomState(1)
        # smooth target: horizontal color gradient
        xx = np.linspace(0, 1, W)[None, :, None]
        target = np.concatenate(
            [np.repeat(xx, H, 0), 1 - np.repeat(xx, H, 0), 0.5 * np.ones((H, W, 1))],
            axis=2,
        ).astype(np.float32)
        batch = make_batch(rng, target)
        _, m0 = train_step(state, batch)
        psnr0 = float(m0["psnr"])
        for _ in range(30):
            state, metrics = train_step(state, batch)
        psnr1 = float(metrics["psnr"])
        assert psnr1 > psnr0 + 1.0, (psnr0, psnr1)

    def test_densify_step(self):
        scene = make_scene(n=100)
        cfg = tcfg()
        cam = camera.canonical_camera(W, H)
        train_step, density_step, opacity_reset = trainer.make_train_step(cfg, cam.extrinsic)
        state = trainer.init_train_state(cfg, scene)
        rng = np.random.RandomState(2)
        batch = make_batch(rng, rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        for _ in range(3):
            state, _ = train_step(state, batch)
        n_before = int(state.scene.num_alive)
        state, info = density_step(state)
        assert np.isfinite(float(info.num_alive))
        assert int(info.num_alive) == int(state.scene.num_alive)
        # opacity reset keeps shapes and clamps opacities
        state = opacity_reset(state)
        op = np.asarray(jax.nn.sigmoid(state.scene.params["opacity"]))
        assert (op <= 0.0101).all()


class TestDensityUnit:
    def _setup(self, n=20):
        scene = make_scene(n=n)
        opt = optim.make_optimizer(optim.OptimConfig())
        opt_state = opt.init(scene.params)
        dstate = density.init_state(CAP)
        return scene, opt, opt_state, dstate

    def test_clone_into_free_slots(self):
        scene, opt, opt_state, dstate = self._setup(n=20)
        cfg = density.DensifyConfig(densify_grad_threshold=0.1, percent_dense=10.0)
        # large grads on 5 points; huge percent_dense => all clones, no splits
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=jnp.zeros((CAP,)).at[:5].set(1.0),
            denom=jnp.ones((CAP,)),
        )
        scene2, opt2, d2, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg, jax.random.PRNGKey(0)
        )
        assert int(info.num_cloned) == 5
        assert int(info.num_split) == 0
        assert int(scene2.num_alive) == 25
        # clone children inherit parent positions
        alive_new = np.asarray(scene2.alive) & ~np.asarray(scene.alive)
        new_pos = np.asarray(scene2.params["position"])[alive_new]
        parents = np.asarray(scene.params["position"])[:5]
        for p in new_pos:
            assert np.min(np.abs(parents - p).sum(axis=1)) < 1e-6

    def test_split_removes_parent(self):
        scene, opt, opt_state, dstate = self._setup(n=20)
        # tiny percent_dense => all hot points split
        cfg = density.DensifyConfig(densify_grad_threshold=0.1, percent_dense=1e-9)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=jnp.zeros((CAP,)).at[:3].set(1.0),
            denom=jnp.ones((CAP,)),
        )
        scene2, opt2, d2, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg, jax.random.PRNGKey(0)
        )
        assert int(info.num_split) == 3
        # 20 - 3 parents + 6 children = 23
        assert int(scene2.num_alive) == 23
        alive2 = np.asarray(scene2.alive)
        assert not alive2[0] and not alive2[1] and not alive2[2]

    def test_prune_low_opacity(self):
        scene, opt, opt_state, dstate = self._setup(n=20)
        params = dict(scene.params)
        params["opacity"] = params["opacity"].at[:4].set(-10.0)  # sigmoid ~ 0
        scene = scene.replace(params=params)
        cfg = density.DensifyConfig(densify_grad_threshold=1e9, min_opacity=0.05)
        scene2, _, _, info = density.densify_and_prune(
            scene, opt_state, density.init_state(CAP), jnp.asarray(100), cfg,
            jax.random.PRNGKey(0),
        )
        assert int(info.num_pruned) == 4
        assert int(scene2.num_alive) == 16

    def test_size_prune_gated_on_opacity_reset_interval(self):
        """The WORLD-scale size prune applies only once
        step > opacity_reset_interval in the single-atlas path
        (`gs_optimizer.py:361-372`); `size_prune_always` restores the
        unconditional atlas behavior (`atlas_gs_optimizer.py:362`).

        Regression for the 2026-08-19 480p-scale collapse: unconditional
        size pruning from the first event shrank a 27.8k scene to 6.1k."""
        def run(step, **kw):
            scene, opt, opt_state, dstate = self._setup(n=20)
            params = dict(scene.params)
            # 6 points above the world-size bar: exp(scaling) > 0.1*extent
            big = float(np.log(0.1 * 5.0 * 1.5))
            params["scaling"] = params["scaling"].at[:6].set(big)
            scene = scene.replace(params=params)
            cfg = density.DensifyConfig(
                densify_grad_threshold=1e9, opacity_reset_interval=3000,
                cameras_extent=5.0, **kw
            )
            _, _, _, info = density.densify_and_prune(
                scene, opt_state, dstate, jnp.asarray(step), cfg,
                jax.random.PRNGKey(0),
            )
            return int(info.num_pruned)

        assert run(600) == 0          # before the gate: big scales survive
        assert run(3500) == 6         # after the gate: pruned
        assert run(600, size_prune_always=True) == 6  # atlas variant

    def test_screen_radius_never_prunes(self):
        """PARITY: the reference's `max_radii2D > 20` prune is dead code in
        production — `densify_clone`/`densify_split` zero the stats via
        `reset_densification_state()` BEFORE `prune` runs in the same
        event (`gs_optimizer.py:302,338,361-372`, duplicate_interval ==
        prune_interval == 100), so the screen test always sees zeros.
        Enforcing it instead executes the big gaussians that re-cover the
        scene after each opacity reset and training quality declines
        monotonically (480p/100k r4 run: PSNR 23 -> 6 over steps 2.5k-8k)."""
        scene, opt, opt_state, dstate = self._setup(n=20)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)).at[:6].set(100.0),  # huge px
            pos_grad_accum=jnp.zeros((CAP,)),
            denom=jnp.ones((CAP,)),
        )
        cfg = density.DensifyConfig(
            densify_grad_threshold=1e9, size_prune_always=True
        )
        _, _, _, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(600), cfg,
            jax.random.PRNGKey(0),
        )
        assert int(info.num_pruned) == 0

    def test_capacity_saturation_reported(self):
        scene, opt, opt_state, dstate = self._setup(n=250)  # only 6 free
        cfg = density.DensifyConfig(densify_grad_threshold=0.1, percent_dense=10.0)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=jnp.zeros((CAP,)).at[:20].set(1.0),
            denom=jnp.ones((CAP,)),
        )
        scene2, _, _, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg, jax.random.PRNGKey(0)
        )
        assert int(info.dropped) == 14  # 20 candidates, 6 free slots
        assert int(scene2.num_alive) == CAP

    def test_saturated_placement_prioritizes_hot_gradients(self):
        """Under capacity pressure the placement prefix must follow the
        accumulated viewspace-grad ranking, not slot order: the hottest
        parents win the free slots (the T=250 flagship collapse was the
        slot-order policy starving the highest-error regions)."""
        scene, opt, opt_state, dstate = self._setup(n=250)  # only 6 free
        cfg = density.DensifyConfig(densify_grad_threshold=0.1,
                                    percent_dense=10.0)
        grads = jnp.zeros((CAP,))
        # low-index lukewarm candidates, high-index HOT candidates
        grads = grads.at[:20].set(0.2).at[200:210].set(5.0)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=grads,
            denom=jnp.ones((CAP,)),
        )
        scene2, _, _, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg,
            jax.random.PRNGKey(0),
        )
        assert int(info.dropped) == 24  # 30 candidates, 6 free
        assert int(info.num_cloned) == 6
        # every placed child is a clone of a HOT parent (position matches
        # one of slots 200..209, none of the lukewarm 0..19)
        alive_new = np.asarray(scene2.alive) & ~np.asarray(scene.alive)
        new_pos = np.asarray(scene2.params["position"])[alive_new]
        hot_pos = np.asarray(scene.params["position"])[200:210]
        cold_pos = np.asarray(scene.params["position"])[:20]
        for p in new_pos:
            assert np.min(np.abs(hot_pos - p).sum(axis=1)) < 1e-6
            assert np.min(np.abs(cold_pos - p).sum(axis=1)) > 1e-4

    def test_growth_budget_caps_event_and_takes_hottest(self):
        """max_growth_frac bounds per-event placements to a fraction of
        alive, spent on the highest-grad candidates."""
        scene, opt, opt_state, dstate = self._setup(n=100)  # plenty free
        cfg = density.DensifyConfig(densify_grad_threshold=0.1,
                                    percent_dense=10.0,
                                    max_growth_frac=0.05)  # 5 of 100
        grads = jnp.zeros((CAP,))
        grads = grads.at[:30].set(0.2).at[90:95].set(5.0)  # 35 hot
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=grads,
            denom=jnp.ones((CAP,)),
        )
        scene2, _, _, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg,
            jax.random.PRNGKey(0),
        )
        assert int(info.num_cloned) == 5
        assert int(info.dropped) == 30
        assert int(scene2.num_alive) == 105
        # the budget went to the 5 hottest parents (slots 90..94)
        alive_new = np.asarray(scene2.alive) & ~np.asarray(scene.alive)
        new_pos = np.asarray(scene2.params["position"])[alive_new]
        hot_pos = np.asarray(scene.params["position"])[90:95]
        for p in new_pos:
            assert np.min(np.abs(hot_pos - p).sum(axis=1)) < 1e-6

    def test_clones_place_before_hotter_splits(self):
        """Reference order parity under scarcity: densify_clone runs
        before densify_split (`gs_optimizer.py:302,338`), so when slots
        are scarce clones win them even against higher-grad splits
        (grad-only priority measurably collapses training by churning
        mass through hot splits)."""
        scene, opt, opt_state, dstate = self._setup(n=250)  # 6 free
        # dense_limit such that slots 0..9 (scale below) clone and
        # slots 200..204 split: set scales explicitly
        params = dict(scene.params)
        params["scaling"] = params["scaling"].at[:10].set(-10.0)   # tiny
        params["scaling"] = params["scaling"].at[200:205].set(1.0)  # huge
        scene = scene.replace(params=params)
        cfg = density.DensifyConfig(densify_grad_threshold=0.1,
                                    percent_dense=0.001)
        grads = jnp.zeros((CAP,))
        grads = grads.at[:10].set(0.2).at[200:205].set(5.0)  # splits hotter
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=grads,
            denom=jnp.ones((CAP,)),
        )
        scene2, _, _, info = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg,
            jax.random.PRNGKey(0),
        )
        # all 6 free slots went to clones; no split parent was removed
        assert int(info.num_cloned) == 6
        assert int(info.num_split) == 0
        alive2 = np.asarray(scene2.alive)
        assert alive2[200:205].all()

    def test_moments_zeroed_for_new_slots(self):
        scene, opt, opt_state, dstate = self._setup(n=20)
        # fake nonzero moments everywhere
        import optax

        def fill(node):
            if isinstance(node, optax.ScaleByAdamState):
                one = jax.tree_util.tree_map(jnp.ones_like, node.mu)
                return optax.ScaleByAdamState(node.count, one, one)
            return node

        opt_state = jax.tree_util.tree_map(
            fill, opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
        )
        cfg = density.DensifyConfig(densify_grad_threshold=0.1, percent_dense=10.0)
        dstate = density.DensifyState(
            max_radii2d=jnp.zeros((CAP,)),
            pos_grad_accum=jnp.zeros((CAP,)).at[:5].set(1.0),
            denom=jnp.ones((CAP,)),
        )
        scene2, opt2, _, _ = density.densify_and_prune(
            scene, opt_state, dstate, jnp.asarray(100), cfg, jax.random.PRNGKey(0)
        )
        used = np.asarray(scene2.alive) & ~np.asarray(scene.alive)
        leaves = jax.tree_util.tree_leaves(opt2)
        checked = 0
        for leaf in leaves:
            arr = np.asarray(leaf)
            if arr.ndim >= 1 and arr.shape[0] == CAP:
                assert (arr[used] == 0).all()
                checked += 1
        assert checked > 0


class TestCriterionLibrary:
    """Cross-check the criterion-library ports against torch reference
    semantics (`/root/reference/src/criterion.py`)."""

    def test_trimmed_mse_matches_torch_semantics(self):
        import torch

        rng = np.random.RandomState(0)
        p = rng.rand(64, 3).astype(np.float32)
        g = rng.rand(64, 3).astype(np.float32)
        ours = float(losses.trimmed_mse_loss(jnp.asarray(p), jnp.asarray(g)))
        tp, tg = torch.tensor(p), torch.tensor(g)
        loss = torch.nn.functional.mse_loss(tp, tg, reduction="none").mean(-1)
        ref = loss[loss < torch.quantile(loss, 0.9)].mean()
        assert abs(ours - float(ref)) < 1e-5

    def test_depth_range_loss(self):
        import torch

        rng = np.random.RandomState(1)
        d = (rng.rand(100).astype(np.float32) * 4.0) - 1.0
        ours = float(losses.depth_range_loss(jnp.asarray(d), 0.0, 2.0))
        td = torch.tensor(d)
        ref = (
            ((td[td < 0.0]) ** 2).sum() + ((td[td > 2.0] - 2.0) ** 2).sum()
        ) / td.numel()
        assert abs(ours - float(ref)) < 1e-6
        assert float(losses.depth_range_loss(jnp.ones(10), 0.0, 2.0)) == 0.0

    def test_distortion_loss(self):
        import torch

        rng = np.random.RandomState(2)
        t = np.sort(rng.rand(4, 9).astype(np.float32), axis=-1)
        w = rng.rand(4, 8).astype(np.float32)
        ours = float(losses.distortion_loss(jnp.asarray(t), jnp.asarray(w)))
        tt, tw = torch.tensor(t), torch.tensor(w)
        ut = (tt[..., 1:] + tt[..., :-1]) / 2
        dut = torch.abs(ut[..., :, None] - ut[..., None, :])
        inter = torch.sum(tw * torch.sum(tw[..., None, :] * dut, dim=-1), dim=-1)
        intra = torch.sum(tw**2 * (tt[..., 1:] - tt[..., :-1]), dim=-1) / 3
        assert abs(ours - float((inter + intra).mean())) < 1e-5

    def test_flow_smoothness_and_norm_helpers(self):
        rng = np.random.RandomState(3)
        flow = jnp.asarray(rng.rand(8, 9, 2).astype(np.float32))
        alpha = jnp.ones((8, 9, 1), jnp.float32)
        v = float(losses.flow_smoothness_loss(flow, alpha))
        assert np.isfinite(v) and v > 0
        # constant flow -> zero smoothness cost
        assert float(losses.flow_smoothness_loss(jnp.ones((8, 9, 2)), alpha)) == 0.0
        x = losses.normalize_minus_one_to_one(jnp.asarray([1.0, 2.0, 3.0]))
        assert float(x.min()) == -1.0 and float(x.max()) == 1.0

    def test_std_and_var_normed(self):
        rng = np.random.RandomState(4)
        p = jnp.asarray(rng.rand(64, 3).astype(np.float32))
        g = jnp.asarray(rng.rand(64, 3).astype(np.float32))
        assert np.isfinite(float(losses.trimmed_std_normed_l1_loss(p, g)))
        assert np.isfinite(float(losses.trimmed_var_normed_mse_loss(p, g)))


class TestLossUnits:
    def test_masked_l1_quantile(self):
        pred = jnp.zeros((10, 2))
        gt = jnp.zeros((10, 2)).at[0].set(100.0)  # one outlier
        full = losses.masked_l1_loss(pred, gt, quantile=1.0)
        trimmed = losses.masked_l1_loss(pred, gt, quantile=0.9)
        assert float(trimmed) < float(full)
        assert float(trimmed) < 1e-6

    def test_depth_loss_scale_invariant(self):
        rng = np.random.RandomState(0)
        d = jnp.asarray(rng.rand(24, 32).astype(np.float32))
        assert float(losses.depth_loss_dpt(d, d * 3.0 + 2.0)) < 1e-8

    def test_ssi_depth_loss(self):
        rng = np.random.RandomState(0)
        d = jnp.asarray(rng.rand(24, 32).astype(np.float32))
        assert float(losses.scale_shift_invariant_depth_loss(d, 2.5 * d - 1.0)) < 1e-8

    def test_arap_zero_for_rigid_motion(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        # rigid transform: rotation + translation
        ang = 0.3
        R = jnp.asarray(
            np.array(
                [
                    [np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1],
                ],
                np.float32,
            )
        )
        pts2 = pts @ R.T + jnp.asarray([0.5, -0.2, 0.1])
        err_rigid = float(
            losses.arap_loss(pts, pts2, jax.random.PRNGKey(0), sample_num=64)
        )
        pts3 = pts * jnp.asarray([2.0, 0.5, 1.0])  # non-rigid stretch
        err_stretch = float(
            losses.arap_loss(pts, pts3, jax.random.PRNGKey(0), sample_num=64)
        )
        assert err_rigid < 1e-5, err_rigid
        assert err_stretch > err_rigid * 100

    def test_entropy_loss(self):
        op = jnp.asarray([0.9, 0.1, 0.5])
        gs_idx = jnp.asarray([[[0, 1, -1], [2, -1, -1]]])
        e = losses.entropy_loss(op, gs_idx)
        assert np.isfinite(float(e)) and float(e) > 0

    def test_tapir_parse(self):
        vis, invis, conf = losses.parse_tapir_track_info(
            jnp.asarray([-10.0, 10.0]), jnp.asarray([-10.0, -10.0])
        )
        assert bool(vis[0]) and not bool(vis[1])
        assert not bool(invis[0]) and bool(invis[1])
        assert float(conf[0]) > 0.99

    def test_weight_scheduler(self):
        w = losses.weight_scheduler(jnp.asarray(0), 0, 1 / 100, 0.0, 10.0)
        assert float(w) == 0.0
        w = losses.weight_scheduler(jnp.asarray(500), 0, 1 / 100, 0.0, 10.0)
        assert abs(float(w) - 5.0) < 1e-6
        w = losses.weight_scheduler(jnp.asarray(99999), 0, 1 / 100, 0.0, 10.0)
        assert float(w) == 10.0


class TestOptim:
    def test_expon_lr(self):
        sched = optim.expon_lr(1e-3, 1e-5, 100)
        assert abs(float(sched(0)) - 1e-3) < 1e-9
        assert abs(float(sched(100)) - 1e-5) < 1e-9
        mid = float(sched(50))
        assert 1e-5 < mid < 1e-3
        assert abs(mid - 1e-4) < 1e-6  # log-linear midpoint

    def test_per_attribute_lrs(self):
        """A uniform gradient moves each attribute by its own lr."""
        scene = make_scene(n=10)
        opt = optim.make_optimizer(optim.OptimConfig(max_steps=100))
        st = opt.init(scene.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, scene.params)
        updates, _ = opt.update(grads, st, scene.params)
        # adam first step: update magnitude ~ lr
        up_op = float(jnp.abs(updates["opacity"]).max())
        up_rot = float(jnp.abs(updates["rotation"]).max())
        assert abs(up_op - 0.05) < 0.06 * 0.2
        assert abs(up_rot - 0.001) < 0.001 * 0.2


class TestGanLoss:
    """gan_loss vs torch reference semantics (`criterion.py:154-236`)."""

    def test_all_modes_match_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(0).randn(4, 7).astype(np.float32)
        tx = torch.from_numpy(x)
        for mode in ("original", "ls", "hinge", "w"):
            for real in (True, False):
                for disc in (True, False):
                    if mode == "hinge" and not disc and not real:
                        continue
                    ours = float(losses.gan_loss(jnp.asarray(x), real, mode, disc))
                    t = torch.full_like(tx, 1.0 if real else 0.0)
                    if mode == "original":
                        ref = F.binary_cross_entropy_with_logits(tx, t)
                    elif mode == "ls":
                        ref = F.mse_loss(tx, t)
                    elif mode == "hinge":
                        if disc:
                            z = torch.zeros_like(tx)
                            ref = -(torch.min((tx - 1) if real else (-tx - 1), z)).mean()
                        else:
                            ref = -tx.mean()
                    else:
                        ref = -tx.mean() if real else tx.mean()
                    assert abs(ours - float(ref)) < 1e-6, (mode, real, disc)

    def test_multiscale_list_averaging(self):
        """Lists (and list-of-list discriminator pyramids, last = logits)
        average per-scale like the reference `__call__` (`:222-236`)."""
        x = jnp.asarray(np.random.RandomState(1).randn(3, 5).astype(np.float32))
        single = losses.gan_loss(x, True, "ls")
        multi = losses.gan_loss([x, [x * 9.0, x]], True, "ls")
        np.testing.assert_allclose(float(multi), float(single), rtol=1e-6)

    def test_generator_hinge_requires_real(self):
        import pytest as _pytest

        with _pytest.raises(AssertionError):
            losses.gan_loss(jnp.zeros((2, 2)), False, "hinge", for_discriminator=False)


@pytest.mark.slow
class TestAttributeSupervision:
    def test_mask_dino_supervision_trains(self):
        """The reference's hand-switched mask/dino attribute losses
        (`trainer_fragGS.py:631-642`, `if False:` there) as proper config:
        MSE on the detached-opacity-blended channels, weight 20."""
        scene = make_scene()
        cfg = tcfg(mask_attr_weight=20.0, dino_attr_weight=20.0)
        cam = camera.canonical_camera(W, H)
        train_step = trainer.make_train_step(cfg, cam.extrinsic)[0]
        state = trainer.init_train_state(cfg, scene)
        rng = np.random.RandomState(0)
        target = rng.rand(H, W, 3).astype(np.float32)
        batch = make_batch(rng, target)
        mask1 = (np.mgrid[0:H, 0:W][1] < W // 2).astype(np.float32)
        dino1 = np.tile(mask1[..., None], (1, 1, 3)) * 0.8
        batch = batch._replace(
            mask1=jnp.asarray(mask1), dino1=jnp.asarray(dino1)
        )
        m0 = None
        for _ in range(15):
            state, m = train_step(state, batch)
            if m0 is None:
                m0 = {k: float(v) for k, v in m.items()}
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss_mask_attr"]) < m0["loss_mask_attr"]
        assert float(m["loss_dino_attr"]) < m0["loss_dino_attr"]
        # gradients reached the attribute params
        assert not np.allclose(
            np.asarray(state.scene.params["mask_attribute"]),
            np.asarray(scene.params["mask_attribute"]),
        )
        assert not np.allclose(
            np.asarray(state.scene.params["dino_attribute"]),
            np.asarray(scene.params["dino_attribute"]),
        )

    def test_fg_layer_losses_train(self):
        """fg-layer re-render supervision (`trainer_fragGS.py:645-668`):
        after fg_layer_start_iter, fg-selected gaussians rendered alone on
        black are pushed toward the masked GT; before it the term is inert."""
        scene = make_scene()
        cfg = tcfg(mask_attr_weight=20.0, fg_layer_weight=20.0,
                   fg_layer_start_iter=3)
        cam = camera.canonical_camera(W, H)
        train_step = trainer.make_train_step(cfg, cam.extrinsic)[0]
        state = trainer.init_train_state(cfg, scene)
        rng = np.random.RandomState(1)
        target = rng.rand(H, W, 3).astype(np.float32)
        mask1 = (np.mgrid[0:H, 0:W][1] < W // 2).astype(np.float32)
        batch = make_batch(rng, target)._replace(mask1=jnp.asarray(mask1))
        metrics = []
        for _ in range(12):
            state, m = train_step(state, batch)
            metrics.append({k: float(v) for k, v in m.items()})
        assert np.isfinite(metrics[-1]["loss"])
        # the fg terms are reported from step 0 but only weighted in after
        # the start iter; they must move once active
        assert metrics[-1]["loss_mask_fg"] < metrics[3]["loss_mask_fg"]


class TestSmoothnessLoss:
    def test_zero_for_constant_features_and_grad_finite(self):
        """`cal_smooth_error` parity (`geometry_utils.py:126-141`): constant
        features have zero neighborhood difference; rough features don't;
        gradients stay finite through the sampled-KNN connectivity."""
        key = jax.random.PRNGKey(0)
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(300, 3).astype(np.float32))
        z = losses.smoothness_loss(jnp.ones((300, 3)), key, positions=pts)
        r = losses.smoothness_loss(pts * 10, key, positions=pts)
        assert float(z) < 1e-6 < float(r)
        g = jax.grad(
            lambda f: losses.smoothness_loss(f, key, positions=pts)
        )(pts * 10)
        assert np.isfinite(np.asarray(g)).all()
