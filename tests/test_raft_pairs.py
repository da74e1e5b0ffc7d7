"""Legacy RAFT-exhaustive pair sampler (data/raft_pairs.py)."""

import json
import os

import numpy as np
import pytest


H, W, T = 24, 32, 6


@pytest.fixture(scope="module")
def raft_dir(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("raft_seq")
    os.makedirs(root / "color")
    os.makedirs(root / "raft_exhaustive")
    os.makedirs(root / "raft_masks")
    os.makedirs(root / "count_maps")
    rng = np.random.RandomState(0)
    names = [f"{t:05d}.png" for t in range(T)]
    stats = {}
    for t, n in enumerate(names):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        imageio.imwrite(root / "color" / n, img)
        imageio.imwrite(
            root / "count_maps" / n,
            (rng.rand(H, W) * 20).astype(np.uint8),
        )
        stats[n] = {}
    for i, n1 in enumerate(names):
        for j, n2 in enumerate(names):
            if i == j:
                continue
            flow = rng.randn(H, W, 2).astype(np.float32)
            np.save(root / "raft_exhaustive" / f"{n1}_{n2}.npy", flow)
            m = np.zeros((H, W, 3), np.uint8)
            m[..., 0] = (rng.rand(H, W) > 0.3) * 255   # cycle-consistent
            m[..., 1] = (rng.rand(H, W) > 0.8) * 255   # occluded
            imageio.imwrite(root / "raft_masks" / f"{n1}_{n2}.png", m)
            stats[n1][n2] = int(rng.randint(1, 100))
    with open(root / "flow_stats.json", "w") as f:
        json.dump(stats, f)
    return str(root)


class TestRaftExhaustivePairs:
    def _make(self, raft_dir, **kw):
        from splatter_a_video_tpu.data import raft_pairs

        cfg = raft_pairs.RaftPairsConfig(
            data_dir=raft_dir, num_imgs=T, num_pts=64, seed=3, **kw
        )
        return raft_pairs.RaftExhaustivePairs(cfg)

    def test_batch_shapes_and_flow_consistency(self, raft_dir):
        ds = self._make(raft_dir)
        s = ds.sample(2)
        assert s["pts1"].shape == (64, 2) and s["pts2"].shape == (64, 2)
        assert s["gt_rgb1"].shape == (64, 3)
        assert s["weights"].shape == (64, 1)
        assert s["gt_img"].shape == (3, H, W)
        assert s["gt_flow"].shape == (2, H, W)
        # pts2 - pts1 equals the stored flow at pts1 (before any swap the
        # pts1 grid is integral; after a swap the roles flip — either way
        # one side is integral grid coords)
        p_int = s["pts1"] if np.allclose(s["pts1"] % 1, 0) else s["pts2"]
        assert np.allclose(p_int % 1, 0)

    def test_curriculum_bounds_interval(self, raft_dir):
        ds = self._make(raft_dir)
        ds.set_max_interval(1)
        for i in range(10):
            s = ds.sample(i)
            assert abs(int(s["ids1"]) - int(s["ids2"])) <= 1
        ds.increase_max_interval_by(100)
        assert ds._max_interval == T - 1

    def test_adjacent_pair_full_mask_weight(self, raft_dir):
        """interval == 1 pairs use the all-ones mask and pair_weight 1."""
        ds = self._make(raft_dir)
        ds.set_max_interval(1)
        s = ds.sample(0)
        w = s["weights"]
        assert np.allclose(w[w > 0], 1.0)

    def test_count_map_variant(self, raft_dir):
        ds = self._make(raft_dir, use_count_map=True)
        s = ds.sample(1)
        assert s["pts1"].shape == (64, 2)

    def test_point_variant_full_grids(self, raft_dir):
        ds = self._make(raft_dir, full_grids=True)
        s = ds.sample(4)
        assert s["pts1_all"].shape == (H, W, 2)
        assert s["pts2_all"].shape == (H, W, 2)
        assert s["gt_img1"].shape == (H, W, 3)
        # pts2_all - pts1_all is exactly the stored flow field
        d = s["pts2_all"] - s["pts1_all"]
        assert np.isfinite(d).all()

    def test_deterministic_given_seed(self, raft_dir):
        a = self._make(raft_dir).sample(5)
        b = self._make(raft_dir).sample(5)
        np.testing.assert_array_equal(a["pts1"], b["pts1"])
        np.testing.assert_array_equal(a["weights"], b["weights"])


class TestBilinear:
    def test_matches_grid_sample(self):
        """_bilinear == torch grid_sample(align_corners=True,
        padding_mode='zeros' — the torch default the reference relies on)
        on interior, border, AND out-of-frame points (out-flowing pts2 get
        zero RGB supervision in the reference, raft.py:143-144)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from splatter_a_video_tpu.data.raft_pairs import _bilinear

        rng = np.random.RandomState(1)
        img = rng.rand(11, 13, 3)
        pts = np.stack(
            [rng.uniform(-3, 15, 80), rng.uniform(-3, 13, 80)], axis=1
        )
        ours = _bilinear(img, pts)
        t_img = torch.from_numpy(img).permute(2, 0, 1)[None].double()
        gx = pts[:, 0] / (13 - 1) * 2 - 1
        gy = pts[:, 1] / (11 - 1) * 2 - 1
        grid = torch.from_numpy(
            np.stack([gx, gy], axis=1)[None, None]
        ).double()
        ref = (
            F.grid_sample(t_img, grid, align_corners=True)
            .squeeze()
            .T.numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=1e-12)


class TestBaDepth:
    def test_load_ba_depth(self, tmp_path):
        from splatter_a_video_tpu.data.raft_pairs import load_ba_depth

        os.makedirs(tmp_path / "BA_full")
        rng = np.random.RandomState(2)
        K = np.diag([20.0, 20.0, 1.0])
        for i in range(3):
            np.savez(
                tmp_path / "BA_full" / f"{i:04d}.npz",
                disp=rng.rand(8, 10).astype(np.float32) + 0.1,
                R=np.eye(3, dtype=np.float32),
                t=np.array([0, 0, float(i)], np.float32),
                K=K.astype(np.float32),
            )
        d = load_ba_depth(str(tmp_path))
        assert d["depth"].shape == (3, 8, 10)
        assert np.isclose(d["depth"].max(), 1.0)
        assert d["c2w"][2][2, 3] == 2.0
        assert np.allclose(d["K"][0][:3, :3], K)


class TestErrorMapSampling:
    def test_error_map_branch(self, raft_dir, tmp_path):
        """use_error_map: cached predicted flows steer pixel sampling
        toward high-error regions (raft.py:108-121)."""
        import numpy as np

        from splatter_a_video_tpu.data import raft_pairs

        pred_dir = tmp_path / "flow_cache"
        pred_dir.mkdir()
        names = sorted(
            f for f in __import__("os").listdir(f"{raft_dir}/color")
        )
        rng = np.random.RandomState(7)
        for i, n1 in enumerate(names):
            n2 = names[(i + 1) % len(names)]
            # cached prediction named like the supervision flow file
            np.save(pred_dir / f"{n1}_{n2}.npy", rng.randn(24, 32, 2))
        cfg = raft_pairs.RaftPairsConfig(
            data_dir=raft_dir, num_imgs=len(names), num_pts=32, seed=1,
            use_error_map=True, error_map_dir=str(pred_dir),
        )
        ds = raft_pairs.RaftExhaustivePairs(cfg)
        ds.set_max_interval(1)  # pairs are i, i+1 -> cache names line up
        s = ds.sample(0)
        assert s["pts1"].shape == (32, 2)
        assert np.isfinite(s["weights"]).all()
