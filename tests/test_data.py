"""Tests: synthetic clips, track lifting, pair sampling, batch assembly."""

import numpy as np
import pytest

from splatter_a_video_tpu.data import pairs, synthetic, video_flow


@pytest.fixture(scope="module")
def clip():
    return synthetic.make_clip(synthetic.SyntheticClipConfig())


class TestSynthetic:
    def test_clip_shapes(self, clip):
        assert clip.num_frames == 12
        H, W = clip.image_size
        assert (H, W) == (48, 64)
        assert clip.frames[0].shape == (H, W, 3)
        assert clip.get_depth(0).shape == (H, W)
        # normalized depth range
        d = np.stack([clip.get_depth(i) for i in range(clip.num_frames)])
        assert d.min() >= 0.5 - 1e-5 and d.max() <= 2.0 + 1e-5

    def test_trinary_masks(self, clip):
        m = clip.get_mask(0)
        vals = set(np.unique(m).tolist())
        assert vals <= {-1.0, 0.0, 1.0}
        assert (m == 1).sum() > 0 and (m == -1).sum() > 0

    def test_marigold_loss_depth(self, clip, tmp_path):
        """The depth LOSS trains on raw Marigold depths when the layout has
        them (reference `trainer_fragGS.py:285-289`: marigold/depth_npy for
        gt_depths, aligned_depth_anything_v2 for lifting); the lifting depth
        is the fallback."""
        base = synthetic.dump_clip_to_disk(clip, str(tmp_path / "seq"))
        import os

        data = video_flow.VideoFlowData(
            img_dir=os.path.join(base, "images"),
            depth_dir=os.path.join(base, "aligned_depth_anything_v2"),
            mask_dir=os.path.join(base, "masks"),
            tracks_dir=os.path.join(base, "bootstapir"),
            loss_depth_dir=os.path.join(base, "marigold", "depth_npy"),
        ).setup()
        raw = np.load(os.path.join(base, "marigold", "depth_npy",
                                   "00000_pred.npy"))
        np.testing.assert_array_equal(data.get_loss_depth(0), raw)
        # NOT the renormalized lifting depth
        assert np.abs(data.get_loss_depth(0) - data.get_depth(0)).max() > 1e-3
        # the batch builder feeds it as depth1
        b = pairs.BatchBuilder(data, num_track_samples=8).build(0, 1)
        np.testing.assert_array_equal(b.depth1, raw)
        # fallback: in-memory clip (no loss_depth_dir) uses the lifting depth
        np.testing.assert_array_equal(clip.get_loss_depth(0), clip.get_depth(0))

    def test_tracks_consistent(self, clip):
        """Track of a query point at the query frame is the point itself."""
        tr = clip.load_target_tracks(3, [3])[:, 0]
        qp = clip.load_target_tracks(3, [3])[:, 0, :2]
        np.testing.assert_allclose(tr[:, :2], qp)
        # target at another frame differs for fg points
        tr2 = clip.load_target_tracks(3, [8])[:, 0, :2]
        assert np.abs(tr2 - qp).max() > 0.5


class TestLifting:
    def test_get_tracks_3d_fg(self, clip):
        t3d, vis, invis, conf, colors = clip.get_tracks_3d(200, extract_fg=True)
        N, T, _ = t3d.shape
        assert T == clip.num_frames and N > 10
        assert colors.shape == (N, 3)
        # xy in [-1, 1], depth in [0.5, 2]
        assert np.abs(t3d[..., :2]).max() <= 1.5
        assert t3d[..., 2].min() >= 0.4 and t3d[..., 2].max() <= 2.1
        # fg tracks move
        motion = np.abs(t3d[:, -1, :2] - t3d[:, 0, :2]).max()
        assert motion > 0.01

    def test_get_tracks_3d_bg(self, clip):
        t3d, vis, invis, conf, colors = clip.get_tracks_3d(200, extract_fg=False)
        # bg is static in the synthetic clip
        motion = np.abs(t3d[:, -1, :2] - t3d[:, 0, :2]).max()
        assert motion < 1e-3

    def test_extend_track3d(self, clip):
        t3d, *_ = clip.get_tracks_3d(100, extract_fg=False)
        ext, cols = clip.extend_track3d(t3d, grid_size=8, margin=0.25)
        assert ext.ndim == 3 and ext.shape[1] == clip.num_frames
        assert len(ext) == len(cols) and len(ext) > 0

    def test_bilinear_sample(self):
        img = np.arange(12, dtype=np.float32).reshape(3, 4)
        v = video_flow.bilinear_sample(img, np.array([[1.5, 1.0]]))
        assert abs(float(v[0]) - 5.5) < 1e-6
        # border clamp
        v = video_flow.bilinear_sample(img, np.array([[-5.0, -5.0]]))
        assert float(v[0]) == 0.0


class TestPairs:
    def test_sampler_schedule(self):
        cfg = pairs.PairSamplerConfig(num_frames=10)
        s = pairs.PairSampler(cfg)
        t1s = [s.sample(i)[0] for i in range(20)]
        assert t1s[:10] == list(range(10))

    def test_curriculum_interval(self):
        cfg = pairs.PairSamplerConfig(
            num_frames=100, use_curriculum=True, start_interval=3,
            interval_growth_steps=10,
        )
        s = pairs.PairSampler(cfg)
        for step in [0, 5, 9]:
            t1, t2 = s.sample(step)
            assert abs(t2 - t1) <= 3
        assert s.max_interval(25) == 5

    def test_batch_builder(self, clip):
        b = pairs.BatchBuilder(clip, num_track_samples=64)
        batch = b.build(0, 5)
        assert batch.rgb1.shape == (48, 64, 3)
        assert batch.query_px.shape == (64, 2)
        assert batch.target_tracks.shape == (64, 4)
        assert batch.track_valid.dtype == bool
        # valid entries have in-bounds query pixels
        qp = batch.query_px[batch.track_valid]
        assert (qp[:, 0] < 64).all() and (qp[:, 1] < 48).all()

    def test_batch_stream(self, clip):
        cfg = pairs.PairSamplerConfig(num_frames=clip.num_frames)
        stream = pairs.batch_stream(
            pairs.PairSampler(cfg), pairs.BatchBuilder(clip, 32), num_steps=5
        )
        batches = list(stream)
        assert len(batches) == 5
        assert int(batches[3].t1) == 3


class TestDatasetFactory:
    """Weighted dataset-mix factory (`data/factory.py`) — parity with
    `get_training_dataset` (`create_training_dataset.py:61-188`)."""

    def test_single_type_plain_sampler(self):
        from splatter_a_video_tpu.data.factory import make_training_sampler
        from splatter_a_video_tpu.data.pairs import PairSampler

        s = make_training_sampler("simpleGS", num_frames=8)
        assert isinstance(s, PairSampler)
        assert not s.cfg.use_curriculum
        g = make_training_sampler("gaussian", num_frames=8)
        assert g.cfg.use_curriculum

    def test_weighted_mixture_ratio(self):
        from splatter_a_video_tpu.data.factory import make_training_sampler

        mix = make_training_sampler(
            "simpleGS+gaussian", num_frames=40,
            dataset_weights=[0.8, 0.2], seed=1,
        )
        # curriculum policy draws t2 within start_interval=5 of t1;
        # uniform policy draws t2 anywhere. Measure the wide-interval rate.
        wide = 0
        n = 2000
        for i in range(n):
            t1, t2 = mix.sample(i)
            if abs(t2 - t1) > 6:
                wide += 1
        # uniform contributes ~0.8 * P(|gap|>6) ≈ 0.8 * 0.66; curriculum 0
        assert 0.35 < wide / n < 0.68, wide / n

    def test_weights_must_sum_to_one(self):
        import pytest as _pytest

        from splatter_a_video_tpu.data.factory import make_training_sampler

        with _pytest.raises(ValueError):
            make_training_sampler(
                "simpleGS+gaussian", 8, dataset_weights=[0.8, 0.5]
            )

    def test_curriculum_passthrough_and_error_weights(self):
        import numpy as np

        from splatter_a_video_tpu.data.factory import make_training_sampler

        mix = make_training_sampler(
            "simpleGS+gaussian", num_frames=10,
            dataset_weights=[0.5, 0.5], seed=0,
        )
        mix.set_max_interval(3)
        assert all(s.cfg.start_interval == 3 for s in mix.samplers)
        mix.increase_max_interval_by(2)
        assert all(s.cfg.start_interval == 5 for s in mix.samplers)
        w = np.full(10, 1e-9)
        w[4] = 1.0
        mix.cfg.error_weights = w  # the fit loop's resampling hook
        draws = [mix.sample(i)[0] for i in range(100)]
        assert np.mean(np.asarray(draws) == 4) > 0.9


class TestDepthNormals:
    def test_normals_match_reference_semantics(self):
        """depth->world points + organized-cloud normals
        (`video3Dflow/utils.py:300-366`): flat fronto-parallel depth under
        identity extrinsics gives -z normals in the interior; unprojection
        respects K and the world transform."""
        H, W = 10, 14
        depth = np.full((H, W), 2.0, np.float32)
        K = np.array([[20.0, 0, 7.0], [0, 20.0, 5.0], [0, 0, 1.0]], np.float32)
        E = np.eye(4, dtype=np.float32)
        n = video_flow.normal_from_depth_image(depth, K, E)
        inner = n[1:-1, 1:-1]
        np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
        np.testing.assert_allclose(inner[..., :2], 0.0, atol=1e-5)
        assert (n[0] == 0).all() and (n[:, 0] == 0).all()  # zero border
        # unprojection: the principal-axis pixel maps to (0, 0, depth)
        pts = video_flow.depth_to_points_world(depth, K, E).reshape(H, W, 3)
        # pixel whose (x*(W-1), y*(H-1)) == principal point (7, 5)
        np.testing.assert_allclose(pts[5, 7], [0.0, 0.0, 2.0], atol=1e-5)
        # world translation moves every point by -R^T t (inverse extrinsic)
        E2 = np.eye(4, dtype=np.float32)
        E2[:3, 3] = [1.0, 2.0, 3.0]
        pts2 = video_flow.depth_to_points_world(depth, K, E2).reshape(H, W, 3)
        np.testing.assert_allclose(
            pts2 - pts, np.broadcast_to(-E2[:3, 3], pts.shape), atol=1e-5
        )
