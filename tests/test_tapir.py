"""TAPIR JAX port: parity vs the reference's vendored torch port.

The oracle is the torch TAPIR at `/root/reference/src/data_preparation/
tapnet_torch/` run with RANDOM weights on tiny square videos (gated: these
tests skip wherever that read-only checkout or its deps are absent). The
production configuration is square-resolution inference, where the two
implementations must agree numerically."""

import os
import sys

import numpy as np
import pytest

from splatter_a_video_tpu.nets import tapir

_REF = "/root/reference/src/data_preparation"


def _torch_tapir(initial_resolution):
    if not os.path.isdir(os.path.join(_REF, "tapnet_torch")):
        pytest.skip("reference tapnet_torch checkout not available")
    torch = pytest.importorskip("torch")
    pytest.importorskip("einshape")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from tapnet_torch import tapir_model

    torch.manual_seed(0)
    model = tapir_model.TAPIR(
        initial_resolution=initial_resolution,
        feature_extractor_chunk_size=3,
    ).eval()
    return torch, model


def _jax_cfg(res):
    return tapir.TapirConfig(initial_resolution=res, frame_chunk=3)


@pytest.fixture(scope="module")
def tiny():
    """Torch model + converted params at 32x32 inference resolution."""
    torch, tm = _torch_tapir((32, 32))
    params = tapir.params_from_torch(tm.state_dict())
    return torch, tm, _jax_cfg((32, 32)), params


class TestSubmodules:
    def test_resnet_features(self, tiny):
        torch, tm, cfg, params = tiny
        rng = np.random.RandomState(1)
        x = rng.randn(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm.resnet_torch(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = tapir.resnet_forward(cfg, params, x)
        for unit in ("unit1", "unit3"):
            r = ref[f"resnet_{unit.replace('unit', 'unit_')}"].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(got[unit]), r,
                                       atol=2e-4, rtol=1e-4)

    def test_extra_convs(self, tiny):
        torch, tm, cfg, params = tiny
        rng = np.random.RandomState(2)
        x = rng.randn(2, 4, 4, 256).astype(np.float32)
        with torch.no_grad():
            ref = tm.extra_convs(torch.from_numpy(x)).numpy()
        got = np.asarray(tapir.extra_convs_forward(cfg, params, x))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    def test_mixer(self, tiny):
        torch, tm, cfg, params = tiny
        rng = np.random.RandomState(3)
        x = rng.randn(5, 6, cfg.mixer_in_dim).astype(np.float32)
        with torch.no_grad():
            ref, _ = tm.torch_pips_mixer(torch.from_numpy(x))
        got = np.asarray(tapir.mixer_forward(cfg, params, x))
        np.testing.assert_allclose(got, ref.numpy(), atol=2e-4, rtol=1e-3)


class TestEndToEnd:
    @pytest.mark.slow
    def test_full_forward_parity(self, tiny):
        """Full tracking pass on a 6-frame 32x32 video, queries on several
        frames: tracks / occlusion / expected_dist must match torch."""
        torch, tm, cfg, params = tiny
        rng = np.random.RandomState(4)
        T = 6
        video = rng.rand(T, 32, 32, 3).astype(np.float32) * 2 - 1
        qp = np.stack(
            [
                np.array([0, 5.0, 7.0]),
                np.array([2, 16.0, 9.0]),
                np.array([5, 28.0, 30.0]),
                np.array([3, 1.0, 2.0]),
            ]
        ).astype(np.float32)

        with torch.no_grad():
            ref = tm(
                torch.from_numpy(video[None]),
                torch.from_numpy(qp[None]),
                query_chunk_size=16,
            )
        got = tapir.forward(cfg, params, video, qp)

        np.testing.assert_allclose(
            np.asarray(got["tracks"]), ref["tracks"][0].numpy(),
            atol=5e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(got["occlusion"]), ref["occlusion"][0].numpy(),
            atol=5e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(got["expected_dist"]), ref["expected_dist"][0].numpy(),
            atol=5e-3, rtol=1e-3,
        )

    def test_query_frame_snapped(self, tiny):
        """At the query frame, the track equals the query point exactly
        after the cost-volume init (refinement then perturbs it like the
        reference does)."""
        torch, tm, cfg, params = tiny
        rng = np.random.RandomState(5)
        video = rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1
        qp = np.array([[1, 10.0, 20.0]], np.float32)
        lowres, hires = tapir.get_feature_grids(cfg, params, video)
        q_lo = tapir._sample_trilinear(
            lowres, qp * np.array([1.0, lowres.shape[1] / 32, lowres.shape[2] / 32])
        )
        pts, _, _ = tapir.tracks_from_cost_volume(cfg, params, q_lo, lowres, qp)
        np.testing.assert_allclose(np.asarray(pts[0, 1]), [20.0, 10.0], atol=1e-5)


class TestDriver:
    @pytest.mark.slow
    def test_track_points_chunked(self, tiny):
        _, _, cfg, params = tiny
        import jax.numpy as jnp

        model = tapir.TapirModel(
            cfg=cfg, params={k: jnp.asarray(v) for k, v in params.items()},
            pretrained=False,
        )
        rng = np.random.RandomState(6)
        video = rng.randint(0, 255, (4, 40, 48, 3), dtype=np.uint8)
        qp = np.stack([np.zeros(5), rng.rand(5) * 39, rng.rand(5) * 47], -1)
        out = tapir.track_points(model, video, qp, chunk=3)  # 2 chunks + pad
        assert out["tracks"].shape == (5, 4, 2)
        assert out["occlusion"].shape == (5, 4)
        assert np.isfinite(out["tracks"]).all()

    def test_get_model_gated(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SPLAT_TAPIR_WEIGHTS", raising=False)
        assert tapir.get_model() is None
        cfg = tapir.TapirConfig(initial_resolution=(16, 16))
        params = tapir.random_params(cfg, 0)
        path = str(tmp_path / "t.npz")
        tapir.save_params(path, params)
        monkeypatch.setenv("SPLAT_TAPIR_WEIGHTS", path)
        m = tapir.get_model(cfg)
        assert m is not None and m.pretrained
        assert set(m.params.keys()) == set(params.keys())

    @pytest.mark.slow
    def test_compute_tracks_wired(self, tmp_path, monkeypatch):
        """The preprocessing stage runs through the JAX net when a
        converted checkpoint is present, writing the {q}_{t}.npy layout
        with query-frame snapping."""
        import imageio.v2 as iio

        from splatter_a_video_tpu.data import preprocess

        cfg = tapir.TapirConfig(initial_resolution=(24, 24), frame_chunk=2)
        path = str(tmp_path / "t.npz")
        tapir.save_params(path, tapir.random_params(cfg, 1))
        monkeypatch.setenv("SPLAT_TAPIR_WEIGHTS", path)
        monkeypatch.setattr(tapir, "TapirConfig", lambda: cfg)

        img_dir, mask_dir = tmp_path / "images", tmp_path / "masks"
        img_dir.mkdir(), mask_dir.mkdir()
        rng = np.random.RandomState(0)
        T, H, W = 3, 20, 24
        for i in range(T):
            iio.imwrite(str(img_dir / f"{i:05d}.png"),
                        rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
            mask = np.zeros((H, W), np.uint8)
            mask[4:16, 6:20] = 255
            iio.imwrite(str(mask_dir / f"{i:05d}.png"), mask)

        out_dir = str(tmp_path / "bootstapir")
        n = preprocess.compute_tracks(str(img_dir), str(mask_dir), out_dir,
                                      grid_size=4, resize=(24, 24),
                                      query_chunk=8)
        assert n == T * T
        a01 = np.load(os.path.join(out_dir, "00000_00001.npy"))
        a00 = np.load(os.path.join(out_dir, "00000_00000.npy"))
        assert a01.shape[1] == 4 and a01.shape[0] > 0
        assert np.isfinite(a01).all()
        # query-frame coords snapped to the original pixel grid
        assert np.all(a00[:, 0] % 4 == 0) and np.all(a00[:, 1] % 4 == 0)
        # second run skips (files complete)
        assert preprocess.compute_tracks(str(img_dir), str(mask_dir), out_dir,
                                         grid_size=4, resize=(24, 24)) == 0

    def test_compute_tracks_gated_without_weights(self, monkeypatch):
        from splatter_a_video_tpu.data import preprocess

        monkeypatch.delenv("SPLAT_TAPIR_WEIGHTS", raising=False)
        with pytest.raises(NotImplementedError, match="not available"):
            preprocess.compute_tracks("/nonexistent", "/nonexistent", "/tmp/x")

    def test_random_params_shapes_match_conversion(self, tiny):
        """random_params emits the exact parameter inventory the torch
        conversion produces."""
        _, _, cfg, params = tiny
        mine = tapir.random_params(cfg, 0)
        assert set(mine.keys()) == set(params.keys())
        for k in mine:
            assert mine[k].shape == params[k].shape, k
