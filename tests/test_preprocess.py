"""Offline preprocessing alignment math (data/preprocess.py)."""

import os

import numpy as np


class TestAlignDisparity:
    def test_recovers_synthetic_scale_shift(self):
        """mono = (metric - shift)/scale => alignment inverts it exactly."""
        from splatter_a_video_tpu.data.preprocess import align_disparity

        rng = np.random.RandomState(0)
        metric = rng.rand(32, 40) * 2.0 + 0.5
        scale_true, shift_true = 3.0, 0.7
        mono = (metric - shift_true) / scale_true
        aligned, scale, shift = align_disparity(mono, metric)
        assert abs(scale - scale_true) < 1e-6
        assert abs(shift - shift_true) < 1e-6
        np.testing.assert_allclose(aligned, metric, atol=1e-6)

    def test_invalid_values_zeroed(self):
        from splatter_a_video_tpu.data.preprocess import align_disparity

        rng = np.random.RandomState(1)
        metric = rng.rand(16, 16) + 1.0
        mono = metric / 2.0
        mono[0, 0] = -50.0  # becomes deeply negative after alignment
        aligned, _, _ = align_disparity(mono, metric)
        assert aligned[0, 0] == 0.0

    def test_robust_to_outliers(self):
        """Median estimation shrugs off 10% corrupted pixels (the reason
        the reference uses medians, compute_depth.py:111-117)."""
        from splatter_a_video_tpu.data.preprocess import align_disparity

        rng = np.random.RandomState(2)
        metric = rng.rand(50, 50) * 2 + 0.5
        mono = (metric - 0.3) / 2.0
        bad = rng.rand(50, 50) < 0.1
        mono_corr = np.where(bad, rng.rand(50, 50) * 10, mono)
        _, scale, shift = align_disparity(mono_corr, metric)
        assert abs(scale - 2.0) < 0.35
        assert abs(shift - 0.3) < 0.35
        # a least-squares fit on the same data is far worse
        A = np.stack([mono_corr.ravel(), np.ones(mono_corr.size)], axis=1)
        ls_scale, _ = np.linalg.lstsq(A, metric.ravel(), rcond=None)[0]
        assert abs(ls_scale - 2.0) > abs(scale - 2.0)


class TestComputeMetricDepth:
    def _write_imgs(self, img_dir, n=3, h=8, w=10):
        import imageio.v2 as iio

        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(4)
        for t in range(n):
            iio.imwrite(
                os.path.join(img_dir, f"{t:05d}.png"),
                (rng.rand(h, w, 3) * 255).astype(np.uint8),
            )

    @staticmethod
    def _fake_model(rgb, intrinsics):
        h, w = rgb.shape[:2]
        depth = 1.0 + rgb[..., 0].astype(np.float64) / 255.0
        K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1.0]])
        return {"depth": depth, "intrinsics": K}

    def test_driver_writes_disparity_and_intrinsics(self, tmp_path):
        import json

        from splatter_a_video_tpu.data.preprocess import compute_metric_depth

        img_dir = tmp_path / "images"
        self._write_imgs(str(img_dir))
        depth_dir = tmp_path / "unidepth_disp"
        intr = tmp_path / "unidepth_intrins"  # .json appended by the driver
        n = compute_metric_depth(
            str(img_dir), str(depth_dir), str(intr), model=self._fake_model
        )
        assert n == 3
        import imageio.v2 as iio

        rgb0 = iio.imread(img_dir / "00000.png")
        disp0 = np.load(depth_dir / "00000.npy")
        np.testing.assert_allclose(
            disp0, 1.0 / (1.0 + rgb0[..., 0] / 255.0), rtol=1e-6
        )
        with open(str(intr) + ".json") as f:
            d = json.load(f)
        assert set(d) == {"00000", "00001", "00002"}
        assert d["00000"] == [10.0, 10.0, 5.0, 4.0]  # (fx, fy, cx, cy)
        # complete output short-circuits (compute_metric_depth.py:25-29)
        assert compute_metric_depth(
            str(img_dir), str(depth_dir), str(intr), model=self._fake_model
        ) == 0

    def test_gated_without_backend(self, tmp_path):
        import pytest

        from splatter_a_video_tpu.data.preprocess import compute_metric_depth

        img_dir = tmp_path / "images"
        self._write_imgs(str(img_dir), n=1)
        with pytest.raises(NotImplementedError):
            compute_metric_depth(
                str(img_dir), str(tmp_path / "d"), str(tmp_path / "i")
            )


class TestDirectoryDriver:
    def test_align_dir_roundtrip_and_skip(self, tmp_path):
        import imageio.v2 as iio

        from splatter_a_video_tpu.data.preprocess import (
            UINT16_MAX,
            align_monodepth_with_metric_depth,
            disp_to_uint16,
        )

        rng = np.random.RandomState(3)
        mono_dir = tmp_path / "mono"
        metric_dir = tmp_path / "metric"
        out_dir = tmp_path / "aligned"
        os.makedirs(mono_dir)
        os.makedirs(metric_dir)
        for t in range(3):
            metric = rng.rand(8, 10).astype(np.float32) + 0.5
            mono16 = disp_to_uint16((metric - 0.1) / 2.0)
            iio.imwrite(mono_dir / f"{t:05d}.png", mono16)
            np.save(metric_dir / f"{t:05d}.npy", metric)
        n = align_monodepth_with_metric_depth(
            str(metric_dir), str(mono_dir), str(out_dir)
        )
        assert n == 3
        a = np.load(out_dir / "00000.npy")
        assert a.shape == (8, 10)
        # aligned disparity matches metric up to uint16 quantization
        m = np.load(metric_dir / "00000.npy")
        assert np.abs(a - m).max() < 4.0 / UINT16_MAX * 2.0 * 3
        # complete output dir short-circuits (compute_depth.py:102-104)
        assert align_monodepth_with_metric_depth(
            str(metric_dir), str(mono_dir), str(out_dir)
        ) == 0


class TestPreprocessCLI:
    def test_stages_skip_gracefully_and_align_runs(self, tmp_path, capsys):
        """The CLI mirrors the reference's three data-prep scripts: gated
        network stages skip with a message; the pure-math align stage runs
        when its inputs exist."""
        import imageio.v2 as iio

        from splatter_a_video_tpu.apps import preprocess as cli
        from splatter_a_video_tpu.data.preprocess import disp_to_uint16

        base = tmp_path / "seq"
        rng = np.random.RandomState(7)
        os.makedirs(base / "images")
        os.makedirs(base / "masks")
        os.makedirs(base / "unidepth_disp")
        os.makedirs(base / "depth_anything")
        for t in range(2):
            iio.imwrite(base / "images" / f"{t:05d}.png",
                        (rng.rand(8, 10, 3) * 255).astype(np.uint8))
            iio.imwrite(base / "masks" / f"{t:05d}.png",
                        (rng.rand(8, 10) > 0.5).astype(np.uint8) * 255)
            metric = rng.rand(8, 10).astype(np.float32) + 0.5
            np.save(base / "unidepth_disp" / f"{t:05d}.npy", metric)
            iio.imwrite(base / "depth_anything" / f"{t:05d}.png",
                        disp_to_uint16((metric - 0.1) / 2.0))
        cli.main(["--datadir", str(tmp_path), "--seq_name", "seq",
                  "--stages", "all"])
        out = capsys.readouterr().out
        assert "metric: SKIPPED" in out       # no unidepth install
        assert "monodepth: SKIPPED" in out    # no converted weights
        assert "align: ok (2 files)" in out
        assert "tracks: SKIPPED" in out       # no converted weights
        a = np.load(base / "aligned_depth_anything_v2" / "00000.npy")
        assert a.shape == (8, 10)

    def test_missing_images_errors(self, tmp_path):
        import pytest

        from splatter_a_video_tpu.apps import preprocess as cli

        with pytest.raises(SystemExit):
            cli.main(["--datadir", str(tmp_path)])
