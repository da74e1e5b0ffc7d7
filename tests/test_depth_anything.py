"""Depth-Anything JAX port: parity vs the torch reference implementation.

The oracle is `transformers.DepthAnythingForDepthEstimation` with a tiny
random-weight config (no downloads): the converted state_dict must
reproduce the torch forward pass. Also pins the torch-semantics resize
matrices against `torch.nn.functional.interpolate`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from splatter_a_video_tpu.nets import depth_anything as da
from splatter_a_video_tpu.nets import interp, vit


def _tiny_torch_model():
    from transformers import (
        DepthAnythingConfig as HfDAConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    backbone = Dinov2Config(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=128,
        out_indices=[1, 2, 3, 4],
        apply_layernorm=True,
        reshape_hidden_states=False,
        attn_implementation="eager",
    )
    cfg = HfDAConfig(
        backbone_config=backbone,
        reassemble_hidden_size=32,
        neck_hidden_sizes=[8, 16, 24, 32],
        fusion_hidden_size=16,
        head_hidden_size=8,
        patch_size=14,
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    return model


def _tiny_jax_cfg():
    return da.DepthAnythingConfig(
        backbone=vit.ViTConfig(
            hidden_size=32, num_layers=4, num_heads=2, mlp_ratio=4,
            patch_size=14, image_size=28,
        ),
        out_indices=(1, 2, 3, 4),
        neck_hidden_sizes=(8, 16, 24, 32),
        fusion_hidden_size=16,
        head_hidden_size=8,
    )


@pytest.fixture(scope="module")
def models():
    tm = _tiny_torch_model()
    params = da.params_from_torch(tm.state_dict())
    return tm, _tiny_jax_cfg(), params


class TestInterp:
    @pytest.mark.parametrize(
        "mode,align", [("bilinear", False), ("bilinear", True), ("bicubic", False)]
    )
    @pytest.mark.parametrize("sizes", [(5, 13), (16, 7), (9, 9), (4, 17)])
    def test_matches_torch(self, mode, align, sizes):
        n_in, n_out = sizes
        rng = np.random.RandomState(0)
        x = rng.randn(1, 3, n_in, n_in).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(n_out, n_out), mode=mode,
            align_corners=align,
        ).numpy()
        got = np.asarray(
            interp.interp2d(x.transpose(0, 2, 3, 1), n_out, n_out, mode, align)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_identity(self):
        x = np.random.RandomState(1).randn(2, 6, 6, 3).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(interp.interp2d(x, 6, 6)), x)


class TestVitParity:
    def test_backbone_features(self, models):
        tm, jcfg, params = models
        rng = np.random.RandomState(2)
        x = rng.randn(1, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            ref = tm.backbone(torch.from_numpy(x)).feature_maps
        got = vit.forward(jcfg.backbone, params, x.transpose(0, 2, 3, 1),
                          jcfg.out_indices)
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(g), r.numpy(), atol=1e-4, rtol=1e-4
            )


class TestDepthAnythingParity:
    def test_square_input(self, models):
        tm, jcfg, params = models
        rng = np.random.RandomState(3)
        x = rng.randn(1, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).predicted_depth.numpy()
        got = np.asarray(da.forward(jcfg, params, x.transpose(0, 2, 3, 1)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)

    def test_rectangular_input_interpolates_pos(self, models):
        """28x42 input exercises the bicubic pos-embedding resample."""
        tm, jcfg, params = models
        rng = np.random.RandomState(4)
        x = rng.randn(1, 3, 28, 42).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).predicted_depth.numpy()
        got = np.asarray(da.forward(jcfg, params, x.transpose(0, 2, 3, 1)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


class TestDriver:
    def test_fit_size(self):
        # landscape 480x854 -> height fits 518 (scale closer to 1), both
        # rounded to multiples of 14
        h, w = da._fit_size(480, 854)
        assert h % 14 == 0 and w % 14 == 0
        assert abs(h - 518) <= 7
        assert da._fit_size(518, 518) == (518, 518)

    def test_infer_disparity_roundtrip(self, models):
        _, jcfg, params = models
        import jax.numpy as jnp

        model = da.DepthAnythingModel(
            cfg=jcfg,
            params={k: jnp.asarray(v) for k, v in params.items()},
            pretrained=False,
        )
        img = (np.random.RandomState(5).rand(30, 45, 3) * 255).astype(np.uint8)
        disp = da.infer_disparity(model, img)
        assert disp.shape == (30, 45)
        assert np.isfinite(disp).all()
        # relative head ends in ReLU; the bicubic resize back to source
        # resolution may overshoot slightly negative (same in torch)
        assert disp.min() >= -1e-3

    def test_get_model_gated(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SPLAT_DEPTH_ANYTHING_WEIGHTS", raising=False)
        assert da.get_model() is None  # no weights on this machine
        # save + load roundtrip with config inference from shapes
        cfg = _tiny_jax_cfg()
        params = da.random_params(cfg, seed=0)
        path = str(tmp_path / "w.npz")
        da.save_params(path, params, num_heads=cfg.backbone.num_heads,
                       out_indices=cfg.out_indices)
        monkeypatch.setenv("SPLAT_DEPTH_ANYTHING_WEIGHTS", path)
        m = da.get_model()
        assert m is not None and m.pretrained
        assert m.cfg == cfg  # full architecture recovered from the npz
        assert set(m.params.keys()) == set(params.keys())

    def test_compute_monodepth_wired(self, tmp_path, monkeypatch):
        """The preprocessing stage runs through the JAX net when a
        converted checkpoint is present."""
        import imageio.v2 as iio

        from splatter_a_video_tpu.data import preprocess

        cfg = _tiny_jax_cfg()
        path = str(tmp_path / "w.npz")
        da.save_params(path, da.random_params(cfg, 1),
                       num_heads=cfg.backbone.num_heads,
                       out_indices=cfg.out_indices)
        monkeypatch.setenv("SPLAT_DEPTH_ANYTHING_WEIGHTS", path)

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            iio.imwrite(str(img_dir / f"{i:05d}.png"),
                        rng.randint(0, 255, (32, 44, 3), dtype=np.uint8))
        out_dir = str(tmp_path / "depth_anything_v2")
        n = preprocess.compute_monodepth(str(img_dir), out_dir)
        assert n == 2
        disp = iio.imread(out_dir + "/00000.png")
        assert disp.shape == (32, 44) and disp.dtype == np.uint16

    def test_compute_monodepth_gated_without_weights(self, monkeypatch):
        from splatter_a_video_tpu.data import preprocess

        monkeypatch.delenv("SPLAT_DEPTH_ANYTHING_WEIGHTS", raising=False)
        with pytest.raises(NotImplementedError, match="not available"):
            preprocess.compute_monodepth("/nonexistent", "/nonexistent")
