"""Weight-converter fixture tests (published checkpoint layouts, offline).

The real checkpoints can't be downloaded here, but their KEY NAMING is
available offline with full fidelity:

* Depth-Anything: `transformers.DepthAnythingForDepthEstimation` built from
  a config produces exactly the state_dict layout of the published
  `depth-anything/*-hf` checkpoints the reference loads
  (`/root/reference/src/data_preparation/compute_depth.py:20-30`).
* TAPIR: the torch port vendored by the reference
  (`/root/reference/src/data_preparation/tapnet_torch/`) is what
  `load_state_dict`s the published `bootstapir_checkpoint_v2.pt`
  (`compute_tracks_torch.py:60-70`), so its state_dict IS the checkpoint
  key layout.

These tests drive the actual `scripts/convert_*.py` entry points end-to-end
(save checkpoint -> script -> npz) and the strict-consumption rename guard.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
_REF = "/root/reference/src/data_preparation"


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Depth-Anything
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_da():
    from tests.test_depth_anything import _tiny_torch_model

    return _tiny_torch_model()


@pytest.mark.slow
class TestDepthAnythingConverter:
    def test_strict_conversion_consumes_all_keys(self, tiny_da):
        from splatter_a_video_tpu.nets import depth_anything as da

        p = da.params_from_torch(tiny_da.state_dict(), strict=True)
        assert len(p) > 50

    def test_strict_catches_pattern_rename(self, tiny_da):
        """An upstream rename of block-pattern keys (silently skipped by
        the discovery loops) must fail loudly in strict mode."""
        from splatter_a_video_tpu.nets import depth_anything as da

        sd = dict(tiny_da.state_dict())
        renamed = {
            (k.replace("reassemble_stage", "reassembling_stage")): v
            for k, v in sd.items()
        }
        with pytest.raises((ValueError, KeyError)):
            da.params_from_torch(renamed, strict=True)

    def test_convert_script_end_to_end(self, tiny_da, tmp_path):
        """`scripts/convert_depth_anything.py` over a saved HF checkpoint
        dir: must produce an npz that loads and matches the direct
        conversion."""
        from splatter_a_video_tpu.nets import depth_anything as da

        ckpt_dir = str(tmp_path / "hf_model")
        tiny_da.save_pretrained(ckpt_dir, safe_serialization=True)
        out = str(tmp_path / "da.npz")
        _load_script("convert_depth_anything").main(
            ["--model", ckpt_dir, "--out", out]
        )
        assert os.path.exists(out)
        direct = da.params_from_torch(tiny_da.state_dict())
        with np.load(out) as z:
            meta = {k for k in z.files if k.startswith("_meta")}
            assert set(z.files) - meta == set(direct)
            for k in direct:
                np.testing.assert_array_equal(z[k], direct[k])


# ---------------------------------------------------------------------------
# TAPIR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tapir_torch():
    if not os.path.isdir(os.path.join(_REF, "tapnet_torch")):
        pytest.skip("reference tapnet_torch checkout not available")
    pytest.importorskip("einshape")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from tapnet_torch import tapir_model

    torch.manual_seed(0)
    return tapir_model.TAPIR(pyramid_level=1, extra_convs=True)


@pytest.mark.slow
class TestTapirConverter:
    def test_strict_conversion_consumes_all_keys(self, tapir_torch):
        from splatter_a_video_tpu.nets import tapir

        p = tapir.params_from_torch(tapir_torch.state_dict(), strict=True)
        assert len(p) > 100

    def test_strict_catches_pattern_rename(self, tapir_torch):
        from splatter_a_video_tpu.nets import tapir

        sd = dict(tapir_torch.state_dict())
        renamed = {
            k.replace("torch_pips_mixer.blocks", "torch_pips_mixer.layers"): v
            for k, v in sd.items()
        }
        with pytest.raises((ValueError, KeyError)):
            tapir.params_from_torch(renamed, strict=True)

    @pytest.mark.parametrize("nesting", [None, "model", "state_dict"])
    def test_convert_script_end_to_end(self, tapir_torch, tmp_path, nesting):
        """`scripts/convert_tapir.py` over a saved .pt, including the
        nested-checkpoint variants the script unwraps."""
        from splatter_a_video_tpu.nets import tapir

        sd = tapir_torch.state_dict()
        obj = sd if nesting is None else {nesting: sd}
        ckpt = str(tmp_path / f"ck_{nesting}.pt")
        torch.save(obj, ckpt)
        out = str(tmp_path / f"tapir_{nesting}.npz")
        _load_script("convert_tapir").main(["--ckpt", ckpt, "--out", out])
        direct = tapir.params_from_torch(sd)
        with np.load(out) as z:
            meta = {k for k in z.files if k.startswith("_meta")}
            assert set(z.files) - meta == set(direct)
            for k in direct:
                np.testing.assert_array_equal(z[k], direct[k])
