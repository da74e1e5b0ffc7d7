"""Hermetic on-disk DAVIS-layout pipeline test: the USER-FACING path.

Dumps a synthetic clip in the reference's preprocessed layout
(`/root/reference/src/data_preparation/README.md:39-60`: images/ masks/
aligned_depth_anything_v2/ bootstapir/), then drives the real CLIs:
`apps.train --datadir` -> VideoFlowData disk load -> lift -> train ->
checkpoint -> `apps.render` + `apps.track` off the checkpoint. Each piece
has its own unit tests; this covers CLI -> disk -> lift -> train -> ckpt ->
infer as one pipeline.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from splatter_a_video_tpu.data import synthetic


@pytest.fixture(scope="module")
def davis_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    clip = synthetic.make_clip(
        synthetic.SyntheticClipConfig(width=64, height=48, num_frames=8)
    )
    synthetic.dump_clip_to_disk(clip, str(root / "seq"))
    return root


class TestDavisLayoutPipeline:
    def test_train_render_track(self, davis_dir, tmp_path):
        from splatter_a_video_tpu.apps import render as render_app
        from splatter_a_video_tpu.apps import track as track_app
        from splatter_a_video_tpu.apps import train as train_app

        out = str(tmp_path / "run")
        state = train_app.main([
            "--datadir", str(davis_dir), "--seq_name", "seq",
            "--out_dir", out, "--num_iters", "30", "--i_print", "10",
            "--num_track_samples", "64", "--tensorboard", "0",
            "--max_intersections", str(1 << 14),
        ])
        assert int(state.step) == 30
        assert os.path.exists(os.path.join(out, "args.json"))
        assert os.path.exists(os.path.join(out, "history.json"))
        with open(os.path.join(out, "history.json")) as f:
            hist = json.load(f)
        assert np.isfinite(hist[-1]["loss"])

        # render a video from the saved checkpoint (gif/png fallback ok)
        vid = str(tmp_path / "vid.mp4")
        render_app.main([
            "--ckpt", out, "--mode", "video", "--width", "64",
            "--height", "48", "--num_frames", "8", "--out", vid,
            "--max_intersections", str(1 << 14),
        ])
        produced = [
            p for p in (vid, vid.replace(".mp4", ".gif"))
            if os.path.exists(p)
        ] or [p for p in os.listdir(str(tmp_path)) if p.startswith("vid")]
        assert produced, "render produced no output"

        # tracking eval from the checkpoint against the on-disk clip
        mfile = str(tmp_path / "tap.json")
        track_app.main([
            "--ckpt", out, "--mode", "eval", "--datadir", str(davis_dir),
            "--seq_name", "seq", "--num_queries", "32", "--out", mfile,
            "--max_intersections", str(1 << 14),
        ])
        with open(mfile) as f:
            m = json.load(f)
        assert "average_jaccard" in m or "AJ" in m or len(m) > 0
        for v in m.values():
            if isinstance(v, (int, float)):
                assert np.isfinite(v)

        # appearance edit from the checkpoint: recolor the masked region
        # (`optimize_appearance_from_mask`, trainer_fragGS.py:999-1060)
        import imageio.v2 as imageio

        from splatter_a_video_tpu.apps import edit as edit_app

        frame0 = imageio.imread(str(davis_dir / "seq" / "images" / "00000.png"))
        mask0 = str(davis_dir / "seq" / "masks" / "00000.png")
        target = frame0.astype(np.float32) / 255.0
        target[..., 0] = np.minimum(target[..., 0] + 0.4, 1.0)  # redden fg
        tpath = str(tmp_path / "edited_target.png")
        imageio.imwrite(tpath, (target * 255).astype(np.uint8))
        evid = str(tmp_path / "edited.mp4")
        edit_app.main([
            "--ckpt", out, "--mode", "appearance", "--mask", mask0,
            "--target", tpath, "--steps", "20", "--width", "64",
            "--height", "48", "--num_frames", "8", "--out", evid,
            "--max_intersections", str(1 << 14),
        ])
        eproduced = [
            p for p in (evid, evid.replace(".mp4", ".gif"))
            if os.path.exists(p)
        ] or [p for p in os.listdir(str(tmp_path)) if p.startswith("edited")]
        assert eproduced, "edit produced no output"

    def test_refine_camera_flag(self, davis_dir, tmp_path):
        """--refine_camera reaches fit_clip and exports camera_xi.npy."""
        from splatter_a_video_tpu.apps import train as train_app

        out = str(tmp_path / "run_cam")
        state = train_app.main([
            "--datadir", str(davis_dir), "--seq_name", "seq",
            "--out_dir", out, "--num_iters", "20", "--i_print", "10",
            "--num_track_samples", "64", "--tensorboard", "0",
            "--max_intersections", str(1 << 14),
            "--refine_camera", "1", "--camera_lr", "1e-3",
        ])
        assert int(state.step) == 20
        xi = np.load(os.path.join(out, "camera_xi.npy"))
        assert xi.shape == (8, 6) and np.isfinite(xi).all()
        # the joint step actually moved the camera parameters
        assert np.abs(xi).max() > 0
