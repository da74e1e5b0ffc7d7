"""Tests: the native C++ track loader vs the numpy reference path."""

import os

import numpy as np
import pytest

from splatter_a_video_tpu.data import native_loader


@pytest.fixture(scope="module")
def track_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tracks")
    rng = np.random.RandomState(0)
    T, N = 4, 37
    names = [f"{i:05d}" for i in range(T)]
    for q in range(T):
        for t in range(T):
            arr = rng.rand(N, 4).astype(np.float32) * 50
            if q == t:
                arr[:, 2:] = -8.0  # self-tracks: visible
            np.save(os.path.join(str(d), f"{names[q]}_{names[t]}.npy"), arr)
    return str(d), names, T, N


class TestNativeLoader:
    def test_builds(self):
        assert native_loader.available(), "g++ build of sav_loader failed"

    def test_num_tracks(self, track_dir):
        d, names, T, N = track_dir
        ld = native_loader.NativeTrackLoader(d, names)
        assert ld.num_tracks(0, 3) == N
        assert ld.num_tracks(2, 1) == N

    def test_batch_contents_match_files(self, track_dir):
        d, names, T, N = track_dir
        ld = native_loader.NativeTrackLoader(d, names)
        q, t, P = 1, 3, 16
        qp, tt, valid = ld.build(q, t, P, seed=42)
        assert valid.all()
        self_tracks = np.load(os.path.join(d, f"{names[q]}_{names[q]}.npy"))
        tgt_tracks = np.load(os.path.join(d, f"{names[q]}_{names[t]}.npy"))
        # every returned row must be a real (query, target) pair at the
        # same underlying index
        for i in range(P):
            matches = np.where(
                (np.abs(self_tracks[:, :2] - qp[i]) < 1e-6).all(axis=1)
            )[0]
            assert len(matches) >= 1
            assert any(
                np.allclose(tgt_tracks[m], tt[i], atol=1e-6) for m in matches
            )
        # sampling without replacement: all query rows distinct
        assert len(np.unique(qp, axis=0)) == P

    def test_padding_when_few_tracks(self, track_dir):
        d, names, T, N = track_dir
        ld = native_loader.NativeTrackLoader(d, names)
        P = N + 10
        qp, tt, valid = ld.build(0, 2, P, seed=7)
        assert valid.sum() == N
        assert (qp[N:] == 0).all() and (tt[N:] == 0).all()

    def test_deterministic_in_seed(self, track_dir):
        d, names, T, N = track_dir
        ld = native_loader.NativeTrackLoader(d, names)
        a = ld.build(1, 2, 8, seed=5)
        b = ld.build(1, 2, 8, seed=5)
        c = ld.build(1, 2, 8, seed=6)
        np.testing.assert_array_equal(a[0], b[0])
        assert not np.array_equal(a[0], c[0])

    def test_batchbuilder_integration(self, track_dir):
        """BatchBuilder picks up the native loader for on-disk clips."""
        d, names, T, N = track_dir
        from splatter_a_video_tpu.data.pairs import BatchBuilder
        from splatter_a_video_tpu.data.video_flow import VideoFlowData

        H, W = 8, 8
        data = VideoFlowData(
            frames=[np.zeros((H, W, 3), np.float32)] * T,
            depths_raw=[np.ones((H, W), np.float32)] * T,
            masks_raw=[np.zeros((H, W), bool)] * T,
            tracks=None,
            frame_names=names,
            tracks_dir=d,
        ).setup()
        b = BatchBuilder(data, num_track_samples=8)
        assert b._native is not None, "native path not engaged"
        batch = b.build(0, 2)
        assert batch.query_px.shape == (8, 2)
        assert batch.track_valid.all()
