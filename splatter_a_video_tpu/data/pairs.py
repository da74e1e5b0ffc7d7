"""Frame-pair sampling + device batch assembly (+ background prefetch).

TPU-native equivalent of the reference data pipeline:
  * `GSSimpleDataset` (`/root/reference/src/loaders/gs_data2.py:25-88`):
    infinite sampler, id1 = step % num_frames (or flow-error-weighted),
    id2 uniform random;
  * the max-interval curriculum of `GSRAFTExhaustiveDataset`
    (`src/loaders/gs_data.py:83-118` + `create_training_dataset.py:134-141`,
    widened by `train.py:201`);
  * the per-pair TAPIR track reads the reference does from disk *inside*
    the train step (`trainer_fragGS.py:537-538`) — here assembled host-side
    into a fixed-shape `Batch` (padded to `num_track_samples`) and
    prefetched on a background thread so the TPU never waits on IO.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..train.trainer import Batch
from .video_flow import VideoFlowData


@dataclass
class PairSamplerConfig:
    num_frames: int
    error_weights: Optional[np.ndarray] = None  # per-frame sampling weights
    start_interval: int = 5                     # curriculum start
    interval_growth_steps: int = 2000           # +1 max_interval per this many
    use_curriculum: bool = False
    seed: int = 0


class PairSampler:
    """Deterministic, seeded (t1, t2) pair stream."""

    def __init__(self, cfg: PairSamplerConfig):
        self.cfg = cfg
        self.rng = np.random.RandomState(cfg.seed)

    def max_interval(self, step: int) -> int:
        """Curriculum: start_interval + step // growth (`train.py:201`)."""
        return self.cfg.start_interval + step // self.cfg.interval_growth_steps

    def sample(self, step: int):
        T = self.cfg.num_frames
        if self.cfg.error_weights is not None:
            w = self.cfg.error_weights / self.cfg.error_weights.sum()
            t1 = int(self.rng.choice(T, p=w))
        else:
            t1 = step % T
        if self.cfg.use_curriculum:
            mi = max(1, self.max_interval(step))
            lo = max(0, t1 - mi)
            hi = min(T - 1, t1 + mi)
            t2 = int(self.rng.randint(lo, hi + 1))
        else:
            t2 = int(self.rng.randint(0, T))
        return t1, t2


class BatchBuilder:
    """Assemble fixed-shape `Batch`es from a `VideoFlowData` clip.

    When the clip's tracks live on disk, the per-step track IO +
    subsampling runs through the native C++ loader (mmap'd .npy files,
    `native/sav_loader.cpp`); in-memory clips use the numpy path.
    """

    def __init__(
        self,
        data: VideoFlowData,
        num_track_samples: int = 4096,
        seed: int = 0,
        use_native: bool = True,
        slim: bool = False,
    ):
        """slim=True omits the heavy per-frame tensors (rgb1/depth1/mask1/
        dino1) — the train step reads them from a device-resident
        `trainer.FrameStore` instead, cutting the per-step host->device
        transfer from ~8 MB (480p) to the track batch."""
        self.data = data
        self.P = num_track_samples
        self.slim = slim
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        # cache per-query grid positions (queries are on the pixel grid,
        # trainer_fragGS.py:552-555)
        self._query_cache = {}
        self._native = None
        if use_native and data.tracks_dir and data.tracks is None:
            try:
                from .native_loader import NativeTrackLoader

                self._native = NativeTrackLoader(data.tracks_dir, data.frame_names)
            except Exception:
                self._native = None

    def _query_pixels(self, t1: int) -> np.ndarray:
        if t1 not in self._query_cache:
            self._query_cache[t1] = self.data.load_target_tracks(t1, [t1])[:, 0, :2]
        return self._query_cache[t1]

    def build(self, t1: int, t2: int) -> Batch:
        P = self.P
        if self._native is not None:
            step_seed = int(self.rng.randint(0, 2**31))
            qp, tt, valid = self._native.build(t1, t2, P, step_seed)
        else:
            qp_all = self._query_pixels(t1)               # [N, 2]
            tt_all = self.data.load_target_tracks(t1, [t2])[:, 0, :]  # [N, 4]
            N = len(qp_all)
            if N >= P:
                sel = self.rng.choice(N, P, replace=False)
                qp, tt = qp_all[sel], tt_all[sel]
                valid = np.ones((P,), bool)
            else:
                pad = P - N
                qp = np.concatenate([qp_all, np.zeros((pad, 2), np.float32)])
                tt = np.concatenate([tt_all, np.zeros((pad, 4), np.float32)])
                valid = np.concatenate(
                    [np.ones((N,), bool), np.zeros((pad,), bool)]
                )

        if self.slim:
            return Batch(
                t1=np.int32(t1),
                t2=np.int32(t2),
                query_px=qp.astype(np.float32),
                target_tracks=tt.astype(np.float32),
                track_valid=valid,
            )
        dino1 = self.data.get_dino(t1)
        return Batch(
            t1=np.int32(t1),
            t2=np.int32(t2),
            rgb1=self.data.frames[t1].astype(np.float32),
            depth1=self.data.get_loss_depth(t1).astype(np.float32),
            query_px=qp.astype(np.float32),
            target_tracks=tt.astype(np.float32),
            track_valid=valid,
            mask1=np.asarray(self.data.masks_raw[t1], np.float32),
            dino1=None if dino1 is None else dino1.astype(np.float32),
        )


def dp_batch_stream(
    sampler: PairSampler,
    builder: BatchBuilder,
    num_steps: int,
    n_devices: int,
    prefetch: int = 2,
    start_step: int = 0,
) -> Iterator[Batch]:
    """Data-parallel batch stream: each yielded `Batch` has a leading
    [n_devices] axis (one frame pair per chip, `parallel/dp.stack_batches`
    layout). Each optimizer step consumes n_devices sampler draws, so the
    pair distribution matches the single-chip stream run n_devices times
    as fast — the reference's DistributedSampler semantics
    (`create_training_dataset.py:61-103`) without the rank bookkeeping."""
    import jax.tree_util as jtu

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        for step in range(start_step, num_steps):
            if stop.is_set():
                return
            group = []
            for d in range(n_devices):
                t1, t2 = sampler.sample(step * n_devices + d)
                group.append(builder.build(t1, t2))
            q.put(jtu.tree_map(lambda *xs: np.stack(xs), *group))
        q.put(None)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    try:
        while True:
            b = q.get()
            if b is None:
                return
            yield b
    finally:
        stop.set()


def batch_stream(
    sampler: PairSampler,
    builder: BatchBuilder,
    num_steps: int,
    prefetch: int = 2,
    start_step: int = 0,
) -> Iterator[Batch]:
    """Background-thread prefetching batch iterator.

    Replaces the reference's DataLoader worker processes
    (`train.py:89`, num_workers=4) — one thread suffices because batch
    assembly is two .npy reads + a gather, and the device step dominates.
    """
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        for step in range(start_step, num_steps):
            if stop.is_set():
                return
            t1, t2 = sampler.sample(step)
            q.put(builder.build(t1, t2))
        q.put(None)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    try:
        while True:
            b = q.get()
            if b is None:
                return
            yield b
    finally:
        stop.set()
