"""ctypes bindings for the native track loader (native/sav_loader.cpp).

Replaces the per-step Python .npy reads + numpy subsampling of
`BatchBuilder` with mmap'd C++ batch assembly — the runtime role the
reference fills with torch DataLoader worker processes. Builds on first
use with g++ (toolchain is baked into the image); falls back gracefully
(callers check `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    return os.path.join(root, "native", "libsav_loader.so")


def _src_path() -> str:
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    return os.path.join(root, "native", "sav_loader.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    src = _src_path()
    try:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", path],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(path)
    except Exception:
        return None
    lib.sav_open_clip.restype = ctypes.c_void_p
    lib.sav_open_clip.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.sav_close_clip.argtypes = [ctypes.c_void_p]
    lib.sav_num_tracks.restype = ctypes.c_int64
    lib.sav_num_tracks.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.sav_build_batch.restype = ctypes.c_int64
    lib.sav_build_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeTrackLoader:
    """mmap-backed per-pair track batch assembly."""

    def __init__(self, tracks_dir: str, frame_names: List[str]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++ build failed?)")
        self._lib = lib
        self._handle = lib.sav_open_clip(
            tracks_dir.encode(), "\n".join(frame_names).encode()
        )
        if not self._handle:
            raise RuntimeError("sav_open_clip failed")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sav_close_clip(self._handle)
            self._handle = None

    def num_tracks(self, q: int, t: int) -> int:
        return int(self._lib.sav_num_tracks(self._handle, q, t))

    def build(self, q: int, t: int, P: int, seed: int):
        """Returns (query_px [P,2], target_tracks [P,4], valid [P] bool)."""
        qbuf = np.empty((P, 2), np.float32)
        tbuf = np.empty((P, 4), np.float32)
        vbuf = np.empty((P,), np.float32)
        n = self._lib.sav_build_batch(
            self._handle, q, t, P, seed,
            qbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n < 0:
            raise RuntimeError(f"sav_build_batch({q},{t}) failed")
        return qbuf, tbuf, vbuf > 0.5
