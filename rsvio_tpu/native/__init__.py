"""Native (C++) components: threaded PNG frame loader.

The shared library is built on demand with g++ (libpng + zlib, both baked
into the image). If the toolchain or libraries are unavailable the callers
fall back to the Python prefetcher (rsvio_tpu.data.players.prefetch_frames).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LIB = os.path.join(_DIR, "librsvio_loader.so")

_lib = None


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-lz", "-lpthread", "-o", _LIB]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.rsvio_loader_create.restype = ctypes.c_void_p
    lib.rsvio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.rsvio_loader_next.restype = ctypes.c_int
    lib.rsvio_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.rsvio_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeStereoLoader:
    """Ordered, threaded stereo PNG loader over explicit path lists."""

    def __init__(self, left_paths, right_paths, height: int, width: int,
                 n_threads: int = 3, depth: int = 6):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._n = len(left_paths)
        self._h, self._w = height, width
        self._arr_l = (ctypes.c_char_p * self._n)(
            *[p.encode() for p in left_paths])
        self._arr_r = (ctypes.c_char_p * self._n)(
            *[p.encode() for p in right_paths])
        self._handle = lib.rsvio_loader_create(
            self._arr_l, self._arr_r, self._n, height, width, n_threads, depth)
        if not self._handle:
            raise RuntimeError("native loader creation failed")

    def __iter__(self):
        while True:
            left = np.empty((self._h, self._w), dtype=np.float32)
            right = np.empty((self._h, self._w), dtype=np.float32)
            idx = self._lib.rsvio_loader_next(
                self._handle,
                left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if idx == -1:
                break
            if idx == -2:
                raise IOError("native loader: PNG decode failed")
            yield idx, left, right

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rsvio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_prefetch_frames(player, height: int, width: int,
                           start: int = 0, end: Optional[int] = None,
                           ) -> Optional[Iterator]:
    """Iterator of FrameData over a player with frame_paths(); None if the
    native loader can't be used (caller falls back to the Python path)."""
    from ..data.players import FrameData

    if not hasattr(player, "frame_paths"):
        return None
    end = len(player) if end is None else min(end, len(player))
    triples = [player.frame_paths(i) for i in range(start, end)]
    try:
        loader = NativeStereoLoader(
            [t[1] for t in triples], [t[2] for t in triples], height, width)
    except RuntimeError:
        return None

    def gen():
        try:
            for idx, left, right in loader:
                yield FrameData(triples[idx][0], left, right)
        finally:
            loader.close()

    return gen()
