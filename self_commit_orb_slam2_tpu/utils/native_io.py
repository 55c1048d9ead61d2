"""ctypes bindings for the native IO runtime (native/slamio.cc).

Auto-builds the shared library on first use (one g++ invocation); falls back
to PIL when a toolchain is unavailable, so the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
    so = os.path.join(here, "libslamio.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["sh", os.path.join(here, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.slamio_load_gray.restype = ctypes.POINTER(ctypes.c_float)
    lib.slamio_load_gray.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
    lib.slamio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.slamio_prefetch_start.restype = ctypes.c_void_p
    lib.slamio_prefetch_start.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                          ctypes.c_int, ctypes.c_int]
    lib.slamio_prefetch_next.restype = ctypes.POINTER(ctypes.c_float)
    lib.slamio_prefetch_next.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int),
                                         ctypes.POINTER(ctypes.c_int)]
    lib.slamio_prefetch_stop.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def load_gray(path: str) -> Optional[np.ndarray]:
    """Decode an image to float32 grayscale via the native library.
    Returns None if the library or format is unsupported (caller falls back)."""
    lib = _build_and_load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.slamio_load_gray(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value)).copy()
    finally:
        lib.slamio_free(ptr)
    return arr


class Prefetcher:
    """Background-thread image decoding ahead of the tracking loop
    (the native analogue of the reference drivers' synchronous imread)."""

    def __init__(self, paths: list[str], capacity: int = 4):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._n = len(paths)
        self._handle = lib.slamio_prefetch_start(arr, len(paths), capacity)
        self._served = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._served >= self._n:
            raise StopIteration
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = self._lib.slamio_prefetch_next(self._handle, ctypes.byref(w), ctypes.byref(h))
        self._served += 1
        if not ptr:
            raise IOError("decode failed in prefetcher")
        try:
            return np.ctypeslib.as_array(ptr, shape=(h.value, w.value)).copy()
        finally:
            self._lib.slamio_free(ptr)

    def close(self):
        if self._handle:
            self._lib.slamio_prefetch_stop(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
