"""ctypes binding to the native runtime library (native/tpuasr_native.cc).

Provides parallel WAV batch decoding (the host-side hot loop of the
reference's DataLoader, SURVEY §3.1) and the CER edit-distance DP in C++.
Everything degrades gracefully to the pure-python paths when the library is
not built (`native/build.sh` builds it; `is_available()` reports status)."""

from __future__ import annotations

import ctypes
import glob
import os
import threading
from typing import Optional, Sequence

import numpy as np

_lib = None
_lib_lock = threading.Lock()


def _find_library() -> Optional[str]:
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build")
    for pattern in ("libtpuasr_native.so", "*tpuasr_native*.so"):
        hits = glob.glob(os.path.join(os.path.abspath(root), pattern))
        if hits:
            return hits[0]
    return None


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _find_library()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tpuasr_wav_read.restype = ctypes.c_int64
        lib.tpuasr_wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tpuasr_loader_create.restype = ctypes.c_void_p
        lib.tpuasr_loader_create.argtypes = [ctypes.c_int]
        lib.tpuasr_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.tpuasr_loader_load_batch.restype = ctypes.c_int
        lib.tpuasr_loader_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.tpuasr_cer_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def is_available() -> bool:
    return _load() is not None


def wav_read(path: str, max_samples: int = 1 << 26) -> tuple[np.ndarray, int]:
    """Native WAV decode -> (float32 wave, sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    out = np.zeros(max_samples, np.float32)
    sr = ctypes.c_int32(0)
    total = ctypes.c_int64(0)
    n = lib.tpuasr_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr), ctypes.byref(total),
    )
    if n < 0:
        raise IOError(f"failed to decode {path}")
    return out[:n].copy(), int(sr.value)


class BatchLoader:
    """Thread-pool parallel WAV batch decoder writing into padded buffers."""

    def __init__(self, num_threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run native/build.sh)")
        self._lib = lib
        self._pool = lib.tpuasr_loader_create(num_threads)

    def load(self, paths: Sequence[str], max_samples: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (waves [N, max_samples] zero-padded, lens [N])."""
        n = len(paths)
        waves = np.zeros((n, max_samples), np.float32)
        lens = np.zeros(n, np.int64)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.tpuasr_loader_load_batch(
            self._pool, arr, n,
            waves.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_samples,
        )
        if failures:
            raise IOError(f"{failures} wav files failed to decode")
        return waves, lens.astype(np.int32)

    def __del__(self):
        try:
            if getattr(self, "_pool", None):
                self._lib.tpuasr_loader_destroy(self._pool)
        except Exception:
            pass


def cer_counts_native(ref: Sequence[int], hyp: Sequence[int]):
    """C++ edit distance -> (S, D, I)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    r = np.asarray(ref, np.int32)
    h = np.asarray(hyp, np.int32)
    out = np.zeros(3, np.int32)
    lib.tpuasr_cer_counts(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(out[0]), int(out[1]), int(out[2])
