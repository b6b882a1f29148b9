"""ctypes bindings for the native host-IO library (io.cc).

Builds lazily with make/g++ on first use and caches the .so next to the
source; every entry point has a pure-numpy fallback so the framework works
without a toolchain.  (pybind11 is not available in this image; the C ABI +
ctypes keeps the binding dependency-free.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpuvc_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.tpuvc_wav_read_pcm16.restype = ctypes.c_int64
        lib.tpuvc_wav_read_pcm16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.tpuvc_read_f32.restype = ctypes.c_int64
        lib.tpuvc_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.tpuvc_gather_rows.restype = None
        lib.tpuvc_gather_rows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_wav_native(path: str) -> tuple[np.ndarray, int] | None:
    """PCM16 WAV -> (float32 mono [-1,1], fs); None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    size = os.path.getsize(path)
    buf = np.empty(max(size // 2, 1), np.float32)
    fs = ctypes.c_int32(0)
    n = lib.tpuvc_wav_read_pcm16(path.encode(), _fptr(buf), buf.size,
                                 ctypes.byref(fs))
    if n < 0:
        return None
    return buf[:n].copy(), int(fs.value)


def read_f32_native(path: str) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    n_floats = os.path.getsize(path) // 4
    buf = np.empty(max(n_floats, 1), np.float32)
    n = lib.tpuvc_read_f32(path.encode(), _fptr(buf), n_floats)
    if n < 0:
        return None
    return buf[:n]


def gather_rows(src: np.ndarray, idx: np.ndarray,
                n_threads: int | None = None) -> np.ndarray:
    """out[i] = src[idx[i]] — native parallel gather with numpy fallback.

    Out-of-range indices raise IndexError on BOTH paths (the C side would
    zero-fill, which could silently mask data-pipeline bugs)."""
    src = np.ascontiguousarray(src, np.float32)
    idx64 = np.ascontiguousarray(idx, np.int64)
    if idx64.size and (idx64.min() < 0 or idx64.max() >= src.shape[0]):
        raise IndexError(
            f"gather_rows: indices out of range [0, {src.shape[0]})")
    lib = _load()
    if lib is None:
        return src[idx64]
    out = np.empty((idx64.size, src.shape[1]), np.float32)
    nt = n_threads or min(8, os.cpu_count() or 1)
    lib.tpuvc_gather_rows(
        _fptr(src), src.shape[0], src.shape[1],
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), idx64.size,
        _fptr(out), nt)
    return out
