"""ctypes bindings for the native data-path kernels (_native/pdr_native.cc).

Compiles the shared library on first use (g++ -O3 -shared -fPIC, cached next
to the source); every entry point has a numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "pdr_native.cc")
_SO = os.path.join(os.path.dirname(__file__), "_native", "pdr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i64 = ctypes.c_int64
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int64)
            lib.apply_similarity.argtypes = [fp, fp, i64, i64, i64, fp, fp]
            lib.gather_rows.argtypes = [fp, fp, ip, i64, i64]
            lib.add_clipped.argtypes = [fp, fp, i64, ctypes.c_float]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            print(f"pdr_native unavailable, using numpy fallback: {e}")
            _lib = None
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_available() -> bool:
    return _load() is not None


def apply_similarity(clouds: np.ndarray, M: np.ndarray, t: np.ndarray) -> np.ndarray:
    """p' = p @ M_b^T + t_b per sample; trailing channels pass through.

    Args:
      clouds: (B, N, C>=3) float32; M: (B, 3, 3); t: (B, 3).
    """
    clouds = np.ascontiguousarray(clouds, np.float32)
    M = np.ascontiguousarray(M, np.float32)
    t = np.ascontiguousarray(t, np.float32)
    lib = _load()
    B, N, C = clouds.shape
    if lib is None:
        out = clouds.copy()
        out[..., :3] = np.einsum("bnc,bdc->bnd", clouds[..., :3], M) + t[:, None, :]
        return out
    out = np.empty_like(clouds)
    lib.apply_similarity(_fptr(out), _fptr(clouds), B, N, C, _fptr(M), _fptr(t))
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = src[idx[i]] — contiguous batch assembly for (S, ...) arrays."""
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _load()
    if lib is None:
        return src[idx]
    row = int(np.prod(src.shape[1:]))
    out = np.empty((idx.shape[0],) + src.shape[1:], np.float32)
    lib.gather_rows(
        _fptr(out), _fptr(src),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0], row,
    )
    return out
