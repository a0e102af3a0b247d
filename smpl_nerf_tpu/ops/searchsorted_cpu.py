"""ctypes bindings for the native CPU searchsorted extension.

The reference shipped torchsearchsorted (C++/CUDA, pybind11). Our compute path
is TPU (Pallas/XLA); this native op is the host-side fallback and oracle, bound
with ctypes (no pybind11 in this image). Built lazily with `make` on first use;
returns None from load_library() when no toolchain is available so callers can
fall back to numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "searchsorted")
_LIB_PATH = os.path.join(_DIR, "libsearchsorted.so")
_lib = None


def build_library() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    for suffix, ctype in (("f32", ctypes.c_float), ("f64", ctypes.c_double)):
        fn = getattr(lib, f"searchsorted_{suffix}")
        fn.argtypes = [
            ctypes.POINTER(ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        fn.restype = None
    _lib = lib
    return lib


def searchsorted(a: np.ndarray, v: np.ndarray, side: str = "left") -> np.ndarray:
    """Batched searchsorted: a [Ba, A] sorted rows, v [Bv, V] queries.

    Row-broadcast like the reference shim (torchsearchsorted/searchsorted.py:20-53):
    Ba or Bv may be 1. Returns int64 [max(Ba,Bv), V].
    """
    lib = load_library()
    a = np.ascontiguousarray(a)
    v = np.ascontiguousarray(v)
    if a.ndim != 2 or v.ndim != 2:
        raise ValueError("a and v must be 2-D")
    if a.shape[0] != v.shape[0] and 1 not in (a.shape[0], v.shape[0]):
        raise ValueError("row counts must match or broadcast from 1")
    rows = max(a.shape[0], v.shape[0])
    out = np.empty((rows, v.shape[1]), np.int64)
    if lib is None:  # no toolchain: numpy fallback
        for r in range(rows):
            ar = a[0] if a.shape[0] == 1 else a[r]
            vr = v[0] if v.shape[0] == 1 else v[r]
            out[r] = np.searchsorted(ar, vr, side=side)
        return out
    if a.dtype == np.float64 or v.dtype == np.float64:
        a = a.astype(np.float64)
        v = v.astype(np.float64)
        fn, ctype = lib.searchsorted_f64, ctypes.c_double
    else:
        a = a.astype(np.float32)
        v = v.astype(np.float32)
        fn, ctype = lib.searchsorted_f32, ctypes.c_float
    fn(a.ctypes.data_as(ctypes.POINTER(ctype)), a.shape[0], a.shape[1],
       v.ctypes.data_as(ctypes.POINTER(ctype)), v.shape[0], v.shape[1],
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       1 if side == "right" else 0)
    return out
