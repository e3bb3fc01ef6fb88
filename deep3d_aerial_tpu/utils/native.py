"""ctypes bridge to the C++ host-side kernels (libaerial3d_native.so).

Build with native/build.sh; every entry point has a NumPy fallback so the
framework works without the native library (tests exercise both paths).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "_native",
        "libaerial3d_native.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i64p = ctypes.POINTER(ctypes.c_int64)

    lib.dsm_reduce_max.restype = ctypes.c_int64
    lib.dsm_reduce_max.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, c_f32p,
    ]
    lib.dsm_reduce_robust_max.restype = ctypes.c_int64
    lib.dsm_reduce_robust_max.argtypes = lib.dsm_reduce_max.argtypes
    lib.grid_decimate.restype = ctypes.c_int64
    lib.grid_decimate.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_double, c_i64p]
    _LIB = lib
    return _LIB


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def dsm_reduce(points: np.ndarray, bbx, cell, shape, nodata: float,
               robust: bool) -> Optional[np.ndarray]:
    """Native per-cell (robust-)max; None if the library isn't built."""
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    rows, cols = shape
    grid = np.full(rows * cols, np.float32(nodata), np.float32)
    fn = lib.dsm_reduce_robust_max if robust else lib.dsm_reduce_max
    fn(_fp(pts), len(pts), float(bbx[0]), float(bbx[3]),
       float(cell[0]), float(cell[1]), rows, cols, np.float32(nodata),
       _fp(grid))
    return grid.reshape(rows, cols)


def grid_decimate_indices(points: np.ndarray, spacing: float) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.int64)
    n = lib.grid_decimate(
        _fp(pts), len(pts), float(spacing),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
