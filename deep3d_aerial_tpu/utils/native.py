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


def reconstruct_mesh_native(
    points: np.ndarray,          # [N, 3] float
    vis_values: np.ndarray,      # CSR camera indices (int32)
    vis_offsets: np.ndarray,     # [N+1] int64
    cam_centers: np.ndarray,     # [M, 3] float
    alpha_vis: float = 1.0,
    inside_w: float = 2.0,
    min_component: int = 20,
) -> Optional[np.ndarray]:
    """Visibility-driven 3D Delaunay + graph-cut surface (the OpenMVS
    ReconstructMesh equivalent, native/delaunay_mesh.cc) -> [T, 3] int32
    triangle indices into `points`, or None if the library isn't built."""
    lib = load_native()
    if lib is None or not hasattr(lib, "d3d_reconstruct_mesh"):
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.d3d_reconstruct_mesh.restype = ctypes.c_int
    lib.d3d_reconstruct_mesh.argtypes = [
        c_dp, ctypes.c_int, c_i32p, c_i64p, c_dp, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.d3d_free.restype = None
    lib.d3d_free.argtypes = [ctypes.c_void_p]

    pts = np.ascontiguousarray(points, np.float64)
    vals = np.ascontiguousarray(vis_values, np.int32)
    offs = np.ascontiguousarray(vis_offsets, np.int64)
    cams = np.ascontiguousarray(cam_centers, np.float64)
    out_tris = ctypes.POINTER(ctypes.c_int32)()
    out_n = ctypes.c_int64(0)
    rc = lib.d3d_reconstruct_mesh(
        pts.ctypes.data_as(c_dp), pts.shape[0],
        vals.ctypes.data_as(c_i32p), offs.ctypes.data_as(c_i64p),
        cams.ctypes.data_as(c_dp), cams.shape[0],
        float(alpha_vis), float(inside_w), int(min_component),
        ctypes.byref(out_tris), ctypes.byref(out_n),
    )
    if rc != 0 or out_n.value == 0:
        if out_tris:
            lib.d3d_free(out_tris)
        return np.zeros((0, 3), np.int32) if rc == 0 else None
    tris = np.ctypeslib.as_array(out_tris, shape=(out_n.value, 3)).copy()
    lib.d3d_free(out_tris)
    return tris


def rasterize_mesh_native(
    tri_xyz: np.ndarray,  # [F, 3, 3] triangle vertices
    bbx, cell, shape, nodata: float,
) -> Optional[np.ndarray]:
    """Native max-z triangle rasterization (dsm/rasterize hot loop);
    None if the library isn't built."""
    lib = load_native()
    if lib is None or not hasattr(lib, "rasterize_mesh_max"):
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.rasterize_mesh_max.restype = ctypes.c_int64
    lib.rasterize_mesh_max.argtypes = [
        c_dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, c_f32p,
    ]
    tris = np.ascontiguousarray(tri_xyz, np.float64)
    rows, cols = shape
    grid = np.empty(rows * cols, np.float32)
    lib.rasterize_mesh_max(
        tris.ctypes.data_as(c_dp), tris.shape[0],
        float(bbx[0]), float(bbx[3]), float(cell[0]), float(cell[1]),
        rows, cols, np.float32(nodata), grid.ctypes.data_as(c_f32p),
    )
    return grid.reshape(rows, cols)
