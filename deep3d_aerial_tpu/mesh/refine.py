"""Mesh refinement — RefineMesh-stage equivalent (reference wraps the
OpenMVS RefineMesh binary, createmesh.py:82-112).

Round-1 scope: feature-preserving Taubin lambda/mu smoothing of vertex
positions (removes fusion noise without the shrinkage of plain Laplacian),
plus edge-collapse-free decimation by vertex clustering. The variational
photo-consistency refinement (OpenMVS's core) is the planned C++ upgrade.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class RefineConfig:
    iterations: int = 10
    lamb: float = 0.5
    mu: float = -0.53
    decimate_ratio: float = 1.0  # keep fraction of vertices (<=1)


def vertex_adjacency(n_vertices: int, faces: np.ndarray):
    """CSR neighbor lists from triangle faces."""
    edges = np.concatenate([
        faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]],
        faces[:, [1, 0]], faces[:, [2, 1]], faces[:, [0, 2]],
    ])
    # unique directed edges
    key = edges[:, 0].astype(np.int64) * n_vertices + edges[:, 1]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    keep = np.concatenate([[True], key_s[1:] != key_s[:-1]])
    e = edges[order][keep]
    counts = np.bincount(e[:, 0], minlength=n_vertices)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return e[:, 1], offsets


def taubin_smooth(
    vertices: np.ndarray, faces: np.ndarray, cfg: RefineConfig = RefineConfig()
) -> np.ndarray:
    """Taubin smoothing: alternate positive/negative Laplacian steps."""
    v = np.asarray(vertices, np.float64).copy()
    n = len(v)
    if n == 0 or len(faces) == 0:
        return vertices.astype(np.float32)
    nbr, off = vertex_adjacency(n, faces)
    deg = np.maximum(np.diff(off), 1)

    def laplacian(x):
        sums = np.zeros_like(x)
        np.add.at(sums, np.repeat(np.arange(n), np.diff(off)), x[nbr])
        return sums / deg[:, None] - x

    for _ in range(cfg.iterations):
        v = v + cfg.lamb * laplacian(v)
        v = v + cfg.mu * laplacian(v)
    return v.astype(np.float32)


def decimate_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    keep_ratio: float,
    colors: Optional[np.ndarray] = None,
):
    """Vertex-clustering decimation to ~keep_ratio of the vertices."""
    if keep_ratio >= 1.0 or len(vertices) < 16:
        return vertices, faces, colors
    # grid size chosen so expected occupied cells ~= keep_ratio * n
    bbox_min = vertices.min(0)
    extent = np.maximum(vertices.max(0) - bbox_min, 1e-9)
    target = max(4, int(len(vertices) * keep_ratio))
    cell = (extent[0] * extent[1] / target) ** 0.5 if extent[0] * extent[1] > 0 else 1.0
    key = np.floor((vertices[:, :2] - bbox_min[:2]) / max(cell, 1e-9)).astype(np.int64)
    h = key[:, 0] * 73856093 ^ key[:, 1] * 19349663

    uniq, inverse = np.unique(h, return_inverse=True)
    new_v = np.zeros((len(uniq), 3), np.float64)
    cnt = np.bincount(inverse)
    np.add.at(new_v, inverse, vertices)
    new_v /= cnt[:, None]

    new_c = None
    if colors is not None:
        new_c = np.zeros((len(uniq), 3), np.float64)
        np.add.at(new_c, inverse, colors.astype(np.float64))
        new_c = (new_c / cnt[:, None]).astype(np.uint8)

    new_f = inverse[faces]
    valid = (
        (new_f[:, 0] != new_f[:, 1]) & (new_f[:, 1] != new_f[:, 2])
        & (new_f[:, 0] != new_f[:, 2])
    )
    new_f = new_f[valid]
    # drop duplicate faces
    kf = np.sort(new_f, axis=1)
    _, first = np.unique(
        kf[:, 0] * len(uniq) * len(uniq) + kf[:, 1] * len(uniq) + kf[:, 2],
        return_index=True,
    )
    new_f = new_f[np.sort(first)]
    return new_v.astype(np.float32), new_f.astype(np.int32), new_c


def refine_mesh_file(src_ply, dst_ply, cfg: RefineConfig = RefineConfig()):
    """File driver matching the reference RefineMesh stage."""
    from .trimesh_io import read_mesh_ply, write_mesh_ply

    verts, faces = read_mesh_ply(src_ply)
    verts = taubin_smooth(verts, faces, cfg)
    verts, faces, _ = decimate_mesh(verts, faces, cfg.decimate_ratio)
    write_mesh_ply(dst_ply, verts, faces)
    return verts, faces
