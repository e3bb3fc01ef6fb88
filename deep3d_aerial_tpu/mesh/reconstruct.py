"""Mesh reconstruction from fused point clouds.

Stage parity with the reference's OpenMVS ReconstructMesh wrapper
(/root/reference/mesh/createmesh.py:50-79). Aerial scenes are 2.5D, so the
round-1 reconstruction is a Delaunay triangulation in the xy plane over a
decimated point set, with long/steep triangles culled by `insert_distance`
(the OpenMVS flag controlling point insertion spacing). Vertex colors carry
through as the texturing signal (per-vertex; texture atlas in a later
round). The full 3D Delaunay + graph-cut C++ core (RefineMesh/TextureMesh
equivalents) is the planned upgrade path behind the same API.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..io.ply import read_ply
from .trimesh_io import write_mesh_ply


@dataclasses.dataclass
class MeshConfig:
    insert_distance: float = 1.5  # target point spacing (m); also max-edge scale
    decimate_ratio: float = 1.0  # keep fraction of points (<=1)
    max_edge_factor: float = 8.0  # cull triangles with edges > factor*spacing


def grid_decimate(
    points: np.ndarray, spacing: float, colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
):
    """Keep one (mean) point per xy grid cell of side `spacing`."""
    if spacing <= 0 or len(points) == 0:
        return points, colors, normals

    from ..utils.native import grid_decimate_indices

    idx_native = grid_decimate_indices(points, spacing)
    if idx_native is not None:
        return (
            points[idx_native],
            colors[idx_native] if colors is not None else None,
            normals[idx_native] if normals is not None else None,
        )

    key = np.floor(points[:, :2] / spacing).astype(np.int64)
    # hash cells
    h = key[:, 0] * 73856093 ^ key[:, 1] * 19349663
    order = np.argsort(h, kind="stable")
    h_s = h[order]
    starts = np.flatnonzero(np.concatenate([[True], h_s[1:] != h_s[:-1]]))
    ends = np.concatenate([starts[1:], [len(h_s)]])

    idx_keep = []
    for s, e in zip(starts, ends):
        seg = order[s:e]
        # representative: the point closest to the cell's median height
        z = points[seg, 2]
        idx_keep.append(seg[np.argmin(np.abs(z - np.median(z)))])
    idx_keep = np.asarray(idx_keep)
    return (
        points[idx_keep],
        colors[idx_keep] if colors is not None else None,
        normals[idx_keep] if normals is not None else None,
    )


def delaunay_mesh_25d(
    points: np.ndarray,
    cfg: MeshConfig = MeshConfig(),
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
):
    """Points [N, 3] -> (vertices, faces [M, 3], vertex_colors|None)."""
    from scipy.spatial import Delaunay

    pts, colors, normals = grid_decimate(
        points, cfg.insert_distance, colors, normals
    )
    if cfg.decimate_ratio < 1.0 and len(pts) > 10:
        keep = max(4, int(len(pts) * cfg.decimate_ratio))
        sel = np.linspace(0, len(pts) - 1, keep).astype(np.int64)
        pts = pts[sel]
        colors = colors[sel] if colors is not None else None

    if len(pts) < 4:
        return pts, np.zeros((0, 3), np.int32), colors

    tri = Delaunay(pts[:, :2])
    faces = tri.simplices.astype(np.int32)

    # cull degenerate sliver triangles spanning holes
    a = pts[faces[:, 0], :2]
    b = pts[faces[:, 1], :2]
    c = pts[faces[:, 2], :2]
    edges = np.stack([
        np.linalg.norm(a - b, axis=1),
        np.linalg.norm(b - c, axis=1),
        np.linalg.norm(c - a, axis=1),
    ])
    max_edge = cfg.max_edge_factor * max(cfg.insert_distance, 1e-6)
    keep = edges.max(0) < max_edge
    faces = faces[keep]

    # consistent upward orientation (2.5D): counter-clockwise in xy
    det = (b[keep, 0] - a[keep, 0]) * (c[keep, 1] - a[keep, 1]) - (
        b[keep, 1] - a[keep, 1]
    ) * (c[keep, 0] - a[keep, 0])
    flip = det < 0
    faces[flip] = faces[flip][:, ::-1]

    return pts.astype(np.float32), faces, colors


def create_mesh_from_ply(src_ply, dst_ply, cfg: MeshConfig = MeshConfig()):
    """ReconstructMesh-equivalent file driver: fused PLY -> mesh PLY."""
    pts, normals, colors = read_ply(src_ply)
    verts, faces, vcolors = delaunay_mesh_25d(pts, cfg, colors, normals)
    write_mesh_ply(dst_ply, verts, faces, vcolors)
    return verts, faces
