from .reconstruct import MeshConfig, create_mesh_from_ply, delaunay_mesh_25d

__all__ = ["MeshConfig", "create_mesh_from_ply", "delaunay_mesh_25d"]
