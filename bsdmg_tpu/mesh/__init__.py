"""Mesh generation pipeline: voxel field -> refine -> marching cubes -> weld -> export."""

from bsdmg_tpu.mesh.field import VoxelField, create_voxel_field, refine_field
from bsdmg_tpu.mesh.pipeline import Mesh, generate_mesh, triangles_to_mesh
from bsdmg_tpu.mesh.session import MeshGenSession, Stage
from bsdmg_tpu.mesh.weld import weld_vertices

__all__ = [
    "VoxelField",
    "create_voxel_field",
    "refine_field",
    "Mesh",
    "MeshGenSession",
    "Stage",
    "generate_mesh",
    "triangles_to_mesh",
    "weld_vertices",
]
