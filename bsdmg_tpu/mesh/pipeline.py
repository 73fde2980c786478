"""End-to-end mesh generation: field -> refine^k -> marching cubes -> weld.

The functional equivalent of the reference's interactive state machine
(src/renderer/mod.rs:155-226: Empty -> VoxelField -> Mesh, B to refine, V to
advance) driving ``CudaHandler::{create_cuda_voxel_field, refine_voxel_field,
voxel_field_to_mesh}`` (src/cuda/mod.rs:105-346).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from bsdmg_tpu.config import MeshGenConfig
from bsdmg_tpu.mesh.field import VoxelField, create_voxel_field, refine_field
from bsdmg_tpu.mesh.weld import weld_vertices
from bsdmg_tpu.ops.marching_cubes import TriangleSoup, extract_triangles

SdfFn = Callable[[jax.Array], jax.Array]


@dataclasses.dataclass
class Mesh:
    """Indexed triangle mesh with per-vertex normals."""

    vertices: np.ndarray  # (V, 3) float32
    normals: np.ndarray  # (V, 3) float32
    faces: np.ndarray  # (T, 3) int32

    @property
    def vertex_count(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def triangle_count(self) -> int:
        return int(self.faces.shape[0])


@partial(jax.jit, static_argnums=(0, 4, 5))
def _extract(sdf: SdfFn, lowers, voxel_size, count, config: MeshGenConfig, csdf=None):
    return extract_triangles(sdf, lowers, voxel_size, count, config, csdf=csdf)


def field_to_triangles(
    sdf: SdfFn,
    field: VoxelField,
    config: MeshGenConfig = MeshGenConfig(),
    csdf=None,
) -> TriangleSoup:
    """Marching cubes over a voxel field (cf. src/cuda/mod.rs:204-261).

    Voxels with more crossing edges than ``config.edge_budget`` (checkerboard
    MC cases — fractal scenes only) overflow the compacted projection layout;
    on overflow the extraction reruns once with the full 12-lane layout so
    the result is always exact."""
    lowers = field.lowers
    soup = _extract(
        sdf, lowers, jnp.float32(field.voxel_size), jnp.int32(field.count), config,
        csdf,
    )
    if config.edge_budget < 12 and int(soup.edge_overflow) > 0:
        soup = _extract(
            sdf, lowers, jnp.float32(field.voxel_size), jnp.int32(field.count),
            dataclasses.replace(config, edge_budget=12), csdf,
        )
    return soup


def triangles_to_mesh(
    soup: TriangleSoup, config: MeshGenConfig = MeshGenConfig()
) -> Mesh:
    """Compact valid triangles to the host and weld shared vertices
    (cf. src/cuda/mod.rs:263-326)."""
    valid = np.asarray(soup.valid).reshape(-1)
    positions = np.asarray(soup.positions).reshape(-1, 3, 3)[valid]
    normals = np.asarray(soup.normals).reshape(-1, 3, 3)[valid]
    if positions.size == 0:
        return Mesh(
            vertices=np.zeros((0, 3), np.float32),
            normals=np.zeros((0, 3), np.float32),
            faces=np.zeros((0, 3), np.int32),
        )
    vertices, vertex_normals, faces = weld_vertices(
        positions, normals, config.weld_quantization
    )
    return Mesh(vertices=vertices, normals=vertex_normals, faces=faces)


def extract_mesh_chunked(
    sdf: SdfFn,
    field: VoxelField,
    config: MeshGenConfig = MeshGenConfig(),
    chunk_size: int = 1 << 18,
    csdf=None,
) -> Mesh:
    """Marching cubes over a large field in fixed-size voxel chunks.

    The triangle budget buffers are (N, 5, 3, 3) floats; at the 1024^3
    adaptive scale N reaches millions of voxels, so extraction runs in
    ``chunk_size`` slices (one jit cache entry total) and the per-chunk
    valid triangles accumulate on the host before a single weld.
    """
    if field.count == 0:
        return triangles_to_mesh(
            TriangleSoup(
                jnp.zeros((0, 5, 3, 3)), jnp.zeros((0, 5, 3, 3)), jnp.zeros((0, 5), bool)
            ),
            config,
        )
    positions_acc = []
    normals_acc = []
    voxel_size = jnp.float32(field.voxel_size)
    for start in range(0, field.count, chunk_size):
        n = min(chunk_size, field.count - start)
        end = start + chunk_size
        if end <= field.capacity:
            chunk = field.lowers[start:end]
        else:
            pad = jnp.full((end - field.capacity, 3), 1e6, jnp.float32)
            chunk = jnp.concatenate([field.lowers[start:], pad], axis=0)
        soup = _extract(sdf, chunk, voxel_size, jnp.int32(n), config, csdf)
        if config.edge_budget < 12 and int(soup.edge_overflow) > 0:
            soup = _extract(
                sdf, chunk, voxel_size, jnp.int32(n),
                dataclasses.replace(config, edge_budget=12), csdf,
            )
        valid = np.asarray(soup.valid).reshape(-1)
        if valid.any():
            positions_acc.append(np.asarray(soup.positions).reshape(-1, 3, 3)[valid])
            normals_acc.append(np.asarray(soup.normals).reshape(-1, 3, 3)[valid])

    if not positions_acc:
        return Mesh(
            vertices=np.zeros((0, 3), np.float32),
            normals=np.zeros((0, 3), np.float32),
            faces=np.zeros((0, 3), np.int32),
        )
    positions = np.concatenate(positions_acc)
    normals = np.concatenate(normals_acc)
    vertices, vertex_normals, faces = weld_vertices(
        positions, normals, config.weld_quantization
    )
    return Mesh(vertices=vertices, normals=vertex_normals, faces=faces)


def generate_mesh(
    sdf: SdfFn,
    refine_steps: int = 3,
    config: MeshGenConfig = MeshGenConfig(),
    *,
    on_level: Callable[[VoxelField], None] | None = None,
    chunk_size: int = 1 << 18,
    csdf=None,
) -> Mesh:
    """Full pipeline, the real version of the reference's intended headless
    sequence (advance -> refine^k -> advance -> save; src/main.rs:20-34 sends
    the events in one frame so the reference's headless mode never actually
    refines — ours does).
    """
    field = create_voxel_field(config)
    if on_level is not None:
        on_level(field)
    for _ in range(refine_steps):
        field = refine_field(sdf, field, config, csdf=csdf)
        if on_level is not None:
            on_level(field)
    if field.count > chunk_size:
        return extract_mesh_chunked(sdf, field, config, chunk_size, csdf=csdf)
    soup = field_to_triangles(sdf, field, config, csdf=csdf)
    return triangles_to_mesh(soup, config)
