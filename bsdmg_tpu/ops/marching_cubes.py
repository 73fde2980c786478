"""Table-driven marching cubes over a sparse voxel set.

Reference kernel (cuda/modules/compute_mesh_generation.cu:64-120): per voxel,
sample the SDF at 8 corners, classify into the canonical 256-case table, emit
up to 5 triangles with vertices at edge midpoints (true interpolation is
commented out in the reference, cuda/includes/marching_cubes.cu:14), Newton-
project every vertex onto the isosurface, compute finite-difference normals,
and fix the winding by comparing the geometric triangle normal against the
SDF normal at the centroid. Unused triangle slots carry NaN sentinels.

TPU-native redesign: the whole voxel batch classifies and gathers through the
table in one pass; triangles live in a fixed ``(N, 5)`` budget with a boolean
validity mask instead of NaN sentinels; Newton projection runs as a bounded
``fori_loop`` over all emitted vertices at once.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bsdmg_tpu.config import MeshGenConfig
from bsdmg_tpu.ops.tables import (
    MC_CORNER_OFFSETS,
    MC_EDGE_TABLE,
    MC_MAX_TRIANGLES,
    MC_TRI_MIDPOINT_OFFSETS,
    MC_TRIANGLE_CASES,
)
from bsdmg_tpu.sdf.normals import (
    as_component,
    closest_surface_point,
    normal_fd4,
    normal_fd4_c,
    normal_jvp_c,
)

SdfFn = Callable[[jax.Array], jax.Array]


class TriangleSoup(NamedTuple):
    """Fixed-budget triangle emission: ``(N, 5)`` slots with a validity mask.

    Replaces the reference's NaN-padded ``Triangle*`` buffer
    (compute_mesh_generation.cu:116-118)."""

    positions: jax.Array  # (N, 5, 3 verts, 3) float32
    normals: jax.Array  # (N, 5, 3 verts, 3) float32
    valid: jax.Array  # (N, 5) bool


def corner_points(lowers: jax.Array, voxel_size) -> jax.Array:
    """The 8 cube corners per voxel, ``(N, 8, 3)``, reference corner order
    (compute_mesh_generation.cu:79-86)."""
    offsets = jnp.asarray(MC_CORNER_OFFSETS, jnp.float32) * jnp.asarray(
        voxel_size, jnp.float32
    )
    return lowers[:, None, :] + offsets[None, :, :]


def classify(values: jax.Array) -> jax.Array:
    """256-way case index: bit i set iff corner i is inside (values <= 0)."""
    bits = (values <= 0.0).astype(jnp.int32)  # (N, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    return jnp.sum(bits * weights, axis=-1)


def extract_triangles(
    sdf: SdfFn,
    lowers: jax.Array,
    voxel_size,
    count: jax.Array | None = None,
    config: MeshGenConfig = MeshGenConfig(),
    csdf=None,
) -> TriangleSoup:
    """Marching cubes + Newton vertex projection + winding fix.

    Args:
      sdf: scene SDF.
      lowers: ``(N, 3)`` voxel lower corners (padding rows allowed).
      voxel_size: scalar cubic voxel size.
      count: optional int32 live-row count; rows beyond it are masked out.
      config: mesh-generation parameters.
      csdf: optional component-form SDF ``f(x, y, z) -> d``. All SDF
        evaluation (corners, Newton, normals) runs on flat coordinate planes
        — full TPU lane occupancy, ~30x faster than the ``(N, 3)`` layout —
        falling back to a wrapper around ``sdf`` when absent.

    Returns a :class:`TriangleSoup` with the same per-voxel 5-triangle budget
    as the reference (src/cuda/mod.rs:205).
    """
    if csdf is None:
        csdf = as_component(sdf)
    n = lowers.shape[0]
    valid_voxel = (
        jnp.ones(n, bool) if count is None else jnp.arange(n) < count
    )
    safe = jnp.where(valid_voxel[:, None], lowers, 1e6)

    vs = jnp.asarray(voxel_size, jnp.float32)
    offs = jnp.asarray(MC_CORNER_OFFSETS, jnp.float32) * vs  # (8, 3)
    cx = safe[:, 0:1] + offs[None, :, 0]  # (N, 8)
    cy = safe[:, 1:2] + offs[None, :, 1]
    cz = safe[:, 2:3] + offs[None, :, 2]
    values = csdf(cx.reshape(-1), cy.reshape(-1), cz.reshape(-1)).reshape(n, 8)
    case = classify(values)  # (N,)

    tri_edges = jnp.asarray(MC_TRIANGLE_CASES)[case]  # (N, 5, 3) edge ids, -1 pad
    tri_valid = (tri_edges[..., 0] >= 0) & valid_voxel[:, None]  # (N, 5)

    if config.interpolate_edges:
        safe_edges = jnp.maximum(tri_edges, 0)
        edge_corners = jnp.asarray(MC_EDGE_TABLE)[safe_edges]  # (N, 5, 3, 2)
        c0 = edge_corners[..., 0]  # (N, 5, 3)
        c1 = edge_corners[..., 1]

        def gather_corner_plane(plane, idx):
            # plane (N, 8), idx (N, 5, 3) corner ids -> (N, 5, 3)
            return jnp.take_along_axis(
                plane[:, None, None, :], idx[..., None], axis=-1
            ).squeeze(-1)

        p0x, p0y, p0z = (gather_corner_plane(c, c0) for c in (cx, cy, cz))
        p1x, p1y, p1z = (gather_corner_plane(c, c1) for c in (cx, cy, cz))
        v0 = gather_corner_plane(values, c0)
        v1 = gather_corner_plane(values, c1)
        t = v0 / jnp.where(jnp.abs(v0 - v1) < 1e-12, 1.0, v0 - v1)
        t = jnp.clip(t, 0.0, 1.0)
        vx = p0x + (p1x - p0x) * t  # (N, 5, 3)
        vy = p0y + (p1y - p0y) * t
        vz = p0z + (p1z - p0z) * t
    else:
        # reference uses fixed midpoints (marching_cubes.cu:14): the two
        # corner lookups are pre-baked into one case-indexed offset table,
        # replacing six per-edge gathers with one row gather by case
        off = jnp.asarray(MC_TRI_MIDPOINT_OFFSETS)[case] * vs  # (N, 5, 3, 3)
        vx = safe[:, 0][:, None, None] + off[..., 0]
        vy = safe[:, 1][:, None, None] + off[..., 1]
        vz = safe[:, 2][:, None, None] + off[..., 2]

    # Newton projection of every emitted vertex onto the isosurface
    # (compute_mesh_generation.cu:95-97; bounded per MeshGenConfig), on
    # flat coordinate planes.
    flat_mask = jnp.repeat(tri_valid.reshape(-1), 3)
    fx = jnp.where(flat_mask, vx.reshape(-1), 1e6)
    fy = jnp.where(flat_mask, vy.reshape(-1), 1e6)
    fz = jnp.where(flat_mask, vz.reshape(-1), 1e6)
    if config.projection_normals == "grad":
        proj_csdf = csdf
        normal_c = normal_jvp_c
    else:
        proj_csdf = csdf
        normal_c = lambda f, x, y, z: normal_fd4_c(f, x, y, z, config.normal_epsilon)

    def cond(carry):
        _, _, _, done, i = carry
        return (~jnp.all(done)) & (i < config.newton_iters)

    def body(carry):
        gx, gy, gz, done, i = carry
        sd = proj_csdf(gx, gy, gz)
        nx, ny, nz = normal_c(proj_csdf, gx, gy, gz)
        gx = jnp.where(done, gx, gx - sd * nx)
        gy = jnp.where(done, gy, gy - sd * ny)
        gz = jnp.where(done, gz, gz - sd * nz)
        return gx, gy, gz, done | (jnp.abs(sd) <= config.newton_tolerance), i + 1

    fx, fy, fz, _, _ = jax.lax.while_loop(
        cond, body, (fx, fy, fz, ~flat_mask, jnp.int32(0))
    )
    fx = jnp.where(flat_mask, fx, 0.0)
    fy = jnp.where(flat_mask, fy, 0.0)
    fz = jnp.where(flat_mask, fz, 0.0)
    vx, vy, vz = (a.reshape(n, 5, 3) for a in (fx, fy, fz))

    # exported normals always use the reference's fd4 stencil for parity
    nx_, ny_, nz_ = normal_fd4_c(csdf, fx, fy, fz, config.normal_epsilon)

    # winding fix (compute_mesh_generation.cu:103-113): flip when the
    # geometric normal opposes the SDF normal at the centroid.
    e1x, e1y, e1z = vx[..., 1] - vx[..., 0], vy[..., 1] - vy[..., 0], vz[..., 1] - vz[..., 0]
    e2x, e2y, e2z = vx[..., 2] - vx[..., 0], vy[..., 2] - vy[..., 0], vz[..., 2] - vz[..., 0]
    gx_ = e1y * e2z - e1z * e2y  # (N, 5)
    gy_ = e1z * e2x - e1x * e2z
    gz_ = e1x * e2y - e1y * e2x
    mx = (vx[..., 0] + vx[..., 1] + vx[..., 2]) / 3.0
    my = (vy[..., 0] + vy[..., 1] + vy[..., 2]) / 3.0
    mz = (vz[..., 0] + vz[..., 1] + vz[..., 2]) / 3.0
    ax_, ay_, az_ = normal_fd4_c(
        csdf, mx.reshape(-1), my.reshape(-1), mz.reshape(-1), config.normal_epsilon
    )
    flip = (
        gx_ * ax_.reshape(n, 5) + gy_ * ay_.reshape(n, 5) + gz_ * az_.reshape(n, 5)
    ) <= 0.0  # (N, 5)

    verts = jnp.stack(
        [vx, vy, vz], axis=-1
    )  # (N, 5, 3 verts, 3)
    normals = jnp.stack(
        [nx_.reshape(n, 5, 3), ny_.reshape(n, 5, 3), nz_.reshape(n, 5, 3)], axis=-1
    )

    def swap02(x):
        return jnp.where(flip[..., None, None], x[..., ::-1, :], x)

    verts = swap02(verts)
    normals = swap02(normals)

    verts = jnp.where(tri_valid[..., None, None], verts, 0.0)
    normals = jnp.where(tri_valid[..., None, None], normals, 0.0)
    return TriangleSoup(verts, normals, tri_valid)
