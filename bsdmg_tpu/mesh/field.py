"""Voxel-field state for hierarchical mesh generation.

Mirrors the reference's ``CudaVoxelField`` (src/cuda/mod.rs:41-46,105-122):
a flat list of voxel lower corners plus a cubic voxel size. Here the field is
a padded device buffer + live count, so refinement stays on device; only the
scalar count is pulled to the host to size the next level (the reference pulls
the *entire* voxel buffer every level, src/cuda/mod.rs:184-194).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from bsdmg_tpu.config import MeshGenConfig

SdfFn = Callable[[jax.Array], jax.Array]


@dataclasses.dataclass
class VoxelField:
    """Padded sparse voxel field. ``lowers[:count]`` are live lower corners."""

    lowers: jax.Array  # (CAP, 3) float32
    count: int  # host-side live count
    voxel_size: float  # cubic voxel edge length
    level: int = 0  # refinement levels applied

    @property
    def capacity(self) -> int:
        return self.lowers.shape[0]

    def live_lowers(self) -> jax.Array:
        return self.lowers[: self.count]

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.live_lowers())


def create_voxel_field(config: MeshGenConfig = MeshGenConfig()) -> VoxelField:
    """Dense initial grid: ``init_factor**3`` voxels of size ``bb_size/init_factor``
    covering ``[-bb_size/2, bb_size/2]^3`` (src/cuda/mod.rs:105-122)."""
    n = config.init_factor
    size = config.bb_size / n
    axis = jnp.arange(n, dtype=jnp.float32) * size - config.bb_size / 2.0
    grid = jnp.stack(jnp.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    lowers = grid.reshape(-1, 3)
    return VoxelField(lowers=lowers, count=n**3, voxel_size=size, level=0)


def _round_capacity(n: int, granule: int = 2048) -> int:
    """Round buffer capacity up to a granule to bound jit-shape churn."""
    return max(granule, ((n + granule - 1) // granule) * granule)


def refine_field(
    sdf: SdfFn,
    field: VoxelField,
    config: MeshGenConfig = MeshGenConfig(),
    csdf=None,
) -> VoxelField:
    """One refinement level: split surface-crossing voxels into 8 children.

    Equivalent of ``CudaHandler::refine_voxel_field`` (src/cuda/mod.rs:124-202)
    with on-device compaction instead of host ``retain``.
    """
    if field.count == 0:
        return VoxelField(
            lowers=field.lowers[:0].reshape(0, 3),
            count=0,
            voxel_size=field.voxel_size / 2.0,
            level=field.level + 1,
        )

    in_cap = _round_capacity(field.count)
    lowers = _pad_to(field.lowers, in_cap)
    count = jnp.int32(field.count)
    size = jnp.float32(field.voxel_size)

    # blocked two-stage compaction (ops/refine.py::refine_step_blocked):
    # guess a quarter of the blocks stay alive, retry larger on overflow
    from bsdmg_tpu.ops.refine import _BLOCK_ROWS

    nb = (8 * in_cap) // _BLOCK_ROWS
    block_cap = max(64, -(-nb // 4))
    # packed 2-column fine sort (ops/refine.py): sound only when child
    # lowers are exact on a dyadic lattice — bb_size mantissa <= 12 bits
    # (m*ijk then fits f32 exactly) and child resolution < 2^11
    import math

    mant = math.frexp(config.bb_size)[0]
    child_res = config.init_factor << (field.level + 1)
    origin = (
        config.bb_min
        if (mant * 4096 == int(mant * 4096) and child_res <= 2048)
        else None
    )
    while True:
        out, new_count, new_size, alive = _refine_blocked_jit(
            sdf, lowers, count, size, csdf, block_cap, origin
        )
        n, a = int(new_count), int(alive)
        if a <= block_cap:
            break
        if block_cap >= nb:
            break  # full width: rows == 8N >= any survivor count
        block_cap = min(nb, max(2 * block_cap, -(-a * 9 // 8)))

    # shrink the inflated output to a rounded capacity: downstream passes
    # (marching cubes, further refines) must not pay for dead padding rows —
    # surviving voxels are O(surface area), typically a few % of 8N
    cap = _round_capacity(n)
    if cap < out.shape[0]:
        out = out[:cap]
    elif cap > out.shape[0]:
        out = _pad_to(out, cap)
    return VoxelField(
        lowers=out,
        count=n,
        voxel_size=float(new_size),
        level=field.level + 1,
    )


def _pad_to(arr: jax.Array, capacity: int) -> jax.Array:
    n = arr.shape[0]
    if n == capacity:
        return arr
    if n > capacity:
        return arr[:capacity]
    pad = jnp.full((capacity - n,) + arr.shape[1:], 1e6, arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _refine_blocked_jit(
    sdf: SdfFn, lowers, count, voxel_size, csdf, block_cap, origin=None
):
    from bsdmg_tpu.ops.refine import refine_step_blocked

    return refine_step_blocked(
        sdf, lowers, count, voxel_size, block_cap=block_cap, csdf=csdf,
        origin=origin,
    )
