"""Pallas sphere-trace over a baked grid SDF (mesh-asset scenes).

The analytic render kernel bakes its scene as compile-time scalar constants
(ops/pallas/csdf.py) — impossible for a mesh asset's ``SdfGrid``
(models/mesh_sdf.py), whose 64^3-1024^3 table must be a kernel *operand*.
This kernel keeps the whole table VMEM-resident (a constant BlockSpec: the
same (R^3/128, 128) block for every grid step — 1 MB at 64^3) and evaluates
the trilinear interpolation with 8 per-lane gathers per march step.

Status: numerically validated against the XLA ``grid_csdf`` path in
interpret mode (tests/test_mesh_sdf.py); Mosaic's per-lane-gather lowering
on the real TPU backend is the open question this module exists to answer —
``cli render`` keeps the SoA XLA fallback (ops/shade.py::render_image_c)
until the measured kernel wins. Reference tie-in: the OBJ assets the
reference loads but never renders (src/main.rs:65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.ops.pallas.render_kernel import (
    TILE_L,
    TILE_S,
    _SWIZZLED_BLOCK_ROWS,
    _march,
)

#: Largest grid resolution whose table fits comfortably in VMEM alongside
#: the ray planes (64^3 f32 = 1 MB; v5e VMEM is 16 MB/core).
MAX_VMEM_RESOLUTION = 64


def _interp_csdf(table, r: int, lo, hi):
    """Trilinear-interpolation csdf over a flat ``(R^3,)`` table value.

    The math (including the sound outside-box step) is single-sourced in
    models/mesh_sdf.py::make_grid_interp_csdf; only the corner-sample
    gather differs — per-lane ``jnp.take`` here vs flat vector gathers in
    the XLA twin."""
    from bsdmg_tpu.models.mesh_sdf import make_grid_interp_csdf

    def at(ix, iy, iz):
        # indices are clip-guaranteed in range
        return jnp.take(table, (ix * r + iy) * r + iz, mode="clip")

    return make_grid_interp_csdf(at, r, lo, hi)


def _grid_trace_kernel(r: int, lo, hi, config: MarchConfig, budget: int):
    def kernel(
        table_ref,
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        cone_ref,
        depth_ref, steps_ref, outcome_ref,
    ):
        table = table_ref[:].reshape(-1)
        csdf = _interp_csdf(table, r, lo, hi)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        cone = cone_ref[:]
        active0 = jnp.ones_like(cone, bool)
        depth, steps, outcome, _ = _march(
            csdf, config, (ox, oy, oz), (dx, dy, dz), cone,
            active0, jnp.zeros_like(cone), jnp.zeros_like(cone, jnp.int32),
            budget,
        )
        depth_ref[:] = depth
        steps_ref[:] = steps
        outcome_ref[:] = outcome

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("r", "lo", "hi", "config", "budget", "interpret"),
)
def grid_trace_pallas(
    table, r: int, lo, hi, o_s, d_s, cone_s,
    config: MarchConfig = MarchConfig(),
    budget: int = 10**9,
    interpret: bool = False,
):
    """Sphere-trace pre-swizzled ``(M, 128)`` ray planes against a baked
    grid SDF. ``table`` is the flat ``(R^3,)`` grid (``SdfGrid.values``
    raveled, C order); ``lo``/``hi`` the grid box corners (python tuples).

    Returns ``(depth, steps, outcome)`` planes."""
    if r > MAX_VMEM_RESOLUTION:
        raise ValueError(
            f"grid resolution {r} > {MAX_VMEM_RESOLUTION}: table would not "
            "fit VMEM; use the SoA XLA path (ops/shade.py::render_image_c)"
        )
    if (r * r * r) % TILE_L:
        raise ValueError(
            f"grid resolution {r}: r^3 = {r**3} is not a multiple of "
            f"{TILE_L}, so the table cannot tile into VMEM lanes; use a "
            f"resolution whose cube is a multiple of {TILE_L} (e.g. 32, "
            "48, 64) or the SoA XLA path (ops/shade.py::render_image_c)"
        )
    m, L = cone_s.shape
    if m % TILE_S:
        raise ValueError(
            f"ray planes have {m} rows, not a multiple of {TILE_S}: the "
            "grid would skip the trailing partial block and return "
            "uninitialized rows (swizzled_ray_planes emits padded planes)"
        )
    rows = (r * r * r) // TILE_L
    table2 = table.reshape(rows, TILE_L)
    table_spec = pl.BlockSpec(
        (rows, TILE_L), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct((m, L), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m, L), jnp.int32)
    block_rows = _SWIZZLED_BLOCK_ROWS if m % _SWIZZLED_BLOCK_ROWS == 0 else TILE_S
    spec = pl.BlockSpec(
        (block_rows, TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _grid_trace_kernel(r, lo, hi, config, budget),
        grid=(m // block_rows,),
        in_specs=[table_spec] + [spec] * 7,
        out_specs=[spec] * 3,
        out_shape=[f32, i32, i32],
        interpret=interpret,
    )(
        table2,
        o_s[..., 0], o_s[..., 1], o_s[..., 2],
        d_s[..., 0], d_s[..., 1], d_s[..., 2],
        cone_s,
    )
