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


def grid_trace_hybrid(
    grid,
    o_s, d_s, cone_s,
    config: MarchConfig = MarchConfig(),
    coarse_resolution: int = MAX_VMEM_RESOLUTION,
    interpret: bool = False,
    coarse=None,
):
    """Two-level sphere trace for grid SDFs of ANY resolution.

    Grids <= :data:`MAX_VMEM_RESOLUTION` run the single VMEM-resident Pallas
    kernel. Larger grids (the reference's 1024^3-class assets,
    src/main.rs:65; BASELINE.md config) run:

    1. **Coarse pass (Pallas, VMEM)**: march a 64^3 min-pooled *lower-bound*
       mip (models/mesh_sdf.py::coarsen_grid_lower — provably
       ``coarse(p) <= fine(p)``, so no step can overshoot the fine surface).
       The conservative pooling slack (~one coarse cell) makes the march
       stall — i.e. report COLLISION — just before the fine zero level;
       sky / depth-limit rays resolve entirely in-kernel.
    2. **Fine pass (XLA)**: rays the coarse pass stopped resume the SAME
       march loop (render_kernel.py::_march, shared verbatim with the
       kernel) against the full-resolution trilinear csdf via flat XLA
       gathers, carrying depth and step count. Only the last ~handful of
       steps per surface ray pay the HBM-gather cost.

    Returns ``(depth, steps, outcome)`` planes.
    """
    from bsdmg_tpu.models.mesh_sdf import coarsen_grid_lower, grid_csdf
    from bsdmg_tpu.ops.pallas.render_kernel import COLLISION, _march

    r = grid.resolution
    if r <= MAX_VMEM_RESOLUTION and (r * r * r) % TILE_L == 0:
        return grid_trace_pallas(
            grid.values.reshape(-1), r, grid.lo, grid.hi,
            o_s, d_s, cone_s, config, interpret=interpret,
        )

    if coarse is None:
        coarse = coarsen_grid_lower(grid, coarse_resolution)
    depth1, steps1, outcome1 = grid_trace_pallas(
        coarse.values.reshape(-1), coarse.resolution, coarse.lo, coarse.hi,
        o_s, d_s, cone_s, config, interpret=interpret,
    )

    fine = grid_csdf(grid)
    resume = outcome1 == COLLISION
    depth, steps, outcome, _ = _march(
        fine, config,
        (o_s[..., 0], o_s[..., 1], o_s[..., 2]),
        (d_s[..., 0], d_s[..., 1], d_s[..., 2]),
        cone_s, resume, depth1, steps1, config.step_limit,
        outcome0=outcome1,
    )
    return depth, steps, outcome


def render_image_grid(
    grid,
    origins, directions, cone_radius,
    config: MarchConfig = MarchConfig(),
    coarse_resolution: int = MAX_VMEM_RESOLUTION,
    interpret: bool = False,
    coarse=None,
):
    """Full render of a grid-SDF (mesh-asset) scene through the hybrid
    tracer: swizzled Pallas coarse march + XLA fine finish + fd4 normals and
    the reference shade. Any grid resolution. Returns linear RGB (H, W, 3).

    Semantics note: the hybrid's step *history* differs from a start-to-end
    fine march (coarse steps are conservative), so accepted hit depths can
    differ from the pure-XLA path within a few collision epsilons near
    silhouettes — the mesh surface is itself a bake-resolution approximation
    (validated within tolerance in tests/test_mesh_sdf.py).
    """
    from bsdmg_tpu.models.mesh_sdf import grid_csdf
    from bsdmg_tpu.ops.pallas.render_kernel import (
        _fd_normal, _unswizzle, swizzled_ray_planes,
    )
    from bsdmg_tpu.ops.shade import shade_planes

    h, w = origins.shape[:2]
    o_s, d_s, cone_s, (hp, wp, m, _) = swizzled_ray_planes(
        origins, directions, cone_radius, h, w
    )
    depth, _, outcome = grid_trace_hybrid(
        grid, o_s, d_s, cone_s, config, coarse_resolution, interpret, coarse
    )
    fine = grid_csdf(grid)
    px = o_s[..., 0] + depth * d_s[..., 0]
    py = o_s[..., 1] + depth * d_s[..., 1]
    pz = o_s[..., 2] + depth * d_s[..., 2]
    nx, ny, nz = _fd_normal(fine, px, py, pz, config.normal_epsilon)
    r, g, b = shade_planes(nx, ny, nz, outcome)
    r, g, b = (_unswizzle(x[:m], hp, wp) for x in (r, g, b))
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)
