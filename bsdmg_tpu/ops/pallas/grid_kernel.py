"""Pallas sphere-trace over a baked grid SDF (mesh-asset scenes).

The analytic render kernel bakes its scene as compile-time scalar constants
(ops/pallas/csdf.py) — impossible for a mesh asset's ``SdfGrid``
(models/mesh_sdf.py), whose 64^3-1024^3 table must be a kernel *operand*.
Two in-kernel sampling backends share the march loop:

- **gather** (:func:`grid_trace_pallas` / :func:`grid_trace_hybrid`): the
  whole table VMEM-resident, trilinear via 8 per-lane gathers per step.
  Round-5 on-chip measurement: Mosaic on this backend CANNOT lower any
  dynamic gather (1D ``jnp.take`` raises ``NotImplementedError: Only 2D
  gather is supported``; 2D ``take_along_axis`` forms crash the remote
  compile helper), so this backend exists only as the interpret-mode /
  CPU oracle for tests.

- **contraction** (:func:`grid_trace_contraction`): gather-free — the
  table is laid out as a ``(R, R^2)`` matrix ``[z, x*R+y]`` and trilinear
  interpolation becomes a hat-weight MXU contraction
  ``sum_z wz * (T @ (wx ⊗ wy))`` with exactly-sparse tent weights built
  from ``broadcasted_iota``. O(R^3) MACs per sample instead of 8 loads,
  but they run on the MXU at full rate — on-chip probe-validated, and the
  ONLY grid sampler Mosaic accepts on this backend. A multi-level ladder
  (32^3 bf16 lower-bound mip -> <=64^3 mip/exact table) marches in-kernel;
  grids >64^3 finish the last near-surface steps on the fine table via
  XLA gathers (resume-masked).

``cli render`` probes the contraction kernel (:func:`probe_grid_backend`)
and falls back to the SoA XLA march if it will not compile. Reference
tie-in: the OBJ assets the reference loads but never renders
(src/main.rs:65).
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
    from bsdmg_tpu.ops.pallas.render_kernel import COLLISION, STEP_LIMIT, _march

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
    # Resume coarse COLLISION rays (stalled just before the fine surface)
    # AND coarse STEP_LIMIT rays: the lower-bound mip takes strictly
    # smaller steps, so grazing rays can burn the whole coarse budget yet
    # still collide under a start-to-end fine march — give those a fresh
    # step budget so the outcome matches the single-level fine trace
    # (advisor finding, round 4).
    resume = (outcome1 == COLLISION) | (outcome1 == STEP_LIMIT)
    steps0 = jnp.where(outcome1 == STEP_LIMIT, 0, steps1)
    depth, steps, outcome, _ = _march(
        fine, config,
        (o_s[..., 0], o_s[..., 1], o_s[..., 2]),
        (d_s[..., 0], d_s[..., 1], d_s[..., 2]),
        cone_s, resume, depth1, steps0, config.step_limit,
        outcome0=outcome1,
    )
    return depth, steps, outcome


# ---------------------------------------------------------------------------
# contraction backend: gather-free trilinear sampling on the MXU
# ---------------------------------------------------------------------------

#: Lane width of the contraction kernel's ray blocks. Wider than the vreg
#: lane count so each hat-weight matmul has a healthy N dimension (512) and
#: one (8, 512) block covers a whole 32-row swizzled pixel group.
_C_LANES = 4 * TILE_L
_C_ROWS = 8
#: Max sublane rows of a weight-chunk buffer: (R * xchunk, 512) f32 = 2 MB.
_C_CHUNK_ROWS = 1024
#: bf16 rounding bound for lower-bound mip levels: the MXU's one-pass f32
#: matmul rounds both operands to bf16 (rel 2^-9 each; measured on-chip:
#: max err 0.0019 * max|T|); 3x covers weight+table rounding with slack.
_BF16_MARGIN = 3.0 * 2.0**-9


def _hat(c, r: int, lanes: int):
    """Tent weights ``max(0, 1 - |c - i|)`` of a ``(1, L)`` coordinate row
    against grid index ``i`` — exactly the two trilinear corner weights
    ``(1-f, f)`` at ``floor(c), floor(c)+1`` and exact zeros elsewhere."""
    # int32 iota then cast: Mosaic's tpu.iota only produces integer vectors
    a = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c - a))


def make_contraction_csdf(t2, r: int, lo, hi, *, bf16: bool, margin: float):
    """Component-form trilinear grid csdf with NO gathers: corner lookups
    become an MXU contraction against ``t2``, the table as a ``(r, r*r)``
    matrix ``t2[z, x*r + y]`` (``SdfGrid.values.reshape(r*r, r).T``).

    Same clamp/outside semantics as models/mesh_sdf.py::make_grid_interp_csdf
    (the XLA twin), minus ``margin``: for bf16 levels pass
    ``_BF16_MARGIN * max|T|`` so the result stays a sound lower bound under
    MXU operand rounding; exact (f32 HIGHEST) levels pass 0.
    """
    from bsdmg_tpu.models.mesh_sdf import _outside_step

    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    scale = (r - 1) / (hi - lo)
    xc = max(1, _C_CHUNK_ROWS // r)  # x-indices per weight chunk
    nchunks = -(-r // xc)
    precision = None if bf16 else jax.lax.Precision.HIGHEST

    def csdf(x, y, z):
        s_rows, lanes = x.shape
        cx = jnp.clip((x - float(lo[0])) * float(scale[0]), 0.0, r - 1 - 1e-4)
        cy = jnp.clip((y - float(lo[1])) * float(scale[1]), 0.0, r - 1 - 1e-4)
        cz = jnp.clip((z - float(lo[2])) * float(scale[2]), 0.0, r - 1 - 1e-4)
        rows = []
        for s in range(s_rows):
            wx = _hat(cx[s : s + 1], r, lanes)
            wy = _hat(cy[s : s + 1], r, lanes)
            wz = _hat(cz[s : s + 1], r, lanes)
            v1 = jnp.zeros((r, lanes), jnp.float32)
            for k in range(nchunks):
                x0 = k * xc
                xn = min(xc, r - x0)
                # 4-sparse (x,y) weight plane for this x-range: exactly the
                # trilinear xy corner weights, zero elsewhere
                wxy = jnp.repeat(wx[x0 : x0 + xn], r, axis=0) * jnp.tile(
                    wy, (xn, 1)
                )
                tt = t2[:, x0 * r : (x0 + xn) * r]
                if bf16:
                    wxy = wxy.astype(jnp.bfloat16)
                v1 = v1 + jnp.dot(
                    tt, wxy,
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            rows.append(jnp.sum(v1 * wz, axis=0, keepdims=True))
        interior = jnp.concatenate(rows, axis=0) if s_rows > 1 else rows[0]

        ox = jnp.maximum(jnp.maximum(float(lo[0]) - x, x - float(hi[0])), 0.0)
        oy = jnp.maximum(jnp.maximum(float(lo[1]) - y, y - float(hi[1])), 0.0)
        oz = jnp.maximum(jnp.maximum(float(lo[2]) - z, z - float(hi[2])), 0.0)
        sq = ox * ox + oy * oy + oz * oz
        outside = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
        return _outside_step(interior, outside) - margin

    return csdf


def _contraction_kernel(r, lo, hi, config, budget, bf16, margin, chunk):
    def kernel(
        table_ref,
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        cone_ref,
        act_ref, depth0_ref, steps0_ref, outcome0_ref,
        depth_ref, steps_ref, outcome_ref,
    ):
        csdf = make_contraction_csdf(
            table_ref[:], r, lo, hi, bf16=bf16, margin=margin
        )
        depth, steps, outcome, _ = _march(
            csdf, config,
            (ox_ref[:], oy_ref[:], oz_ref[:]),
            (dx_ref[:], dy_ref[:], dz_ref[:]),
            cone_ref[:],
            act_ref[:] > 0, depth0_ref[:], steps0_ref[:], budget,
            chunk=chunk, outcome0=outcome0_ref[:],
        )
        depth_ref[:] = depth
        steps_ref[:] = steps
        outcome_ref[:] = outcome

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "r", "lo", "hi", "config", "budget", "bf16", "margin", "chunk",
        "interpret",
    ),
)
def grid_trace_contraction_pallas(
    t2, r: int, lo, hi,
    ox, oy, oz, dx, dy, dz, cone,
    active0, depth0, steps0, outcome0,
    config: MarchConfig = MarchConfig(),
    budget: int = 10**9,
    bf16: bool = False,
    margin: float = 0.0,
    chunk: int = 8,
    interpret: bool = False,
):
    """One contraction-march level over ``(m4, 512)`` ray planes (the
    ``(m, 128)`` swizzled planes reshaped 4-rows-into-lanes). Resume-capable:
    ``active0/depth0/steps0/outcome0`` carry the previous level's state."""
    m4, lanes = cone.shape
    if lanes != _C_LANES or m4 % _C_ROWS:
        raise ValueError(
            f"contraction planes must be (8k, {_C_LANES}); got {cone.shape}"
        )
    f32 = jax.ShapeDtypeStruct((m4, lanes), jnp.float32)
    i32 = jax.ShapeDtypeStruct((m4, lanes), jnp.int32)
    table_spec = pl.BlockSpec(
        t2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    spec = pl.BlockSpec(
        (_C_ROWS, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _contraction_kernel(r, lo, hi, config, budget, bf16, margin, chunk),
        grid=(m4 // _C_ROWS,),
        in_specs=[table_spec] + [spec] * 11,
        out_specs=[spec] * 3,
        out_shape=[f32, i32, i32],
        interpret=interpret,
    )(t2, ox, oy, oz, dx, dy, dz, cone, active0, depth0, steps0, outcome0)


def _table2(values) -> np.ndarray:
    """``(R,R,R)`` C-order grid -> ``(R, R^2)`` contraction layout
    ``t2[z, x*R+y]``.

    HOST-side numpy on purpose: eager device ops here (``.T``,
    ``.astype``) each cost a 20-240 s remote compile on this backend
    (round-5 measurement — a mip build took 429 s before this fix). The
    table uploads as a jit operand at the first kernel call instead."""
    v = np.asarray(values)
    r = v.shape[0]
    return np.ascontiguousarray(v.reshape(r * r, r).T)


def make_contraction_levels(grid, mid_resolution: int = MAX_VMEM_RESOLUTION):
    """Build the contraction march ladder for ``grid``: a list of
    ``(t2, r, lo, hi, bf16, margin, exact)`` levels, coarse to fine.

    - a 32^3 min-pooled lower-bound mip in bf16 (+ sound rounding margin);
    - then the exact table (f32, ``Precision.HIGHEST``, margin 0) when
      ``R <= mid_resolution``, else a ``mid_resolution`` lower-bound mip —
      the caller finishes >64^3 grids on the fine table via XLA gathers.

    Mip pooling is host-side numpy (one-time per bake) — cache the result.
    """
    from bsdmg_tpu.models.mesh_sdf import coarsen_grid_lower

    r = grid.resolution
    levels = []

    def bf16_level(g):
        maxv = float(np.abs(np.asarray(g.values)).max())
        return (
            _table2(g.values).astype(jnp.bfloat16), g.resolution,
            g.lo, g.hi, True, _BF16_MARGIN * maxv, False,
        )

    if r > 32:
        levels.append(bf16_level(coarsen_grid_lower(grid, 32)))
    if r <= mid_resolution:
        levels.append((_table2(grid.values), r, grid.lo, grid.hi,
                       False, 0.0, True))
    else:
        levels.append(bf16_level(coarsen_grid_lower(grid, mid_resolution)))
    return levels


def grid_trace_contraction(
    grid,
    o_s, d_s, cone_s,
    config: MarchConfig = MarchConfig(),
    levels=None,
    interpret: bool = False,
    finish_cap: float = 0.375,
):
    """Sphere-trace ``(m, 128)`` swizzled ray planes against a baked grid
    SDF with the gather-free contraction ladder (any resolution). Grids
    ``> MAX_VMEM_RESOLUTION`` finish on the fine table via XLA gathers —
    run on rays COMPACTED to the resumed set first: XLA TPU gathers cost
    per gathered element (~8 ns — measured round 5; a windowed (2,2,2)
    gather is 37x WORSE, not better), so marching full planes pays for
    every sky pixel at every fine step. ``finish_cap`` bounds the
    compacted set as a fraction of all rays; rays past the cap (a >37.5%
    near-surface view — closer than the SoA fallback handles either) stay
    STEP_LIMIT rather than silently wrong, and render_image_grid logs
    when that happens.

    Returns ``(depth, steps, outcome)`` planes shaped like ``cone_s``."""
    from bsdmg_tpu.models.mesh_sdf import grid_csdf
    from bsdmg_tpu.ops.pallas.render_kernel import (
        COLLISION, DEPTH_LIMIT, STEP_LIMIT,
    )

    if levels is None:
        levels = make_contraction_levels(grid)
    m, L = cone_s.shape
    mp = -(-m // (4 * _C_ROWS)) * (4 * _C_ROWS)  # pad to whole (8,512) blocks

    def to4(x, fill=0.0):
        x = jnp.asarray(x)
        if mp != m:
            pad = jnp.full((mp - m, L), fill, x.dtype)
            x = jnp.concatenate([x, pad], axis=0)
        return x.reshape(mp // 4, _C_LANES)

    ox, oy, oz = (to4(o_s[..., i]) for i in range(3))
    dx, dy, dz = (to4(d_s[..., i]) for i in range(3))
    cone = to4(cone_s, 1.0)
    valid = to4(jnp.ones((m, L), jnp.int32), 0)

    active = valid
    depth = jnp.zeros_like(cone)
    steps = jnp.zeros_like(valid)
    outcome = jnp.full_like(valid, DEPTH_LIMIT)
    for t2, r, lo, hi, bf16, margin, _exact in levels:
        depth, steps, outcome = grid_trace_contraction_pallas(
            t2, r, tuple(lo), tuple(hi),
            ox, oy, oz, dx, dy, dz, cone,
            active, depth, steps, outcome,
            config=config, budget=config.step_limit,
            bf16=bf16, margin=margin, interpret=interpret,
        )
        # hand stalled rays to the next level: COLLISION stalled a sound
        # margin short of the next surface; STEP_LIMIT may still collide
        # under finer steps, so it resumes with a fresh budget (same
        # semantics as grid_trace_hybrid)
        resume = (outcome == COLLISION) | (outcome == STEP_LIMIT)
        active = (resume & (valid > 0)).astype(jnp.int32)
        steps = jnp.where(outcome == STEP_LIMIT, 0, steps)

    back = lambda x: x.reshape(mp, L)[:m]
    depth, steps, outcome = back(depth), back(steps), back(outcome)
    active2 = back(active) > 0

    exact = levels[-1][6]
    if exact:
        # the last in-kernel level IS the fine table: outcomes are final
        return depth, steps, outcome

    # ---- compacted XLA fine finish, in shrinking-cap rounds ----
    # Measured distribution (refscene 128^3 bake, 512^2 real view): 17% of
    # rays resume; fine steps p50=9, p90=26, p99=54, max=225. A single
    # compacted march would pay max-steps x full-cap gather width (the
    # while-loop runs to the LAST ray); rounds re-compact the surviving
    # tail so late steps run at 1/16 the width.
    fine = grid_csdf(grid)
    total = m * L
    active_flat = active2.reshape(-1)
    lim = config.step_limit
    rounds = (
        (finish_cap, lim // 4),
        (finish_cap / 4.0, lim // 2),
        (finish_cap / 16.0, lim),
    )
    for frac, budget in rounds:
        cap_rows = max(
            TILE_S, -(-int(total * frac) // (TILE_S * TILE_L)) * TILE_S
        )
        cap = min(cap_rows * TILE_L, total)
        n_res = jnp.sum(active_flat.astype(jnp.int32))
        # fill_value=total -> sentinel reads / dropped writes for dead rows
        idx = jnp.nonzero(active_flat, size=cap, fill_value=total)[0]
        live = (jnp.arange(cap) < n_res).reshape(-1, TILE_L)

        def take(x, fill):
            fx = x.reshape(-1)
            fx = jnp.concatenate([fx, jnp.full((1,), fill, fx.dtype)])
            return fx[idx].reshape(-1, TILE_L)

        d2, s2, oc2, unresolved = _march(
            fine, config,
            tuple(take(o_s[..., a], 0.0) for a in range(3)),
            tuple(take(d_s[..., a], 1.0) for a in range(3)),
            take(cone_s, 1.0),
            live, take(depth, 0.0), take(steps, jnp.int32(0)),
            budget, outcome0=take(outcome, jnp.int32(DEPTH_LIMIT)),
        )

        def put(full, vals):
            return (
                full.reshape(-1).at[idx].set(vals.reshape(-1), mode="drop")
                .reshape(full.shape)
            )

        depth, steps = put(depth, d2), put(steps, s2)
        outcome = put(outcome, oc2)
        # next round: rays this round left unresolved (budget hit), plus
        # resumed rays the cap dropped (idx never serviced them)
        serviced = (
            jnp.zeros((total,), bool).at[idx].set(True, mode="drop")
        )
        carried = (
            jnp.zeros((total,), bool)
            .at[idx].set((unresolved & live).reshape(-1), mode="drop")
        )
        active_flat = carried | (active_flat & ~serviced)
    # anything still active after the last full-budget round was dropped by
    # every cap: mark STEP_LIMIT (honest "unresolved"), never a phantom
    # mip-level COLLISION
    outcome = jnp.where(
        active_flat.reshape(outcome.shape), STEP_LIMIT, outcome
    )
    return depth, steps, outcome


_PROBE_CACHE: dict = {}


def probe_grid_backend() -> str | None:
    """Compile-probe the contraction kernel on the current backend.

    Returns ``"contraction"`` when the tiny probe kernel Mosaic-compiles and
    executes (the production TPU path), else ``None`` — callers must fall
    back to the SoA XLA march. Non-TPU backends return ``None`` outright:
    there the plain XLA path is both correct and faster than interpret-mode
    Pallas. Result is cached per backend (first probe costs one small
    compile, ~seconds)."""
    backend = jax.default_backend()
    if backend in _PROBE_CACHE:
        return _PROBE_CACHE[backend]
    mode = None
    if backend == "tpu":
        try:
            r = 8
            t2 = jnp.ones((r, r * r), jnp.float32)
            z = jnp.zeros((_C_ROWS, _C_LANES), jnp.float32)
            i = jnp.ones((_C_ROWS, _C_LANES), jnp.int32)
            out = grid_trace_contraction_pallas(
                t2, r, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                z, z, z, z, z, z + 1.0, z + 0.01,
                i, z, i * 0, i * 0,
                budget=2, chunk=2,
            )
            jax.block_until_ready(out)
            float(out[0][0, 0])  # hard sync (block_until_ready is unreliable
            # on this backend — CLAUDE.md timing note)
            mode = "contraction"
        except Exception:
            mode = None
    _PROBE_CACHE[backend] = mode
    return mode


def shade_grid_planes_contraction(
    grid, o_s, d_s, cone_s,
    config: MarchConfig = MarchConfig(),
    levels=None,
    interpret: bool = False,
):
    """Per-plane mesh-asset shading: contraction-ladder trace + compacted
    fd4 normals + the reference shade, on ``(m, 128)`` swizzled planes.
    Returns ``(r, g, b)`` planes. Shared by :func:`render_image_grid` and
    the multi-device ``parallel.sharding.render_grid_sharded`` (everything
    here is shard-local: the compactions, the ladder, the finish)."""
    from bsdmg_tpu.models.mesh_sdf import grid_csdf
    from bsdmg_tpu.ops.pallas.render_kernel import COLLISION, _fd_normal
    from bsdmg_tpu.ops.shade import shade_planes

    depth, _, outcome = grid_trace_contraction(
        grid, o_s, d_s, cone_s, config, levels, interpret
    )
    fine = grid_csdf(grid)
    px = o_s[..., 0] + depth * d_s[..., 0]
    py = o_s[..., 1] + depth * d_s[..., 1]
    pz = o_s[..., 2] + depth * d_s[..., 2]
    # fd4 normals = 12 more gather evals; on the per-element-cost XLA
    # gather path that is ~200 ms of sky pixels at 512^2. Normals only
    # matter for COLLISION rays -> compact those (same pattern as the
    # fine finish), with a full-plane lax.cond fallback so close-up
    # views (more hits than the cap) stay exact instead of degrading.
    mrow, L = px.shape
    total = mrow * L
    cap = max(
        TILE_S, (-(-int(total * 0.375) // (TILE_S * TILE_L))) * TILE_S
    ) * TILE_L
    cap = min(cap, total)
    hit = outcome == COLLISION
    n_hit = jnp.sum(hit.astype(jnp.int32))

    def compacted(_):
        idx = jnp.nonzero(hit.reshape(-1), size=cap, fill_value=total)[0]

        def take(x):
            fx = jnp.concatenate([x.reshape(-1), jnp.zeros((1,), x.dtype)])
            return fx[idx].reshape(-1, TILE_L)

        nxc, nyc, nzc = _fd_normal(
            fine, take(px), take(py), take(pz), config.normal_epsilon
        )

        def put(vals):
            return (
                jnp.zeros((total,), vals.dtype)
                .at[idx].set(vals.reshape(-1), mode="drop")
                .reshape(px.shape)
            )

        return put(nxc), put(nyc), put(nzc)

    def full(_):
        return _fd_normal(fine, px, py, pz, config.normal_epsilon)

    nx, ny, nz = jax.lax.cond(n_hit <= cap, compacted, full, None)
    return shade_planes(nx, ny, nz, outcome)


def render_image_grid(
    grid,
    origins, directions, cone_radius,
    config: MarchConfig = MarchConfig(),
    coarse_resolution: int = MAX_VMEM_RESOLUTION,
    interpret: bool = False,
    coarse=None,
    mode: str = "gather",
    levels=None,
):
    """Full render of a grid-SDF (mesh-asset) scene: swizzled Pallas march
    (``mode="contraction"`` — the production TPU backend — or
    ``mode="gather"`` — the interpret/CPU oracle) + XLA fine finish for
    >64^3 grids + fd4 normals and the reference shade. Any grid resolution.
    Returns linear RGB (H, W, 3).

    Semantics note: a multi-level march's step *history* differs from a
    start-to-end fine march (coarse steps are conservative), so accepted hit
    depths can differ from the pure-XLA path within a few collision epsilons
    near silhouettes — the mesh surface is itself a bake-resolution
    approximation (validated within tolerance in tests/test_mesh_sdf.py).
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
    if mode == "contraction":
        r, g, b = shade_grid_planes_contraction(
            grid, o_s, d_s, cone_s, config, levels, interpret
        )
    else:
        depth, _, outcome = grid_trace_hybrid(
            grid, o_s, d_s, cone_s, config, coarse_resolution, interpret,
            coarse,
        )
        fine = grid_csdf(grid)
        px = o_s[..., 0] + depth * d_s[..., 0]
        py = o_s[..., 1] + depth * d_s[..., 1]
        pz = o_s[..., 2] + depth * d_s[..., 2]
        nx, ny, nz = _fd_normal(fine, px, py, pz, config.normal_epsilon)
        r, g, b = shade_planes(nx, ny, nz, outcome)
    r, g, b = (_unswizzle(x[:m], hp, wp) for x in (r, g, b))
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)
