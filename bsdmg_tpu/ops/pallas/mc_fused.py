"""Fully fused marching-cubes Pallas kernel.

Round-3 redesign of the MC hot path. The round-2 pipeline ran five XLA
stages around a projection-only kernel (corner evals -> table gather ->
edge compaction -> Pallas Newton -> slot pick -> winding -> assembly) and
measured ~21-29 Mvoxels/s: every stage boundary materialized ~(N, 12) or
(N, 5, 3, 3) planes to HBM, and the 200+ tiny ``where`` selects of the
XLA-side compaction cost more than the kernel time they saved.

This kernel fuses everything per (BLOCK_ROWS, 128) voxel tile, entirely
in registers/VMEM:

1. unpack crossing bits + triangle-slot edge ids (4-bit nibbles packed in
   two int32 planes by the XLA pre-pass — no per-lane table gather here),
2. rank-compact the <= 12 crossing edges into ``edge_budget`` lanes
   (pure vreg selects — free next to the Newton work they halve),
3. Newton-project all compacted planes **interleaved in one chunked
   while loop** (independent chains keep the VPU pipeline fed; per-tile
   early exit as in mesh_kernel.py), start points at edge midpoints
   (reference semantics, cuda/includes/marching_cubes.cu:14),
4. fd4 normals at the projected points (signed_distance.cu:181-202),
5. per-slot pick through the compaction rank (selects, no gather),
6. winding fix by the vertex-mean normal test with in-kernel vertex swap
   (compute_mesh_generation.cu:103-113); ambiguous triangles (vertex
   normals nearly cancel) are exported via ``dot``/``amb`` planes and
   re-resolved by the wrapper with the reference's centroid stencil
   behind a rare-path ``lax.cond``.

Only the 8-corner classify and the 256-case table lookup stay in XLA —
they are cheap and the table gather is per-voxel, not per-edge.

The XLA path in ops/marching_cubes.py remains the oracle; parity is
asserted in tests/test_mesh.py (interpret mode, CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsdmg_tpu.ops.tables import MC_EDGE_MIDPOINTS

_TILE_L = 128
_BLOCK_ROWS = 8
_CHUNK = 2  # Newton steps between cross-lane any-active reductions


def _value_and_grad_vjp(csdf, x, y, z):
    sd, vjp_fn = jax.vjp(csdf, x, y, z)
    gx, gy, gz = vjp_fn(jnp.ones_like(sd))
    return sd, gx, gy, gz


def _grad_fd4(csdf, x, y, z, eps):
    def deriv(fp2, fp1, fm1, fm2):
        return -fp2 + 8.0 * fp1 - 8.0 * fm1 + fm2

    gx = deriv(
        csdf(x + 2 * eps, y, z), csdf(x + eps, y, z),
        csdf(x - eps, y, z), csdf(x - 2 * eps, y, z),
    )
    gy = deriv(
        csdf(x, y + 2 * eps, z), csdf(x, y + eps, z),
        csdf(x, y - eps, z), csdf(x, y - 2 * eps, z),
    )
    gz = deriv(
        csdf(x, y, z + 2 * eps), csdf(x, y, z + eps),
        csdf(x, y, z - eps), csdf(x, y, z - 2 * eps),
    )
    return gx, gy, gz


def _mc_kernel(csdf, budget: int, iters: int, tol: float, eps: float,
               use_grad: bool, winding: str):
    mids = [tuple(float(v) for v in MC_EDGE_MIDPOINTS[e]) for e in range(12)]

    def kernel(vs_ref, lx_ref, ly_ref, lz_ref, cross_ref, t0_ref, t1_ref,
               pos_ref, nrm_ref, dot_ref, amb_ref, meta_ref):
        vs = vs_ref[0]
        lx, ly, lz = lx_ref[:], ly_ref[:], lz_ref[:]
        cross = cross_ref[:]

        # --- unpack crossing bits; exclusive rank per edge ---------------
        act = [(cross >> e) & 1 for e in range(12)]  # int32 0/1 planes
        rank = []
        run = jnp.zeros_like(cross)
        for e in range(12):
            rank.append(run)
            run = run + act[e]

        # --- compact: pack each voxel's crossing edges into the first
        # `budget` lanes; start points at the reference's edge midpoints --
        cxs, cys, czs, todo0 = [], [], [], []
        for j in range(budget):
            ox = jnp.zeros_like(lx)
            oy = jnp.zeros_like(lx)
            oz = jnp.zeros_like(lx)
            here = jnp.zeros_like(cross)
            for e in range(12):
                m = (act[e] > 0) & (rank[e] == j)
                ox = jnp.where(m, mids[e][0], ox)
                oy = jnp.where(m, mids[e][1], oy)
                oz = jnp.where(m, mids[e][2], oz)
                here = jnp.where(m, 1, here)
            # inactive lanes park far away (1e6), matching mesh_kernel prep
            cxs.append(jnp.where(here > 0, lx + vs * ox, 1e6))
            cys.append(jnp.where(here > 0, ly + vs * oy, 1e6))
            czs.append(jnp.where(here > 0, lz + vs * oz, 1e6))
            todo0.append(here)

        if use_grad:
            val_grad = functools.partial(_value_and_grad_vjp, csdf)
        else:
            def val_grad(a, b, c):
                return (csdf(a, b, c), *_grad_fd4(csdf, a, b, c, eps))

        # --- Newton: all compacted planes interleaved in ONE loop --------
        def step(_, carry):
            xs, ys, zs, todos, i = carry
            nx, ny, nz, nt = [], [], [], []
            for j in range(budget):
                live = (todos[j] > 0) & (i < iters)
                sd, gx, gy, gz = val_grad(xs[j], ys[j], zs[j])
                inv = jax.lax.rsqrt(
                    jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-24)
                )
                nx.append(jnp.where(live, xs[j] - sd * gx * inv, xs[j]))
                ny.append(jnp.where(live, ys[j] - sd * gy * inv, ys[j]))
                nz.append(jnp.where(live, zs[j] - sd * gz * inv, zs[j]))
                nt.append((live & (jnp.abs(sd) > tol)).astype(jnp.int32))
            return tuple(nx), tuple(ny), tuple(nz), tuple(nt), i + 1

        def cond(carry):
            state, n_todo = carry
            return (n_todo > 0) & (state[4] < iters)

        def body(carry):
            state = jax.lax.fori_loop(0, _CHUNK, step, carry[0])
            return state, sum(jnp.sum(t) for t in state[3])

        state0 = (tuple(cxs), tuple(cys), tuple(czs), tuple(todo0),
                  jnp.int32(0))
        (pxs, pys, pzs, _, _), _ = jax.lax.while_loop(
            cond, body, (state0, sum(jnp.sum(t) for t in todo0))
        )

        # --- exported fd4 unit normals at the projected points -----------
        nxs, nys, nzs = [], [], []
        for j in range(budget):
            gx, gy, gz = _grad_fd4(csdf, pxs[j], pys[j], pzs[j], eps)
            inv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz,
                                            1e-24))
            nxs.append(gx * inv)
            nys.append(gy * inv)
            nzs.append(gz * inv)

        # --- per-slot pick through the rank (selects, no gather) ---------
        t0, t1 = t0_ref[:], t1_ref[:]
        svx, svy, svz, snx, sny, snz, svalid = [], [], [], [], [], [], []
        for s in range(15):
            nib = ((t0 >> (4 * s)) if s < 8 else (t1 >> (4 * (s - 8)))) & 15
            ok = nib < 12
            rsel = jnp.zeros_like(nib)
            for e in range(12):
                rsel = jnp.where(nib == e, rank[e], rsel)
            rsel = jnp.where(ok, rsel, budget)  # invalid -> no lane match
            vx = jnp.zeros_like(lx)
            vy = jnp.zeros_like(lx)
            vz = jnp.zeros_like(lx)
            nx = jnp.zeros_like(lx)
            ny = jnp.zeros_like(lx)
            nz = jnp.zeros_like(lx)
            for j in range(budget):
                m = rsel == j
                vx = jnp.where(m, pxs[j], vx)
                vy = jnp.where(m, pys[j], vy)
                vz = jnp.where(m, pzs[j], vz)
                nx = jnp.where(m, nxs[j], nx)
                ny = jnp.where(m, nys[j], ny)
                nz = jnp.where(m, nzs[j], nz)
            svx.append(vx); svy.append(vy); svz.append(vz)
            snx.append(nx); sny.append(ny); snz.append(nz)
            svalid.append(ok & (rsel < budget))  # beyond-budget = overflow

        # --- validity/overflow meta plane: bit t (0-4) = triangle t valid,
        # bits 5+ = beyond-budget crossing-edge count. Computed here (the
        # rank already lives in registers) so the XLA wrapper never re-runs
        # the cumsum/12-way-select bookkeeping — that XLA block alone cost
        # ~1.5 ms at 66k voxels, ~10x the whole kernel.
        meta = jnp.maximum(run - budget, 0) << 5

        # --- winding + in-kernel swap (compute_mesh_generation.cu:103) ---
        for t in range(5):
            a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
            tri_ok = svalid[a] & svalid[b] & svalid[c]
            meta = meta | (tri_ok.astype(jnp.int32) << t)
            e1x = svx[b] - svx[a]; e1y = svy[b] - svy[a]; e1z = svz[b] - svz[a]
            e2x = svx[c] - svx[a]; e2y = svy[c] - svy[a]; e2z = svz[c] - svz[a]
            gx = e1y * e2z - e1z * e2y
            gy = e1z * e2x - e1x * e2z
            gz = e1x * e2y - e1y * e2x
            if winding == "vertex_mean":
                ax = snx[a] + snx[b] + snx[c]
                ay = sny[a] + sny[b] + sny[c]
                az = snz[a] + snz[b] + snz[c]
                dot = gx * ax + gy * ay + gz * az
                g2 = gx * gx + gy * gy + gz * gz
                a2 = ax * ax + ay * ay + az * az
                amb = (dot * dot <= 1e-4 * g2 * a2) & tri_ok
            else:  # centroid_fd4: the reference's exact estimator
                mx = (svx[a] + svx[b] + svx[c]) / 3.0
                my = (svy[a] + svy[b] + svy[c]) / 3.0
                mz = (svz[a] + svz[b] + svz[c]) / 3.0
                ax, ay, az = _grad_fd4(csdf, mx, my, mz, eps)
                dot = gx * ax + gy * ay + gz * az
                amb = jnp.zeros_like(tri_ok)
            flip = dot <= 0.0
            zero = jnp.zeros_like(lx)
            for (vs_, ns_) in ((svx, snx), (svy, sny), (svz, snz)):
                va = jnp.where(tri_ok, jnp.where(flip, vs_[c], vs_[a]), zero)
                vc = jnp.where(tri_ok, jnp.where(flip, vs_[a], vs_[c]), zero)
                vb = jnp.where(tri_ok, vs_[b], zero)
                na = jnp.where(tri_ok, jnp.where(flip, ns_[c], ns_[a]), zero)
                nc = jnp.where(tri_ok, jnp.where(flip, ns_[a], ns_[c]), zero)
                nb = jnp.where(tri_ok, ns_[b], zero)
                vs_[a], vs_[b], vs_[c] = va, vb, vc
                ns_[a], ns_[b], ns_[c] = na, nb, nc
            dot_ref[t] = dot
            amb_ref[t] = amb.astype(jnp.int32)
        meta_ref[0] = meta

        # output layout: plane p = slot s * 3 + coord -> (45, BR, L)
        for s in range(15):
            for ci, (v, nn) in enumerate(
                ((svx[s], snx[s]), (svy[s], sny[s]), (svz[s], snz[s]))
            ):
                pos_ref[3 * s + ci] = v
                nrm_ref[3 * s + ci] = nn

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "budget", "iters", "tol", "eps", "use_grad", "winding",
        "interpret", "block_rows",
    ),
)
def mc_fused_pallas(
    csdf, lx, ly, lz, cross_bits, t0, t1, voxel_size, *,
    budget: int, iters: int, tol: float, eps: float, use_grad: bool = True,
    winding: str = "vertex_mean", interpret: bool = False,
    block_rows: int = _BLOCK_ROWS,
):
    """Run the fused MC kernel on flat per-voxel planes.

    Args:
      csdf: baked component SDF (static; scalar constants only).
      lx, ly, lz: ``(N,)`` voxel lower corners (SoA planes).
      cross_bits: ``(N,)`` int32, bit e = edge e sign-crossing.
      t0, t1: ``(N,)`` int32 packed 4-bit triangle-slot edge ids
        (slots 0-7 / 8-14; 15 = invalid slot).
      voxel_size: traced scalar (SMEM).

    Returns ``(pos, nrm, dot, amb, meta)``: ``(45, N)`` swapped vertex
    coordinate and normal planes (plane ``3*s + c``), ``(5, N)`` winding dots
    and ambiguity flags for the wrapper's rare-path centroid re-resolve, and
    an ``(N,)`` int32 meta plane — bits 0-4 triangle validity, bits 5+ the
    voxel's beyond-budget crossing-edge count (``edge_overflow`` source).
    """
    n = lx.shape[0]
    rows = -(-n // (block_rows * _TILE_L)) * block_rows
    npad = rows * _TILE_L

    def prep(v, fill):
        flat = jnp.concatenate([v, jnp.full((npad - n,), fill, v.dtype)])
        return flat.reshape(rows, _TILE_L)

    inv_nib = jnp.int32(-1)  # all nibbles = 15 -> every slot invalid
    args = (
        prep(lx, 1e6), prep(ly, 1e6), prep(lz, 1e6),
        prep(cross_bits, 0), prep(t0, inv_nib), prep(t1, inv_nib),
    )
    spec = pl.BlockSpec(
        (block_rows, _TILE_L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def lead_spec(k):
        return pl.BlockSpec(
            (k, block_rows, _TILE_L), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )

    out_shape = [
        jax.ShapeDtypeStruct((45, rows, _TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((45, rows, _TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((5, rows, _TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((5, rows, _TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((1, rows, _TILE_L), jnp.int32),
    ]
    pos, nrm, dot, amb, meta = pl.pallas_call(
        _mc_kernel(csdf, budget, iters, tol, eps, use_grad, winding),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=[lead_spec(45), lead_spec(45), lead_spec(5), lead_spec(5),
                   lead_spec(1)],
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(voxel_size, jnp.float32).reshape(1), *args)
    return (
        pos.reshape(45, npad)[:, :n],
        nrm.reshape(45, npad)[:, :n],
        dot.reshape(5, npad)[:, :n],
        amb.reshape(5, npad)[:, :n],
        meta.reshape(npad)[:n],
    )
