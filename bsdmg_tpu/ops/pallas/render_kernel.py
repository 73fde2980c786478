"""Fused Pallas render path: slab cull -> tiled march -> in-kernel shade.

Default (single-phase) pipeline — ONE kernel per frame:

1. **Slab cull.** Collisions satisfy ``f <= cone*t + eps`` and can only
   happen at ``t <= T* = (|o-c| + r)/(1 - cone)``, so a per-ray slab test
   against the scene box inflated by ``cone*T*`` retires sky rays instantly
   and its exit depth is a sound per-ray *stop* (no marching empty space
   out to the depth limit). Tiles whose rays all miss the *near* component's
   inflated slab march a cheaper far-only scene (``compile_scene_split``).
2. **Tiled march.** 32x32 spatial pixel blocks (the warp-swizzle analogue)
   stream through (32, 128) Pallas blocks — 4 independent vregs per plane
   keep the VPU pipeline fed — under a per-tile chunked ``while_loop``.
3. **In-kernel shade.** fd4 normals (12 SDF evals, skipped for
   collision-free tiles via ``@pl.when``), Lambert mix, ACES — fused into
   the march kernel, so ray planes never round-trip HBM.

An opt-in two-phase mode caps phase A's steps and re-marches the compacted
active tail in a second kernel (per-*ray* instead of per-*tile* worst case);
measurements show the gather/scatter overhead outweighs its savings on the
reference scene, so it is off by default but available for scenes with
pathological silhouettes.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.ops.shade import _ACES_M1, _ACES_M2
from bsdmg_tpu.ops.trace import COLLISION, DEPTH_LIMIT, STEP_LIMIT, RayMarchHit

TILE_S = 8  # sublanes (f32 native)
TILE_L = 128  # lanes

def _pad2(a: jax.Array, h: int, w: int, value) -> jax.Array:
    ph, pw = h - a.shape[0], w - a.shape[1]
    if ph == 0 and pw == 0:
        return a
    return jnp.pad(a, ((0, ph), (0, pw)), constant_values=value)


# ---------------------------------------------------------------------------
# shared march pieces
# ---------------------------------------------------------------------------


def _slab_enter(ox, oy, oz, dx, dy, dz, lo, hi, margin):
    """Per-ray slab test against [lo - margin, hi + margin]^3.

    Returns ``(miss, t_enter)`` planes (the reference's scalar helper:
    signed_distance.cu:142-175, unused by its kernels)."""

    def axis(o, d, lo_a, hi_a):
        d_safe = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
        inv = 1.0 / d_safe
        t1 = (lo_a - margin - o) * inv
        t2 = (hi_a + margin - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    nx, fx = axis(ox, dx, lo[0], hi[0])
    ny, fy = axis(oy, dy, lo[1], hi[1])
    nz, fz = axis(oz, dz, lo[2], hi[2])
    tmin = jnp.maximum(nx, jnp.maximum(ny, nz))
    tmax = jnp.minimum(fx, jnp.minimum(fy, fz))
    t_enter = jnp.maximum(tmin, 0.0)
    miss = tmax < t_enter
    return miss, t_enter, jnp.maximum(tmax, 0.0)


def _bb_parts(bb):
    """Split a static bounds tuple into ``(lo, hi, slack)``.

    ``scene_bounds``/``compile_scene_split`` emit 3-tuples whose last element
    is the scene-derived SDF under-estimation bound (smooth-min k/6 + eps);
    bare ``(lo, hi)`` tuples keep the legacy conservative 0.1."""
    if len(bb) > 2:
        return bb[0], bb[1], float(bb[2])
    return bb[0], bb[1], 0.1


def _slab_cull(ox, oy, oz, dx, dy, dz, lo, hi, cone, config: MarchConfig,
               slack: float = 0.1):
    """Tight conservative box cull: can this ray ever collide with a surface
    inside [lo, hi]^3?

    A collision at ray parameter t needs ``f <= cone*t + eps`` and
    ``f >= |p(t) - c| - r - slack >= t - D - r - slack`` (c box center, r its
    half-diagonal, D = |origin - c|), so every collision has
    ``t <= T* = (D + r + slack + eps) / (1 - cone)`` and the colliding ray
    must pierce the box inflated by ``cone*T* + eps + slack``. At the
    reference operating point T* ~ 11 vs depth limit 500 — a 40x tighter
    inflation (~0.012 vs 0.5), recovering the band of tiles around every
    silhouette that used to march only because of margin slop. The returned
    ``t_exit`` is therefore also a sound per-ray *stop* depth: beyond it no
    collision is possible at any t. ``slack`` absorbs SDF under-estimation
    (smooth-min k/6) and must be >= the scene's actual undershoot — pass the
    value carried by ``scene_bounds``' 3-tuple (see :func:`_bb_parts`) rather
    than relying on the 0.1 default, which is unsound for smooth_k > 0.6.
    """
    eps = config.collision_distance
    cx = (lo[0] + hi[0]) * 0.5
    cy = (lo[1] + hi[1]) * 0.5
    cz = (lo[2] + hi[2]) * 0.5
    r = 0.5 * float(
        np.sqrt(
            (hi[0] - lo[0]) ** 2 + (hi[1] - lo[1]) ** 2 + (hi[2] - lo[2]) ** 2
        )
    )
    ex, ey, ez = ox - cx, oy - cy, oz - cz
    reach = jnp.sqrt(ex * ex + ey * ey + ez * ez) + r + slack + eps
    t_star = jnp.where(
        cone < 0.5, reach / jnp.maximum(1.0 - cone, 0.5), config.depth_limit
    )
    margin = cone * jnp.minimum(t_star, config.depth_limit) + eps + slack
    miss, t_enter, t_exit = _slab_enter(ox, oy, oz, dx, dy, dz, lo, hi, margin)
    return miss, t_enter, t_exit


def _march(csdf, config: MarchConfig, o, d, cone, active0, depth0, steps0, budget,
           chunk: int = 8, omega: float = 1.0, t_stop=None,
           track_min: bool = False, outcome0=None):
    """March loop on planes. Returns (depth, steps, outcome, active).

    ``track_min=True`` additionally returns ``(min_margin, t_min)`` — the
    per-ray minimum of the cone margin ``f - cone*t`` over every sampled
    point and the depth where it occurred (1e9 / 0 for never-sampled rays).
    This is the closest-approach record that silhouette-aware gradients
    differentiate via the envelope theorem (grad/diff_render.py). Adds two
    loop-carried planes + one compare per step, so it is opt-in (the
    forward render kernel never pays for it). Exact stepping only.

    ``steps0`` carries prior progress (phase B resumes phase A's counter);
    ``budget`` caps total per-ray steps at ``min(budget, config.step_limit)``.

    The tile-wide any-active reduction for the ``while`` condition is paid
    once per ``chunk`` steps (a ``fori_loop`` inside the ``while``), trading
    at most ``chunk - 1`` wasted masked iterations per tile for ``chunk``-fold
    fewer cross-lane reduces.

    ``omega > 1`` enables over-relaxed sphere tracing (Keinert et al. 2014):
    steps are scaled by ``omega``; when consecutive safety spheres stop
    overlapping the ray rewinds to the safe position and relaxation is
    disabled for that ray, so the first-crossing guarantee is preserved.
    ``omega == 1`` is the exact reference semantics (ray_marching.cu:14-49).
    """
    eps = config.collision_distance
    step_cap = min(int(budget), config.step_limit)
    relax = float(omega) > 1.0
    ox, oy, oz = o
    dx, dy, dz = d
    # a ray past t_stop can never collide (the whole scene sits inside the
    # caller's slab, exited at t_stop) — declare DepthLimit right there
    # instead of sphere-tracing empty space out to depth 500 (same outcome
    # the reference reaches, ~10 steps later: ray_marching.cu:37-40)
    limit = config.depth_limit if t_stop is None else t_stop

    def sample(depth):
        # positions are derived from depth (2 fma/axis) instead of carried
        # (select + fma/axis) — fewer ops and 3 fewer loop-carried planes
        return csdf(ox + depth * dx, oy + depth * dy, oz + depth * dz)

    def finish(advance, depth, steps, outcome):
        over = advance & (depth > limit)
        outcome = jnp.where(over, DEPTH_LIMIT, outcome)
        survived = advance & ~over
        steps = jnp.where(survived, steps + 1, steps)
        active = survived & (steps < step_cap)
        return active, steps, outcome

    def step_exact(_, carry):
        depth, steps, outcome, active_i = carry
        active = active_i > 0
        cd = cone * depth
        dist = sample(depth)

        hit = active & (dist <= cd + eps)
        outcome = jnp.where(hit, COLLISION, outcome)

        advance = active & ~hit
        depth = jnp.where(advance, depth + dist - cd, depth)
        active, steps, outcome = finish(advance, depth, steps, outcome)
        return (depth, steps, outcome, active.astype(jnp.int32))

    def step_exact_track(_, carry):
        depth, steps, outcome, active_i, min_m, t_min = carry
        active = active_i > 0
        cd = cone * depth
        dist = sample(depth)

        m = dist - cd
        upd = active & (m < min_m)
        min_m = jnp.where(upd, m, min_m)
        t_min = jnp.where(upd, depth, t_min)

        hit = active & (dist <= cd + eps)
        outcome = jnp.where(hit, COLLISION, outcome)

        advance = active & ~hit
        depth = jnp.where(advance, depth + dist - cd, depth)
        active, steps, outcome = finish(advance, depth, steps, outcome)
        return (depth, steps, outcome, active.astype(jnp.int32), min_m, t_min)

    def step_relaxed(_, carry):
        depth, steps, outcome, active_i, prev_r, step_len, om = carry
        active = active_i > 0
        cd = cone * depth
        dist = sample(depth)
        r = dist - cd  # safe step (the cone-adjusted sphere radius)

        # consecutive safety spheres must overlap; otherwise rewind to the
        # safe position and drop to omega=1 for this ray
        fail = active & (step_len > jnp.abs(prev_r) + jnp.abs(r))
        depth = jnp.where(fail, depth - step_len + prev_r, depth)
        om = jnp.where(fail, 1.0, om)

        hit = active & ~fail & (dist <= cd + eps)
        outcome = jnp.where(hit, COLLISION, outcome)

        advance = active & ~hit
        new_step = jnp.where(fail, 0.0, om * r)
        depth = jnp.where(advance, depth + new_step, depth)
        prev_r = jnp.where(fail, prev_r, r)
        step_len = jnp.where(advance, new_step, step_len)

        active, steps, outcome = finish(advance, depth, steps, outcome)
        return (
            depth, steps, outcome, active.astype(jnp.int32),
            prev_r, step_len, om,
        )

    def cond(carry):
        return carry[-1] > 0

    if track_min and relax:
        raise NotImplementedError("track_min requires exact stepping (omega=1)")
    step_body = (
        step_relaxed if relax
        else step_exact_track if track_min
        else step_exact
    )

    def body(carry):
        state = jax.lax.fori_loop(0, chunk, step_body, carry[0])
        return (state, jnp.sum(state[3]))

    active0_i = active0.astype(jnp.int32)
    # inactive lanes keep their prior outcome when resuming (block-retire
    # phase B re-enters with a mix of finished and still-active lanes)
    prior = DEPTH_LIMIT if outcome0 is None else outcome0
    state0 = (
        depth0,
        steps0,
        jnp.where(active0, STEP_LIMIT, prior).astype(jnp.int32),
        active0_i,
    )
    if relax:
        state0 = state0 + (
            jnp.zeros_like(depth0),
            jnp.zeros_like(depth0),
            jnp.full_like(depth0, float(omega)),
        )
    elif track_min:
        state0 = state0 + (
            # 1e9 == grad/edge.py::UNTRACKED — the closest-approach sentinel
            jnp.full_like(depth0, 1e9),
            jnp.zeros_like(depth0),
        )
    state, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.sum(active0_i))
    )
    depth, steps, outcome, active_i = state[:4]
    # still-active rays (hit neither surface nor depth limit inside budget)
    unresolved = (active_i > 0) | (
        (outcome == STEP_LIMIT) & (steps >= step_cap) & (steps < config.step_limit)
    )
    if track_min:
        return depth, steps, outcome, unresolved, state[4], state[5]
    return depth, steps, outcome, unresolved


def _fd_normal(csdf, px, py, pz, eps: float):
    """4th-order FD normal on planes (12 evals; signed_distance.cu:181-202)."""

    def deriv(fp2, fp1, fm1, fm2):
        return -fp2 + 8.0 * fp1 - 8.0 * fm1 + fm2

    gx = deriv(
        csdf(px + 2 * eps, py, pz), csdf(px + eps, py, pz),
        csdf(px - eps, py, pz), csdf(px - 2 * eps, py, pz),
    )
    gy = deriv(
        csdf(px, py + 2 * eps, pz), csdf(px, py + eps, pz),
        csdf(px, py - eps, pz), csdf(px, py - 2 * eps, pz),
    )
    gz = deriv(
        csdf(px, py, pz + 2 * eps), csdf(px, py, pz + eps),
        csdf(px, py, pz - eps), csdf(px, py, pz - 2 * eps),
    )
    inv = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-24))
    return gx * inv, gy * inv, gz * inv


def _aces_plane(r, g, b):
    def mat(m, x, y, z):
        return (
            m[0][0] * x + m[0][1] * y + m[0][2] * z,
            m[1][0] * x + m[1][1] * y + m[1][2] * z,
            m[2][0] * x + m[2][1] * y + m[2][2] * z,
        )

    vr, vg, vb = mat(_ACES_M1, r, g, b)

    def curve(v):
        a = v * (v + 0.0245786) - 0.000090537
        bb = v * (0.983729 * v + 0.4329510) + 0.238081
        return a / bb

    rr, gg, bb = mat(_ACES_M2, curve(vr), curve(vg), curve(vb))
    clip = lambda v: jnp.clip(v, 0.0, 1.0)
    return clip(rr), clip(gg), clip(bb)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _trace_kernel(csdf, config: MarchConfig, bb, use_bb_skip: bool, budget: int,
                  omega: float = 1.0, split=None, shade: bool = False):
    def kernel(
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        cone_ref, depth0_ref, steps0_ref, outcome0_ref, active0_ref,
        depth_ref, steps_ref, outcome_ref, active_ref,
        *shade_refs,
    ):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        cone = cone_ref[:]

        active0 = active0_ref[:] > 0
        depth0 = depth0_ref[:]
        steps0 = steps0_ref[:]
        outcome0 = outcome0_ref[:]

        t_stop = None
        if use_bb_skip and bb is not None:
            lo, hi, slack = _bb_parts(bb)
            miss, _, t_exit = _slab_cull(
                ox, oy, oz, dx, dy, dz, lo, hi, cone, config, slack
            )
            skip = active0 & miss
            active0 = active0 & ~miss
            # NOTE: no fast-forward to t_enter — the reference marches from
            # t=0 (ray_marching.cu:14) and a different start lands the hit
            # elsewhere inside the cone acceptance window, breaking
            # pixel-exact parity with the no-skip path for a handful of
            # approach steps saved.
            depth0 = jnp.where(skip, config.depth_limit * 1.01, depth0)
            t_stop = jnp.minimum(t_exit, config.depth_limit)

        def run(scene_fn):
            depth, steps, outcome, unresolved = _march(
                scene_fn, config, (ox, oy, oz), (dx, dy, dz), cone,
                active0, depth0, steps0, budget, omega=omega, t_stop=t_stop,
                outcome0=outcome0,
            )
            depth_ref[:] = depth
            steps_ref[:] = steps
            outcome_ref[:] = outcome
            active_ref[:] = unresolved.astype(jnp.int32)
            if shade:
                # fused epilogue: planes are still in registers, and far-only
                # tiles get exact normals from the cheap far scene (any hit
                # there is > margin >> 2*eps away from the near component, so
                # the fd4 stencil never sees it)
                from bsdmg_tpu.ops.shade import shade_planes

                r_ref, g_ref, b_ref = shade_refs
                collided = outcome == COLLISION
                any_collision = jnp.sum(collided.astype(jnp.int32)) > 0
                white = (outcome == STEP_LIMIT).astype(jnp.float32)

                @pl.when(any_collision)
                def _():
                    px = ox + depth * dx
                    py = oy + depth * dy
                    pz = oz + depth * dz
                    nx, ny, nz = _fd_normal(
                        scene_fn, px, py, pz, config.normal_epsilon
                    )
                    rr, gg, bbv = shade_planes(nx, ny, nz, outcome)
                    r_ref[:] = rr
                    g_ref[:] = gg
                    b_ref[:] = bbv

                @pl.when(~any_collision)
                def _():
                    rr, gg, bbv = _aces_plane(white, white, white)
                    r_ref[:] = rr
                    g_ref[:] = gg
                    b_ref[:] = bbv

        if split is None:
            run(csdf)
        else:
            # per-tile scene specialization (compile_scene_split): tiles
            # whose rays all stay > collision threshold away from the near
            # component's inflated slab sphere-trace the far scene alone —
            # an exact trace of the only surface those rays can reach.
            far_csdf, nbb = split
            nlo, nhi, nslack = _bb_parts(nbb)
            n_miss, _, _ = _slab_cull(
                ox, oy, oz, dx, dy, dz, nlo, nhi, cone, config, nslack
            )
            any_near = jnp.sum((active0 & ~n_miss).astype(jnp.int32)) > 0

            @pl.when(any_near)
            def _():
                run(csdf)

            @pl.when(~any_near)
            def _():
                run(far_csdf)

    return kernel


def _shade_kernel(csdf, config: MarchConfig):
    def kernel(
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        depth_ref, outcome_ref,
        r_ref, g_ref, b_ref,
    ):
        outcome = outcome_ref[:]
        collided = outcome == COLLISION
        any_collision = jnp.sum(collided.astype(jnp.int32)) > 0
        white = (outcome == STEP_LIMIT).astype(jnp.float32)

        from bsdmg_tpu.ops.shade import shade_planes

        @pl.when(any_collision)
        def _():
            depth = depth_ref[:]
            px = ox_ref[:] + depth * dx_ref[:]
            py = oy_ref[:] + depth * dy_ref[:]
            pz = oz_ref[:] + depth * dz_ref[:]
            nx, ny, nz = _fd_normal(csdf, px, py, pz, config.normal_epsilon)
            rr, gg, bbv = shade_planes(nx, ny, nz, outcome)
            r_ref[:] = rr
            g_ref[:] = gg
            b_ref[:] = bbv

        @pl.when(~any_collision)
        def _():
            rr, gg, bbv = _aces_plane(white, white, white)
            r_ref[:] = rr
            g_ref[:] = gg
            b_ref[:] = bbv

    return kernel


def _tile_spec(block_rows: int = TILE_S):
    return pl.BlockSpec(
        (block_rows, TILE_L), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "config", "bb", "use_bb_skip", "budget", "omega", "interpret",
        "block_rows", "split",
    ),
)
def _trace_call(csdf, o, d, cone, depth0, steps0, active0, config, bb, use_bb_skip,
                budget, interpret, omega=1.0, block_rows=TILE_S, split=None,
                outcome0=None):
    h, w = cone.shape
    spec = _tile_spec(block_rows)
    f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
    i32 = jax.ShapeDtypeStruct((h, w), jnp.int32)
    if outcome0 is None:
        outcome0 = jnp.full((h, w), DEPTH_LIMIT, jnp.int32)
    return pl.pallas_call(
        _trace_kernel(csdf, config, bb, use_bb_skip, budget, omega, split),
        grid=(h // block_rows, w // TILE_L),
        in_specs=[spec] * 11,
        out_specs=[spec] * 4,
        out_shape=[f32, i32, i32, i32],
        interpret=interpret,
    )(
        o[..., 0], o[..., 1], o[..., 2],
        d[..., 0], d[..., 1], d[..., 2],
        cone, depth0, steps0, outcome0, active0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "config", "bb", "use_bb_skip", "budget", "omega", "interpret",
        "block_rows", "split",
    ),
)
def _fused_call_resumable(csdf, o, d, cone, depth0, steps0, outcome0, active0,
                          config, bb, use_bb_skip, budget, interpret,
                          omega=1.0, block_rows=TILE_S, split=None):
    """Fused trace+shade with carried march state; returns all 7 planes
    (depth, steps, outcome, active, r, g, b). The building block of both the
    single-phase render and the block-retire pipeline's phases."""
    h, w = cone.shape
    spec = _tile_spec(block_rows)
    f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
    i32 = jax.ShapeDtypeStruct((h, w), jnp.int32)
    return pl.pallas_call(
        _trace_kernel(csdf, config, bb, use_bb_skip, budget, omega, split,
                      shade=True),
        grid=(h // block_rows, w // TILE_L),
        in_specs=[spec] * 11,
        out_specs=[spec] * 7,
        out_shape=[f32, i32, i32, i32, f32, f32, f32],
        interpret=interpret,
    )(
        o[..., 0], o[..., 1], o[..., 2],
        d[..., 0], d[..., 1], d[..., 2],
        cone, depth0, steps0, outcome0, active0,
    )


def _render_fused_call(csdf, o, d, cone, config, bb, use_bb_skip,
                       interpret, omega=1.0, block_rows=TILE_S, split=None):
    """Single-dispatch trace + shade (the default single-phase path): one
    kernel writes depth/steps/outcome AND the shaded r/g/b planes, avoiding
    the separate shade kernel's HBM re-read of six ray planes."""
    h, w = cone.shape
    outs = _fused_call_resumable(
        csdf, o, d, cone,
        jnp.zeros((h, w), jnp.float32), jnp.zeros((h, w), jnp.int32),
        jnp.full((h, w), DEPTH_LIMIT, jnp.int32), jnp.ones((h, w), jnp.int32),
        config, bb, use_bb_skip, 10**9, interpret, omega, block_rows, split,
    )
    return outs[4], outs[5], outs[6]


@functools.partial(
    jax.jit, static_argnames=("csdf", "config", "interpret", "block_rows")
)
def _shade_call(csdf, o, d, depth, outcome, config, interpret, block_rows=TILE_S):
    h, w = depth.shape
    spec = _tile_spec(block_rows)
    f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
    return pl.pallas_call(
        _shade_kernel(csdf, config),
        grid=(h // block_rows, w // TILE_L),
        in_specs=[spec] * 8,
        out_specs=[spec] * 3,
        out_shape=[f32, f32, f32],
        interpret=interpret,
    )(
        o[..., 0], o[..., 1], o[..., 2],
        d[..., 0], d[..., 1], d[..., 2],
        depth, outcome,
    )


# ---------------------------------------------------------------------------
# orchestrator — one jit, zero host syncs per frame
# ---------------------------------------------------------------------------


def _pad_planes(origins, directions, cone, h, w, hp, wp):
    cone_p = _pad2(jnp.broadcast_to(jnp.asarray(cone, jnp.float32), (h, w)), hp, wp, 0.0)
    o_p = jnp.stack([_pad2(origins[..., a], hp, wp, 1e5) for a in range(3)], axis=-1)
    d_p = jnp.stack(
        [_pad2(directions[..., a], hp, wp, 1.0 if a == 0 else 0.0) for a in range(3)],
        axis=-1,
    )
    return o_p, d_p, cone_p


def _gather_active(active, o, d, cone, depth, steps, cap: int):
    """Compact active rays into a dense (cap/128, 128) layout (prefix-sum
    free: jnp.nonzero with a static size). Overflow rays beyond ``cap`` stay
    in place and are handled by the residual pass."""
    n = active.shape[0] * active.shape[1]
    flat = active.reshape(-1) > 0
    idx = jnp.nonzero(flat, size=cap, fill_value=n)[0]
    valid = idx < n
    safe = jnp.minimum(idx, n - 1)

    rows = -(-cap // TILE_L)

    def take(x, fill):
        g = x.reshape(n, -1)[safe]
        g = jnp.where(valid[:, None], g, fill).reshape(rows, TILE_L, -1)
        return g.squeeze(-1) if g.shape[-1] == 1 else g

    return (
        idx,
        valid.reshape(rows, TILE_L),
        take(o, 1e5),
        take(d, 0.0),
        take(cone, 0.0),
        take(depth, 0.0),
        take(steps, 0),
    )


def _scatter_back(idx, full, tail):
    out = []
    for f, t in zip(full, tail):
        shape = f.shape
        out.append(
            f.reshape(-1).at[idx].set(t.reshape(-1), mode="drop").reshape(shape)
        )
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "config", "bb", "use_bb_skip", "two_phase", "phase_a_steps",
        "tail_cap", "interpret", "omega", "block_rows", "split",
    ),
)
def _trace_pipeline(
    csdf, o_p, d_p, cone_p, config, bb, use_bb_skip, two_phase,
    phase_a_steps, tail_cap, interpret, omega=1.0, block_rows=TILE_S,
    split=None,
):
    hp, wp = cone_p.shape
    zero_f = jnp.zeros((hp, wp), jnp.float32)
    zero_i = jnp.zeros((hp, wp), jnp.int32)
    ones_i = jnp.ones((hp, wp), jnp.int32)

    budget = phase_a_steps if two_phase else 10**9
    depth, steps, outcome, active = _trace_call(
        csdf, o_p, d_p, cone_p, zero_f, zero_i, ones_i,
        config, bb, use_bb_skip, budget, interpret, omega, block_rows, split,
    )

    if not two_phase:
        return depth, steps, outcome

    # phase B: compacted tail, fixed capacity, no host sync. The cap must
    # be a whole number of (8, 128) tiles — phase B's grid floor-divides the
    # gathered rows, and a ragged cap would leave tiles unwritten and
    # scatter uninitialized values onto active rays.
    grain = TILE_S * TILE_L
    tail_cap = max(-(-int(tail_cap) // grain) * grain, grain)
    idx, valid, o_g, d_g, cone_g, depth_g, steps_g = _gather_active(
        active, o_p, d_p, cone_p, depth, steps, tail_cap
    )
    # keep use_bb_skip on: resumed rays recompute their slab t_exit (the
    # per-ray stop depth), instead of marching empty space to depth_limit
    depth_t, steps_t, outcome_t, _ = _trace_call(
        csdf, o_g, d_g, cone_g, depth_g, steps_g, valid.astype(jnp.int32),
        config, bb, use_bb_skip, 10**9, interpret, omega,
    )
    depth, steps, outcome = _scatter_back(
        idx, (depth, steps, outcome), (depth_t, steps_t, outcome_t)
    )

    # phase C safety: if the tail overflowed tail_cap, finish the leftovers
    # with a masked full-image pass (tiles with no active rays exit at once).
    served = (
        jnp.zeros(hp * wp, jnp.int32).at[idx].set(1, mode="drop").reshape(hp, wp)
    )
    leftover = (active > 0) & (served == 0)
    any_left = jnp.any(leftover)

    def phase_c(args):
        depth, steps, outcome = args
        d2, s2, oc2, _ = _trace_call(
            csdf, o_p, d_p, cone_p, depth, steps, leftover.astype(jnp.int32),
            config, bb, use_bb_skip, 10**9, interpret, omega,
        )
        keep = leftover
        return (
            jnp.where(keep, d2, depth),
            jnp.where(keep, s2, steps),
            jnp.where(keep, oc2, outcome),
        )

    depth, steps, outcome = jax.lax.cond(
        any_left, phase_c, lambda a: a, (depth, steps, outcome)
    )
    return depth, steps, outcome


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "config", "bb", "use_bb_skip", "phase_a_steps", "block_cap",
        "interpret", "omega", "split", "block_rows",
    ),
)
def _render_fused_blocks(
    csdf, o_s, d_s, cone_s, config, bb, use_bb_skip, interpret,
    omega, split, phase_a_steps, block_cap,
    block_rows: int | None = None,
):
    """Fused render with *block-granule ray retirement* (swizzled layout).

    The tile-synchronized march executes each tile's slowest lane; phase A
    caps every ray at ``phase_a_steps``, then the surviving long-tail rays
    (silhouette grazes) are regrouped by gathering their whole (8, 128)
    swizzled blocks — one 32x32 spatial pixel block each — into a dense
    buffer for phase B. Block gathers move few, large rows, which is ~50x
    cheaper per byte than the row gathers that made per-ray two-phase a
    loss (see ops/refine.py's block compaction, the same trick).

    Exactness: the march is resumable (depth/steps/outcome carried), so
    phases A+B sample the identical point sequence as one uncapped march;
    the phase-C fallback finishes alive blocks beyond ``block_cap`` with a
    masked full-image pass (taken only when the static cap overflows).
    """
    m, L = cone_s.shape
    nb = m // TILE_S
    if block_rows is None:
        block_rows = _SWIZZLED_BLOCK_ROWS
    if block_rows <= 0 or block_rows % TILE_S or m % block_rows:
        # loud, not a silent fallback: a bench sweep must know the knob
        # actually applied
        raise ValueError(
            f"phase_a_rows={block_rows}: must be a positive multiple of "
            f"{TILE_S} that divides the {m} swizzled rows"
        )
    # phase A runs at `block_rows` (divergence there is capped at
    # phase_a_steps, so bigger blocks can trade divergence for VPU ILP);
    # phases B/C keep the 4-vreg default where divergence concentrates
    outs = _fused_call_resumable(
        csdf, o_s, d_s, cone_s,
        jnp.zeros((m, L), jnp.float32), jnp.zeros((m, L), jnp.int32),
        jnp.full((m, L), DEPTH_LIMIT, jnp.int32), jnp.ones((m, L), jnp.int32),
        config, bb, use_bb_skip, phase_a_steps, interpret, omega,
        block_rows, split,
    )
    depth, steps, outcome, active, r, g, b = outs

    alive = jnp.any((active > 0).reshape(nb, TILE_S * L), axis=1)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    key = jnp.where(alive, jnp.int32(0), jnp.int32(1))
    _, sel = jax.lax.sort(
        (key, jnp.arange(nb, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    sel = sel[:block_cap]

    def take(x):
        return x.reshape(nb, TILE_S, L)[sel].reshape(block_cap * TILE_S, L)

    o_g = jnp.stack([take(o_s[..., a]) for a in range(3)], axis=-1)
    d_g = jnp.stack([take(d_s[..., a]) for a in range(3)], axis=-1)
    outs_b = _fused_call_resumable(
        csdf, o_g, d_g, take(cone_s), take(depth), take(steps),
        take(outcome), take(active),
        config, bb, use_bb_skip, 10**9, interpret, omega,
        _SWIZZLED_BLOCK_ROWS, split,
    )

    def put(full, tail):
        return (
            full.reshape(nb, TILE_S, L)
            .at[sel]
            .set(tail.reshape(block_cap, TILE_S, L))
            .reshape(m, L)
        )

    r = put(r, outs_b[4])
    g = put(g, outs_b[5])
    b = put(b, outs_b[6])

    # phase C: alive blocks beyond the static cap (rare) finish in place
    def phase_c(args):
        r, g, b = args
        served = jnp.zeros((nb,), bool).at[sel].set(True)
        lmask = jnp.repeat(alive & ~served, TILE_S)[:, None]  # (m, 1)
        outs_c = _fused_call_resumable(
            csdf, o_s, d_s, cone_s, depth, steps, outcome,
            (active * lmask).astype(jnp.int32),
            config, bb, use_bb_skip, 10**9, interpret, omega,
            _SWIZZLED_BLOCK_ROWS, split,
        )
        pick = jnp.broadcast_to(lmask, (m, L))
        return (
            jnp.where(pick, outs_c[4], r),
            jnp.where(pick, outs_c[5], g),
            jnp.where(pick, outs_c[6], b),
        )

    return jax.lax.cond(
        n_alive > block_cap, phase_c, lambda a: a, (r, g, b)
    )


def _default_block_cap(m_rows: int) -> int:
    """Static phase-B capacity: 1/8 of the swizzled blocks (alive blocks
    after a 48-step phase A measure ~2-6% on the reference scene), in
    _SWIZZLED_BLOCK_ROWS granules."""
    nb = m_rows // TILE_S
    return max(4, (-(-nb // 8) // 4) * 4)


_BLOCK = 32  # spatial block edge; 32*32 == TILE_S*TILE_L

# Pallas block height for the swizzled layout: 4 spatial blocks per grid
# step. One (8, 128) tile is a single vector register per plane, so the
# march's dependent op chain stalls the VPU pipeline; 4 independent blocks
# per instruction keep it fed (measured: 5.5 -> 3.2 ms trace at 1080p; 8
# blocks is slightly worse because the whole Pallas block shares one
# while_loop and divergence grows with block size).
_SWIZZLED_BLOCK_ROWS = 4 * TILE_S


def _pad_rows(plane: jax.Array, rows: int, fill) -> jax.Array:
    n = plane.shape[0]
    if n == rows:
        return plane
    pad = jnp.full((rows - n, plane.shape[1]), fill, plane.dtype)
    return jnp.concatenate([plane, pad], axis=0)


def _swizzle(plane: jax.Array) -> jax.Array:
    """Remap an (Hp, Wp) plane so each (8, 128) register tile holds one
    32x32 *spatial block* of pixels instead of an 8-row x 128-col strip.

    The TPU analogue of the reference's warp pixel swizzle
    (render_texture_coord, cuda/modules/common.cu:186-215), and for the same
    reason: rays in a compact square finish in similar step counts, so the
    tile-synchronized march wastes fewer masked iterations (measured ~17%
    lower mean tile-max steps on the reference scene) and fewer tiles touch
    a collision in the shade pass (36% -> 25%).
    """
    hp, wp = plane.shape
    hb, wb = hp // _BLOCK, wp // _BLOCK
    t = plane.reshape(hb, _BLOCK, wb, _BLOCK).transpose(0, 2, 1, 3)
    return t.reshape(hb * wb * TILE_S, TILE_L)


def _unswizzle(plane: jax.Array, hp: int, wp: int) -> jax.Array:
    hb, wb = hp // _BLOCK, wp // _BLOCK
    t = plane.reshape(hb, wb, _BLOCK, _BLOCK).transpose(0, 2, 1, 3)
    return t.reshape(hp, wp)


def swizzled_ray_planes(
    origins, directions, cone_radius, h: int, w: int,
    row_granule: int = _SWIZZLED_BLOCK_ROWS,
):
    """Pad an (H, W) ray image to 32x32-block granules, swizzle every plane
    into the (M, 128) block layout and pad rows to ``row_granule``.

    Returns ``(o_s, d_s, cone_s, (hp, wp, m, mp))`` with ``o_s``/``d_s`` of
    shape ``(mp, 128, 3)``. Padding rays carry origin 1e5 (instant sky via
    the BB slab) and direction (1, 0, 0). The multi-device path uses a
    ``row_granule`` of ``n_devices * _SWIZZLED_BLOCK_ROWS`` so the swizzled
    rows split evenly across chips with no per-shard padding."""
    hp = -(-h // _BLOCK) * _BLOCK
    wp = -(-w // max(_BLOCK, TILE_L)) * max(_BLOCK, TILE_L)
    o_p, d_p, cone_p = _pad_planes(origins, directions, cone_radius, h, w, hp, wp)
    m = (hp // _BLOCK) * (wp // _BLOCK) * TILE_S  # live swizzled rows
    mp = -(-m // row_granule) * row_granule
    o_s = jnp.stack(
        [_pad_rows(_swizzle(o_p[..., a]), mp, 1e5) for a in range(3)], axis=-1
    )
    d_s = jnp.stack(
        [
            _pad_rows(_swizzle(d_p[..., a]), mp, 1.0 if a == 0 else 0.0)
            for a in range(3)
        ],
        axis=-1,
    )
    cone_s = _pad_rows(_swizzle(cone_p), mp, 0.0)
    return o_s, d_s, cone_s, (hp, wp, m, mp)


def render_swizzled(
    csdf, o_s, d_s, cone_s, config, bb, use_bb_skip, two_phase,
    phase_a_steps, tail_cap, interpret, omega, split=None,
    phase_a_rows: int | None = None,
):
    """Trace + shade pre-swizzled ``(M, 128)`` planes; returns swizzled
    ``(r, g, b)`` planes. The per-chip body of the sharded render path.

    ``two_phase="block"`` selects block-granule ray retirement
    (:func:`_render_fused_blocks`): ``phase_a_steps`` caps phase A and
    ``tail_cap`` (in swizzled 8-row blocks, None = 1/8 of the image)
    bounds the gathered tail. A user-supplied cap is normalized to the
    phase-B grid granule (rounded up to a multiple of 4, clamped to the
    block count) — phase B floor-divides the gathered rows into
    ``_SWIZZLED_BLOCK_ROWS`` Pallas blocks, so a ragged cap would leave
    whole blocks unwritten and scatter uninitialized rows into the frame."""
    if two_phase == "block":
        nb = cone_s.shape[0] // TILE_S
        if tail_cap:
            cap = min(max(-(-int(tail_cap) // 4) * 4, 4), (nb // 4) * 4)
        else:
            cap = _default_block_cap(cone_s.shape[0])
        return _render_fused_blocks(
            csdf, o_s, d_s, cone_s, config, bb, use_bb_skip, interpret,
            omega, split, phase_a_steps, cap, phase_a_rows,
        )
    if not two_phase:
        return _render_fused_call(
            csdf, o_s, d_s, cone_s, config, bb, use_bb_skip, interpret,
            omega, _SWIZZLED_BLOCK_ROWS, split,
        )
    depth, steps, outcome = _trace_pipeline(
        csdf, o_s, d_s, cone_s, config, bb, use_bb_skip, two_phase,
        phase_a_steps, tail_cap, interpret, omega, _SWIZZLED_BLOCK_ROWS,
        split,
    )
    return _shade_call(
        csdf, o_s, d_s, depth, outcome, config, interpret, _SWIZZLED_BLOCK_ROWS
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "csdf", "config", "bb", "use_bb_skip", "two_phase", "phase_a_steps",
        "tail_cap", "interpret", "h", "w", "omega", "swizzle", "split",
        "phase_a_rows",
    ),
)
def _render_pipeline(
    csdf, origins, directions, cone_radius, config, bb, use_bb_skip,
    two_phase, phase_a_steps, tail_cap, interpret, h, w, omega=1.0,
    swizzle=True, split=None, phase_a_rows=None,
):
    if swizzle:
        o_p, d_p, cone_p, (hp, wp, m, _) = swizzled_ray_planes(
            origins, directions, cone_radius, h, w
        )
        r, g, b = render_swizzled(
            csdf, o_p, d_p, cone_p, config, bb, use_bb_skip, two_phase,
            phase_a_steps, tail_cap, interpret, omega, split, phase_a_rows,
        )
        r, g, b = (_unswizzle(x[:m], hp, wp) for x in (r, g, b))
        return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)

    hp = -(-h // TILE_S) * TILE_S
    wp = -(-w // TILE_L) * TILE_L
    o_p, d_p, cone_p = _pad_planes(origins, directions, cone_radius, h, w, hp, wp)
    depth, steps, outcome = _trace_pipeline(
        csdf, o_p, d_p, cone_p, config, bb, use_bb_skip, two_phase,
        phase_a_steps, tail_cap, interpret, omega, TILE_S, split,
    )
    r, g, b = _shade_call(
        csdf, o_p, d_p, depth, outcome, config, interpret, TILE_S
    )
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)


def _default_tail_cap(h: int, w: int) -> int:
    # ~6% of rays, in whole (8,128) tiles
    return max(1024, -(-(h * w // 16) // 1024) * 1024)


def trace_pallas(
    csdf: Callable,
    origins: jax.Array,
    directions: jax.Array,
    cone_radius,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    use_bb_skip: bool = True,
    two_phase: bool = False,
    phase_a_steps: int = 32,
    tail_cap: int | None = None,
    interpret: bool = False,
    omega: float | None = None,
):
    """Trace an (H, W) ray image. Returns (depth, steps, outcome) planes.

    ``omega=None`` honors ``config.relaxation``."""
    omega = config.relaxation if omega is None else float(omega)
    h, w = origins.shape[:2]
    hp = -(-h // TILE_S) * TILE_S
    wp = -(-w // TILE_L) * TILE_L
    o_p, d_p, cone_p = _pad_planes(origins, directions, cone_radius, h, w, hp, wp)
    if tail_cap is None:
        tail_cap = _default_tail_cap(h, w)
    depth, steps, outcome = _trace_pipeline(
        csdf, o_p, d_p, cone_p, config, bb, use_bb_skip, two_phase,
        phase_a_steps, tail_cap, interpret, omega,
    )
    return depth[:h, :w], steps[:h, :w], outcome[:h, :w]


def sphere_trace_pallas(
    csdf: Callable,
    origins: jax.Array,
    directions: jax.Array,
    cone_radius,
    config: MarchConfig = MarchConfig(),
    *,
    interpret: bool = False,
) -> RayMarchHit:
    """Pallas sphere tracer over an ``(H, W)`` ray image, returning the
    pure-tracer's :class:`RayMarchHit` structure (semantics identical to
    ``bsdmg_tpu.ops.trace.sphere_trace``).

    A thin wrapper over the fused kernel's march (``trace_pallas``) — round
    1 kept a second, position-carrying march implementation for this API;
    positions are derived from depth instead (one march source of truth)."""
    depth, steps, outcome = trace_pallas(
        csdf, origins, directions, cone_radius, config,
        bb=None, use_bb_skip=False, two_phase=False, interpret=interpret,
    )
    position = origins + depth[..., None] * directions
    return RayMarchHit(steps=steps, position=position, depth=depth, outcome=outcome)


def render_image_pallas(
    csdf: Callable,
    origins: jax.Array,
    directions: jax.Array,
    cone_radius,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    use_bb_skip: bool = True,
    two_phase: bool = False,
    phase_a_steps: int = 32,
    tail_cap: int | None = None,
    interpret: bool = False,
    omega: float | None = None,
    swizzle: bool = True,
    split=None,
    phase_a_rows: int | None = None,
) -> jax.Array:
    """Full fused render (single dispatch, no host syncs).

    ``omega > 1`` turns on safe over-relaxed marching (see :func:`_march`);
    ``omega=None`` honors ``config.relaxation``. ``split`` (from
    ``csdf.compile_scene_split``) enables per-tile scene specialization.
    ``two_phase="block"`` selects block-granule ray retirement (swizzled
    layout only; ``tail_cap`` then counts 8-row blocks, None = 1/8 image;
    ``phase_a_rows`` sets phase A's Pallas block height — divergence there
    is capped at ``phase_a_steps``, so taller blocks can trade divergence
    for VPU ILP). Returns linear RGB ``(H, W, 3)``."""
    omega = config.relaxation if omega is None else float(omega)
    h, w = origins.shape[:2]
    if two_phase == "block" and not swizzle:
        raise ValueError("two_phase='block' requires the swizzled layout")
    if tail_cap is None and two_phase is True:
        tail_cap = _default_tail_cap(h, w)
    return _render_pipeline(
        csdf, origins, directions,
        jnp.broadcast_to(jnp.asarray(cone_radius, jnp.float32), (h, w)),
        config, bb, use_bb_skip, two_phase, phase_a_steps, tail_cap,
        interpret, h, w, omega, swizzle, split, phase_a_rows,
    )
