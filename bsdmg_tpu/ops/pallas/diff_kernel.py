"""Pallas sphere-trace with *runtime* SDF parameters (SMEM scalars).

The fused render kernel (ops/pallas/render_kernel.py) bakes scene parameters
as compile-time constants — right for forward serving, wrong for the
differentiable path where parameters are traced optimization variables and
change every step. Mosaic kernels cannot capture traced array constants, but
they CAN read scalars from SMEM: here the (tiny) parameter pytree is
flattened to one f32 vector, passed in SMEM, and rebuilt inside the kernel
as a pytree of scalars/tuples that the param-traced component SDF
(``Scene.csdf``) consumes directly (sdf/primitives.py ``_vec3``).

Used as the stopped forward march of the differentiable render
(grad/diff_render.py): the march output is reattached via the implicit
function theorem, so no AD rule is needed — callers pass stop_gradient'ed
parameters and the kernel is a constant of the linearization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.ops.pallas.render_kernel import TILE_L, _march, _tile_spec


def flatten_param_tree(params):
    """Flatten a pytree of scalars / small vectors into one f32 vector.

    Returns ``(flat (1, K) array, meta)``; ``meta`` is hashable/static."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(tuple(np.shape(leaf)) for leaf in leaves)
    parts = []
    for leaf in leaves:
        arr = jnp.asarray(leaf, jnp.float32)
        parts.append(arr.reshape(-1) if arr.ndim else arr[None])
    flat = jnp.concatenate(parts) if parts else jnp.zeros((1,), jnp.float32)
    return flat[None, :], (treedef, shapes)


def rebuild_param_tree(read, meta):
    """Rebuild the pytree from a scalar-reader ``read(i)`` (leaf vectors
    become tuples of scalars — see ``sdf.primitives._vec3``)."""
    treedef, shapes = meta
    leaves = []
    i = 0
    for shp in shapes:
        n = int(np.prod(shp)) if shp else 1
        vals = [read(i + j) for j in range(n)]
        i += n
        leaves.append(vals[0] if shp == () else tuple(vals))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _march_kernel(cfn, meta, config: MarchConfig, budget: int, bb, split,
                  track_min: bool = False):
    from bsdmg_tpu.ops.pallas.render_kernel import _bb_parts, _slab_cull

    def kernel(prm_ref, *refs):
        (
            ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, cone_ref,
            depth_ref, steps_ref, outcome_ref, dfdt_ref,
        ) = refs[:11]
        if track_min:
            minm_ref, tmin_ref = refs[11:]
        params = rebuild_param_tree(lambda i: prm_ref[0, i], meta)
        csdf = lambda x, y, z: cfn(params, x, y, z)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        cone = cone_ref[:]
        shape = cone.shape
        active0 = jnp.ones(shape, bool)
        depth0 = jnp.zeros(shape, jnp.float32)
        t_stop = None
        if bb is not None:
            # same slab pre-pass as the forward kernel; `bb` must cover the
            # surface for EVERY parameter value reachable during optimization
            # (caller-supplied trust region)
            lo_, hi_, slack_ = _bb_parts(bb)
            miss, _, t_exit = _slab_cull(
                ox, oy, oz, dx, dy, dz, lo_, hi_, cone, config, slack_
            )
            skip = active0 & miss
            active0 = active0 & ~miss
            # march from t=0 like the forward kernel (see its NOTE: a
            # fast-forward moves the accepted hit inside the cone window)
            depth0 = jnp.where(skip, config.depth_limit * 1.01, depth0)
            t_stop = jnp.minimum(t_exit, config.depth_limit)

        def run(scene_fn):
            outs = _march(
                scene_fn, config,
                (ox, oy, oz), (dx, dy, dz), cone,
                active0, depth0, jnp.zeros(shape, jnp.int32),
                budget, t_stop=t_stop, track_min=track_min,
            )
            depth, steps, outcome = outs[:3]
            depth_ref[:] = depth
            steps_ref[:] = steps
            outcome_ref[:] = outcome
            if track_min:
                minm_ref[:] = outs[4]
                tmin_ref[:] = outs[5]
            # the IFT denominator df/dt at the hit (stop-gradient'ed by the
            # caller anyway, so it can live inside the no-AD kernel): one
            # in-register jvp instead of an XLA-side primal+tangent re-eval
            _, dfdt = jax.jvp(
                scene_fn,
                (ox + depth * dx, oy + depth * dy, oz + depth * dz),
                (dx, dy, dz),
            )
            dfdt_ref[:] = dfdt

        if split is None:
            run(csdf)
        else:
            # per-tile specialization (see render_kernel): `split` carries a
            # *static* far scene (param-independent — the reference scene's
            # frame wireframe) and a trust-region bound of the near component
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
                run(lambda x, y, z: far_csdf(x, y, z))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfn", "meta", "config", "interpret", "block_rows", "bb", "split",
        "track_min",
    ),
)
def _march_params_call(
    cfn, meta, prm, o_p, d_p, cone_p, config, interpret, block_rows, bb=None,
    split=None, track_min=False,
):
    hp, wp = cone_p.shape
    spec = _tile_spec(block_rows)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    i32 = jax.ShapeDtypeStruct((hp, wp), jnp.int32)
    n_out = 6 if track_min else 4
    out_shape = [f32, i32, i32, f32] + ([f32, f32] if track_min else [])
    return pl.pallas_call(
        _march_kernel(
            cfn, meta, config, config.step_limit, bb, split, track_min
        ),
        grid=(hp // block_rows, wp // TILE_L),
        in_specs=[smem] + [spec] * 7,
        out_specs=[spec] * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(
        prm,
        o_p[..., 0], o_p[..., 1], o_p[..., 2],
        d_p[..., 0], d_p[..., 1], d_p[..., 2],
        cone_p,
    )


def march_params_pallas(
    cfn,
    params,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    split=None,
    interpret: bool = False,
    track_min: bool = False,
):
    """Sphere-trace an (H, W) ray image under *runtime* parameters.

    ``cfn(params, x, y, z)`` is the param-traced component SDF. Pass
    ``stop_gradient``-ed params — the kernel has no AD rule and needs none
    (IFT reattachment happens outside). ``bb``, when given, enables the sky
    slab skip and must conservatively bound the surface for every parameter
    value the optimization can reach; ``split`` (a *param-independent* far
    scene + a near trust-region box) enables per-tile specialization. Rays
    stream through the same 32x32 spatial-block swizzle as the forward
    kernel (coherent step counts per tile).

    Returns ``(depth, steps, outcome, dfdt)`` — ``dfdt`` is the SDF's
    directional derivative along the ray at the hit (the IFT denominator,
    computed in-register). ``track_min=True`` appends ``(min_margin,
    t_min)``, the closest-approach record silhouette-aware gradients need
    (grad/edge.py; slab-culled rays carry the ``UNTRACKED`` sentinel)."""
    from bsdmg_tpu.ops.pallas.render_kernel import (
        _SWIZZLED_BLOCK_ROWS,
        _unswizzle,
        swizzled_ray_planes,
    )

    h, w = origins.shape[:2]
    cone_full = jnp.broadcast_to(jnp.asarray(cone, jnp.float32), (h, w))
    o_s, d_s, c_s, (hp, wp, m, _) = swizzled_ray_planes(
        origins, directions, cone_full, h, w
    )
    prm, meta = flatten_param_tree(params)
    outs = _march_params_call(
        cfn, meta, prm, o_s, d_s, c_s, config, interpret,
        _SWIZZLED_BLOCK_ROWS, bb, split, track_min,
    )
    return tuple(_unswizzle(x[:m], hp, wp)[:h, :w] for x in outs)


# ---------------------------------------------------------------------------
# fully-fused loss + gradient kernel
# ---------------------------------------------------------------------------


def _loss_grad_kernel(cfn, meta, n_prm: int, config: MarchConfig, bb, split,
                      inv_denom_elems: float, edge_weight: float = 0.0,
                      edge_band: float = 0.0, inv_pixels: float = 0.0):
    """One kernel = the whole training step's compute: stopped march, IFT
    reattachment, shading, L2 loss against the target AND dL/dparams.

    The parameters live in SMEM as traced scalars, so ``jax.value_and_grad``
    applies *inside* the kernel body — reverse-mode runs at trace time and
    lowers to ordinary VPU ops, with per-tile gradient partial sums
    accumulated into an SMEM output across the sequential grid. No XLA-side
    autodiff graph, no HBM round trips between forward and backward.

    ``edge_weight > 0`` fuses the silhouette-aware closest-approach loss
    (grad/edge.py) into the same kernel: the march additionally tracks the
    per-ray minimum cone margin and its depth, and outcome-mismatched
    pixels (vs the target-state input plane) add envelope-theorem hinge
    terms inside the differentiated ``pixel_loss`` — one extra SDF eval at
    the recorded point, zero extra kernel launches.
    """
    from bsdmg_tpu.grad.edge import edge_loss_planes
    from bsdmg_tpu.ops.pallas.render_kernel import _bb_parts, _slab_cull
    from bsdmg_tpu.ops.shade import shade_planes
    from bsdmg_tpu.ops.trace import COLLISION

    edge = edge_weight != 0.0

    def kernel(prm_ref, *refs):
        (
            ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, cone_ref,
            tr_ref, tg_ref, tb_ref,
        ) = refs[:10]
        ts_ref = refs[10] if edge else None
        acc_ref = refs[-1]
        @pl.when(pl.program_id(0) == 0)
        def _():
            for i in range(n_prm + 1):
                acc_ref[0, i] = jnp.float32(0.0)

        prm0 = tuple(prm_ref[0, i] for i in range(n_prm))
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        cone = cone_ref[:]
        shape = cone.shape

        def scene_of(prm):
            params = rebuild_param_tree(lambda i: prm[i], meta)
            return lambda x, y, z: cfn(params, x, y, z)

        csdf0 = scene_of(prm0)  # stopped scene: prm0 captured, not an arg
        active0 = jnp.ones(shape, bool)
        depth0 = jnp.zeros(shape, jnp.float32)
        t_stop = None
        if bb is not None:
            lo_, hi_, slack_ = _bb_parts(bb)
            miss, _, t_exit = _slab_cull(
                ox, oy, oz, dx, dy, dz, lo_, hi_, cone, config, slack_
            )
            active0 = active0 & ~miss
            depth0 = jnp.where(miss, config.depth_limit * 1.01, depth0)
            t_stop = jnp.minimum(t_exit, config.depth_limit)

        def tile_loss_grad(march_fn):
            outs = _march(
                march_fn, config, (ox, oy, oz), (dx, dy, dz), cone,
                active0, depth0, jnp.zeros(shape, jnp.int32),
                config.step_limit, t_stop=t_stop, track_min=edge,
            )
            depth, _, outcome = outs[:3]
            if edge:
                min_m, t_min = outs[4], outs[5]
            t0 = depth  # constant w.r.t. prm (march used captured prm0)
            px, py, pz = ox + t0 * dx, oy + t0 * dy, oz + t0 * dz
            _, dfdt = jax.jvp(march_fn, (px, py, pz), (dx, dy, dz))
            denom = dfdt - cone
            denom = jnp.where(jnp.abs(denom) < 1e-6, -1e-6, denom)
            collided = outcome == COLLISION

            def pixel_loss(prm):
                f = scene_of(prm)
                residual = (
                    f(px, py, pz) - cone * t0 - config.collision_distance
                )
                t_diff = jnp.where(collided, t0 - residual / denom, t0)
                qx = ox + t_diff * dx
                qy = oy + t_diff * dy
                qz = oz + t_diff * dz
                gx, gy, gz = jax.grad(
                    lambda x, y, z: jnp.sum(f(x, y, z)), argnums=(0, 1, 2)
                )(qx, qy, qz)
                inv = jax.lax.rsqrt(
                    jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-24)
                )
                r, g, b = shade_planes(gx * inv, gy * inv, gz * inv, outcome)
                err = (
                    (r - tr_ref[:]) ** 2
                    + (g - tg_ref[:]) ** 2
                    + (b - tb_ref[:]) ** 2
                )
                total = jnp.sum(err) * inv_denom_elems
                if edge:
                    e = edge_loss_planes(
                        f, ox, oy, oz, dx, dy, dz, cone,
                        t_min, min_m, collided, ts_ref[:], edge_band,
                    )
                    total = total + edge_weight * jnp.sum(e) * inv_pixels
                return total

            loss, grads = jax.value_and_grad(pixel_loss)(prm0)
            acc_ref[0, 0] = acc_ref[0, 0] + loss
            for i, g in enumerate(grads):
                acc_ref[0, i + 1] = acc_ref[0, i + 1] + g

        if split is None:
            tile_loss_grad(csdf0)
        else:
            far_csdf, nbb = split
            nlo, nhi, nslack = _bb_parts(nbb)
            n_miss, _, _ = _slab_cull(
                ox, oy, oz, dx, dy, dz, nlo, nhi, cone, config, nslack
            )
            any_near = jnp.sum((active0 & ~n_miss).astype(jnp.int32)) > 0

            @pl.when(any_near)
            def _():
                tile_loss_grad(csdf0)

            @pl.when(~any_near)
            def _():
                # the far scene is param-independent: its tiles still carry
                # gradients through the residual/normal of the FULL scene
                # (object contributions vanish there, but jax.grad of the
                # full csdf keeps the math identical), while the march uses
                # the cheap far-only SDF
                tile_loss_grad(lambda x, y, z: far_csdf(x, y, z))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfn", "meta", "n_prm", "n_pixels", "config", "interpret", "bb",
        "split", "edge_weight", "edge_band",
    ),
)
def _loss_grad_call(
    cfn, meta, n_prm, n_pixels, prm, o_s, d_s, c_s, t_r, t_g, t_b, config,
    bb, split, interpret, edge_weight=0.0, edge_band=0.0, t_state=None,
):
    from bsdmg_tpu.ops.pallas.render_kernel import _SWIZZLED_BLOCK_ROWS

    edge = edge_weight != 0.0
    rows, _ = c_s.shape
    spec = pl.BlockSpec(
        (_SWIZZLED_BLOCK_ROWS, TILE_L), lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    acc = pl.BlockSpec(
        (1, n_prm + 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    # padded lanes contribute exactly zero; normalize by the TRUE pixel count
    operands = [
        prm,
        o_s[..., 0], o_s[..., 1], o_s[..., 2],
        d_s[..., 0], d_s[..., 1], d_s[..., 2],
        c_s, t_r, t_g, t_b,
    ]
    n_planes = 10
    if edge:
        operands.append(t_state)
        n_planes = 11
    out = pl.pallas_call(
        _loss_grad_kernel(
            cfn, meta, n_prm, config, bb, split, 1.0 / (3.0 * n_pixels),
            edge_weight, edge_band, 1.0 / n_pixels,
        ),
        grid=(rows // _SWIZZLED_BLOCK_ROWS,),
        in_specs=[smem_in] + [spec] * n_planes,
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((1, n_prm + 1), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[0, 0], out[0, 1:]


def render_loss_grad_pallas(
    cfn,
    params,
    target: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    cone,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    split=None,
    interpret: bool = False,
    total_pixels: int | None = None,
    edge_weight: float = 0.0,
    edge_band: float | None = None,
    target_miss: jax.Array | None = None,
):
    """Fused inverse-rendering step: ``(loss, grads)`` of the L2 image loss
    w.r.t. the SDF parameter pytree, computed end-to-end in ONE Pallas
    kernel (march + IFT + shading + loss + reverse-mode, with gradient
    partial sums accumulated across the grid in SMEM).

    Semantically identical to
    ``jax.value_and_grad(lambda p: mean((render_image_diff(p) - target)**2))``
    on the SoA path — asserted by tests against that XLA oracle.

    ``total_pixels`` overrides the mean's denominator — the sharded
    training step passes the GLOBAL pixel count so per-shard partial sums
    ``psum`` into the exact global mean.

    ``edge_weight > 0`` fuses the silhouette-aware closest-approach loss
    (grad/edge.py) into the kernel; ``target_miss`` (bool, True = target
    shows no surface) overrides the RGB-based target classification.
    """
    from bsdmg_tpu.ops.pallas.render_kernel import (
        _SWIZZLED_BLOCK_ROWS,
        _swizzle,
        _pad_rows,
        _pad2,
        _BLOCK,
        TILE_L,
        swizzled_ray_planes,
    )

    h, w = origins.shape[:2]
    cone_full = jnp.broadcast_to(jnp.asarray(cone, jnp.float32), (h, w))
    o_s, d_s, c_s, (hp, wp, m, mp) = swizzled_ray_planes(
        origins, directions, cone_full, h, w
    )
    # target planes through the same swizzle; padding target = 0 matches the
    # padded rays' rendered black, so pad lanes contribute zero loss/grad
    t_planes = []
    for a in range(3):
        t = _pad2(target[..., a], hp, wp, 0.0)
        t_planes.append(_pad_rows(_swizzle(t), mp, 0.0))
    edge_weight = float(edge_weight)
    t_state = None
    if edge_weight:
        from bsdmg_tpu.grad.edge import classify_target_miss

        miss = (
            classify_target_miss(target) if target_miss is None else target_miss
        ).astype(jnp.float32)
        # pad lanes get the ignore sentinel (-1): a padded ray's degenerate
        # march must never produce an edge pull
        t_state = _pad_rows(_swizzle(_pad2(miss, hp, wp, -1.0)), mp, -1.0)
    band = (
        4.0 * config.collision_distance if edge_band is None
        else float(edge_band)
    )
    prm, meta = flatten_param_tree(jax.tree.map(jax.lax.stop_gradient, params))
    n_prm = prm.shape[1]
    loss, flat_grads = _loss_grad_call(
        cfn, meta, n_prm, total_pixels or (h * w), prm, o_s, d_s, c_s,
        *t_planes, config, bb, split, interpret, edge_weight, band, t_state,
    )
    # unflatten back into the params pytree
    treedef, shapes = meta
    leaves = []
    i = 0
    for shp in shapes:
        n = int(np.prod(shp)) if shp else 1
        chunk = flat_grads[i : i + n]
        i += n
        leaves.append(chunk[0] if shp == () else chunk.reshape(shp))
    grads = jax.tree_util.tree_unflatten(treedef, leaves)
    return loss, grads
