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


def _march_kernel(cfn, meta, config: MarchConfig, budget: int, bb, split):
    from bsdmg_tpu.ops.pallas.render_kernel import _slab_cull

    def kernel(
        prm_ref,
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref, cone_ref,
        depth_ref, steps_ref, outcome_ref, dfdt_ref,
    ):
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
            miss, _, t_exit = _slab_cull(
                ox, oy, oz, dx, dy, dz, bb[0], bb[1], cone, config
            )
            skip = active0 & miss
            active0 = active0 & ~miss
            # march from t=0 like the forward kernel (see its NOTE: a
            # fast-forward moves the accepted hit inside the cone window)
            depth0 = jnp.where(skip, config.depth_limit * 1.01, depth0)
            t_stop = jnp.minimum(t_exit, config.depth_limit)

        def run(scene_fn):
            depth, steps, outcome, _ = _march(
                scene_fn, config,
                (ox, oy, oz), (dx, dy, dz), cone,
                active0, depth0, jnp.zeros(shape, jnp.int32),
                budget, t_stop=t_stop,
            )
            depth_ref[:] = depth
            steps_ref[:] = steps
            outcome_ref[:] = outcome
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
            far_csdf, (nlo, nhi) = split
            n_miss, _, _ = _slab_cull(
                ox, oy, oz, dx, dy, dz, nlo, nhi, cone, config
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
    ),
)
def _march_params_call(
    cfn, meta, prm, o_p, d_p, cone_p, config, interpret, block_rows, bb=None,
    split=None,
):
    hp, wp = cone_p.shape
    spec = _tile_spec(block_rows)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    i32 = jax.ShapeDtypeStruct((hp, wp), jnp.int32)
    return pl.pallas_call(
        _march_kernel(cfn, meta, config, config.step_limit, bb, split),
        grid=(hp // block_rows, wp // TILE_L),
        in_specs=[smem] + [spec] * 7,
        out_specs=[spec] * 4,
        out_shape=[f32, i32, i32, f32],
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
    computed in-register)."""
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
        _SWIZZLED_BLOCK_ROWS, bb, split,
    )
    return tuple(_unswizzle(x[:m], hp, wp)[:h, :w] for x in outs)
