"""Tiled Pallas sphere tracer with per-tile early exit.

The pure-JAX tracer (ops/trace.py) advances the *whole image* until the last
ray resolves: a silhouette ray that needs 256 steps forces 256 full-image SDF
passes. This kernel tiles the image into native (8, 128) float32 tiles and
runs the march ``while_loop`` *per tile*: sky tiles exit after ~10 iterations,
interior tiles after a few dozen, and only silhouette tiles pay the full
budget — the TPU analogue of the reference's warp-coherent early exit
(one 128-thread block per 8x16-px tile, cuda/modules/common.cu:186-215).

Coordinates are carried as separate x/y/z planes (see ``csdf.py``) so every
operation is a native (sublane, lane) VPU op.
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
from bsdmg_tpu.ops.trace import COLLISION, DEPTH_LIMIT, STEP_LIMIT, RayMarchHit

TILE_S = 8  # sublanes (f32 native)
TILE_L = 128  # lanes


def _tracer_kernel(csdf, config: MarchConfig):
    eps = config.collision_distance
    depth_limit = config.depth_limit
    step_limit = config.step_limit

    def kernel(
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        cone_ref,
        depth_ref, outcome_ref, steps_ref,
        px_ref, py_ref, pz_ref,
    ):
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        cone = cone_ref[:]

        # booleans are carried as int32 (Mosaic can't legalize i1 loop
        # carries); intermediates stay as masks for jnp.where.
        def cond(carry):
            return carry[-1] > 0

        def body(carry):
            px, py, pz, depth, steps, outcome, active_i, _ = carry
            active = active_i > 0
            cd = cone * depth
            d = csdf(px, py, pz)

            hit = active & (d <= cd + eps)
            outcome = jnp.where(hit, COLLISION, outcome)

            advance = active & ~hit
            step = d - cd
            depth = jnp.where(advance, depth + step, depth)
            px = jnp.where(advance, px + step * dx, px)
            py = jnp.where(advance, py + step * dy, py)
            pz = jnp.where(advance, pz + step * dz, pz)

            over = advance & (depth > depth_limit)
            outcome = jnp.where(over, DEPTH_LIMIT, outcome)

            survived = advance & ~over
            steps = jnp.where(survived, steps + 1, steps)
            active = survived & (steps < step_limit)
            active_i = active.astype(jnp.int32)
            return (px, py, pz, depth, steps, outcome, active_i, jnp.sum(active_i))

        shape = dx.shape
        init = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.int32),
            jnp.full(shape, STEP_LIMIT, jnp.int32),
            jnp.ones(shape, jnp.int32),
            jnp.int32(1),
        )
        px, py, pz, depth, steps, outcome, _, _ = jax.lax.while_loop(
            cond, body, init
        )
        depth_ref[:] = depth
        outcome_ref[:] = outcome
        steps_ref[:] = steps
        px_ref[:] = px
        py_ref[:] = py
        pz_ref[:] = pz

    return kernel


def _pad2(a: jax.Array, h: int, w: int, value) -> jax.Array:
    ph, pw = h - a.shape[0], w - a.shape[1]
    if ph == 0 and pw == 0:
        return a
    return jnp.pad(a, ((0, ph), (0, pw)), constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("csdf", "config", "interpret")
)
def _trace_padded(csdf, origins, dirs, cone, config: MarchConfig, interpret: bool):
    h, w = cone.shape
    grid = (h // TILE_S, w // TILE_L)
    spec = pl.BlockSpec((TILE_S, TILE_L), lambda i, j: (i, j), memory_space=pltpu.VMEM)

    f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
    i32 = jax.ShapeDtypeStruct((h, w), jnp.int32)

    outs = pl.pallas_call(
        _tracer_kernel(csdf, config),
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=[spec] * 6,
        out_shape=[f32, i32, i32, f32, f32, f32],
        interpret=interpret,
    )(
        origins[..., 0], origins[..., 1], origins[..., 2],
        dirs[..., 0], dirs[..., 1], dirs[..., 2],
        cone,
    )
    return outs


def sphere_trace_pallas(
    csdf: Callable,
    origins: jax.Array,
    directions: jax.Array,
    cone_radius,
    config: MarchConfig = MarchConfig(),
    *,
    interpret: bool = False,
) -> RayMarchHit:
    """Pallas sphere tracer over an ``(H, W)`` ray image.

    Args:
      csdf: component-form scene SDF (see ``csdf.compile_scene_csdf``).
      origins/directions: ``(H, W, 3)`` ray bundle.
      cone_radius: scalar or ``(H, W)`` cone radius at unit depth.
      interpret: run in the Pallas interpreter (for CPU tests).

    Semantics identical to :func:`bsdmg_tpu.ops.trace.sphere_trace`.
    """
    h, w = origins.shape[:2]
    hp = -(-h // TILE_S) * TILE_S
    wp = -(-w // TILE_L) * TILE_L

    cone = jnp.broadcast_to(jnp.asarray(cone_radius, jnp.float32), (h, w))
    cone_p = _pad2(cone, hp, wp, 0.0)
    # padded rays: point +x from far away, they depth-limit in ~2 iterations
    o_p = jnp.stack(
        [_pad2(origins[..., a], hp, wp, 1e5) for a in range(3)], axis=-1
    )
    d_p = jnp.stack(
        [_pad2(directions[..., a], hp, wp, 1.0 if a == 0 else 0.0) for a in range(3)],
        axis=-1,
    )

    depth, outcome, steps, px, py, pz = _trace_padded(
        csdf, o_p, d_p, cone_p, config, interpret
    )
    position = jnp.stack([px, py, pz], axis=-1)
    return RayMarchHit(
        steps=steps[:h, :w],
        position=position[:h, :w],
        depth=depth[:h, :w],
        outcome=outcome[:h, :w],
    )
