"""Sphere tracing (ray marching) with cone-radius adaptive thresholds.

Semantics match the reference tracer (cuda/includes/ray_marching.cu:14-49):

* collision when ``d <= cone_radius * depth + collision_distance``
* step size ``d - cone_radius * depth`` (the cone shrinks steps near grazing)
* outcomes: Collision / StepLimit (default) / DepthLimit
* ``steps`` counts completed advances (the reference's ``for`` increments
  after the body; breaks skip the increment)

TPU-first design: instead of one thread per ray with divergent loops, the
whole ray batch advances under a ``lax.while_loop`` with per-ray active
masks — the loop ends as soon as *every* ray in the batch has resolved, and
each iteration is one fused VPU pass over the batch. The Pallas kernel in
``ops/pallas/render_kernel.py`` tiles the image so early-finishing tiles stop
iterating (the TPU analogue of warp-coherent early exit).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bsdmg_tpu.config import MarchConfig

# Outcome codes (reference: cuda/includes/bindings.h:12-14).
COLLISION = 0
STEP_LIMIT = 1
DEPTH_LIMIT = 2

SdfFn = Callable[[jax.Array], jax.Array]


class RayMarchHit(NamedTuple):
    """Batched ray-march result (reference struct: cuda/includes/types.cu:8-14).

    The reference's per-ray ``clock64()`` cycle counter is replaced by the
    profiling utilities in ``bsdmg_tpu.utils.profiling`` (whole-kernel
    timing is the meaningful unit on TPU)."""

    steps: jax.Array  # (...,) int32 completed advances
    position: jax.Array  # (..., 3) final march position
    depth: jax.Array  # (...,) distance travelled along the ray
    outcome: jax.Array  # (...,) int32: COLLISION / STEP_LIMIT / DEPTH_LIMIT


def sphere_trace(
    sdf: SdfFn,
    origins: jax.Array,
    directions: jax.Array,
    cone_radius=0.0,
    config: MarchConfig = MarchConfig(),
) -> RayMarchHit:
    """March a batch of rays against ``sdf``.

    Args:
      sdf: scene SDF, ``(..., 3) -> (...,)``.
      origins/directions: ``(..., 3)`` ray bundle (directions unit length).
      cone_radius: scalar or ``(...,)`` per-ray cone radius at unit depth.
      config: step/depth/collision budget.

    Returns a :class:`RayMarchHit` of batched arrays.
    """
    batch = origins.shape[:-1]
    cone = jnp.broadcast_to(jnp.asarray(cone_radius, jnp.float32), batch)

    class State(NamedTuple):
        position: jax.Array
        depth: jax.Array
        steps: jax.Array
        outcome: jax.Array
        active: jax.Array

    init = State(
        position=origins,
        depth=jnp.zeros(batch, jnp.float32),
        steps=jnp.zeros(batch, jnp.int32),
        outcome=jnp.full(batch, STEP_LIMIT, jnp.int32),
        active=jnp.ones(batch, bool),
    )

    def cond(s: State) -> jax.Array:
        return jnp.any(s.active)

    def body(s: State) -> State:
        collision_distance = cone * s.depth
        d = sdf(s.position)

        hit = s.active & (d <= collision_distance + config.collision_distance)
        outcome = jnp.where(hit, COLLISION, s.outcome)

        advance = s.active & ~hit
        step = d - collision_distance
        depth = jnp.where(advance, s.depth + step, s.depth)
        position = jnp.where(
            advance[..., None], s.position + step[..., None] * directions, s.position
        )

        over_depth = advance & (depth > config.depth_limit)
        outcome = jnp.where(over_depth, DEPTH_LIMIT, outcome)

        survived = advance & ~over_depth
        steps = jnp.where(survived, s.steps + 1, s.steps)
        active = survived & (steps < config.step_limit)
        return State(position, depth, steps, outcome, active)

    final = jax.lax.while_loop(cond, body, init)
    return RayMarchHit(final.steps, final.position, final.depth, final.outcome)
