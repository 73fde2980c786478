"""Benchmark harness: rays/s render, Mvoxels/s refine + marching cubes.

The reference has no benchmark suite; these are the operating points implied
by its workload constants (BASELINE.md): full-image sphere trace of the exact
reference scene, voxel refinement throughput, MC extraction throughput.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np


def _sync_time(fn, iters: int = 3, warmup: int = 2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _slope_time(make_many, k1: int = 1, k2: int = 8, iters: int = 3) -> float:
    """Per-iteration device time via a two-point slope.

    ``make_many(k)`` must return a host float after executing the workload
    ``k`` times inside ONE dispatch (e.g. a jitted loop ending in a reduction
    pulled to the host). Timing ``k2`` vs ``k1`` and taking the slope removes
    the fixed per-dispatch cost, which on tunneled/remote device transports
    can be tens of ms — orders of magnitude above the real per-frame device
    time. Pure device throughput is what the baseline comparison needs.
    """
    make_many(k1)
    make_many(k2)  # warm both shapes

    def best(k):
        b = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            make_many(k)
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(k2) - best(k1)) / (k2 - k1)


def benchmark_render(
    width: int = 1920,
    height: int = 1080,
    *,
    iters: int = 3,
    use_pallas: bool | None = None,
    use_grad_normal: bool = False,
) -> dict[str, Any]:
    """Rays/s of the reference-scene sphere trace at the given resolution.

    ``use_pallas=None`` auto-selects: the fused Pallas kernel on TPU, the
    pure-JAX path elsewhere (Pallas interpret mode is not a benchmark).
    """
    import jax
    import jax.numpy as jnp

    from bsdmg_tpu.cam import generate_rays, look_at
    from bsdmg_tpu.models import reference_render_scene
    from bsdmg_tpu.ops.shade import render_image

    scene = reference_render_scene()
    cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
    origins, dirs, cone = generate_rays(cam, (width, height), (1920.0, 1080.0))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    import functools

    if use_pallas:
        from bsdmg_tpu.ops.pallas import compile_scene_csdf
        from bsdmg_tpu.ops.pallas.csdf import scene_bounds
        from bsdmg_tpu.ops.pallas.render_kernel import render_image_pallas

        csdf = compile_scene_csdf(scene)
        bb = scene_bounds(scene)
        render_i = lambda i: render_image_pallas(
            csdf, origins + 1e-6 * i, dirs, cone, bb=bb, two_phase=False
        )
    else:
        sdf = scene.bind()
        render_i = lambda i: render_image(
            sdf, origins + 1e-6 * i, dirs, cone, use_grad_normal=use_grad_normal
        )

    # K frames per dispatch (distinct origins so nothing folds away), summed
    # to a scalar pulled to the host — a hard sync per dispatch.
    @functools.partial(jax.jit, static_argnames="k")
    def many(k):
        return sum(jnp.sum(render_i(i)) for i in range(k))

    per_frame = _slope_time(lambda k: float(many(k)), iters=iters)
    rays = width * height
    return {
        "rays_per_s": rays / per_frame,
        "seconds_per_frame": per_frame,
        "width": width,
        "height": height,
        "pallas": bool(use_pallas),
    }


def benchmark_refine(init_factor: int = 64, levels: int = 2, iters: int = 3):
    """Mvoxels/s of hierarchical refinement on the reference object."""
    import jax
    import jax.numpy as jnp

    from bsdmg_tpu.config import MeshGenConfig
    from bsdmg_tpu.mesh import create_voxel_field, refine_field
    from bsdmg_tpu.models import reference_object

    sdf = reference_object().bind()
    cfg = MeshGenConfig(init_factor=init_factor)

    def run():
        field = create_voxel_field(cfg)
        total = 0
        for _ in range(levels):
            total += field.count
            field = refine_field(sdf, field, cfg)
        return field, total

    # warmup (compilation per level shape)
    field, total = run()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        field, total = run()
        jax.block_until_ready(field.lowers)
        best = min(best, time.perf_counter() - t0)
    return {
        "voxels_per_s": total / best,
        "seconds": best,
        "input_voxels": total,
        "final_count": field.count,
    }


def benchmark_marching_cubes(init_factor: int = 64, iters: int = 3):
    """Mvoxels/s of marching-cubes extraction (incl. Newton projection)."""
    import jax

    from bsdmg_tpu.config import MeshGenConfig
    from bsdmg_tpu.mesh import create_voxel_field, refine_field
    from bsdmg_tpu.mesh.pipeline import field_to_triangles
    from bsdmg_tpu.models import reference_object

    sdf = reference_object().bind()
    cfg = MeshGenConfig(init_factor=init_factor)
    field = refine_field(sdf, create_voxel_field(cfg), cfg)

    def run():
        return field_to_triangles(sdf, field, cfg)

    best = _sync_time(run, iters=iters)
    return {
        "voxels_per_s": field.count / best,
        "seconds": best,
        "voxel_count": field.count,
    }
