"""Headline benchmark: 1080p sphere-traced render of the reference scene,
plus driver-captured side metrics for every other pipeline stage.

Prints ONE JSON line. The driver contract keys are unchanged —
``{"metric", "value", "unit", "vs_baseline"}`` describe the 1080p render
headline — and extra keys ride along (VERDICT round-4 item 3) so each
round's artifact records all stages, not just the render:

- ``render_rays_per_s_2560x1440``: the resolution the reference was actually
  built for (src/renderer/mod.rs:10).
- ``grad_rays_per_s``: fused forward+backward differentiable render, 512^2.
- ``refine_voxels_per_s``: one refine level at the 64^3 operating point.
- ``mc_voxels_per_s``: fused marching-cubes extraction at a ~66k-voxel field.
- ``grid_render_rays_per_s_512``: mesh-asset (baked 128^3 grid) render via
  the gather-free MXU-contraction tracer at 512^2.

Baseline: the reference publishes no numbers (README.md is install-only, no
benchmarks/ dir — see BASELINE.md). Its implied operating point is the render
target it was built for: a 2560x1440 CUDA render presented at AutoVsync 60 Hz
on sm_86 (src/renderer/mod.rs:10, src/main.rs:52-53), i.e. 2560*1440*60 =
221.2 Mrays/s. ``vs_baseline`` is measured rays/s divided by that.

Methodology: per-frame *device* time is measured as the slope between K
frames-per-dispatch points (each dispatch hard-syncs via a scalar pulled to
the host). This removes the fixed per-dispatch transport cost, which on this
tunneled TPU is ~25 ms — 3x the actual per-frame device time — and which a
naive per-call timer would measure instead of the hardware. See
bsdmg_tpu/bench.py::_slope_time.
"""

from __future__ import annotations

import json
import sys
import time

WIDTH, HEIGHT = 1920, 1080
BASELINE_RAYS_PER_S = 2560 * 1440 * 60.0  # implied reference operating point


#: Wall-clock budget: side metrics stop being attempted past this point so
#: the run ends inside the driver's timeout. The headline contract line is
#: printed IMMEDIATELY after the headline measurement (before any side
#: stage), so even a hard kill mid-sides leaves a parseable line on stdout;
#: a completed run re-prints the enriched line last. Warm-cache full runs
#: measure ~10-12 min on this rig.
_BUDGET_S = float(__import__("os").environ.get("BSDMG_BENCH_BUDGET_S", 900))
_T0 = time.monotonic()


def _try(label: str, fn):
    """Run one side metric; a failure forfeits that key, never the line."""
    if time.monotonic() - _T0 > _BUDGET_S:
        print(f"# {label} skipped: over time budget", file=sys.stderr)
        return None
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — isolate every side metric
        print(f"# {label} skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return None


def _grid_render_rays_per_s(width: int = 512, height: int = 512) -> float:
    """Mesh-asset render throughput: bake (or load) a 128^3 grid of the
    reference object, render through the contraction ladder."""
    import math
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bsdmg_tpu.bench import _slope_time
    from bsdmg_tpu.cam import generate_rays, look_at
    from bsdmg_tpu.models.mesh_sdf import SdfGrid
    from bsdmg_tpu.models.scenes import get_scene
    from bsdmg_tpu.ops.pallas.grid_kernel import (
        make_contraction_levels, probe_grid_backend, render_image_grid,
    )

    if probe_grid_backend() != "contraction":
        raise RuntimeError("contraction kernel unavailable on this backend")

    res = 128
    path = os.path.join(os.path.dirname(__file__), ".cache", f"refgrid_{res}.npy")
    if os.path.exists(path):
        vals = np.load(path)
    else:
        sc = get_scene("reference_object")
        cfn = jax.jit(lambda x, y, z: sc.csdf(sc.params, x, y, z))
        ax = jnp.linspace(-2.6, 2.6, res)
        out = []
        for xs in np.array_split(np.asarray(ax), max(1, res // 32)):
            X, Y, Z = jnp.meshgrid(jnp.asarray(xs), ax, ax, indexing="ij")
            out.append(
                np.asarray(
                    cfn(X.reshape(-1, res), Y.reshape(-1, res), Z.reshape(-1, res))
                ).reshape(len(xs), res, res)
            )
        vals = np.concatenate(out, 0).astype(np.float32)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, vals)
    # host-backed on purpose: the mip build stays in numpy (eager device
    # ops cost 20-240 s remote compiles each on this backend)
    grid = SdfGrid(values=vals, lo=(-2.6,) * 3, hi=(2.6,) * 3)
    levels = make_contraction_levels(grid)

    cam = look_at((5.0, 2.0, -5.0), (0.0, 0.0, 0.0), fov=math.pi / 4)
    o, d, cone = generate_rays(cam, (width, height), (width, height))

    @jax.jit
    def many(k):
        def body(i, acc):
            img = render_image_grid(
                grid, o, d, cone, mode="contraction", levels=levels
            )
            return acc + img.sum()

        return jax.lax.fori_loop(0, k, body, 0.0)

    sec = _slope_time(lambda k: float(many(jnp.int32(k))), k1=2, k2=8)
    return width * height / sec


def main() -> None:
    from bsdmg_tpu.bench import (
        benchmark_marching_cubes, benchmark_refine, benchmark_render,
        benchmark_render_grad,
    )

    # the tunneled dispatch occasionally jitters enough that _slope_time
    # cannot find a positive slope and raises; one clean retry is cheap
    # insurance against publishing nothing at all
    for attempt in range(3):
        try:
            result = benchmark_render(WIDTH, HEIGHT)
            break
        except RuntimeError:
            if attempt == 2:
                raise
            time.sleep(10.0)
    rays_per_s = result["rays_per_s"]
    out = {
        "metric": f"render_rays_per_s_{WIDTH}x{HEIGHT}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }
    # crash-safe early print: if a side stage overruns the driver's own
    # timeout, this line is the stdout tail and the contract still holds
    print(json.dumps(out), flush=True)

    # cheapest stages first so as many as possible land inside the budget;
    # the accumulated line re-prints after every stage, so a run killed
    # mid-stage still leaves every completed key on stdout (last line wins)
    stages = [
        ("refine", benchmark_refine, "refine_voxels_per_s", "voxels_per_s"),
        ("mc", benchmark_marching_cubes, "mc_voxels_per_s", "voxels_per_s"),
        ("grad", benchmark_render_grad, "grad_rays_per_s", "rays_per_s"),
        (
            "render_2560x1440",
            lambda: benchmark_render(2560, 1440),
            "render_rays_per_s_2560x1440", "rays_per_s",
        ),
        # serving throughput: two frames per dispatch overlap across frames
        # (pixel-exact parity proven in tools/frames_sweep.py; F=2 is the
        # measured optimum of the F=1,2,4,8 sweep)
        (
            "render_1080p_frames2",
            lambda: benchmark_render(WIDTH, HEIGHT, frames=2),
            "render_rays_per_s_1920x1080_frames2", "rays_per_s",
        ),
        (
            "grid_render",
            lambda: {"v": _grid_render_rays_per_s()},
            "grid_render_rays_per_s_512", "v",
        ),
    ]
    for label, fn, key, field in stages:
        r = _try(label, fn)
        if r:
            out[key] = round(r[field], 1)
            print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
