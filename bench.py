"""Headline benchmark: 1080p sphere-traced render of the reference scene.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

Baseline: the reference publishes no numbers (README.md is install-only, no
benchmarks/ dir — see BASELINE.md). Its implied operating point is the render
target it was built for: a 2560x1440 CUDA render presented at AutoVsync 60 Hz
on sm_86 (src/renderer/mod.rs:10, src/main.rs:52-53), i.e. 2560*1440*60 =
221.2 Mrays/s. ``vs_baseline`` is measured rays/s divided by that.

Methodology: per-frame *device* time is measured as the slope between K=8
and K=1 frames-per-dispatch (each dispatch hard-syncs via a scalar pulled to
the host). This removes the fixed per-dispatch transport cost, which on this
tunneled TPU is ~25 ms — 3x the actual per-frame device time — and which a
naive per-call timer would measure instead of the hardware. See
bsdmg_tpu/bench.py::_slope_time.
"""

from __future__ import annotations

import json
import time

import numpy as np

WIDTH, HEIGHT = 1920, 1080
BASELINE_RAYS_PER_S = 2560 * 1440 * 60.0  # implied reference operating point


def main() -> None:
    import jax

    from bsdmg_tpu.bench import benchmark_render

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
    print(
        json.dumps(
            {
                "metric": f"render_rays_per_s_{WIDTH}x{HEIGHT}",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
