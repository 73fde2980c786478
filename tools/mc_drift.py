"""MC throughput vs field size, repeated samples (VERDICT r4 item 6).

Pins the quoted ~130-190 Mvoxels/s drift band with data: N repeated
slope-timed samples at three field sizes spanning the 1024^3 pipeline's
real operating range. Run on the real TPU; prints a markdown-ready table.
"""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time

import numpy as np

from bsdmg_tpu.bench import benchmark_marching_cubes

samples = int(sys.argv[1]) if len(sys.argv) > 1 else 5
rows = []
levels_list = tuple(int(v) for v in sys.argv[2].split(',')) if len(sys.argv) > 2 else (2, 3, 4)
for levels in levels_list:
    vals = []
    count = None
    for s in range(samples):
        for attempt in range(3):
            try:
                r = benchmark_marching_cubes(levels=levels)
                break
            except Exception as e:  # transient tunnel/compile-helper flakes
                if attempt == 2:
                    raise
                print(f"  retry after {type(e).__name__}", flush=True)
                time.sleep(20)
        count = r["voxel_count"]
        vals.append(r["voxels_per_s"] / 1e6)
        print(f"levels={levels} sample {s}: {vals[-1]:.1f} Mvox/s "
              f"({count} voxels)", flush=True)
    v = np.asarray(vals)
    rows.append((levels, count, float(np.median(v)), float(v.min()), float(v.max())))

print("\n| field (levels) | voxels | median Mvox/s | min | max |")
print("|---|---|---|---|---|")
for levels, count, med, lo, hi in rows:
    print(f"| {levels} | {count} | {med:.0f} | {lo:.0f} | {hi:.0f} |")
