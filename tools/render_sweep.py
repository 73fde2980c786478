"""On-TPU sweep: block-granule retirement configs vs headline default."""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time
from bsdmg_tpu.bench import benchmark_render

configs = []
for spec in sys.argv[1:]:
    if spec == "base":
        configs.append(("base", dict(two_phase=False)))
    elif spec.startswith("omega="):
        w = float(spec.split("=")[1])
        configs.append((spec, dict(two_phase=False, omega=w)))
    else:
        a, r = (int(v) for v in spec.split(","))
        configs.append(
            (f"block a={a} rows={r}",
             dict(two_phase="block", phase_a_steps=a,
                  phase_a_rows=(None if r == 0 else r)))
        )

for name, kw in configs:
    t0 = time.time()
    r = benchmark_render(1920, 1080, **kw)
    print(f"{name}: {r['rays_per_s']/1e6:.1f} Mrays/s "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
