"""On-chip measurement: SoA XLA gather path for grid scenes (the fallback)."""
import os, time, numpy as np, jax, jax.numpy as jnp
from bsdmg_tpu.models.mesh_sdf import SdfGrid, grid_csdf
from bsdmg_tpu.models.scenes import get_scene
from bsdmg_tpu.cam import look_at, generate_rays
from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.ops.shade import render_image_c
from bsdmg_tpu.bench import _slope_time

print("backend:", jax.default_backend())

def bake_ref_grid(R):
    path = f"/root/repo/.cache/refgrid_{R}.npy"
    if os.path.exists(path):
        vals = np.load(path)
    else:
        sc = get_scene("reference_object")
        cfn = jax.jit(lambda x, y, z: sc.csdf(sc.params, x, y, z))
        ax = jnp.linspace(-2.6, 2.6, R)
        out = []
        for xs in np.array_split(np.asarray(ax), max(1, R // 32)):
            X, Y, Z = jnp.meshgrid(jnp.asarray(xs), ax, ax, indexing="ij")
            out.append(np.asarray(cfn(X.reshape(-1, R), Y.reshape(-1, R), Z.reshape(-1, R))).reshape(len(xs), R, R))
        vals = np.concatenate(out, 0).astype(np.float32)
        np.save(path, vals)
    return SdfGrid(values=jnp.asarray(vals, jnp.float32), lo=(-2.6,)*3, hi=(2.6,)*3)

W = H = 512
cam = look_at((5.0, 2.0, -5.0), (0.0, 0.0, 0.0), fov=np.pi / 4)
o, d, cone = generate_rays(cam, (W, H), (W, H))
cfg = MarchConfig()

for R in (128, 256):
    t0 = time.perf_counter()
    grid = bake_ref_grid(R)
    print(f"R={R} bake/load {time.perf_counter()-t0:.1f}s")
    cfn = grid_csdf(grid)
    @jax.jit
    def many(k):
        def body(i, acc):
            img = render_image_c(lambda p, x, y, z: cfn(x, y, z), {}, o, d, cone)
            return acc + img.sum()
        return jax.lax.fori_loop(0, k, body, 0.0)
    def run(k):
        return float(many(jnp.int32(k)))
    t0 = time.perf_counter(); run(2); print(f"  compile+2 frames {time.perf_counter()-t0:.1f}s")
    sec = _slope_time(run, k1=2, k2=8)
    rays = W * H
    print(f"  R={R} SoA XLA: {rays/sec/1e6:.1f} Mrays/s  ({sec*1e3:.1f} ms/frame)", flush=True)
