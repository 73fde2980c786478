"""End-to-end mesh-asset run (BASELINE's last config): OBJ -> 256^3 SDF bake
-> contraction-ladder TPU render -> adaptive 1024^3 extraction -> weld ->
OBJ. Timed per stage; run on the real chip (round 5)."""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

t00 = time.perf_counter()
obj_path = sys.argv[1] if len(sys.argv) > 1 else ".cache/torus.obj"

from bsdmg_tpu.mesh.export import load_obj, save_obj, save_png
from bsdmg_tpu.models.mesh_sdf import bake_mesh_grid, grid_csdf, grid_sdf
from bsdmg_tpu.ops.pallas.grid_kernel import (
    make_contraction_levels, probe_grid_backend, render_image_grid,
)
from bsdmg_tpu.cam import generate_rays, look_at
from bsdmg_tpu.config import MeshGenConfig
from bsdmg_tpu.mesh import generate_mesh
from bsdmg_tpu.ops.shade import to_rgba8

src = load_obj(obj_path)
print(f"loaded {obj_path}: {src.vertex_count} verts {src.triangle_count} tris", flush=True)

t0 = time.perf_counter()
grid = bake_mesh_grid(src.vertices, src.faces, resolution=256, chunk=4096)
vals_host = np.asarray(grid.values)  # one pull; keep everything host-backed
from bsdmg_tpu.models.mesh_sdf import SdfGrid
grid = SdfGrid(values=vals_host, lo=grid.lo, hi=grid.hi)
print(f"bake 256^3: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
print("probe:", probe_grid_backend(), flush=True)
levels = make_contraction_levels(grid)
W = H = 512
cam = look_at((3.0, 1.5, -3.0), (0.0, 0.0, 0.0), fov=np.pi / 4)
o, d, cone = generate_rays(cam, (W, H), (W, H))
render = jax.jit(lambda: render_image_grid(grid, o, d, cone, mode="contraction", levels=levels))
img = np.asarray(render())
print(f"render 512^2 (compile+1): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
img = np.asarray(render())
rt = time.perf_counter() - t0
print(f"render frame 2: {rt*1e3:.0f} ms ({W*H/rt/1e6:.2f} Mrays/s incl. dispatch)", flush=True)
save_png(img, ".cache/torus_render.png")
hitfrac = float((img.sum(-1) > 0.01).mean())
print(f"wrote .cache/torus_render.png (lit fraction {hitfrac:.3f})", flush=True)

t0 = time.perf_counter()
bb_size = float(grid.hi[0] - grid.lo[0])
cfg = MeshGenConfig(init_factor=32, bb_size=bb_size)
center = jnp.asarray([(l + h) / 2 for l, h in zip(grid.lo, grid.hi)], jnp.float32)
sdf = grid_sdf(grid)
gcsdf = grid_csdf(grid)
shifted = lambda p: sdf(p + center)
shifted_c = lambda x, y, z: gcsdf(x + center[0], y + center[1], z + center[2])
mesh = generate_mesh(shifted, refine_steps=5, config=cfg, csdf=shifted_c)
print(f"extract 32^3 -> 1024^3 (5 refines) + weld: {time.perf_counter()-t0:.1f}s", flush=True)
mesh.vertices = mesh.vertices + np.asarray(center)
save_obj(mesh, ".cache/torus_1024.obj")
print(f"mesh: {mesh.vertex_count} verts {mesh.triangle_count} tris -> .cache/torus_1024.obj", flush=True)

# fidelity: welded vertices must lie on the baked surface
sd = np.asarray(shifted(jnp.asarray(mesh.vertices - np.asarray(center))))
print(f"vertex |sdf|: mean {np.abs(sd).mean():.2e} max {np.abs(sd).max():.2e}", flush=True)
print(f"TOTAL {time.perf_counter()-t00:.1f}s", flush=True)
