"""Dev sweep: batched-frame render dispatch (frames=F) vs single-frame.

Also checks parity: the batched swizzled planes produce pixel-identical
r/g/b rows to the single-frame kernel for each frame offset.
"""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bsdmg_tpu.bench import benchmark_render


def parity_check():
    from bsdmg_tpu.cam import generate_rays, look_at
    from bsdmg_tpu.config import MarchConfig
    from bsdmg_tpu.models import reference_render_scene
    from bsdmg_tpu.ops.pallas import compile_scene_csdf
    from bsdmg_tpu.ops.pallas.csdf import compile_scene_split, scene_bounds
    from bsdmg_tpu.ops.pallas.render_kernel import (
        render_swizzled, swizzled_ray_planes,
    )

    scene = reference_render_scene()
    cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
    origins, dirs, cone = generate_rays(cam, (256, 128), (1920.0, 1080.0))
    csdf = compile_scene_csdf(scene)
    bb = scene_bounds(scene)
    split = compile_scene_split(scene)
    config = MarchConfig()

    o_s, d_s, cone_s, _ = swizzled_ray_planes(origins, dirs, cone, 128, 256)
    F = 3
    o_b = jnp.concatenate([o_s + 1e-6 * j for j in range(F)], axis=0)
    d_b = jnp.concatenate([d_s] * F, axis=0)
    c_b = jnp.concatenate([cone_s] * F, axis=0)
    rb, gb, bbp = render_swizzled(
        csdf, o_b, d_b, c_b, config, bb, True, False, 32, None, False, 1.0,
        split,
    )
    m = o_s.shape[0]
    for j in range(F):
        r1, g1, b1 = render_swizzled(
            csdf, o_s + 1e-6 * j, d_s, c_b[:m], config, bb, True, False, 32,
            None, False, 1.0, split,
        )
        for a, b_ in ((rb[j * m:(j + 1) * m], r1), (gb[j * m:(j + 1) * m], g1),
                      (bbp[j * m:(j + 1) * m], b1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    print("parity OK: batched == per-frame, pixel exact, F=3")


if __name__ == "__main__":
    parity_check()
    for f in [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8"])]:
        r = benchmark_render(1920, 1080, frames=f)
        print(f"frames={f}: {r['rays_per_s']/1e6:.1f} Mrays/s "
              f"({r['seconds_per_frame']*1e3:.3f} ms/frame)")
