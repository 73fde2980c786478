"""Worker for the 2-process multi-host test (run by test_multihost.py).

Each process contributes 4 virtual CPU devices; the pair forms an 8-device
global mesh, renders a row-sharded image through the SoA renderer, and
prints the global pixel sum — both processes must agree.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bsdmg_tpu.parallel.multihost import initialize  # noqa: E402


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    initialize(coordinator=f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bsdmg_tpu.cam import generate_rays, look_at
    from bsdmg_tpu.models import reference_render_scene
    from bsdmg_tpu.ops.shade import render_image_c

    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("dp", "sp"))
    scene = reference_render_scene()
    cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
    o, d, c = generate_rays(cam, (128, 64), (1920.0, 1080.0))
    ray_sharding = NamedSharding(mesh, P("dp", "sp", None))
    o_s = jax.device_put(jnp.asarray(o), ray_sharding)
    d_s = jax.device_put(jnp.asarray(d), ray_sharding)
    c_s = jax.device_put(
        jnp.asarray(np.broadcast_to(c, o.shape[:2])), NamedSharding(mesh, P("dp", "sp"))
    )

    @jax.jit
    def go(o, d, c):
        return jnp.sum(render_image_c(scene.csdf, scene.params, o, d, c))

    total = float(go(o_s, d_s, c_s))
    print(f"MHRESULT {pid} {total:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
