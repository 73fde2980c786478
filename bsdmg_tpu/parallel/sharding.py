"""Multi-device sharding: rays and voxel blocks over a `jax.sharding.Mesh`.

The reference is single-GPU with zero inter-device communication
(``CudaDevice::new(0)``, src/cuda/mod.rs:52; PCIe memcpys only). The
TPU-native scaling story (SURVEY §2.4, §7):

* **Rays** shard over the image row axis ("dp") and column axis ("sp") of a
  2-D device mesh — the structural analogue of data/sequence parallelism for
  this workload. SDF parameters are a tiny pytree, replicated.
* **Voxel blocks** shard over the batch axis for refinement/extraction.
* **Gradients** of the replicated params are partial sums per shard; XLA
  inserts the ``psum`` over ICI automatically when we jit with replicated
  out-shardings (overlap with the backward pass is XLA's job — we keep the
  program a single fused jit).
* Multi-host: same code path — ``jax.distributed.initialize()`` plus a global
  mesh (see ``parallel/multihost.py``).

Work imbalance note: sky rays finish in a few steps, silhouette rays run to
the step limit. Sharding contiguous row *blocks* would put whole-object rows
on one chip; :func:`shard_rays` therefore supports interleaved row assignment
(``interleave=True``) which stripes rows round-robin across devices — the
load-balance analogue of the reference's warp swizzle (common.cu:186-215).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.grad import render_image_diff
from bsdmg_tpu.ops.shade import render_image, render_image_c

SceneFn = Callable[[Any, jax.Array], jax.Array]


def make_mesh(
    devices=None, shape: tuple[int, int] | None = None, axis_names=("dp", "sp")
) -> Mesh:
    """Build a 2-D device mesh (rows x cols of the image).

    ``shape=None`` puts all devices on the first ("dp") axis — the right
    default for row-sharded rendering; pass e.g. ``(4, 2)`` for 2-D sharding.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def interleave_rows(h: int, n_shards: int) -> np.ndarray:
    """Permutation striping rows round-robin across shards (load balance)."""
    order = np.argsort(np.arange(h) % n_shards, kind="stable")
    return order


def shard_rays(origins, dirs, cone, mesh: Mesh, *, interleave: bool = True):
    """Place a ``(H, W, ...)`` ray bundle on the mesh: rows over "dp", columns
    over "sp". With ``interleave`` the rows are striped first so each device
    gets a representative slice of the image (cheap sky + expensive object
    rows alike). Returns ``(origins, dirs, cone, unpermute)``; apply
    ``unpermute`` to rendered images to restore scanline order."""
    h = origins.shape[0]
    n_dp = mesh.shape["dp"]
    if interleave and n_dp > 1:
        order = interleave_rows(h, n_dp)
        inverse = np.argsort(order)
        origins = origins[order]
        dirs = dirs[order]
        cone = cone[order]
        unpermute = lambda img: img[inverse]
    else:
        unpermute = lambda img: img

    ray_sharding = NamedSharding(mesh, P("dp", "sp"))
    origins = jax.device_put(origins, ray_sharding)
    dirs = jax.device_put(dirs, ray_sharding)
    cone = jax.device_put(cone, ray_sharding)
    return origins, dirs, cone, unpermute


def render_sharded(
    scene: SceneFn,
    params: Any,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    *,
    use_grad_normal: bool = True,
    csdf=None,
):
    """Forward render with rays sharded over the mesh, params replicated.

    SDF evaluation is embarrassingly parallel over rays, so the only
    communication is the initial params broadcast; each device traces its
    image shard independently (no resharding until the host gathers pixels).
    """
    replicated = NamedSharding(mesh, P())
    out_sharding = NamedSharding(mesh, P("dp", "sp"))
    params = jax.device_put(params, replicated)

    @partial(
        jax.jit,
        static_argnums=(0,),
        out_shardings=out_sharding,
    )
    def _render(scene_fn, p, o, d, c):
        return render_image(
            lambda q: scene_fn(p, q), o, d, c, config, use_grad_normal=use_grad_normal
        )

    @partial(jax.jit, static_argnums=(0,), out_shardings=out_sharding)
    def _render_c(component_fn, p, o, d, c):
        return render_image_c(
            component_fn, p, o, d, c, config, use_grad_normal=use_grad_normal
        )

    if csdf is not None:
        # SoA fast path: coordinate planes, full lane occupancy (~20x)
        return _render_c(csdf, params, origins, directions, cone)
    return _render(scene, params, origins, directions, cone)


def train_step(
    scene: SceneFn,
    params: Any,
    opt_state: Any,
    optimizer,
    target: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    csdf=None,
):
    """One inverse-rendering step: sharded differentiable render, L2 loss,
    gradient all-reduce over ICI (XLA-inserted), replicated optimizer update.

    Returns ``(params, opt_state, loss)``. Jit-cached per (scene, optimizer).
    """
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnums=(0, 1, 8), donate_argnums=(2, 3))
    def _step(scene_fn, opt, p, opt_st, tgt, o, d, c, component_fn=None):
        def loss_fn(pp):
            img = render_image_diff(
                scene_fn, pp, o, d, c, config, csdf=component_fn
            )
            return jnp.mean((img - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # params are replicated; grads reduce over the mesh automatically.
        updates, opt_st = opt.update(grads, opt_st, p)
        import optax

        p = optax.apply_updates(p, updates)
        p = jax.lax.with_sharding_constraint(p, replicated)
        return p, opt_st, loss

    return _step(
        scene, optimizer, params, opt_state, target, origins, directions, cone,
        csdf,
    )


def render_sharded_pallas(
    csdf,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    interpret: bool = False,
):
    """Multi-device fused-kernel rendering: ``shard_map`` over the mesh with
    the single-chip Pallas render kernel inside.

    Rays shard over both mesh axes (rows over "dp", columns over "sp"); the
    scene is a compiled component SDF (params baked — the forward-serving
    configuration). SDF evaluation is embarrassingly parallel, so there is no
    collective inside the map: each chip traces and shades its own tile of
    the image at full single-chip kernel speed (~586 Mrays/s/chip at 1080p on
    v5e), which is what makes >= 80% scaling efficiency the expectation —
    the only cross-device traffic is the initial shard placement.
    """
    from jax.experimental.shard_map import shard_map

    from bsdmg_tpu.ops.pallas.render_kernel import render_image_pallas

    ray_spec = P("dp", "sp", None)
    plane_spec = P("dp", "sp")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(ray_spec, ray_spec, plane_spec),
        out_specs=ray_spec,
        check_rep=False,
    )
    def local(o, d, c):
        return render_image_pallas(
            csdf, o, d, c, config, bb=bb, use_bb_skip=bb is not None,
            interpret=interpret,
        )

    cone_full = jnp.broadcast_to(
        jnp.asarray(cone, jnp.float32), origins.shape[:-1]
    )
    return local(origins, directions, cone_full)
