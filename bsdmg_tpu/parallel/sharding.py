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
    use_grad_normal: bool = False,
    csdf=None,
):
    """Forward render with rays sharded over the mesh, params replicated.

    ``use_grad_normal`` defaults to ``False`` — the reference's fd4 stencil,
    matching the single-device ``render_image`` default, so sharded and
    direct renders of the same scene are identical by default.

    SDF evaluation is embarrassingly parallel over rays, so the only
    communication is the initial params broadcast; each device traces its
    image shard independently (no resharding until the host gathers pixels).
    """
    replicated = NamedSharding(mesh, P())
    out_sharding = NamedSharding(mesh, P("dp", "sp"))
    params = jax.device_put(params, replicated)

    if csdf is not None:
        # SoA fast path: coordinate planes, full lane occupancy (~20x)
        return _render_sharded_c_jit(
            csdf, config, use_grad_normal, out_sharding, params, origins,
            directions, cone,
        )
    return _render_sharded_points_jit(
        scene, config, use_grad_normal, out_sharding, params, origins,
        directions, cone,
    )


# module-level jitted bodies: cached per (scene/csdf, config, normals,
# sharding) across calls — defining the jit inside render_sharded made
# every frame a fresh wrapper that RECOMPILED the sharded render (the same
# class of bug the round-2 advisor found in train_step; caught again by
# bench.benchmark_scaling_overhead measuring a 26x "overhead" that was
# compile time)
@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _render_sharded_points_jit(
    scene_fn, config, use_grad_normal, out_sharding, p, o, d, c
):
    img = render_image(
        lambda q: scene_fn(p, q), o, d, c, config,
        use_grad_normal=use_grad_normal,
    )
    return jax.lax.with_sharding_constraint(img, out_sharding)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _render_sharded_c_jit(
    component_fn, config, use_grad_normal, out_sharding, p, o, d, c
):
    img = render_image_c(
        component_fn, p, o, d, c, config, use_grad_normal=use_grad_normal
    )
    return jax.lax.with_sharding_constraint(img, out_sharding)


@partial(
    jax.jit,
    static_argnums=(0, 1, 8, 9, 10),
    donate_argnums=(2, 3),
)
def _train_step_jit(
    scene_fn, opt, p, opt_st, tgt, o, d, c, component_fn, mesh, config
):
    """Module-level jitted train step: cached per (scene, optimizer, csdf,
    mesh, config) across every optimizer iteration — defining the jit inside
    ``train_step`` made each call a fresh wrapper that retraced the whole
    sharded graph (advisor finding, round 2)."""
    replicated = NamedSharding(mesh, P())

    def loss_fn(pp):
        # use_pallas=False: this step runs under plain jit with dp/sp-sharded
        # rays, and GSPMD has no partitioning rule for a pallas_call — the
        # auto-selected Pallas diff path would gather/replicate the rays per
        # device (or fail to compile) on a real multi-chip mesh. The XLA SoA
        # path shards cleanly; the fused Pallas training step is the
        # shard_map-wrapped train_step_fused below.
        img = render_image_diff(
            scene_fn, pp, o, d, c, config, csdf=component_fn,
            use_pallas=False,
        )
        return jnp.mean((img - tgt) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(p)
    # params are replicated; grads reduce over the mesh automatically.
    updates, opt_st = opt.update(grads, opt_st, p)
    import optax

    p = optax.apply_updates(p, updates)
    p = jax.lax.with_sharding_constraint(p, replicated)
    return p, opt_st, loss


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

    Returns ``(params, opt_state, loss)``. Jit-cached per
    (scene, optimizer, csdf, mesh, config).
    """
    return _train_step_jit(
        scene, optimizer, params, opt_state, target, origins, directions,
        cone, csdf, mesh, config,
    )


@partial(
    jax.jit,
    static_argnames=(
        "csdf", "mesh", "config", "bb", "interpret", "h", "w", "split",
        "two_phase", "phase_a_steps",
    ),
)
def _render_sharded_pallas_jit(
    csdf, origins, directions, cone_full, mesh, config, bb, interpret, h, w,
    split=None, two_phase=False, phase_a_steps=48,
):
    from jax.experimental.shard_map import shard_map

    from bsdmg_tpu.ops.pallas.render_kernel import (
        _SWIZZLED_BLOCK_ROWS,
        TILE_S,
        _unswizzle,
        render_swizzled,
        swizzled_ray_planes,
    )

    n = mesh.devices.size
    granule = n * _SWIZZLED_BLOCK_ROWS
    o_s, d_s, c_s, (hp, wp, m, mp) = swizzled_ray_planes(
        origins, directions, cone_full, h, w, row_granule=granule
    )
    nblk = mp // TILE_S  # swizzle units: one 32x32 spatial block = 8 rows

    def stripe(x):
        # deal blocks round-robin across the n shards: shard i gets blocks
        # i, i+n, i+2n, ... (a representative mix of sky and object blocks)
        t = x.reshape(nblk // n, n, TILE_S, *x.shape[1:])
        return t.swapaxes(0, 1).reshape(x.shape)

    def unstripe(x):
        t = x.reshape(n, nblk // n, TILE_S, *x.shape[1:])
        return t.swapaxes(0, 1).reshape(x.shape)

    o_s, d_s, c_s = stripe(o_s), stripe(d_s), stripe(c_s)

    axes = tuple(mesh.axis_names)  # flatten every mesh axis onto the rows
    spec3 = P(axes, None, None)
    spec2 = P(axes, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec3, spec3, spec2),
        out_specs=(spec2,) * 3,
        check_rep=False,
    )
    def local(o, d, c):
        # two_phase="block" retires finished 32x32 blocks per shard after
        # phase_a_steps (tail_cap=None: the per-shard default); row-mode
        # two-phase keeps the legacy 32/1024 knobs
        return render_swizzled(
            csdf, o, d, c, config, bb, bb is not None,
            two_phase, phase_a_steps, None if two_phase == "block" else 1024,
            interpret, config.relaxation, split,
        )

    r, g, b = local(o_s, d_s, c_s)
    r, g, b = (_unswizzle(unstripe(x)[:m], hp, wp) for x in (r, g, b))
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)


def render_grid_sharded(
    grid,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    *,
    levels=None,
    interpret: bool = False,
):
    """Multi-device mesh-asset rendering: the gather-free contraction grid
    tracer (ops/pallas/grid_kernel.py) under ``shard_map``.

    Same dealing strategy as :func:`render_sharded_pallas`: the swizzled
    32x32 block rows are striped round-robin across every chip, so each
    shard gets a representative mix of sky and surface blocks. Everything
    inside a shard is local — the mip-ladder Pallas kernels, the
    shrinking-cap compacted fine finish, and the compacted normals all
    operate on the shard's own rays; the mip tables and fine grid replicate
    (they are closed-over constants), so the only cross-device traffic is
    the initial reshard. Per-shard finish caps scale with the shard's ray
    count automatically (they are fractions).

    Takes the full unsharded ray image (scanline order); returns the full
    linear-RGB image.
    """
    h, w = origins.shape[:2]
    cone_full = jnp.broadcast_to(
        jnp.asarray(cone, jnp.float32), origins.shape[:-1]
    )
    from jax.experimental.shard_map import shard_map

    from bsdmg_tpu.ops.pallas.grid_kernel import (
        make_contraction_levels, shade_grid_planes_contraction,
    )
    from bsdmg_tpu.ops.pallas.render_kernel import (
        _SWIZZLED_BLOCK_ROWS, TILE_S, _unswizzle, swizzled_ray_planes,
    )

    if levels is None:
        levels = make_contraction_levels(grid)
    n = mesh.devices.size
    granule = n * _SWIZZLED_BLOCK_ROWS
    o_s, d_s, c_s, (hp, wp, m, mp) = swizzled_ray_planes(
        origins, directions, cone_full, h, w, row_granule=granule
    )
    nblk = mp // TILE_S

    def stripe(x):
        t = x.reshape(nblk // n, n, TILE_S, *x.shape[1:])
        return t.swapaxes(0, 1).reshape(x.shape)

    def unstripe(x):
        t = x.reshape(n, nblk // n, TILE_S, *x.shape[1:])
        return t.swapaxes(0, 1).reshape(x.shape)

    o_s, d_s, c_s = stripe(o_s), stripe(d_s), stripe(c_s)
    axes = tuple(mesh.axis_names)
    spec3 = P(axes, None, None)
    spec2 = P(axes, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec3, spec3, spec2),
        out_specs=(spec2,) * 3,
        check_rep=False,
    )
    def local(o, d, c):
        return shade_grid_planes_contraction(
            grid, o, d, c, config, levels, interpret
        )

    r, g, b = local(o_s, d_s, c_s)
    r, g, b = (_unswizzle(unstripe(x)[:m], hp, wp) for x in (r, g, b))
    return jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)


def train_step_fused(
    csdf_p,
    params: Any,
    opt_state: Any,
    optimizer,
    target: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    split=None,
    interpret: bool = False,
):
    """One inverse-rendering step, fully fused per chip.

    Each chip runs the single-kernel loss+grad
    (``ops.pallas.diff_kernel.render_loss_grad_pallas`` — march + IFT +
    shade + loss + in-kernel reverse-mode) on its ray shard; the per-shard
    gradient partial sums ``psum`` over ICI into the exact global-mean
    gradient (shards pass the global pixel count as the mean denominator),
    then a replicated optax update. This is the maximum-fusion training
    configuration: two collective ops per step, everything else in-kernel.

    Shard rays + target identically beforehand (e.g. ``shard_rays`` with
    the same permutation applied to ``target`` — the loss is
    permutation-invariant, so no unpermute is needed).

    Returns ``(params, opt_state, loss)``.
    """
    h, w = origins.shape[:2]
    cone_full = jnp.broadcast_to(jnp.asarray(cone, jnp.float32), (h, w))
    return _train_step_fused_jit(
        csdf_p, optimizer, params, opt_state, target, origins, directions,
        cone_full, mesh, config, bb, split, interpret, h, w,
    )


@partial(
    jax.jit,
    static_argnums=(0, 1) + tuple(range(8, 15)),
    donate_argnums=(2, 3),
)
def _train_step_fused_jit(
    cfn, opt, p, opt_st, tgt, o, d, c, mesh, config, bb, split, interpret,
    h, w,
):
    """Module-level jitted fused step (see ``_train_step_jit`` for why)."""
    from jax.experimental.shard_map import shard_map

    from bsdmg_tpu.ops.pallas.diff_kernel import render_loss_grad_pallas

    axes = tuple(mesh.axis_names)
    ray = P(axes[0], axes[1] if len(axes) > 1 else None, None)
    plane = P(axes[0], axes[1] if len(axes) > 1 else None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), ray, ray, plane, ray),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def local(p_, o_, d_, c_, t_):
        loss, grads = render_loss_grad_pallas(
            cfn, p_, t_, o_, d_, c_, config,
            bb=bb, split=split, interpret=interpret,
            total_pixels=h * w,
        )
        loss = jax.lax.psum(loss, axes)
        grads = jax.lax.psum(grads, axes)
        return loss, grads

    loss, grads = local(p, o, d, c, tgt)
    updates, opt_st = opt.update(grads, opt_st, p)
    import optax

    p = optax.apply_updates(p, updates)
    return p, opt_st, loss


def render_sharded_pallas(
    csdf,
    origins: jax.Array,
    directions: jax.Array,
    cone: jax.Array,
    mesh: Mesh,
    config: MarchConfig = MarchConfig(),
    *,
    bb: tuple | None = None,
    split=None,
    interpret: bool = False,
    two_phase: bool | str = False,
    phase_a_steps: int = 48,
):
    """Multi-device fused-kernel rendering: ``shard_map`` over the mesh with
    the single-chip Pallas render kernel inside.

    ``two_phase="block"`` enables per-shard block-granule ray retirement
    (same semantics and pixel-exactness as the single-chip kernel; each
    shard compacts its own long-tail blocks, no cross-shard traffic).

    The image is swizzled into its (M, 128) 32x32-block layout *globally*,
    then the block rows are dealt round-robin across all chips (both mesh
    axes flattened) — so every shard is a full-occupancy multiple of the
    kernel's 32-row Pallas block (no per-shard swizzle padding: at 1080p the
    old per-chip row-shard padded 135-row shards to 160 swizzle-granule rows,
    a 19% lane tax) and gets a representative mix of cheap sky blocks and
    expensive object blocks (the multi-chip analogue of the reference's warp
    swizzle, common.cu:186-215). The scene is a compiled component SDF
    (params baked — forward serving); SDF evaluation is embarrassingly
    parallel, so the only cross-device traffic is the initial reshard.

    Takes the *full* unsharded ray image (scanline order); returns the full
    image. Load balancing is internal — do not pre-permute with
    ``shard_rays``.
    """
    h, w = origins.shape[:2]
    cone_full = jnp.broadcast_to(
        jnp.asarray(cone, jnp.float32), origins.shape[:-1]
    )
    return _render_sharded_pallas_jit(
        csdf, origins, directions, cone_full, mesh, config, bb, interpret,
        h, w, split, two_phase, phase_a_steps,
    )
