"""HLO collective-op audit of the production sharded paths.

The scaling-efficiency story (PARITY.md: near-perfect weak scaling — the
reference is single-GPU with zero inter-device traffic, src/cuda/mod.rs:52)
is made auditable without multi-chip hardware by compiling the SPMD
programs on the 8-device virtual CPU mesh and counting collective ops in
the partitioned HLO:

* ``render_sharded_pallas`` — ZERO collectives in the march: ray tracing is
  embarrassingly parallel. The only collectives are exactly 3 all-gathers,
  the final frame assembly (one per color plane) when the full image is
  returned to the caller.
* ``train_step_fused`` — exactly ONE all-reduce: the loss psum and the
  gradient-pytree psum fuse into a single tuple all-reduce over both mesh
  axes. Everything else is in-kernel.
* ``train_step`` (XLA autodiff path) — only all-reduces (the XLA-inserted
  gradient/loss reductions; the exact count is a partitioner choice that
  has been observed at 2-4), never a gather/scatter/permute collective.

If someone adds a hot-path collective (a resharding ``with_sharding_
constraint``, an accidental global reduction inside the march), these
counts change and this test fails.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bsdmg_tpu.cam import generate_rays, look_at
from bsdmg_tpu.config import MarchConfig
from bsdmg_tpu.models import reference_render_scene
from bsdmg_tpu.ops.pallas import compile_scene_csdf
from bsdmg_tpu.ops.pallas.csdf import scene_bounds
from bsdmg_tpu.parallel import make_mesh, shard_rays
from bsdmg_tpu.parallel.sharding import (
    _render_sharded_pallas_jit,
    _train_step_fused_jit,
    _train_step_jit,
)

# matches "  %name = <type> all-reduce(..." including tuple-typed ops
# (spaces inside the type) and async -start variants
_COLLECTIVE = re.compile(
    r" (all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\("
)


def _collective_counts(compiled_text: str) -> dict:
    counts: dict = {}
    for m in _COLLECTIVE.finditer(compiled_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(shape=(4, 2))
    scene = reference_render_scene()
    cam = look_at((5.0, 2.0, -5.0), fov=np.pi / 4)
    h, w = 32, 64
    origins, dirs, cone = generate_rays(cam, (w, h), (1920.0, 1080.0))
    return mesh, scene, origins, dirs, cone, h, w


class TestRenderHotPathHasNoCollectives:
    def test_sharded_pallas_render(self, setup):
        mesh, scene, origins, dirs, cone, h, w = setup
        cone_full = jnp.broadcast_to(jnp.asarray(cone, jnp.float32), (h, w))
        rep = NamedSharding(mesh, P())
        o, d, c = (jax.device_put(x, rep) for x in (origins, dirs, cone_full))
        txt = (
            _render_sharded_pallas_jit.lower(
                compile_scene_csdf(scene), o, d, c, mesh, MarchConfig(),
                scene_bounds(scene), True, h, w, None,
            )
            .compile()
            .as_text()
        )
        counts = _collective_counts(txt)
        # the 3 all-gathers are the output frame assembly (r, g, b planes);
        # the march itself communicates nothing
        assert counts == {"all-gather": 3}, counts


class TestTrainStepCollectiveBudget:
    def test_fused_step_is_one_tuple_all_reduce(self, setup):
        mesh, scene, origins, dirs, cone, h, w = setup
        params = {
            k: jnp.array(v)
            for k, v in scene.params.items()
            if k not in ("object_center", "object_rotation")
        }
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        o, d, c, _ = shard_rays(origins, dirs, cone, mesh, interleave=False)
        cfull = jnp.broadcast_to(jnp.asarray(c, jnp.float32), (h, w))
        target = jax.device_put(
            jnp.zeros((h, w, 3), jnp.float32), NamedSharding(mesh, P("dp", "sp"))
        )
        txt = (
            _train_step_fused_jit.lower(
                scene.csdf, opt, params, opt_state, target, o, d, cfull,
                mesh, MarchConfig(), None, None, True, h, w,
            )
            .compile()
            .as_text()
        )
        counts = _collective_counts(txt)
        assert counts == {"all-reduce": 1}, counts

    def test_xla_step_all_reduces_only(self, setup):
        mesh, scene, origins, dirs, cone, h, w = setup
        params = {k: jnp.array(v) for k, v in scene.params.items()}
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        o, d, c, _ = shard_rays(origins, dirs, cone, mesh, interleave=False)
        target = jax.device_put(
            jnp.zeros((h, w, 3), jnp.float32), NamedSharding(mesh, P("dp", "sp"))
        )
        txt = (
            _train_step_jit.lower(
                scene.sdf, opt, params, opt_state, target, o, d, c,
                scene.csdf, mesh, MarchConfig(),
            )
            .compile()
            .as_text()
        )
        counts = _collective_counts(txt)
        # reduction count is a partitioner choice (observed 2-4); the
        # contract is: reductions only, and few — no gather/permute/scatter
        # collectives, no unbounded growth
        assert set(counts) == {"all-reduce"}, counts
        assert counts["all-reduce"] <= 4, counts
