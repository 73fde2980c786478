"""Profiling: jax.profiler traces + speed-of-light estimates.

TPU-native replacement for the reference's nvtx/cuProfilerStart/clock64
instrumentation (SURVEY §5): capture an xplane trace viewable in
TensorBoard/XProf, and compute an analytic roofline for the render kernel.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bsdmg_trace"):
    """Capture a jax.profiler trace around a code region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    """Analytic speed-of-light estimate: max(compute time, HBM time).

    ``rays`` x ``avg_steps`` x ``ops_per_eval`` models the required FLOPs;
    ``total_bytes`` the single-pass HBM traffic the stage cannot avoid
    (0 for VMEM-resident kernels whose IO rounds to nothing). The light
    speed is whichever wall the stage hits first.
    """

    rays: int
    avg_steps: float
    ops_per_eval: float
    #: f32 VPU peak of one v5e core: 8x128 lanes x 4 ALUs x ~0.94 GHz.
    vpu_flops_per_s: float = 3.85e12
    total_bytes: float = 0.0
    #: v5e HBM bandwidth (819 GB/s per chip).
    hbm_bytes_per_s: float = 8.19e11

    @property
    def total_ops(self) -> float:
        return self.rays * self.avg_steps * self.ops_per_eval

    @property
    def compute_seconds(self) -> float:
        return self.total_ops / self.vpu_flops_per_s

    @property
    def memory_seconds(self) -> float:
        return self.total_bytes / self.hbm_bytes_per_s

    @property
    def seconds(self) -> float:
        return max(self.compute_seconds, self.memory_seconds)

    @property
    def bound(self) -> str:
        return (
            "compute" if self.compute_seconds >= self.memory_seconds
            else "memory"
        )

    def efficiency(self, measured_seconds: float) -> float:
        return self.seconds / measured_seconds


def render_roofline(width: int, height: int, avg_steps: float,
                    ops_per_eval: int = 110) -> Roofline:
    """Speed-of-light for the reference-scene render.

    ``ops_per_eval`` ~110: two factorized 12-edge skeletons (~40 ops each
    with cross-product grouping), sphere + smooth-min + march bookkeeping.
    ``avg_steps`` should come from the kernel's own measured steps plane
    (``bench.render_step_stats`` — use ``mean_tile_max_steps``, since the
    tile-synchronized march executes the per-tile max, not the per-ray
    mean); ``bench --which render --roofline`` prints the comparison.
    """
    return Roofline(width * height, avg_steps, ops_per_eval)


#: Eval-equivalents the fused loss+grad kernel spends per pixel BEYOND the
#: march (ops/pallas/diff_kernel.py::_loss_grad_kernel), counted from the
#: kernel body:
#:
#: * IFT-denominator ``jax.jvp`` of the scene at the hit: primal + tangent
#:   ~= 2.5 evals (tangent arithmetic of this mostly-affine SDF is ~1.5x
#:   the primal's op count);
#: * ``pixel_loss`` forward: 1 residual eval + reverse-mode grad-of-sum for
#:   the normal (forward + transpose ~= 3 evals) + shading/ACES (~15 ops,
#:   folded into the rounding) ~= 4 evals;
#: * the outer ``value_and_grad`` reverse sweep over ``pixel_loss`` w.r.t.
#:   the k SMEM param scalars: the transpose revisits the same chain at
#:   ~1.5x its forward cost ~= 6 evals.
#:
#: Total ~= 12.5 eval-equivalents; march tile-max steps dominate (typically
#: 40-60), so the estimate's sensitivity to the +-20% uncertainty in these
#: constants is a few percent of the final roofline.
GRAD_EXTRA_EVALS = 12.5


def grad_roofline(width: int, height: int, avg_steps: float,
                  ops_per_eval: int = 110,
                  extra_evals: float = GRAD_EXTRA_EVALS) -> Roofline:
    """Speed-of-light for the fused loss+grad (backward) kernel.

    The BASELINE north star profiles forward AND backward kernels against
    speed-of-light: the backward kernel's per-pixel work is the same march
    (``avg_steps`` = measured ``mean_tile_max_steps`` at the grad operating
    point) plus :data:`GRAD_EXTRA_EVALS` eval-equivalents of IFT + shading
    + in-kernel reverse-mode.
    """
    return Roofline(width * height, avg_steps + extra_evals, ops_per_eval)


def csdf_flops_per_eval(csdf, fallback: float = 55.0) -> float:
    """Per-lane FLOPs of one baked component-SDF eval, from XLA's own
    cost analysis (compile a (8, 128) block, divide by 1024 lanes).

    Grounds every roofline's ``ops_per_eval`` in the compiler's count
    instead of a hand-maintained constant. Falls back to ``fallback``
    (the reference *object* scene's measured 55) on backends whose
    cost model is unavailable (e.g. the tunneled axon transport).
    """
    import jax
    import jax.numpy as jnp

    try:
        x = jnp.zeros((8, 128), jnp.float32)
        compiled = jax.jit(csdf).lower(x, x, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            return flops / x.size
    except Exception:
        pass
    return float(fallback)


#: Single-pass HBM bytes per refined parent (the documented floor model):
#: 27 lattice coordinate planes + values (27 x 4 x 4B = 432), 8 children x
#: 3 coordinate planes written then block-gathered (2 x 96), one
#: single-pass fine sort over ~2 rows/parent x 4 columns read+write (64),
#: and the 3-column output stack (24). The production ``lax.sort`` is a
#: multi-pass sorting network, so the measured stage runs well above this
#: floor by construction — the % quantifies exactly that gap.
REFINE_BYTES_PER_PARENT = 712.0


def refine_roofline(
    parents: int,
    ops_per_eval: float = 55.0,
    bytes_per_parent: float = REFINE_BYTES_PER_PARENT,
) -> Roofline:
    """Speed-of-light for one voxel-refinement level.

    The refine lattice evaluates the parent's shared 3x3x3 corner grid —
    **27 SDF evals per parent** (vs the reference's 64 independent child
    corners, compute_mesh_generation.cu:36-49); the 8-child sign test and
    border mask are a handful of compares folded into the rounding.
    Compute light-speed is ~2.6 Gparents/s on v5e — but the stage is
    **memory-bound**: the on-device blocked compaction (child planes,
    block gather, fine sort — see :data:`REFINE_BYTES_PER_PARENT`) hits
    the HBM wall first, and the multi-pass ``lax.sort`` network moves the
    fine-sort columns O(log^2 n) times against the floor model's single
    pass. The % of roofline quantifies the whole stage against that
    single-pass light speed.
    """
    return Roofline(
        parents, 27.0, ops_per_eval,
        total_bytes=parents * bytes_per_parent,
    )


#: Eval-equivalents of one in-kernel ``jax.vjp`` value-and-grad of the SDF
#: (forward + reverse sweep of a mostly-affine chain ~= 1 + 1.5 evals) —
#: the per-Newton-step cost in ops/pallas/mc_fused.py::step.
MC_GRAD_EVAL_COST = 2.5

#: fd4 exported normals: 4 stencil evals per axis (mc_fused.py::_grad_fd4).
MC_NORMAL_EVALS = 12.0


def mc_roofline(
    lanes: int,
    budget: int,
    newton_steps: float,
    corner_evals_per_lane: float = 8.0,
    ops_per_eval: float = 55.0,
) -> Roofline:
    """Speed-of-light for the fused marching-cubes kernel.

    Per padded kernel lane (``lanes`` = voxels padded to (8, 128) blocks,
    mc_fused_pallas's layout) the kernel must execute, with its per-block
    early exit:

    * ``budget`` interleaved Newton planes x ``newton_steps`` executed
      steps (measured per-block chunk-rounded maxima — see
      ``bench.mc_step_stats``) x :data:`MC_GRAD_EVAL_COST` evals,
    * ``budget`` x :data:`MC_NORMAL_EVALS` fd4 normal evals,
    * 8 corner-classify evals per voxel in the XLA pre-pass.

    The pick/winding select pyramid is tens of vreg selects per lane —
    folded into the rounding, as march bookkeeping is for the render
    roofline.
    """
    evals = (
        budget * (newton_steps * MC_GRAD_EVAL_COST + MC_NORMAL_EVALS)
        + corner_evals_per_lane
    )
    # 6 int32/f32 input planes + 101 output planes (45 pos + 45 nrm +
    # 5 dot + 5 amb + 1 meta) x 4B per lane — far below the compute wall
    # (the kernel is compute-bound), included for the bound label.
    return Roofline(lanes, evals, ops_per_eval,
                    total_bytes=lanes * (6 + 101) * 4.0)
