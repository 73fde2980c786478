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
    """Analytic speed-of-light estimate for the sphere-trace kernel."""

    rays: int
    avg_steps: float
    ops_per_eval: int
    #: f32 VPU peak of one v5e core: 8x128 lanes x 4 ALUs x ~0.94 GHz.
    vpu_flops_per_s: float = 3.85e12

    @property
    def total_ops(self) -> float:
        return self.rays * self.avg_steps * self.ops_per_eval

    @property
    def seconds(self) -> float:
        return self.total_ops / self.vpu_flops_per_s

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
