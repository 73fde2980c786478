"""Pallas TPU kernels for the hot paths.

* ``trace_kernel`` — tiled sphere tracer with per-tile early exit (the TPU
  analogue of the reference's warp-coherent pixel swizzle + divergent loop,
  cuda/modules/common.cu:186-215 / cuda/includes/ray_marching.cu).
* ``csdf`` — component-form (x, y, z planes) scene SDFs so kernels stay in
  native (sublane, lane) layouts instead of a trailing length-3 axis.
"""

from bsdmg_tpu.ops.pallas.csdf import compile_scene_csdf
from bsdmg_tpu.ops.pallas.trace_kernel import sphere_trace_pallas

__all__ = ["compile_scene_csdf", "sphere_trace_pallas"]
