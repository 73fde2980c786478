"""Pallas TPU kernels for the hot paths.

* ``render_kernel`` — the fused tiled sphere tracer + shade (the TPU
  analogue of the reference's warp-coherent pixel swizzle + divergent loop,
  cuda/modules/common.cu:186-215 / cuda/includes/ray_marching.cu), and the
  one march source of truth (``sphere_trace_pallas`` wraps it).
* ``diff_kernel`` — the march with runtime SDF parameters in SMEM (the
  stopped forward pass of the differentiable render).
* ``mesh_kernel`` — per-tile-convergent Newton projection for marching cubes.
* ``csdf`` — component-form (x, y, z planes) scene SDFs so kernels stay in
  native (sublane, lane) layouts instead of a trailing length-3 axis.
"""

from bsdmg_tpu.ops.pallas.csdf import compile_scene_csdf
from bsdmg_tpu.ops.pallas.render_kernel import sphere_trace_pallas

__all__ = ["compile_scene_csdf", "sphere_trace_pallas"]
