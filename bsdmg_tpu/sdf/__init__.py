"""Pure-JAX signed-distance-field library.

Every function is natively batched: points ``p`` have shape ``(..., 3)`` and
distances come back with shape ``(...,)``. Everything is ``jit``/``grad``/
``vmap``-compatible and shape-polymorphic over the batch dims, which lets the
tracer, the voxel refiner and the marching-cubes extractor all share one scene
definition compiled into fully fused XLA programs.
"""

from bsdmg_tpu.sdf.primitives import (
    inside_aabb,
    ray_distance_to_bb,
    sd_box,
    sd_box_skeleton,
    sd_bounding_box,
    sd_line,
    sd_mandelbulb,
    sd_ray,
    sd_ray_segment,
    sd_simple_box,
    sd_sphere,
    sd_unit_cube,
    sd_unit_mandelbulb,
    sd_unit_sphere,
    smooth_min,
    wrap,
)
from bsdmg_tpu.sdf.normals import (
    closest_surface_point,
    normal_fd4,
    normal_grad,
    normal_plane,
)

__all__ = [
    "inside_aabb",
    "ray_distance_to_bb",
    "sd_box",
    "sd_box_skeleton",
    "sd_bounding_box",
    "sd_line",
    "sd_mandelbulb",
    "sd_ray",
    "sd_ray_segment",
    "sd_simple_box",
    "sd_sphere",
    "sd_unit_cube",
    "sd_unit_mandelbulb",
    "sd_unit_sphere",
    "smooth_min",
    "wrap",
    "closest_surface_point",
    "normal_fd4",
    "normal_grad",
    "normal_plane",
]
