"""Scene definitions ("model families") for the renderer and mesh generator.

A *scene* is a pair ``(sdf_fn, params)`` where ``sdf_fn(params, p)`` maps a
params pytree and points ``(..., 3)`` to signed distances ``(...,)``. Keeping
the parameters out of the closure makes every scene differentiable (pixel
gradients w.r.t. SDF parameters — the BASELINE north star) and shardable
(params are a small replicated pytree).
"""

from bsdmg_tpu.models.scenes import (
    SCENES,
    Scene,
    box_scene,
    get_scene,
    mandelbulb_scene,
    reference_object,
    reference_render_scene,
    sphere_scene,
)
from bsdmg_tpu.models.compose import compose_scene, load_scene_spec
from bsdmg_tpu.models.motion import (
    AxisCyclicMotion,
    RotateAxisMotion,
    SceneSettings,
    SphericCyclicMotion,
    Transform,
    apply_motion,
    set_center,
)

__all__ = [
    "AxisCyclicMotion",
    "RotateAxisMotion",
    "SceneSettings",
    "SphericCyclicMotion",
    "Transform",
    "apply_motion",
    "set_center",
    "SCENES",
    "Scene",
    "box_scene",
    "compose_scene",
    "load_scene_spec",
    "get_scene",
    "mandelbulb_scene",
    "reference_object",
    "reference_render_scene",
    "sphere_scene",
]
