"""bsdmg_tpu — TPU-native differentiable signed-distance renderer + mesh generator.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``Meterius/bevy-signed-distance-mesh-generation`` (Rust/Bevy/CUDA):

* sphere-traced ray-marching renderer of analytic CSG SDF scenes with per-pixel
  cone-radius adaptive collision thresholds, finite-difference normals,
  two-color Lambert shading and an ACES tonemap
  (reference: cuda/modules/compute_render.cu),
* hierarchical SDF voxel-field refinement + marching-cubes surface extraction
  with Newton projection of vertices onto the isosurface
  (reference: cuda/modules/compute_mesh_generation.cu),

re-designed TPU-first: batched functional transforms, static shapes with
mask-and-compact instead of CPU stream compaction, Pallas kernels for the hot
paths, and `jax.sharding` meshes for multi-chip scaling.
"""

import os as _os

# Persistent XLA compilation cache: the kernels here are large while-loop
# programs that take tens of seconds to compile; caching makes reruns and
# benchmarks near-instant. Opt out with BSDMG_NO_CACHE=1.
if not _os.environ.get("BSDMG_NO_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "BSDMG_CACHE_DIR",
                _os.path.expanduser("~/.cache/bsdmg_jax"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from bsdmg_tpu import config
from bsdmg_tpu.config import (
    MarchConfig,
    MeshGenConfig,
    RenderConfig,
)

__version__ = "0.1.0"

__all__ = [
    "config",
    "MarchConfig",
    "MeshGenConfig",
    "RenderConfig",
    "__version__",
]
