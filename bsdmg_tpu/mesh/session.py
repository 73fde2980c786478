"""Interactive mesh-generation session: the reference's stage machine.

Equivalent of the reference's event-driven state machine
(``RenderMeshGenStage``, src/renderer/mod.rs:42-46, handled at :155-226):

* stage ``EMPTY`` — :meth:`MeshGenSession.advance` creates the initial
  ``init_factor``^3 voxel field and a preview mesh (src/renderer/mod.rs:213-221)
* stage ``VOXEL_FIELD`` — :meth:`MeshGenSession.refine` halves the voxel size
  keeping surface-crossing children and refreshes the preview (:166-188);
  :meth:`MeshGenSession.advance` extracts the final mesh (:196-201)
* stage ``MESH`` — :meth:`MeshGenSession.advance` saves the OBJ and resets to
  ``EMPTY`` (:203-211, output path :11)

``refine`` outside ``VOXEL_FIELD`` is a warned no-op, exactly like the
reference (:182-186). Where Bevy delivers ``MeshGenRefineEvent`` /
``MeshGenAdvanceEvent`` from key presses (src/input_handling.rs:37-42),
callers here invoke the methods directly (CLI verb ``session`` or library
use).
"""

from __future__ import annotations

import enum
from typing import Callable, Optional

import jax

from bsdmg_tpu.config import MeshGenConfig
from bsdmg_tpu.mesh.field import VoxelField, create_voxel_field, refine_field
from bsdmg_tpu.mesh.pipeline import Mesh, extract_mesh_chunked
from bsdmg_tpu.utils import get_logger

SdfFn = Callable[[jax.Array], jax.Array]


class Stage(enum.Enum):
    """src/renderer/mod.rs:42-46."""

    EMPTY = "empty"
    VOXEL_FIELD = "voxel_field"
    MESH = "mesh"


class MeshGenSession:
    """Stateful refine/advance driver over the functional mesh pipeline.

    >>> s = MeshGenSession(sdf)
    >>> s.advance()           # EMPTY -> VOXEL_FIELD (creates 32^3 field)
    >>> s.refine(); s.refine()
    >>> s.advance()           # VOXEL_FIELD -> MESH (marching cubes)
    >>> s.advance()           # MESH -> EMPTY (saves OBJ, resets)
    """

    def __init__(
        self,
        sdf: SdfFn,
        config: MeshGenConfig = MeshGenConfig(),
        *,
        output_path: str = "generated_mesh.obj",
        show_preview: bool = True,
        csdf=None,
    ):
        self.sdf = sdf
        self.csdf = csdf
        self.config = config
        self.output_path = output_path  # src/renderer/mod.rs:11
        self.show_preview = show_preview  # RenderSettings, src/renderer/mod.rs:21-27
        self.stage = Stage.EMPTY
        self.field: Optional[VoxelField] = None
        self.mesh: Optional[Mesh] = None
        self.preview: Optional[Mesh] = None
        self._log = get_logger()

    def _update_preview(self) -> None:
        if self.show_preview and self.field is not None:
            self.preview = extract_mesh_chunked(
                self.sdf, self.field, self.config, csdf=self.csdf
            )

    def refine(self) -> None:
        """One refinement pass; no-op with a warning outside VOXEL_FIELD
        (src/renderer/mod.rs:166-188)."""
        if self.stage is not Stage.VOXEL_FIELD:
            self._log.warning(
                "refine ignored: no voxel field present (stage=%s)", self.stage.value
            )
            return
        assert self.field is not None
        self.field = refine_field(self.sdf, self.field, self.config, csdf=self.csdf)
        self._log.info(
            "refined field: %d voxels at size %.5f", self.field.count, self.field.voxel_size
        )
        self._update_preview()

    def advance(self) -> None:
        """Advance the stage machine (src/renderer/mod.rs:191-225)."""
        if self.stage is Stage.EMPTY:
            self.field = create_voxel_field(self.config)
            self.stage = Stage.VOXEL_FIELD
            self._log.info(
                "created voxel field: %d voxels at size %.5f",
                self.field.count,
                self.field.voxel_size,
            )
            self._update_preview()
        elif self.stage is Stage.VOXEL_FIELD:
            assert self.field is not None
            self.mesh = extract_mesh_chunked(
                self.sdf, self.field, self.config, csdf=self.csdf
            )
            self.stage = Stage.MESH
            self._log.info(
                "extracted mesh: %d vertices, %d triangles",
                self.mesh.vertex_count,
                self.mesh.triangle_count,
            )
        else:  # MESH: save + reset
            assert self.mesh is not None
            from bsdmg_tpu.mesh.export import save_obj

            save_obj(self.mesh, self.output_path)
            self._log.info("saved %s; session reset", self.output_path)
            self.stage = Stage.EMPTY
            self.field = None
            self.mesh = None
            self.preview = None
