from bsdmg_tpu.parallel.mesh import (
    ShardedField,
    distribute_field,
    extract_sharded,
    generate_mesh_sharded,
    refine_field_sharded,
)
from bsdmg_tpu.parallel.sharding import (
    train_step_fused,
    make_mesh,
    render_sharded,
    render_sharded_pallas,
    shard_rays,
    train_step,
)

__all__ = [
    "ShardedField",
    "distribute_field",
    "extract_sharded",
    "generate_mesh_sharded",
    "make_mesh",
    "refine_field_sharded",
    "render_sharded",
    "render_sharded_pallas",
    "shard_rays",
    "train_step",
    "train_step_fused",
]
