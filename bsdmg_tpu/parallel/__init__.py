from bsdmg_tpu.parallel.sharding import (
    make_mesh,
    render_sharded,
    render_sharded_pallas,
    shard_rays,
    train_step,
)

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_sharded_pallas",
    "shard_rays",
    "train_step",
]
