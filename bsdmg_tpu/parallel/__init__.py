from bsdmg_tpu.parallel.sharding import (
    make_mesh,
    render_sharded,
    shard_rays,
    train_step,
)

__all__ = ["make_mesh", "render_sharded", "shard_rays", "train_step"]
