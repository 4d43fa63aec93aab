from eventpretrain_tpu.parallel.mesh import (
    maybe_initialize_distributed,
    make_mesh,
    local_batch_size,
    shard_batch,
    replicate,
    data_sharding,
    HostShardedSource,
    ShardedPipeline,
)
