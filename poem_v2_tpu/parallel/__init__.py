from .mesh import (
    batch_sharding,
    create_mesh,
    local_batch_size,
    replicated,
    shard_batch,
)
