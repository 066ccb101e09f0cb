from .mesh import (
    make_mesh,
    make_data_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "make_data_mesh", "batch_sharding", "replicated",
           "shard_batch"]
