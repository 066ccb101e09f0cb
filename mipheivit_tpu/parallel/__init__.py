from .mesh import (
    make_mesh,
    make_data_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from .sharding import encoder_param_specs, shard_opt_state, shard_params

__all__ = ["make_mesh", "make_data_mesh", "batch_sharding", "replicated",
           "shard_batch", "encoder_param_specs", "shard_opt_state",
           "shard_params"]
