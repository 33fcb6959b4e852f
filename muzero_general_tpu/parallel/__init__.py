"""Device-mesh parallelism: sharding rules and sharded train/self-play steps."""

from muzero_general_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    make_sharded_train_step,
    param_sharding,
    replicated,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding",
    "make_sharded_train_step",
    "shard_batch",
    "shard_train_state",
]
