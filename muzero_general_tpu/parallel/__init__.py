"""Device-mesh parallelism: sharding rules and sharded train/self-play steps."""

from muzero_general_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    make_sharded_fused_train_steps,
    make_sharded_train_step,
    mesh_from_config,
    param_sharding,
    replicated,
    shard_batch,
    shard_stacked_batches,
    shard_train_state,
    stacked_batch_sharding,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding",
    "make_sharded_train_step",
    "make_sharded_fused_train_steps",
    "mesh_from_config",
    "shard_batch",
    "shard_stacked_batches",
    "shard_train_state",
    "stacked_batch_sharding",
]
