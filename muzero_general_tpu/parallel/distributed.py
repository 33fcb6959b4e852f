"""Multi-host scale-out via jax.distributed (SURVEY.md §5.8).

The reference spans a cluster with Ray: SelfPlay actors land on any node,
the Trainer on the GPU node, and SharedStorage/ReplayBuffer are singleton
actors reachable by RPC (reference muzero.py:96 ray.init, README.md:23).
The TPU-native counterpart is `jax.distributed` + one global mesh:

- **Training** is data-parallel over ALL processes: the global dp×mp mesh
  spans every host's devices, each host feeds its local dp shard of the
  batch (`process_local_batch`), and XLA's gradient psum rides ICI within a
  slice and DCN across slices. No parameter server — weights live
  replicated in HBM, updated in place by the sharded train step.
- **Self-play** is per-host: each process runs its own SelfPlayDriver over
  its addressable devices (the reference's "actors on every node"), feeding
  a host-local replay buffer. Games never cross hosts; only gradients do.
- **Counters** (played steps/games for the exact train:act ratio) are
  summed across hosts with `process_allgather` so every learner shard sees
  the same global target.

Entry: `MuZero(game, distributed={...})` or env vars via
`initialize_from_env()`. A 2-process CPU smoke of exactly this wiring runs
as `python -m muzero_general_tpu.parallel.dist_smoke` (tests/test_distributed.py).
"""

from typing import Optional

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Idempotent wrapper around jax.distributed.initialize.

    Must run before any other jax call creates the backend. On TPU pods the
    arguments are auto-detected from the TPU environment (pass nothing);
    on CPU/GPU fleets pass coordinator/count/id explicitly.
    """
    global _initialized
    if _initialized:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _initialized = True


def initialize_from_spec(spec) -> None:
    """`spec` is True (TPU-pod auto-detect) or a dict of initialize() kwargs."""
    if spec is True:
        initialize()
    elif isinstance(spec, dict):
        initialize(**spec)
    else:
        raise ValueError(f"distributed spec must be True or a dict, got {spec!r}")


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def process_local_batch(batch: dict, mesh, batch_axis: int = 0):
    """Assemble a GLOBAL dp-sharded batch from each host's LOCAL batch dict.

    Every process passes its own [B_local, ...] arrays; the returned jax
    Arrays are global [B_local * num_processes, ...] views sharded over the
    mesh's dp axis, with this host's shards backed by its local data. This is
    the multi-host counterpart of parallel.shard_batch (which assumes all
    devices are addressable). batch_axis=1 handles the fused-train
    [M, B, ...] stacks (parallel.stacked_batch_sharding layout).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * batch_axis + ["dp"]))
    s = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(s, v) for k, v in batch.items()
    }


def global_sum(value) -> float:
    """Sum a host-local scalar over all processes (played-steps counters for
    the exact ratio scheduler; reference keeps these in SharedStorage,
    shared_storage.py:24-43)."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(
        np.sum(multihost_utils.process_allgather(np.float64(value)))
    )
