"""Mesh construction and sharding layout.

TPU-native replacement for the reference's torch DataParallel + Ray actor
parallelism (reference models.py:98-124 DataParallel wrapping; SURVEY.md
§2.8): a `jax.sharding.Mesh` with axes

- ``dp``: data parallel — the training batch and the self-play game batch
  are sharded on their leading axis; XLA inserts the gradient psum over ICI.
- ``mp``: tensor parallel — large dense/conv kernels are sharded on their
  output feature axis; activations flow through all-gathers XLA places via
  sharding propagation. Engages only for kernels big enough to matter.

The reference has no TP/PP/SP/EP (SURVEY.md §2.8 table); dp is the faithful
scale-out strategy, mp is extra headroom for large encoders.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Kernel feature dims below this stay replicated — the all-gather would cost
# more than the sharded matmul saves.
MP_MIN_FEATURES = 256


def create_mesh(num_dp: Optional[int] = None, num_mp: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_dp is None:
        num_dp = len(devices) // num_mp
    devices = np.asarray(devices[: num_dp * num_mp]).reshape(num_dp, num_mp)
    return Mesh(devices, ("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis dp sharding for batches."""
    return NamedSharding(mesh, P("dp"))


def param_sharding(params, mesh: Mesh):
    """Sharding pytree for params: feature-dim mp sharding for big kernels."""
    mp = mesh.shape["mp"]

    def rule(x):
        if (
            mp > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= MP_MIN_FEATURES
            and x.shape[-1] % mp == 0
        ):
            spec = [None] * (x.ndim - 1) + ["mp"]
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params per param_sharding (mp for big
    kernels, replicated otherwise); optimizer moments follow their matching
    param's layout via sharding propagation of device_put on the same rule;
    scalars replicated."""
    p_shard = param_sharding(state.params, mesh)
    rep = replicated(mesh)

    def place_like_param(x):
        if (
            mesh.shape["mp"] > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= MP_MIN_FEATURES
            and x.shape[-1] % mesh.shape["mp"] == 0
        ):
            spec = [None] * (x.ndim - 1) + ["mp"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, rep)

    return type(state)(
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_shard),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.batch_stats
        ),
        opt_state=jax.tree_util.tree_map(place_like_param, state.opt_state),
        step=jax.device_put(state.step, rep),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a batch dict on the mesh, leading axis over dp."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_sharded_train_step(runner, config, mesh: Mesh):
    """Jit the raw train step for mesh execution.

    Inputs are pre-placed by shard_train_state/shard_batch; jit compiles for
    those operand shardings and XLA propagates them — inserting the dp
    gradient psum and mp all-gathers over ICI.
    """
    from muzero_general_tpu.trainer import make_train_step

    raw = make_train_step(runner, config, jit=False)
    return jax.jit(raw, donate_argnums=(0,))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[M, B, ...] fused-train batch stacks: dp on the batch axis."""
    return NamedSharding(mesh, P(None, "dp"))


def shard_stacked_batches(batches, mesh: Mesh):
    """Place an [M, B, ...] batch-stack dict on the mesh (axis 1 over dp)."""
    s = stacked_batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batches.items()}


def make_sharded_fused_train_steps(runner, config, mesh: Mesh):
    """Mesh variant of trainer.make_fused_train_steps (M steps, 1 dispatch)."""
    from muzero_general_tpu.trainer import make_fused_train_steps

    raw = make_fused_train_steps(runner, config, jit=False)
    return jax.jit(raw, donate_argnums=(0,))


def mesh_from_config(config, devices=None) -> Mesh | None:
    """The product-path mesh: dp×mp over the available devices.

    config.mesh_dp None = all devices not used by mp go to dp. Returns None
    when the result would be a trivial 1-device mesh (single-chip runs skip
    the sharding machinery entirely). `devices` restricts the mesh to a
    subset of the fleet — the resource-splitting counterpart of the
    reference's fractional-GPU scheduling (reference muzero.py:142-153,
    split_resources_in muzero.py:92,525) used by concurrent hyperparameter
    experiments (search.py).
    """
    devices = devices if devices is not None else jax.devices()
    mp = max(1, int(getattr(config, "mesh_mp", 1) or 1))
    dp = config.mesh_dp if getattr(config, "mesh_dp", None) else max(
        1, len(devices) // mp
    )
    if dp * mp <= 1:
        return None
    if dp * mp > len(devices):
        raise ValueError(
            f"mesh_dp*mesh_mp = {dp}*{mp} exceeds {len(devices)} devices"
        )
    return create_mesh(num_dp=dp, num_mp=mp, devices=devices)
