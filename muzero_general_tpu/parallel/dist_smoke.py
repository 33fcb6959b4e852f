"""2-process multi-host smoke: global-mesh training + per-host self-play.

Runs the exact wiring MuZero uses multi-host (parallel/distributed.py):
jax.distributed over N CPU processes (4 virtual devices each), one global
dp mesh spanning both, a sharded train step fed by per-process local batch
shards, per-host self-play on the addressable devices, and a global counter
sum. Launched twice (process_id 0 and 1) by tests/test_distributed.py —
the fake-backend multi-process story SURVEY.md §4 prescribes.

Usage (each process):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python -m muzero_general_tpu.parallel.dist_smoke \
      --coordinator 127.0.0.1:PORT --num-processes 2 --process-id I
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args(argv)

    from muzero_general_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax
    import numpy as np

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == n_local * args.num_processes, (n_global, n_local)

    from muzero_general_tpu.config import MuZeroConfig
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.parallel import (
        create_mesh,
        make_sharded_train_step,
        shard_train_state,
    )
    from muzero_general_tpu.trainer import init_train_state

    # ---- phase 1: one train step on the GLOBAL mesh ----------------------
    cfg = MuZeroConfig()
    cfg.observation_shape = (1, 1, 4)
    cfg.action_space = list(range(2))
    cfg.num_unroll_steps = 3
    cfg.batch_size = 2 * n_global  # 2 rows per device, globally
    mesh = create_mesh(num_dp=n_global, num_mp=1)

    runner = MuZeroNetwork(cfg)
    state = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)

    B_local = cfg.batch_size // args.num_processes
    U, A = cfg.num_unroll_steps, 2
    rng = np.random.default_rng(100 + args.process_id)
    local = {
        "observation": rng.normal(size=(B_local, 1, 1, 4)).astype(np.float32),
        "action": rng.integers(0, A, (B_local, U + 1)).astype(np.int32),
        "target_value": rng.normal(size=(B_local, U + 1)).astype(np.float32),
        "target_reward": rng.normal(size=(B_local, U + 1)).astype(np.float32),
        "target_policy": rng.dirichlet(np.ones(A), (B_local, U + 1)).astype(
            np.float32
        ),
        "weight": np.ones(B_local, np.float32),
        "gradient_scale": np.full((B_local, U + 1), U, np.float32),
    }
    batch = dist.process_local_batch(local, mesh)
    step_fn = make_sharded_train_step(runner, cfg, mesh)
    state, metrics, _ = step_fn(state, batch)
    state, metrics, _ = step_fn(state, dist.process_local_batch(local, mesh))
    jax.block_until_ready(metrics)
    # Loss metrics are replicated outputs of the global psum: every process
    # must hold the identical value (the gradient all-reduce worked).
    from jax.experimental import multihost_utils

    losses = np.asarray(
        multihost_utils.process_allgather(float(metrics["total_loss"]))
    )
    assert np.isfinite(losses).all(), losses
    assert np.allclose(losses, losses[0]), losses

    # ---- phase 2: per-host self-play on addressable devices --------------
    # (the reference's "SelfPlay actors on every node", muzero.py:177-196)
    from muzero_general_tpu.envs.cartpole import CartPole
    from muzero_general_tpu.selfplay import SelfPlayDriver

    sp = MuZeroConfig()
    sp.num_simulations = 4
    sp.parallel_games = 4
    sp.selfplay_chunk_moves = 4
    sp.max_moves = 12
    local_mesh = create_mesh(
        num_dp=n_local, num_mp=1, devices=jax.local_devices()
    )
    sp_runner = MuZeroNetwork(sp)
    variables = sp_runner.init(jax.random.PRNGKey(1))
    driver = SelfPlayDriver(
        CartPole(), sp_runner, sp, seed=args.process_id, mesh=local_mesh
    )
    _, stats = driver.play(variables, temperature=1.0)
    assert stats["env_steps"] == sp.parallel_games * sp.selfplay_chunk_moves

    # ---- phase 3: global counter sum (exact-ratio bookkeeping) -----------
    total = dist.global_sum(stats["env_steps"])
    assert total == args.num_processes * stats["env_steps"], total

    print(
        f"dist_smoke OK: process {args.process_id}/{args.num_processes}, "
        f"{n_global} global devices, loss={losses[0]:.4f}, "
        f"global env_steps={total:.0f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
