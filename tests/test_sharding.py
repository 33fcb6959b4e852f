"""Multi-device mesh tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.parallel import (
    create_mesh,
    make_sharded_train_step,
    param_sharding,
    shard_batch,
    shard_train_state,
)
from muzero_general_tpu.trainer import init_train_state, make_train_step


def big_fc_config():
    c = MuZeroConfig()
    c.observation_shape = (1, 1, 8)
    c.action_space = list(range(4))
    c.encoding_size = 512
    c.fc_representation_layers = [512]
    c.fc_dynamics_layers = [512]
    c.fc_reward_layers = [64]
    c.fc_value_layers = [64]
    c.fc_policy_layers = [64]
    c.support_size = 10
    c.num_unroll_steps = 3
    c.batch_size = 16
    return c


def fake_batch(cfg, rng):
    B, U = cfg.batch_size, cfg.num_unroll_steps
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    return {
        "observation": rng.normal(size=(B, c, h, w)).astype(np.float32),
        "action": rng.integers(0, A, (B, U + 1)).astype(np.int32),
        "target_value": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_reward": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_policy": rng.dirichlet(np.ones(A), (B, U + 1)).astype(np.float32),
        "weight": np.ones(B, np.float32),
        "gradient_scale": np.full((B, U + 1), U, np.float32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_param_sharding_rule():
    cfg = big_fc_config()
    mesh = create_mesh(num_dp=4, num_mp=2)
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    shardings = param_sharding(variables["params"], mesh)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    mp_sharded = [
        s for _, s in leaves if "mp" in str(s.spec)
    ]
    assert mp_sharded, "no kernel picked up mp sharding despite 512-dim layers"


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(dp, mp):
    """dp/mp sharded training must produce the same step as unsharded.

    SGD without momentum so the update is linear in the gradient (Adam's
    first-step update is ~sign(g), amplifying float reduction noise)."""
    cfg = big_fc_config()
    cfg.optimizer = "SGD"
    cfg.momentum = 0.0
    cfg.weight_decay = 0.0
    runner = MuZeroNetwork(cfg)
    rng = np.random.default_rng(0)
    raw = fake_batch(cfg, rng)

    state1 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    step1 = make_train_step(runner, cfg, donate=False)
    s1, m1, p1 = step1(state1, {k: jnp.asarray(v) for k, v in raw.items()})

    mesh = create_mesh(num_dp=dp, num_mp=mp)
    state2 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    state2 = shard_train_state(state2, mesh)
    step2 = make_sharded_train_step(runner, cfg, mesh)
    s2, m2, p2 = step2(state2, shard_batch(raw, mesh))

    assert float(m1["total_loss"]) == pytest.approx(
        float(m2["total_loss"]), rel=1e-5
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5)
    for p0, a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        # compare the UPDATES, which are lr-scaled gradients
        np.testing.assert_allclose(
            np.asarray(a - p0), np.asarray(b - p0), rtol=5e-3, atol=1e-6
        )


def test_mesh_train_end_to_end(tmp_path):
    """`MuZero(...).train()` on the 8-device mesh: dp-sharded self-play +
    sharded training + streaming greedy eval + batched reanalyse, with
    unchanged learning mechanics (VERDICT r1 item 1 done-condition)."""
    from muzero_general_tpu.muzero import MuZero

    mz = MuZero(
        "cartpole",
        {
            "training_steps": 12,
            "results_path": str(tmp_path / "mesh_e2e"),
            "parallel_games": 16,
            "selfplay_chunk_moves": 4,
            "num_simulations": 6,
            "batch_size": 16,
            "fused_train_steps": 4,
            "reanalyse_interval": 4,
            "checkpoint_interval": 4,
            "max_moves": 20,
        },
    )
    ckpt = mz.train(log_in_tensorboard=False)
    assert ckpt["training_step"] == 12
    assert ckpt["num_played_games"] > 0
    # The greedy eval lane streamed at least one finished episode.
    assert ckpt["episode_length"] > 0
    # Batched reanalyse refreshed games at ~buffer rate (not 1 per interval).
    assert ckpt["num_reanalysed_games"] >= ckpt["num_played_games"]
    assert np.isfinite(ckpt["total_loss"])


def test_reanalyse_sweep_replaces_buffer_wide(tmp_path):
    """Every buffered game's stale root values get replaced by the sweep."""
    from muzero_general_tpu.muzero import MuZero
    from muzero_general_tpu.replay import GameHistory

    mz = MuZero(
        "cartpole",
        {"results_path": str(tmp_path / "reanalyse"),
         "reanalyse_games_per_interval": 8, "reanalyse_chunk_positions": 64},
    )
    from muzero_general_tpu.replay import ReplayBuffer

    replay = ReplayBuffer(mz.config)
    rng = np.random.default_rng(0)
    for _ in range(5):
        L = int(rng.integers(3, 9))
        replay.save_game(
            GameHistory(
                observations=rng.normal(size=(L, 1, 1, 4)).astype(np.float32),
                actions=np.zeros(L + 1, np.int32),
                rewards=np.ones(L + 1, np.float32),
                to_play=np.zeros(L + 1, np.int32),
                child_visits=np.full((L, 2), 0.5, np.float32),
                root_values=np.zeros(L, np.float32),
            )
        )

    state = mz._restore_state()

    def fake_reanalyse_fn(variables, obs):
        return jnp.full((obs.shape[0],), 7.25)

    n = mz._reanalyse_sweep(replay, fake_reanalyse_fn, state)
    assert n == 5
    for gh in replay.buffer.values():
        assert gh.reanalysed_predicted_root_values is not None
        np.testing.assert_allclose(gh.reanalysed_predicted_root_values, 7.25)

    # Round-robin: a second pick starts over (cursor wrapped past the end).
    picked = replay.reanalyse_pick(3)
    assert [gid for gid, _ in picked] == [0, 1, 2]
    picked = replay.reanalyse_pick(3)
    assert [gid for gid, _ in picked] == [3, 4, 0]


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(out))
