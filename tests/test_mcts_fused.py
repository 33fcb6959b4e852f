"""Fully-fused single-kernel MCTS vs the XLA reference path (interpret mode).

The XLA path (ops/mcts.py) is oracle-verified against a sequential
re-derivation of reference self_play.py:249-476 (tests/test_mcts.py); the
fused kernel must reproduce it exactly with deterministic tie-breaking,
including the in-kernel FC network inference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.games.cartpole import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.ops import mcts as M
from muzero_general_tpu.ops import mcts_fused as F


def _setup(num_players=1, sims=20, B=8):  # >= choose_block's 8-lane floor
    cfg = MuZeroConfig()
    cfg.num_simulations = sims
    cfg.players = list(range(num_players))
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(5), (B, 1, 1, 4))
    legal = np.ones((B, 2), bool)
    legal[1, 0] = False  # one lane with a restricted root
    to_play = (jnp.arange(B) % num_players).astype(jnp.int32)
    rng = jax.random.PRNGKey(3)
    return cfg, runner, variables, obs, jnp.asarray(legal), to_play, rng


@pytest.mark.parametrize("num_players", [1, 2])
@pytest.mark.parametrize("noise", [False, True])
def test_fused_matches_xla(num_players, noise):
    cfg, runner, variables, obs, legal, to_play, rng = _setup(num_players)

    spec = M.SearchSpec.from_config(cfg)._replace(deterministic_tie_break=True)
    ref = M.run_mcts(
        lambda o: runner.initial_inference(variables, o),
        lambda h, a: runner.recurrent_inference(variables, h, a),
        obs, legal, to_play, rng, spec, add_exploration_noise=noise,
    )

    fspec = F.FusedSpec.from_config(
        cfg, deterministic_tie_break=True, interpret=True
    )
    got = F.run_mcts_fused(
        lambda o: runner.initial_inference(variables, o),
        variables, obs, legal, to_play, rng, fspec,
        add_exploration_noise=noise,
    )

    np.testing.assert_array_equal(
        np.asarray(got.root_visit_counts), np.asarray(ref.root_visit_counts)
    )
    np.testing.assert_allclose(
        np.asarray(got.root_value), np.asarray(ref.root_value),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.root_predicted_value),
        np.asarray(ref.root_predicted_value), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.max_tree_depth), np.asarray(ref.max_tree_depth)
    )
    # Masked root action must receive zero visits.
    assert int(np.asarray(got.root_visit_counts)[1, 0]) == 0
    # Visit counts sum to num_simulations at every root.
    np.testing.assert_array_equal(
        np.asarray(got.root_visit_counts).sum(-1), cfg.num_simulations
    )


def test_fused_deeper_dynamics_mlp():
    """Multi-layer dynamics/reward heads route through the split first layer."""
    cfg = MuZeroConfig()
    cfg.num_simulations = 12
    cfg.encoding_size = 6
    B = 8
    cfg.fc_dynamics_layers = [16, 12]
    cfg.fc_reward_layers = []  # single linear output layer
    cfg.fc_value_layers = [8]
    cfg.fc_policy_layers = [8]
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(1))
    obs = jax.random.normal(jax.random.PRNGKey(6), (B, 1, 1, 4))
    legal = jnp.ones((B, 2), bool)
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(9)

    spec = M.SearchSpec.from_config(cfg)._replace(deterministic_tie_break=True)
    ref = M.run_mcts(
        lambda o: runner.initial_inference(variables, o),
        lambda h, a: runner.recurrent_inference(variables, h, a),
        obs, legal, to_play, rng, spec, add_exploration_noise=True,
    )
    fspec = F.FusedSpec.from_config(
        cfg, deterministic_tie_break=True, interpret=True
    )
    got = F.run_mcts_fused(
        lambda o: runner.initial_inference(variables, o),
        variables, obs, legal, to_play, rng, fspec,
        add_exploration_noise=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got.root_visit_counts), np.asarray(ref.root_visit_counts)
    )
    np.testing.assert_allclose(
        np.asarray(got.root_value), np.asarray(ref.root_value),
        rtol=1e-5, atol=1e-5,
    )


def test_fused_rejects_unfittable_batch():
    """run_mcts_fused raises a clear error instead of compiling an
    over-VMEM / sub-sublane launch when no valid lane block exists."""
    cfg, runner, variables, obs, legal, to_play, rng = _setup(B=6)
    fspec = F.FusedSpec.from_config(
        cfg, deterministic_tie_break=True, interpret=True
    )
    with pytest.raises(ValueError, match="does not fit VMEM"):
        F.run_mcts_fused(
            lambda o: runner.initial_inference(variables, o),
            variables, obs, legal, to_play, rng, fspec,
        )


def test_fused_selfplay_driver_smoke():
    """SelfPlayDriver engages the fused path (interpret mode) end-to-end."""
    from muzero_general_tpu.games.cartpole import make_env
    from muzero_general_tpu.selfplay import SelfPlayDriver

    cfg = MuZeroConfig()
    cfg.num_simulations = 8
    cfg.parallel_games = 8  # choose_block's floor (TPU sublane) is 8 lanes
    cfg.selfplay_chunk_moves = 3
    cfg.use_fused_search = True
    cfg.pallas_interpret = True
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(make_env(), runner, cfg, seed=0)
    assert driver.use_fused
    completed, stats = driver.play(variables, temperature=1.0)
    assert stats["env_steps"] == 24
    assert stats["max_tree_depth"] >= 1
