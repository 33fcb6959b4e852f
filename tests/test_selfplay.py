"""Self-play driver integration tests on the jittable CartPole env."""

import jax
import numpy as np

from muzero_general_tpu.games.cartpole import MuZeroConfig, make_env
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.selfplay import SelfPlayDriver


def tiny_config():
    cfg = MuZeroConfig()
    cfg.num_simulations = 6
    cfg.parallel_games = 3
    cfg.selfplay_chunk_moves = 5
    cfg.max_moves = 12  # force quick episode cuts
    return cfg


def test_driver_produces_consistent_histories():
    cfg = tiny_config()
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0)

    completed = []
    for _ in range(6):
        games, stats = driver.play(variables, temperature=1.0)
        completed.extend(games)
        assert stats["env_steps"] == cfg.parallel_games * cfg.selfplay_chunk_moves

    assert completed, "no episodes completed in 30 moves/lane with max_moves=12"
    for gh in completed:
        L = len(gh)
        assert 0 < L <= cfg.max_moves
        # GameHistory layout invariants (reference self_play.py:479-494)
        assert gh.actions.shape == (L + 1,) and gh.actions[0] == 0
        assert gh.rewards.shape == (L + 1,) and gh.rewards[0] == 0
        assert gh.to_play.shape == (L + 1,)
        assert gh.child_visits.shape == (L, env.num_actions)
        np.testing.assert_allclose(gh.child_visits.sum(-1), 1.0, atol=1e-5)
        assert gh.observations.shape == (L,) + env.observation_shape
        # CartPole: every move rewards +1
        np.testing.assert_allclose(gh.rewards[1:], 1.0)


def test_episodes_deterministic_given_seed():
    cfg = tiny_config()
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))

    def collect(seed):
        driver = SelfPlayDriver(env, runner, cfg, seed=seed)
        games = []
        for _ in range(4):
            g, _ = driver.play(variables, temperature=1.0)
            games.extend(g)
        return games

    g1, g2 = collect(7), collect(7)
    assert len(g1) == len(g2)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(a.actions, b.actions)
        np.testing.assert_allclose(a.root_values, b.root_values, atol=1e-5)
