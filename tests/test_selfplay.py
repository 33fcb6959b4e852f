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


def test_greedy_eval_lane_partitioned():
    """Lane 0 (greedy eval) episodes arrive in stats['eval_games'] only."""
    cfg = tiny_config()
    cfg.parallel_games = 4
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0, greedy_lanes=1)

    completed, evals = [], []
    for _ in range(8):
        games, stats = driver.play(variables, temperature=1.0)
        completed.extend(games)
        evals.extend(stats["eval_games"])
    # With max_moves=12 and 40 moves/lane, every lane finished >= 1 episode.
    assert evals, "greedy lane produced no eval episodes"
    assert completed, "non-eval lanes produced no replay episodes"
    # Exactly one lane is the eval lane: its episode count is ~1/3 of the
    # replay lanes' combined count.
    assert len(completed) >= 2 * len(evals)


def test_sharded_selfplay_matches_contract():
    """G lanes sharded over the dp mesh axis: same invariants as unsharded."""
    from muzero_general_tpu.parallel import create_mesh

    cfg = tiny_config()
    cfg.parallel_games = 16
    mesh = create_mesh(num_dp=8, num_mp=1)
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0, mesh=mesh,
                            greedy_lanes=1)
    assert driver.dp == 8

    completed = []
    for _ in range(6):
        games, stats = driver.play(variables, temperature=1.0)
        completed.extend(games)
        assert stats["env_steps"] == cfg.parallel_games * cfg.selfplay_chunk_moves
    assert completed
    for gh in completed:
        L = len(gh)
        assert 0 < L <= cfg.max_moves
        np.testing.assert_allclose(gh.child_visits.sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(gh.rewards[1:], 1.0)

    # Lanes must not be correlated across shards: with per-shard PRNG keys
    # the 8 shards' action sequences differ.
    firsts = {tuple(gh.actions[1:6]) for gh in completed[:8]}
    assert len(firsts) > 1


def test_sharded_selfplay_indivisible_falls_back():
    from muzero_general_tpu.parallel import create_mesh

    cfg = tiny_config()
    cfg.parallel_games = 6  # not divisible by dp=8
    mesh = create_mesh(num_dp=8, num_mp=1)
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0, mesh=mesh)
    assert driver.dp == 1
    _, stats = driver.play(variables, temperature=1.0)
    assert stats["env_steps"] == 6 * cfg.selfplay_chunk_moves


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
