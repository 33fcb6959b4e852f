"""Target-generation golden tests against a sequential re-derivation of
reference replay_buffer.py:230-303 (compute_target_value / make_target)."""

import numpy as np
import pytest

from muzero_general_tpu.replay import GameHistory, compute_target_values, make_target


def make_game(L, A=3, players=2, seed=0):
    rng = np.random.default_rng(seed)
    return GameHistory(
        observations=rng.normal(size=(L, 1, 1, 2)).astype(np.float32),
        actions=np.concatenate([[0], rng.integers(0, A, L)]).astype(np.int32),
        rewards=np.concatenate([[0], rng.normal(size=L)]).astype(np.float32),
        to_play=(np.arange(L + 1) % players).astype(np.int32),
        child_visits=rng.dirichlet(np.ones(A), size=L).astype(np.float32),
        root_values=rng.normal(size=L).astype(np.float32),
    )


def oracle_target_value(gh, index, td_steps, discount):
    """Sequential re-derivation of reference replay_buffer.py:230-262."""
    L = len(gh.root_values)
    bootstrap_index = index + td_steps
    if bootstrap_index < L:
        root_values = (
            gh.root_values
            if gh.reanalysed_predicted_root_values is None
            else gh.reanalysed_predicted_root_values
        )
        last = (
            root_values[bootstrap_index]
            if gh.to_play[bootstrap_index] == gh.to_play[index]
            else -root_values[bootstrap_index]
        )
        value = last * discount**td_steps
    else:
        value = 0
    for i, reward in enumerate(gh.rewards[index + 1 : bootstrap_index + 1]):
        value += (
            reward if gh.to_play[index] == gh.to_play[index + i] else -reward
        ) * discount**i
    return value


@pytest.mark.parametrize("players", [1, 2])
@pytest.mark.parametrize("td_steps", [3, 10, 100])
def test_compute_target_values_matches_oracle(players, td_steps):
    gh = make_game(L=17, players=players)
    idx = np.arange(17)
    ours = compute_target_values(gh, idx, td_steps, 0.97)
    ref = np.array([oracle_target_value(gh, i, td_steps, 0.97) for i in range(17)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_reanalysed_values_used():
    gh = make_game(L=20, players=1)
    v1 = compute_target_values(gh, np.arange(5), 5, 0.99)
    gh.reanalysed_predicted_root_values = gh.root_values * 2
    v2 = compute_target_values(gh, np.arange(5), 5, 0.99)
    assert not np.allclose(v1, v2)


def test_make_target_boundaries():
    """Absorbing-state handling (reference replay_buffer.py:279-301)."""
    L, A, U = 6, 3, 5
    gh = make_game(L=L, A=A, players=1)
    rng = np.random.default_rng(0)
    pos = 4  # positions 4..9: 4,5 in-game, 6 boundary, 7-9 absorbing
    values, rewards, policies, actions = make_target(gh, pos, U, 3, 0.97, A, rng)
    assert values.shape == (U + 1,)
    # in-game positions get the n-step target
    ref = oracle_target_value(gh, 4, 3, 0.97)
    assert values[0] == pytest.approx(ref, rel=1e-4)
    # boundary position (== L): value 0 but the real final reward
    assert values[2] == 0.0
    assert rewards[2] == pytest.approx(gh.rewards[L])
    np.testing.assert_allclose(policies[2], 1.0 / A)
    assert actions[2] == gh.actions[L]
    # beyond: value 0, reward 0, uniform policy, random action in range
    assert values[3] == 0.0 and rewards[3] == 0.0
    np.testing.assert_allclose(policies[3:], 1.0 / A)
    assert ((actions[3:] >= 0) & (actions[3:] < A)).all()


def test_priorities_and_sampling():
    from muzero_general_tpu.config import MuZeroConfig
    from muzero_general_tpu.replay import ReplayBuffer

    cfg = MuZeroConfig()
    cfg.observation_shape = (1, 1, 2)
    cfg.replay_buffer_size = 3
    cfg.batch_size = 16
    cfg.num_unroll_steps = 4
    cfg.td_steps = 5
    buf = ReplayBuffer(cfg)
    for s in range(5):
        buf.save_game(make_game(L=10, A=2, players=1, seed=s))
    # FIFO eviction beyond replay_buffer_size (reference replay_buffer.py:53-61)
    assert len(buf.buffer) == 3
    assert buf.num_played_games == 5
    assert set(buf.buffer.keys()) == {2, 3, 4}
    assert buf.total_samples == 30
    # initial priorities were computed
    gh = buf.buffer[2]
    assert gh.priorities is not None and gh.game_priority > 0

    idx, batch = buf.get_batch()
    assert batch["observation"].shape == (16, 1, 1, 2)
    assert batch["action"].shape == (16, 5)
    assert batch["target_policy"].shape == (16, 5, 2)
    assert batch["weight"].max() == pytest.approx(1.0)
    assert (batch["gradient_scale"] >= 1).all()

    # priority write-back including evicted-game guard
    pr = np.abs(np.random.default_rng(0).normal(size=(16, 5))).astype(np.float32)
    idx[0, 0] = 0  # evicted game id — must be ignored silently
    buf.update_priorities(pr, idx)


def test_stacking_device_matches_host():
    import jax.numpy as jnp

    from muzero_general_tpu.ops.stacking import (
        stack_observations,
        stack_observations_np,
    )

    rng = np.random.default_rng(1)
    L, C, H, W, A, n = 6, 2, 3, 3, 4, 2
    obs = rng.normal(size=(L, C, H, W)).astype(np.float32)
    acts = np.concatenate([[0], rng.integers(0, A, L)]).astype(np.int32)

    for index in range(L):
        host = stack_observations_np(obs, acts, index, n, A)
        # Build device rings: slot k = obs[index-k], action that led to it
        obs_hist = np.zeros((1, n + 1, C, H, W), np.float32)
        act_hist = np.zeros((1, n + 1), np.int32)
        for k in range(n + 1):
            if index - k >= 0:
                obs_hist[0, k] = obs[index - k]
                act_hist[0, k] = acts[index - k]
        dev = np.asarray(
            stack_observations(jnp.asarray(obs_hist), jnp.asarray(act_hist), A)
        )[0]
        np.testing.assert_allclose(dev, host, atol=1e-6, err_msg=f"index {index}")
