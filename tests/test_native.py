"""Native C++ batch assembler vs the numpy reference path."""

import numpy as np
import pytest

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.native import get_replay_native
from muzero_general_tpu.replay import GameHistory, ReplayBuffer


def make_buffer(cfg, n_games=6, L=14, players=1, seed=0):
    rng = np.random.default_rng(seed)
    buf = ReplayBuffer(cfg)
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    for s in range(n_games):
        buf.save_game(
            GameHistory(
                observations=rng.normal(size=(L, c, h, w)).astype(np.float32),
                actions=np.concatenate([[0], rng.integers(0, A, L)]).astype(
                    np.int32
                ),
                rewards=np.concatenate([[0], rng.normal(size=L)]).astype(
                    np.float32
                ),
                to_play=(np.arange(L + 1) % players).astype(np.int32),
                child_visits=rng.dirichlet(np.ones(A), L).astype(np.float32),
                root_values=rng.normal(size=L).astype(np.float32),
            )
        )
    return buf


@pytest.mark.parametrize("players", [1, 2])
@pytest.mark.parametrize("stacked", [0, 2])
def test_native_matches_numpy(players, stacked):
    native = get_replay_native()
    if native is None:
        pytest.skip("native extension unavailable (no toolchain)")

    cfg = MuZeroConfig()
    cfg.observation_shape = (2, 3, 3)
    cfg.action_space = list(range(3))
    cfg.players = list(range(players))
    cfg.stacked_observations = stacked
    cfg.batch_size = 32
    cfg.num_unroll_steps = 6
    cfg.td_steps = 5
    cfg.discount = 0.97

    buf = make_buffer(cfg, players=players)
    # Same sampling stream for both paths
    buf.rng = np.random.default_rng(42)
    idx1, b1 = buf.get_batch(use_native=True)
    buf.rng = np.random.default_rng(42)
    idx2, b2 = buf.get_batch(use_native=False)

    np.testing.assert_array_equal(idx1, idx2)
    for key in [
        "observation", "target_value", "target_reward", "target_policy",
        "weight", "gradient_scale",
    ]:
        np.testing.assert_allclose(
            b1[key], b2[key], rtol=1e-5, atol=1e-6, err_msg=key
        )
    # Actions agree except absorbing-state positions (RNG differs there);
    # those must still be in range.
    L = 14
    absorbing = idx1[:, 1][:, None] + np.arange(cfg.num_unroll_steps + 1) > L
    np.testing.assert_array_equal(
        b1["action"][~absorbing], b2["action"][~absorbing]
    )
    assert ((b1["action"] >= 0) & (b1["action"] < 3)).all()


def test_native_with_reanalysed_values():
    native = get_replay_native()
    if native is None:
        pytest.skip("native extension unavailable")
    cfg = MuZeroConfig()
    cfg.observation_shape = (1, 1, 4)
    cfg.action_space = list(range(2))
    cfg.batch_size = 8
    cfg.num_unroll_steps = 3
    cfg.td_steps = 4
    buf = make_buffer(cfg)
    for gh in buf.buffer.values():
        gh.reanalysed_predicted_root_values = gh.root_values * 3
    buf.rng = np.random.default_rng(1)
    _, b1 = buf.get_batch(use_native=True)
    buf.rng = np.random.default_rng(1)
    _, b2 = buf.get_batch(use_native=False)
    np.testing.assert_allclose(b1["target_value"], b2["target_value"], rtol=1e-5)
