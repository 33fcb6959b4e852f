"""Every game module trains end-to-end for a few steps (tiny overrides).

The completeness sweep over the reference's game catalog (SURVEY.md §2.6):
config loads, env constructs, self-play produces episodes, the learner
steps, a checkpoint writes.
"""

import pathlib
import tempfile

import pytest

from muzero_general_tpu import MuZero

TINY = {
    "training_steps": 4,
    "batch_size": 4,
    "num_simulations": 4,
    "parallel_games": 2,
    "selfplay_chunk_moves": 4,
    "num_unroll_steps": 2,
    "td_steps": 3,
    "checkpoint_interval": 2,
    "ratio": None,
    "fused_train_steps": 2,
    "reanalyse_interval": 2,
}


def run_game(name, extra=None):
    overrides = dict(TINY)
    overrides.update(extra or {})
    mz = MuZero(name, overrides)
    mz.config.results_path = pathlib.Path(tempfile.mkdtemp())
    ck = mz.train(log_in_tensorboard=False)
    assert ck["training_step"] == overrides["training_steps"]
    assert (mz.config.results_path / "model.checkpoint").exists()
    return ck


@pytest.mark.parametrize(
    "name",
    ["cartpole", "simple_grid", "gridworld", "twentyone", "tictactoe"],
)
def test_fast_games_train(name):
    run_game(name)


def test_connect4_trains():
    run_game("connect4", {"blocks": 1, "channels": 8})


def test_lunarlander_trains():
    pytest.importorskip("gymnasium")
    run_game("lunarlander", {"max_moves": 20})


@pytest.mark.slow
def test_gomoku_trains():
    run_game("gomoku", {"blocks": 1, "channels": 8, "batch_size": 2})


@pytest.mark.slow
def test_breakout_trains():
    # JAX-native breakout fallback; downsample="resnet" path over 96x96
    run_game(
        "breakout",
        {"blocks": 1, "channels": 8, "max_moves": 12, "batch_size": 2},
    )
