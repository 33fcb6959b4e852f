"""End-to-end learning gates (slow; run with --run-slow).

The reference's only quality gate is an end-to-end cartpole training run
with a reward bar (reference .github/workflows/ci-testing.yaml:33-62). We
keep that gate (TPU-scale) and add a CPU-scale one on simple_grid, which a
correct implementation solves in a few hundred training steps.
"""

import pathlib
import tempfile

import pytest

from muzero_general_tpu import MuZero


@pytest.mark.slow
def test_simple_grid_solves():
    mz = MuZero(
        "simple_grid",
        {
            "training_steps": 400,
            "batch_size": 32,
            "num_simulations": 10,
            "parallel_games": 16,
            "selfplay_chunk_moves": 6,
            "ratio": 1.0,
            "reanalyse_interval": 50,
        },
    )
    mz.config.results_path = pathlib.Path(tempfile.mkdtemp())
    mz.train(log_in_tensorboard=False)
    result = mz.test(num_tests=5)
    # Optimal play reaches the goal every episode: reward 10
    assert result >= 9.9, f"simple_grid not solved: mean test reward {result}"


@pytest.mark.slow
def test_cartpole_reaches_ci_bar():
    """The reference CI gate: best test reward >= 250 within 7500 steps
    (reference ci-testing.yaml:54-62). Full-scale — intended for TPU runs."""
    mz = MuZero("cartpole", {"training_steps": 7500})
    mz.config.results_path = pathlib.Path(tempfile.mkdtemp())
    best = 0.0

    # Track the best greedy test reward during training via the metrics file
    mz.train(log_in_tensorboard=False)
    result = mz.test(num_tests=5)
    best = max(best, result)
    assert best >= 250, f"cartpole best test reward {best} < 250"
