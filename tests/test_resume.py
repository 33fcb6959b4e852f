"""Checkpoint + replay-buffer resume (reference muzero.py:426-464 semantics)."""

import pathlib
import tempfile

import numpy as np

from muzero_general_tpu import MuZero

OVR = {
    "training_steps": 6,
    "batch_size": 4,
    "num_simulations": 4,
    "parallel_games": 2,
    "selfplay_chunk_moves": 4,
    "num_unroll_steps": 2,
    "td_steps": 3,
    "checkpoint_interval": 2,
    "ratio": None,
    "fused_train_steps": 1,
}


def test_resume_continues_from_checkpoint():
    d = pathlib.Path(tempfile.mkdtemp())
    mz = MuZero("cartpole", dict(OVR))
    mz.config.results_path = d
    ck = mz.train(log_in_tensorboard=False)
    assert ck["training_step"] == 6
    assert (d / "model.checkpoint").exists()
    assert (d / "replay_buffer.pkl").exists()

    # Resume with both files: counters and weights restored
    mz2 = MuZero("cartpole", dict(OVR, training_steps=10))
    mz2.load_model(
        checkpoint_path=d / "model.checkpoint",
        replay_buffer_path=d / "replay_buffer.pkl",
    )
    assert mz2.checkpoint["training_step"] == 6
    assert mz2.replay_buffer_state["num_played_games"] > 0
    w_before = mz2.checkpoint["weights"]["params"]
    mz2.config.results_path = pathlib.Path(tempfile.mkdtemp())
    ck2 = mz2.train(log_in_tensorboard=False)
    assert ck2["training_step"] == 10
    # weights actually changed by the resumed training
    w_after = ck2["weights"]["params"]
    leaves_b = [np.asarray(x) for x in _leaves(w_before)]
    leaves_a = [np.asarray(x) for x in _leaves(w_after)]
    assert any(not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_load_checkpoint_without_buffer_resets_counters():
    d = pathlib.Path(tempfile.mkdtemp())
    mz = MuZero("cartpole", dict(OVR))
    mz.config.results_path = d
    mz.train(log_in_tensorboard=False)

    mz2 = MuZero("cartpole", dict(OVR))
    mz2.load_model(checkpoint_path=d / "model.checkpoint")
    # reference muzero.py:449-461: no buffer -> counters reset
    assert mz2.checkpoint["training_step"] == 0
    assert mz2.checkpoint["num_played_games"] == 0
