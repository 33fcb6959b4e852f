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


def test_ratio_schedule_callable_is_honored():
    """config.ratio may be a callable of num_played_games; the exact
    scheduler queries it each loop (reference lunarlander.py:109's hand
    anneal 0.8 -> 0.4 over 250 games, here first-class)."""
    calls = []

    def sched(games):
        calls.append(games)
        return 5.0

    mz = MuZero("cartpole", dict(OVR, max_moves=16))
    mz.config.ratio = sched
    mz.config.results_path = pathlib.Path(tempfile.mkdtemp())
    ck = mz.train(log_in_tensorboard=False)
    assert ck["training_step"] == OVR["training_steps"]
    # Queried with the (non-decreasing) self-played game count each loop.
    assert calls and calls == sorted(calls)


def test_lunarlander_ships_ratio_anneal():
    from muzero_general_tpu.games.lunarlander import MuZeroConfig

    r = MuZeroConfig().ratio
    assert abs(r(0) - 0.8) < 1e-9
    assert abs(r(125) - 0.6) < 1e-9
    assert abs(r(250) - 0.4) < 1e-9
    assert abs(r(1000) - 0.4) < 1e-9


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
