"""Checkpoint & replay-buffer persistence.

Keeps the reference's central 17-key checkpoint dict contract
(reference muzero.py:99-117, SURVEY.md §2.2): the same dict is the live
control-plane state and the on-disk `model.checkpoint`; the replay buffer is
persisted separately as `replay_buffer.pkl` with its counters
(reference muzero.py:334-346). Weights/optimizer state are numpy pytrees
(the TPU counterpart of the torch CPU state-dict, reference models.py:44-73).
"""

import pickle

import jax
import numpy as np

CHECKPOINT_KEYS = [
    "weights",
    "optimizer_state",
    "total_reward",
    "muzero_reward",
    "opponent_reward",
    "episode_length",
    "mean_value",
    "training_step",
    "lr",
    "total_loss",
    "value_loss",
    "reward_loss",
    "policy_loss",
    "num_played_games",
    "num_played_steps",
    "num_reanalysed_games",
    "terminate",
]


def initial_checkpoint() -> dict:
    """Fresh checkpoint (reference muzero.py:99-117)."""
    return {
        "weights": None,
        "optimizer_state": None,
        "total_reward": 0,
        "muzero_reward": 0,
        "opponent_reward": 0,
        "episode_length": 0,
        "mean_value": 0,
        "training_step": 0,
        "lr": 0,
        "total_loss": 0,
        "value_loss": 0,
        "reward_loss": 0,
        "policy_loss": 0,
        "num_played_games": 0,
        "num_played_steps": 0,
        "num_reanalysed_games": 0,
        "terminate": False,
    }


def to_host(tree):
    """Device pytree -> numpy pytree (counterpart of dict_to_cpu).

    jax.device_get prefetches every leaf async before blocking — one tunnel
    round-trip for the whole tree instead of one per array.
    """
    return jax.device_get(tree)


def save_checkpoint(checkpoint: dict, path):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(checkpoint, f)


def load_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_replay_buffer(replay_buffer, checkpoint: dict, path):
    """Persist buffer + counters (reference muzero.py:334-346)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "buffer": replay_buffer.buffer,
                "num_played_games": checkpoint["num_played_games"],
                "num_played_steps": checkpoint["num_played_steps"],
                "num_reanalysed_games": checkpoint["num_reanalysed_games"],
            },
            f,
        )


def load_replay_buffer(path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
