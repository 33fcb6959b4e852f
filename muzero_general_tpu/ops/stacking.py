"""Observation/action history stacking.

Parity: reference GameHistory.get_stacked_observations (self_play.py:513-550):
channel order [obs_t, obs_{t-1}, plane(a_t), obs_{t-2}, plane(a_{t-1}), ...]
where plane(a) = a / action_space_size broadcast over H×W; missing history is
zero for both planes. Channel count = C*(n+1) + n (reference models.py:100-104).

The self-play driver keeps ring histories (most-recent-first) so stacking is a
static concat under jit.
"""

import jax.numpy as jnp
import numpy as np


def stack_observations(obs_hist, act_hist, action_space_size):
    """obs_hist [G, n+1, C, H, W], act_hist [G, n+1] -> [G, C*(n+1)+n, H, W].

    obs_hist[:, 0] is the current observation; act_hist[:, k] is the action
    that *led to* obs_hist[:, k] (so plane for obs_{t-k} pairs with
    act_hist[:, k-1], the action taken from it).
    """
    g, n_plus_1, c, h, w = obs_hist.shape
    n = n_plus_1 - 1
    parts = [obs_hist[:, 0]]
    for k in range(1, n + 1):
        plane = (act_hist[:, k - 1].astype(jnp.float32) / action_space_size)[
            :, None, None, None
        ] * jnp.ones((g, 1, h, w), jnp.float32)
        parts.append(obs_hist[:, k])
        parts.append(plane)
    return jnp.concatenate(parts, axis=1)


def push_history(obs_hist, act_hist, new_obs, action):
    """Shift rings: new observation/action become slot 0."""
    obs_hist = jnp.concatenate([new_obs[:, None], obs_hist[:, :-1]], axis=1)
    act_hist = jnp.concatenate([action[:, None], act_hist[:, :-1]], axis=1)
    return obs_hist, act_hist


def reset_history(obs_hist, act_hist, obs0, done):
    """Zero the rings for lanes where `done`, seeding slot 0 with obs0."""
    g = obs_hist.shape[0]
    fresh_obs = jnp.zeros_like(obs_hist).at[:, 0].set(obs0)
    fresh_act = jnp.zeros_like(act_hist)
    d_obs = done[:, None, None, None, None]
    obs_hist = jnp.where(d_obs, fresh_obs, obs_hist)
    act_hist = jnp.where(done[:, None], fresh_act, act_hist)
    return obs_hist, act_hist


def stack_observations_np(observations, actions, index, num_stacked, action_space_size):
    """Host (numpy) stacking for replay batch assembly.

    observations [L, C, H, W], actions [L+1]; index in [0, L-1].
    Same semantics as the device version / reference self_play.py:513-550.
    """
    L, c, h, w = observations.shape
    parts = [observations[index]]
    for past in range(index - 1, index - 1 - num_stacked, -1):
        if past >= 0:
            parts.append(observations[past])
            parts.append(
                np.full((1, h, w), actions[past + 1] / action_space_size, np.float32)
            )
        else:
            parts.append(np.zeros((c, h, w), np.float32))
            parts.append(np.zeros((1, h, w), np.float32))
    return np.concatenate(parts, axis=0)
