"""Fully connected MuZero network triplet.

Parity: reference models.py:80-195 (MuZeroFullyConnectedNetwork) — same
structure knobs (encoding_size, fc_*_layers), ELU MLPs, per-sample min-max
hidden normalization, one-hot action concat in dynamics.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from muzero_general_tpu.models.common import (
    MLP,
    log_one_hot_zero_reward,
    normalize_hidden_fc,
)


class FCMuZero(nn.Module):
    observation_shape: Sequence[int]  # (C, H, W)
    stacked_observations: int
    action_space_size: int
    encoding_size: int
    fc_reward_layers: Sequence[int]
    fc_value_layers: Sequence[int]
    fc_policy_layers: Sequence[int]
    fc_representation_layers: Sequence[int]
    fc_dynamics_layers: Sequence[int]
    support_size: int
    dtype: jnp.dtype = jnp.float32

    @property
    def full_support_size(self):
        return 2 * self.support_size + 1

    def setup(self):
        self.representation_network = MLP(
            self.fc_representation_layers, self.encoding_size, dtype=self.dtype
        )
        self.dynamics_state_network = MLP(
            self.fc_dynamics_layers, self.encoding_size, dtype=self.dtype
        )
        self.dynamics_reward_network = MLP(
            self.fc_reward_layers, self.full_support_size, dtype=self.dtype
        )
        self.prediction_policy_network = MLP(
            self.fc_policy_layers, self.action_space_size, dtype=self.dtype
        )
        self.prediction_value_network = MLP(
            self.fc_value_layers, self.full_support_size, dtype=self.dtype
        )

    def representation(self, observation, train: bool = False):
        """observation: [B, C', H, W] stacked planes -> hidden [B, E]."""
        x = observation.reshape(observation.shape[0], -1)
        return normalize_hidden_fc(self.representation_network(x))

    def dynamics(self, hidden, action, train: bool = False):
        """hidden [B, E], action [B] int -> (next hidden [B, E], reward logits)."""
        action_one_hot = jax.nn.one_hot(
            action, self.action_space_size, dtype=hidden.dtype
        )
        x = jnp.concatenate([hidden, action_one_hot], axis=-1)
        next_hidden = self.dynamics_state_network(x)
        reward = self.dynamics_reward_network(next_hidden)
        return normalize_hidden_fc(next_hidden), reward

    def prediction(self, hidden, train: bool = False):
        return (
            self.prediction_policy_network(hidden),
            self.prediction_value_network(hidden),
        )

    def initial_inference(self, observation, train: bool = False):
        hidden = self.representation(observation, train)
        policy_logits, value = self.prediction(hidden, train)
        reward = log_one_hot_zero_reward(observation.shape[0], self.full_support_size)
        return value, reward, policy_logits, hidden

    def recurrent_inference(self, hidden, action, train: bool = False):
        next_hidden, reward = self.dynamics(hidden, action, train)
        policy_logits, value = self.prediction(next_hidden, train)
        return value, reward, policy_logits, next_hidden

    def __call__(self, observation, action, train: bool = False):
        """Init/trace path touching every submodule."""
        value, reward, policy_logits, hidden = self.initial_inference(
            observation, train
        )
        return self.recurrent_inference(hidden, action, train)
