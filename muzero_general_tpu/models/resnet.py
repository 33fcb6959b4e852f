"""Residual MuZero network triplet (NHWC, TPU layout).

Parity: reference models.py:206-623 (MuZeroResidualNetwork and its
sub-networks) — same structure knobs (blocks, channels, reduced head
channels, head MLP layers, downsample ∈ {False, "CNN", "resnet"}), batch
norm with running stats, per-channel min-max hidden normalization, broadcast
action-plane concat in dynamics.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from muzero_general_tpu.models.common import (
    MLP,
    ResidualBlock,
    TorchConv,
    conv3x3,
    log_one_hot_zero_reward,
    normalize_hidden_conv,
)


def adaptive_avg_pool(x, out_hw):
    """NHWC adaptive average pool to (out_h, out_w) (torch AdaptiveAvgPool2d)."""
    _, h, w, _ = x.shape
    out_h, out_w = out_hw
    rows = []
    for i in range(out_h):
        h0, h1 = (i * h) // out_h, -((-(i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * w) // out_w, -((-(j + 1) * w) // out_w)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class DownSampleResnet(nn.Module):
    """Strided conv/res-block/pool pyramid, /16 spatial (reference models.py:233-275)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(
            self.out_channels // 2,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        for _ in range(2):
            x = ResidualBlock(self.out_channels // 2, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        x = TorchConv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        for _ in range(3):
            x = ResidualBlock(self.out_channels, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for _ in range(3):
            x = ResidualBlock(self.out_channels, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class DownsampleCNN(nn.Module):
    """Lighter conv/maxpool downsampler (reference models.py:278-297)."""

    in_channels: int
    out_channels: int
    h_w: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = (self.in_channels + self.out_channels) // 2
        k = self.h_w[0] * 2
        x = TorchConv(
            mid, kernel_size=(k, k), strides=(4, 4), padding=2, dtype=self.dtype
        )(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = TorchConv(
            self.out_channels,
            kernel_size=(5, 5),
            strides=(1, 1),
            padding=2,
            dtype=self.dtype,
        )(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return adaptive_avg_pool(x, tuple(self.h_w))


class RepresentationResnet(nn.Module):
    """Reference models.py:300-349."""

    observation_shape: Sequence[int]
    stacked_observations: int
    num_blocks: int
    num_channels: int
    downsample: object
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = (
            self.observation_shape[0] * (self.stacked_observations + 1)
            + self.stacked_observations
        )
        if self.downsample:
            if self.downsample == "resnet":
                x = DownSampleResnet(
                    self.num_channels, dtype=self.dtype,
                    fold_bn=self.fold_bn, act_dtype=self.act_dtype,
                )(x, train)
            elif self.downsample == "CNN":
                x = DownsampleCNN(
                    in_channels,
                    self.num_channels,
                    (
                        math.ceil(self.observation_shape[1] / 16),
                        math.ceil(self.observation_shape[2] / 16),
                    ),
                    dtype=self.dtype,
                )(x, train)
            else:
                raise NotImplementedError('downsample should be "resnet" or "CNN".')
        else:
            if self.fold_bn:
                x = TorchConv(
                    self.num_channels, kernel_size=(3, 3), padding=1,
                    use_bias=True, dtype=self.dtype,
                    out_dtype=self.act_dtype,
                )(x)
            else:
                x = conv3x3(self.num_channels, dtype=self.dtype)(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = jax.nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.num_channels, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        return x


class DynamicsResnet(nn.Module):
    """Reference models.py:352-389 (input has the +1 action plane)."""

    num_blocks: int
    num_channels: int  # channels of the *input* (state channels + 1)
    reduced_channels_reward: int
    fc_reward_layers: Sequence[int]
    full_support_size: int
    block_output_size_reward: int
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn:
            x = TorchConv(
                self.num_channels - 1, kernel_size=(3, 3), padding=1,
                use_bias=True, dtype=self.dtype,
                out_dtype=self.act_dtype,
            )(x)
        else:
            x = conv3x3(self.num_channels - 1, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = jax.nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.num_channels - 1, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        state = x
        r = TorchConv(
            self.reduced_channels_reward,
            kernel_size=(1, 1),
            padding=0,
            dtype=self.dtype,
        )(x)
        r = r.reshape(r.shape[0], -1)
        reward = MLP(self.fc_reward_layers, self.full_support_size, dtype=self.dtype)(r)
        return state, reward


class PredictionResnet(nn.Module):
    """Reference models.py:392-433."""

    action_space_size: int
    num_blocks: int
    num_channels: int
    reduced_channels_value: int
    reduced_channels_policy: int
    fc_value_layers: Sequence[int]
    fc_policy_layers: Sequence[int]
    full_support_size: int
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.num_channels, dtype=self.dtype, fold_bn=self.fold_bn, act_dtype=self.act_dtype)(x, train)
        v = TorchConv(
            self.reduced_channels_value, kernel_size=(1, 1), padding=0, dtype=self.dtype
        )(x)
        p = TorchConv(
            self.reduced_channels_policy,
            kernel_size=(1, 1),
            padding=0,
            dtype=self.dtype,
        )(x)
        v = v.reshape(v.shape[0], -1)
        p = p.reshape(p.shape[0], -1)
        value = MLP(self.fc_value_layers, self.full_support_size, dtype=self.dtype)(v)
        policy = MLP(self.fc_policy_layers, self.action_space_size, dtype=self.dtype)(p)
        return policy, value


class ResMuZero(nn.Module):
    """Residual MuZero triplet (reference models.py:436-623), NHWC hidden states."""

    observation_shape: Sequence[int]  # (C, H, W) as configured
    stacked_observations: int
    action_space_size: int
    num_blocks: int
    num_channels: int
    reduced_channels_reward: int
    reduced_channels_value: int
    reduced_channels_policy: int
    fc_reward_layers: Sequence[int]
    fc_value_layers: Sequence[int]
    fc_policy_layers: Sequence[int]
    support_size: int
    downsample: object
    dtype: jnp.dtype = jnp.float32
    # Inference-only BN-folded variant: apply with params produced by
    # models.network.fold_bn_variables (the search path's per-simulation
    # recurrent inference loses the BN elementwise passes entirely).
    fold_bn: bool = False
    # Activation dtype of the folded variant's conv pipeline (bf16 halves
    # the bytes of the bandwidth-bound epilogue passes + the hidden store;
    # heads still emit f32 logits). f32 unless config.search_bf16_activations.
    act_dtype: jnp.dtype = jnp.float32

    @property
    def full_support_size(self):
        return 2 * self.support_size + 1

    def _hidden_hw(self):
        if self.downsample:
            return (
                math.ceil(self.observation_shape[1] / 16),
                math.ceil(self.observation_shape[2] / 16),
            )
        return (self.observation_shape[1], self.observation_shape[2])

    def setup(self):
        h, w = self._hidden_hw()
        self.representation_network = RepresentationResnet(
            self.observation_shape,
            self.stacked_observations,
            self.num_blocks,
            self.num_channels,
            self.downsample,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            act_dtype=self.act_dtype,
        )
        self.dynamics_network = DynamicsResnet(
            self.num_blocks,
            self.num_channels + 1,
            self.reduced_channels_reward,
            self.fc_reward_layers,
            self.full_support_size,
            self.reduced_channels_reward * h * w,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            act_dtype=self.act_dtype,
        )
        self.prediction_network = PredictionResnet(
            self.action_space_size,
            self.num_blocks,
            self.num_channels,
            self.reduced_channels_value,
            self.reduced_channels_policy,
            self.fc_value_layers,
            self.fc_policy_layers,
            self.full_support_size,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            act_dtype=self.act_dtype,
        )

    def representation(self, observation, train: bool = False):
        """observation [B, C', H, W] -> hidden [B, h, w, channels] (NHWC)."""
        x = jnp.transpose(observation, (0, 2, 3, 1))  # NCHW config layout -> NHWC
        hidden = self.representation_network(x, train)
        return normalize_hidden_conv(hidden)

    def dynamics(self, hidden, action, train: bool = False):
        """hidden [B,h,w,C], action [B] -> (next hidden, reward logits).

        Action is broadcast as a constant plane action/action_space_size
        (reference models.py:555-572).
        """
        b, h, w, _ = hidden.shape
        plane = (action.astype(hidden.dtype) / self.action_space_size)[
            :, None, None, None
        ] * jnp.ones((b, h, w, 1), hidden.dtype)
        x = jnp.concatenate([hidden, plane], axis=-1)
        next_hidden, reward = self.dynamics_network(x, train)
        return normalize_hidden_conv(next_hidden), reward

    def prediction(self, hidden, train: bool = False):
        return self.prediction_network(hidden, train)

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
        value, reward, policy_logits, hidden = self.initial_inference(
            observation, train
        )
        return self.recurrent_inference(hidden, action, train)
