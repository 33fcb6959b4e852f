"""Shared model building blocks.

`TorchDense`/`TorchConv` reproduce torch.nn.Linear / torch.nn.Conv2d default
initialization (kaiming_uniform(a=sqrt(5)) → U(±1/sqrt(fan_in)) for both
kernel and bias) so learning curves are comparable with the reference, which
relies on those defaults (reference models.py:630-642, :206-209).

All modules use NHWC layout (TPU-native); the reference is NCHW.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear default init.

    out_dtype: activation dtype of the OUTPUT (default f32 — heads/losses
    and BN want full precision). The bf16-activation inference variant
    (models/resnet.py act_dtype) passes bf16 to halve the bandwidth of the
    elementwise passes between matmuls."""

    features: int
    dtype: jnp.dtype = jnp.float32
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound), (fan_in, self.features))
        bias = self.param("bias", _uniform_init(bound), (self.features,))
        # Uniform operand dtype keeps the vjp transpose well-typed under
        # mixed precision; the TPU MXU accumulates bf16 products in f32
        # internally, the output is upcast for heads/losses.
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return y.astype(self.out_dtype) + bias.astype(self.out_dtype)


class MLP(nn.Module):
    """ELU MLP with identity output (reference models.py:630-642 `mlp`)."""

    layer_sizes: Sequence[int]
    output_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for size in self.layer_sizes:
            x = jax.nn.elu(TorchDense(size, dtype=self.dtype)(x))
        return TorchDense(self.output_size, dtype=self.dtype)(x)


class TorchConv(nn.Module):
    """NHWC conv with torch.nn.Conv2d default init (out_dtype: see
    TorchDense)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = x.shape[-1] * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel", _uniform_init(bound), (kh, kw, x.shape[-1], self.features)
        )
        pad = [(self.padding, self.padding)] * 2
        # Uniform operand/output dtype (see TorchDense): keeps the conv
        # transpose well-typed under bf16; MXU accumulation is f32 either way.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(self.out_dtype)
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(self.out_dtype)
        return y


def conv3x3(features, strides=1, dtype=jnp.float32):
    """3x3 conv, pad 1, no bias (reference models.py:206-209)."""
    return TorchConv(
        features,
        kernel_size=(3, 3),
        strides=(strides, strides),
        padding=1,
        use_bias=False,
        dtype=dtype,
    )


class ResidualBlock(nn.Module):
    """conv-bn-relu-conv-bn + skip, relu (reference models.py:213-229).

    fold_bn: inference-only variant with the batch norms folded into the
    convolutions (kernel *= gamma*rsqrt(var+eps); bias = beta - mean*that).
    Parameters for this variant come from network.fold_bn_variables — the
    TorchConv numbering is unchanged because BatchNorm uses its own counter.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False
    # Activation dtype of the folded variant (bf16 halves the bandwidth of
    # the conv-epilogue elementwise passes and the search hidden store).
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn:
            assert not train, "fold_bn is an inference-only variant"
            out = TorchConv(
                self.channels, kernel_size=(3, 3), padding=1, use_bias=True,
                dtype=self.dtype, out_dtype=self.act_dtype,
            )(x)
            out = jax.nn.relu(out)
            out = TorchConv(
                self.channels, kernel_size=(3, 3), padding=1, use_bias=True,
                dtype=self.dtype, out_dtype=self.act_dtype,
            )(out)
            return jax.nn.relu(out + x.astype(self.act_dtype))
        out = conv3x3(self.channels, dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = jax.nn.relu(out)
        out = conv3x3(self.channels, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        return jax.nn.relu(out + x)


def normalize_hidden_fc(h: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize hidden state to [0,1] per sample.

    Parity: reference models.py:137-145 — note the reference *adds* 1e-5 to
    scales below 1e-5 rather than clamping; reproduced exactly.
    """
    h_min = jnp.min(h, axis=-1, keepdims=True)
    h_max = jnp.max(h, axis=-1, keepdims=True)
    scale = h_max - h_min
    scale = jnp.where(scale < 1e-5, scale + 1e-5, scale)
    return (h - h_min) / scale


def normalize_hidden_conv(h: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize NHWC hidden state per (sample, channel) over H,W.

    Parity: reference models.py:529-553.
    """
    h_min = jnp.min(h, axis=(-3, -2), keepdims=True)
    h_max = jnp.max(h, axis=(-3, -2), keepdims=True)
    scale = h_max - h_min
    scale = jnp.where(scale < 1e-5, scale + 1e-5, scale)
    return (h - h_min) / scale


def log_one_hot_zero_reward(batch: int, full_support_size: int) -> jnp.ndarray:
    """Reward logits fixed to 'log one-hot of scalar 0' for initial inference.

    Parity: reference models.py:176-183 (uses true log(one_hot) = -inf off
    center; we use a finite -1e9 floor, identical under softmax, NaN-safe).
    """
    logits = jnp.full((batch, full_support_size), -1e9, dtype=jnp.float32)
    return logits.at[:, full_support_size // 2].set(0.0)
