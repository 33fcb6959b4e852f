"""Categorical value/reward support codecs.

MuZero encodes scalar values and rewards as categorical distributions over an
integer support [-support_size, support_size] after contracting the scale with
h(x) = sign(x)(sqrt(|x|+1) - 1) + eps*x  (https://arxiv.org/abs/1805.11593).

Behavioral parity with reference models.py:645-689 (support_to_scalar /
scalar_to_support), re-expressed as pure jnp functions over the last axis so
they vmap/jit/shard freely (the reference hardcodes dim=1/dim=2 torch ops).
"""

import jax.numpy as jnp
import jax.nn

EPS = 0.001


def contract_scale(x: jnp.ndarray) -> jnp.ndarray:
    """h(x) = sign(x)(sqrt(|x|+1)-1) + eps*x (reference models.py:675)."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + EPS * x


def expand_scale(x: jnp.ndarray) -> jnp.ndarray:
    """h^{-1}(x), the closed-form inverse (reference models.py:661-665)."""
    return jnp.sign(x) * (
        jnp.square(
            (jnp.sqrt(1.0 + 4.0 * EPS * (jnp.abs(x) + 1.0 + EPS)) - 1.0) / (2.0 * EPS)
        )
        - 1.0
    )


def support_to_scalar(logits: jnp.ndarray, support_size: int) -> jnp.ndarray:
    """Decode categorical logits [..., 2*support_size+1] to scalars [...].

    softmax -> expectation over the integer support -> invert h.
    Parity: reference models.py:645-666 (which returns keepdim [..., 1]; we
    return the squeezed scalar — callers index accordingly).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    support = jnp.arange(-support_size, support_size + 1, dtype=probs.dtype)
    x = jnp.sum(probs * support, axis=-1)
    return expand_scale(x)


def scalar_to_support(x: jnp.ndarray, support_size: int) -> jnp.ndarray:
    """Encode scalars [...] as two-hot targets [..., 2*support_size+1].

    Apply h, clamp to the support, then split mass between floor and floor+1.
    Parity: reference models.py:669-689 including its edge rule that mass
    falling past the top bin is dropped (masked_fill with 0 at index 0 — the
    floor bin already holds (1-prob) and the overflow prob is discarded into
    bin 0 only when floor == support_size, where prob == 0 anyway after clamp).
    """
    x = contract_scale(x)
    x = jnp.clip(x, -support_size, support_size)
    floor = jnp.floor(x)
    prob = x - floor
    idx_low = (floor + support_size).astype(jnp.int32)
    idx_high = idx_low + 1
    n_bins = 2 * support_size + 1
    # Overflow guard (reference models.py:685-688): when idx_high > 2S the
    # leftover prob is zeroed and the write is redirected to bin 0.
    overflow = idx_high > n_bins - 1
    prob = jnp.where(overflow, 0.0, prob)
    idx_high = jnp.where(overflow, 0, idx_high)
    low = jax.nn.one_hot(idx_low, n_bins, dtype=x.dtype) * (1.0 - prob)[..., None]
    high = jax.nn.one_hot(idx_high, n_bins, dtype=x.dtype) * prob[..., None]
    return low + high
