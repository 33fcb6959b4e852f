"""Trainer unit tests: optimizer parity, gradient-scaling algebra, smoke step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.trainer import (
    init_train_state,
    lr_schedule,
    make_train_step,
    scale_gradient,
)


def small_config(**kw):
    c = MuZeroConfig()
    c.observation_shape = (1, 1, 4)
    c.action_space = list(range(2))
    c.encoding_size = 4
    c.fc_dynamics_layers = [8]
    c.fc_reward_layers = [8]
    c.fc_value_layers = [8]
    c.fc_policy_layers = [8]
    c.support_size = 5
    c.num_unroll_steps = 3
    c.batch_size = 4
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def fake_batch(cfg, rng):
    B, U = cfg.batch_size, cfg.num_unroll_steps
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    n = cfg.stacked_observations
    return {
        "observation": rng.normal(size=(B, c * (n + 1) + n, h, w)).astype(np.float32),
        "action": rng.integers(0, A, (B, U + 1)).astype(np.int32),
        "target_value": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_reward": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_policy": rng.dirichlet(np.ones(A), (B, U + 1)).astype(np.float32),
        "weight": np.ones(B, np.float32),
        "gradient_scale": np.full((B, U + 1), U, np.float32),
    }


def test_scale_gradient_preserves_forward_scales_backward():
    x = jnp.array([2.0, -3.0])

    def f(x):
        return jnp.sum(scale_gradient(x, 0.5) ** 2)

    np.testing.assert_allclose(np.asarray(f(x)), 13.0)
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, -3.0])  # 0.5 * 2x


def test_lr_schedule_matches_reference_formula():
    cfg = small_config(lr_init=0.02, lr_decay_rate=0.8, lr_decay_steps=1000)
    s = lr_schedule(cfg)
    for step in [0, 100, 1000, 5000]:
        expected = 0.02 * 0.8 ** (step / 1000)  # reference trainer.py:279-281
        assert float(s(step)) == pytest.approx(expected, rel=1e-6)


@pytest.mark.parametrize("optimizer", ["Adam", "SGD"])
def test_train_step_reduces_loss(optimizer):
    cfg = small_config(optimizer=optimizer, lr_init=0.05, PER=False)
    runner = MuZeroNetwork(cfg)
    state = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(runner, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in fake_batch(cfg, rng).items()}
    losses = []
    for _ in range(30):
        state, metrics, priorities = step_fn(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert priorities.shape == (cfg.batch_size, cfg.num_unroll_steps + 1)
    assert (np.asarray(priorities) >= 0).all()
    assert int(state.step) == 30


def test_per_weights_scale_loss():
    cfg = small_config(PER=True)
    runner = MuZeroNetwork(cfg)
    state = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(runner, cfg, donate=False)
    rng = np.random.default_rng(0)
    raw = fake_batch(cfg, rng)
    b1 = {k: jnp.asarray(v) for k, v in raw.items()}
    raw2 = dict(raw)
    raw2["weight"] = raw["weight"] * 0.5
    b2 = {k: jnp.asarray(v) for k, v in raw2.items()}
    _, m1, _ = step_fn(state, b1)
    _, m2, _ = step_fn(state, b2)
    # total (weighted) loss halves; per-component logs are pre-weight
    assert float(m2["total_loss"]) == pytest.approx(
        float(m1["total_loss"]) * 0.5, rel=1e-5
    )
    assert float(m2["value_loss"]) == pytest.approx(float(m1["value_loss"]), rel=1e-5)


def test_gradient_scale_divides_unroll_grads():
    """The ÷gradient_scale hook semantics (reference trainer.py:225-233):
    same batch, gradient_scale doubled → unroll-step gradient contributions
    halve, while forward losses are unchanged."""
    cfg = small_config(PER=False)
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    raw = fake_batch(cfg, rng)

    from muzero_general_tpu.trainer import make_train_step as mts

    # Extract loss_fn gradients through a probe: run one step with two
    # different gradient scales from identical states and compare updates.
    import optax

    cfg.lr_init = 1.0
    cfg.lr_decay_rate = 1.0
    cfg.weight_decay = 0.0
    cfg.optimizer = "SGD"
    cfg.momentum = 0.0
    runner2 = MuZeroNetwork(cfg)
    state = init_train_state(runner2, cfg, jax.random.PRNGKey(0))
    step_fn = mts(runner2, cfg, donate=False)

    b1 = {k: jnp.asarray(v) for k, v in raw.items()}
    raw2 = dict(raw)
    raw2["gradient_scale"] = raw["gradient_scale"] * 2
    b2 = {k: jnp.asarray(v) for k, v in raw2.items()}

    s1, m1, _ = step_fn(state, b1)
    s2, m2, _ = step_fn(state, b2)
    # forward losses identical
    assert float(m1["total_loss"]) == pytest.approx(float(m2["total_loss"]), rel=1e-6)
    # with lr=1, update = -grad; the dynamics-net gradient flows only through
    # unroll steps, so its update must halve exactly
    d1 = s1.params["dynamics_state_network"]
    d2 = s2.params["dynamics_state_network"]
    p0 = state.params["dynamics_state_network"]
    u1 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), d1, p0)
    u2 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), d2, p0)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(b, a / 2, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("network", ["fullyconnected", "resnet"])
def test_bfloat16_train_step(network):
    """compute_dtype=bfloat16 trains (forward AND backward) for both nets —
    the conv/dot transpose must stay well-typed under mixed precision."""
    cfg = small_config(compute_dtype="bfloat16")
    if network == "resnet":
        cfg.network = "resnet"
        cfg.observation_shape = (3, 3, 3)
        cfg.action_space = list(range(9))
        cfg.blocks = 1
        cfg.channels = 8
        cfg.reduced_channels_reward = 2
        cfg.reduced_channels_value = 2
        cfg.reduced_channels_policy = 2
        cfg.resnet_fc_reward_layers = [8]
        cfg.resnet_fc_value_layers = [8]
        cfg.resnet_fc_policy_layers = [8]
    runner = MuZeroNetwork(cfg)
    state = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    batch = {
        k: jnp.asarray(v)
        for k, v in fake_batch(cfg, np.random.default_rng(0)).items()
    }
    step = make_train_step(runner, cfg, donate=False)
    s1, m1, _ = step(state, batch)
    assert np.isfinite(float(m1["total_loss"]))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(s1.params),
        )
    )
    assert moved
