"""Shape and invariance tests for the FC and ResNet triplets.

Shape parity targets: reference models.py:80-195 (FC) and :436-623 (ResNet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork


def fc_config():
    c = MuZeroConfig()
    c.network = "fullyconnected"
    c.observation_shape = (1, 1, 4)
    c.action_space = list(range(2))
    c.stacked_observations = 0
    c.encoding_size = 8
    c.support_size = 10
    return c


def resnet_config():
    c = MuZeroConfig()
    c.network = "resnet"
    c.observation_shape = (3, 6, 7)  # connect4-like
    c.action_space = list(range(7))
    c.stacked_observations = 0
    c.blocks = 2
    c.channels = 16
    c.reduced_channels_reward = 4
    c.reduced_channels_value = 4
    c.reduced_channels_policy = 4
    c.resnet_fc_reward_layers = [8]
    c.resnet_fc_value_layers = [8]
    c.resnet_fc_policy_layers = [8]
    c.support_size = 10
    return c


@pytest.mark.parametrize("cfg_fn", [fc_config, resnet_config])
def test_shapes_and_normalization(cfg_fn):
    config = cfg_fn()
    net = MuZeroNetwork(config)
    variables = net.init(jax.random.PRNGKey(0))
    B = 5
    obs = jax.random.normal(
        jax.random.PRNGKey(1), (B,) + net.stacked_observation_shape()
    )
    value, reward, policy, hidden = net.initial_inference(variables, obs)
    A = len(config.action_space)
    S = 2 * config.support_size + 1
    assert value.shape == (B, S)
    assert reward.shape == (B, S)
    assert policy.shape == (B, A)
    # Hidden state min-max normalized to [0, 1] (reference models.py:137-145/529-553)
    h = np.asarray(hidden)
    assert h.min() >= -1e-6 and h.max() <= 1.0 + 1e-6

    actions = jnp.arange(B) % A
    value2, reward2, policy2, hidden2 = net.recurrent_inference(
        variables, hidden, actions
    )
    assert value2.shape == (B, S)
    assert reward2.shape == (B, S)
    assert policy2.shape == (B, A)
    assert hidden2.shape == hidden.shape


def test_initial_reward_is_log_onehot_zero():
    config = fc_config()
    net = MuZeroNetwork(config)
    variables = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2,) + net.stacked_observation_shape())
    _, reward, _, _ = net.initial_inference(variables, obs)
    probs = np.asarray(jax.nn.softmax(reward, axis=-1))
    np.testing.assert_allclose(probs[:, config.support_size], 1.0, atol=1e-6)


def test_stacked_observation_channels():
    """Channel count fed to the net = C*(n+1) + n (reference models.py:100-104)."""
    config = fc_config()
    config.stacked_observations = 3
    net = MuZeroNetwork(config)
    assert net.stacked_observation_shape() == (1 * 4 + 3, 1, 4)


def test_resnet_downsample_shapes():
    config = resnet_config()
    config.observation_shape = (3, 96, 96)
    config.action_space = list(range(4))
    config.downsample = "resnet"
    config.blocks = 1
    config.channels = 8
    net = MuZeroNetwork(config)
    variables = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2,) + net.stacked_observation_shape())
    _, _, _, hidden = net.initial_inference(variables, obs)
    # /16 spatial reduction (reference models.py:456-462)
    assert hidden.shape == (2, 6, 6, 8)


def test_batch_stats_update_in_train_mode():
    config = resnet_config()
    net = MuZeroNetwork(config)
    variables = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(
        jax.random.PRNGKey(2), (4,) + net.stacked_observation_shape()
    )
    out, mutated = net.initial_inference_train(variables, obs)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_bn_folding_matches_unfolded():
    """BN-folded inference (models/network.py fold_bn_variables) equals the
    running-stats inference path up to float reassociation — the folded
    variant is what the self-play search runs (selfplay.py fold_bn)."""
    from muzero_general_tpu.config import load_game_module

    cfg = load_game_module("connect4").MuZeroConfig()
    runner = MuZeroNetwork(cfg)
    v = runner.init(jax.random.PRNGKey(0))

    # Perturb the running stats so folding is non-trivial (fresh init has
    # mean=0 var=1, which folding maps through almost unchanged).
    def bump(d):
        for s in d.values():
            if "mean" in s:
                s["mean"] = s["mean"] + 0.3
                s["var"] = s["var"] * 1.7 + 0.1
            else:
                bump(s)

    bump(v["batch_stats"])
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(4,) + runner.stacked_observation_shape()).astype(
        np.float32
    )
    act = jnp.asarray([0, 1, 2, 3], jnp.int32)

    fv = runner.fold_variables(v)
    # No BatchNorm params remain anywhere in the folded tree.
    flat = jax.tree_util.tree_flatten_with_path(fv)[0]
    assert not any("BatchNorm" in str(path) for path, _ in flat)

    ref = runner.initial_inference(v, jnp.asarray(obs))
    out = runner.initial_inference_folded(fv, jnp.asarray(obs))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    ref2 = runner.recurrent_inference(v, ref[3], act)
    out2 = runner.recurrent_inference_folded(fv, ref[3], act)
    for a, b in zip(ref2, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bn_folding_downsample_resnet():
    """Folding covers the downsample pyramid's blocks too (atari config)."""
    cfg = MuZeroConfig()
    cfg.network = "resnet"
    cfg.observation_shape = (3, 32, 32)
    cfg.stacked_observations = 1
    cfg.action_space = list(range(4))
    cfg.players = [0]
    cfg.blocks = 1
    cfg.channels = 8
    cfg.reduced_channels_reward = 2
    cfg.reduced_channels_value = 2
    cfg.reduced_channels_policy = 2
    cfg.resnet_fc_reward_layers = [8]
    cfg.resnet_fc_value_layers = [8]
    cfg.resnet_fc_policy_layers = [8]
    cfg.support_size = 5
    cfg.downsample = "resnet"
    runner = MuZeroNetwork(cfg)
    v = runner.init(jax.random.PRNGKey(1))
    fv = runner.fold_variables(v)
    obs = np.random.default_rng(1).normal(
        size=(2,) + runner.stacked_observation_shape()
    ).astype(np.float32)
    ref = runner.initial_inference(v, jnp.asarray(obs))
    out = runner.initial_inference_folded(fv, jnp.asarray(obs))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bf16_activation_variant_close():
    """search_bf16_activations: the bf16-activation folded pipeline tracks
    the f32 path within bf16 rounding (policy/value logits still f32)."""
    from muzero_general_tpu.config import load_game_module

    cfg = load_game_module("connect4").MuZeroConfig()
    cfg.search_bf16_activations = True
    runner = MuZeroNetwork(cfg)
    v = runner.init(jax.random.PRNGKey(0))
    fv = runner.fold_variables(v)
    obs = np.random.default_rng(2).normal(
        size=(4,) + runner.stacked_observation_shape()
    ).astype(np.float32)
    ref = runner.initial_inference(v, jnp.asarray(obs))
    out = runner.initial_inference_folded(fv, jnp.asarray(obs))
    assert out[3].dtype == jnp.bfloat16  # hidden store dtype halved
    for a, b in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float32), atol=0.15, rtol=0.05
        )
    r2 = runner.recurrent_inference_folded(fv, out[3], jnp.asarray([0, 1, 2, 3]))
    assert r2[3].dtype == jnp.bfloat16
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in r2)
