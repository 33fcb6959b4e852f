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
