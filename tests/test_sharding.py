"""Multi-device mesh tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.parallel import (
    create_mesh,
    make_sharded_train_step,
    param_sharding,
    shard_batch,
    shard_train_state,
)
from muzero_general_tpu.trainer import init_train_state, make_train_step


def big_fc_config():
    c = MuZeroConfig()
    c.observation_shape = (1, 1, 8)
    c.action_space = list(range(4))
    c.encoding_size = 512
    c.fc_representation_layers = [512]
    c.fc_dynamics_layers = [512]
    c.fc_reward_layers = [64]
    c.fc_value_layers = [64]
    c.fc_policy_layers = [64]
    c.support_size = 10
    c.num_unroll_steps = 3
    c.batch_size = 16
    return c


def fake_batch(cfg, rng):
    B, U = cfg.batch_size, cfg.num_unroll_steps
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    return {
        "observation": rng.normal(size=(B, c, h, w)).astype(np.float32),
        "action": rng.integers(0, A, (B, U + 1)).astype(np.int32),
        "target_value": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_reward": rng.normal(size=(B, U + 1)).astype(np.float32),
        "target_policy": rng.dirichlet(np.ones(A), (B, U + 1)).astype(np.float32),
        "weight": np.ones(B, np.float32),
        "gradient_scale": np.full((B, U + 1), U, np.float32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_param_sharding_rule():
    cfg = big_fc_config()
    mesh = create_mesh(num_dp=4, num_mp=2)
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    shardings = param_sharding(variables["params"], mesh)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    mp_sharded = [
        s for _, s in leaves if "mp" in str(s.spec)
    ]
    assert mp_sharded, "no kernel picked up mp sharding despite 512-dim layers"


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(dp, mp):
    """dp/mp sharded training must produce the same step as unsharded.

    SGD without momentum so the update is linear in the gradient (Adam's
    first-step update is ~sign(g), amplifying float reduction noise)."""
    cfg = big_fc_config()
    cfg.optimizer = "SGD"
    cfg.momentum = 0.0
    cfg.weight_decay = 0.0
    runner = MuZeroNetwork(cfg)
    rng = np.random.default_rng(0)
    raw = fake_batch(cfg, rng)

    state1 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    step1 = make_train_step(runner, cfg, donate=False)
    s1, m1, p1 = step1(state1, {k: jnp.asarray(v) for k, v in raw.items()})

    mesh = create_mesh(num_dp=dp, num_mp=mp)
    state2 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    state2 = shard_train_state(state2, mesh)
    step2 = make_sharded_train_step(runner, cfg, mesh)
    s2, m2, p2 = step2(state2, shard_batch(raw, mesh))

    assert float(m1["total_loss"]) == pytest.approx(
        float(m2["total_loss"]), rel=1e-5
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5)
    for p0, a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        # compare the UPDATES, which are lr-scaled gradients
        np.testing.assert_allclose(
            np.asarray(a - p0), np.asarray(b - p0), rtol=5e-3, atol=1e-6
        )


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(out))
