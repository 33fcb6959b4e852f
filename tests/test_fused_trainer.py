"""Fused multi-step training must equal sequential single steps."""

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.config import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.trainer import (
    init_train_state,
    make_fused_train_steps,
    make_train_step,
)


def test_fused_equals_sequential():
    cfg = MuZeroConfig()
    cfg.observation_shape = (1, 1, 4)
    cfg.action_space = list(range(2))
    cfg.encoding_size = 4
    cfg.fc_dynamics_layers = [8]
    cfg.fc_reward_layers = [8]
    cfg.fc_value_layers = [8]
    cfg.fc_policy_layers = [8]
    cfg.support_size = 5
    cfg.num_unroll_steps = 3
    cfg.batch_size = 4
    cfg.PER = True

    runner = MuZeroNetwork(cfg)
    rng = np.random.default_rng(0)
    M, B, U, A = 3, cfg.batch_size, cfg.num_unroll_steps, 2

    def batch(i):
        r = np.random.default_rng(i)
        return {
            "observation": r.normal(size=(B, 1, 1, 4)).astype(np.float32),
            "action": r.integers(0, A, (B, U + 1)).astype(np.int32),
            "target_value": r.normal(size=(B, U + 1)).astype(np.float32),
            "target_reward": r.normal(size=(B, U + 1)).astype(np.float32),
            "target_policy": r.dirichlet(np.ones(A), (B, U + 1)).astype(np.float32),
            "weight": np.ones(B, np.float32),
            "gradient_scale": np.full((B, U + 1), U, np.float32),
        }

    batches = [batch(i) for i in range(M)]

    s1 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    step = make_train_step(runner, cfg, donate=False)
    prs = []
    for b in batches:
        s1, m1, p = step(s1, {k: jnp.asarray(v) for k, v in b.items()})
        prs.append(np.asarray(p))

    s2 = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    fused = make_fused_train_steps(runner, cfg, donate=False)
    stacked = {
        k: jnp.asarray(np.stack([b[k] for b in batches])) for k in batches[0]
    }
    s2, m2, pm = fused(s2, stacked)

    assert int(s2.step) == int(s1.step) == M
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pm), np.stack(prs), rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
