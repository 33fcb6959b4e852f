"""JAX-native Breakout env tests."""

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.envs.breakout_jax import (
    BRICK_ROWS,
    LIVES,
    BreakoutJax,
)

env = BreakoutJax()


def test_reset_and_observation():
    s = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(env.observation(s))
    assert obs.shape == (3, 96, 96)
    assert 0.0 <= obs.min() and obs.max() <= 1.0
    assert obs.sum() > 0  # bricks + paddle + ball drawn
    assert int(s.lives) == LIVES


def test_fire_serves_and_ball_moves():
    k = jax.random.PRNGKey(0)
    s = env.reset(k)
    s, r, d = env.step(s, jnp.int32(1), k)  # FIRE
    assert bool(s.ball_live)
    y0 = float(s.ball_y)
    s, r, d = env.step(s, jnp.int32(0), k)
    assert float(s.ball_y) < y0  # moving up after serve


def test_paddle_moves_and_clamps():
    k = jax.random.PRNGKey(0)
    s = env.reset(k)
    x0 = float(s.paddle_x)
    s, _, _ = env.step(s, jnp.int32(2), k)
    assert float(s.paddle_x) > x0
    for _ in range(40):
        s, _, _ = env.step(s, jnp.int32(3), k)
    assert float(s.paddle_x) >= 5.9  # clamped at the wall


def test_bricks_break_and_score():
    """Play with a scripted policy until some brick is hit."""
    k = jax.random.PRNGKey(1)
    s = env.reset(k)
    s, _, _ = env.step(s, jnp.int32(1), k)
    total = 0.0
    for i in range(600):
        # track the ball with the paddle
        a = jnp.where(s.ball_x > s.paddle_x + 2, 2,
                      jnp.where(s.ball_x < s.paddle_x - 2, 3, 0))
        a = jnp.where(s.ball_live, a, 1)  # refire when lost
        s, r, d = env.step(s, jnp.int32(a), jax.random.fold_in(k, i))
        total += float(r)
        if bool(d):
            break
    assert total > 0, "tracking policy never hit a brick"
    assert int(np.asarray(s.bricks).sum()) < BRICK_ROWS * 16


def test_vmapped_batch_steps():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.ones((64,), jnp.int32)  # all FIRE
    states, r, d = jax.vmap(env.step)(states, actions, keys)
    obs = jax.vmap(env.observation)(states)
    assert obs.shape == (64, 3, 96, 96)
    assert bool(states.ball_live.all())
