"""Jittable CartPole-v1 (classic Barto-Sutton-Anderson cart-pole physics).

On-device replacement for the gym env the reference wraps
(reference games/cartpole.py:131-204). Same dynamics constants, termination
thresholds, +1-per-step reward, and (1, 1, 4) observation layout, so the
learning problem is identical while self-play stays fully under jit.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv


class CartPoleState(NamedTuple):
    x: jnp.ndarray  # cart position
    x_dot: jnp.ndarray
    theta: jnp.ndarray  # pole angle (rad)
    theta_dot: jnp.ndarray
    steps: jnp.ndarray  # int32 step counter (500-step truncation)
    done: jnp.ndarray  # bool


GRAVITY = 9.8
MASS_CART = 1.0
MASS_POLE = 0.1
TOTAL_MASS = MASS_CART + MASS_POLE
POLE_HALF_LENGTH = 0.5
POLE_MASS_LENGTH = MASS_POLE * POLE_HALF_LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * jnp.pi / 360
X_LIMIT = 2.4
MAX_STEPS = 500


class CartPole(JaxEnv):
    observation_shape = (1, 1, 4)
    num_actions = 2
    num_players = 1

    def reset(self, key):
        init = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        return CartPoleState(
            x=init[0],
            x_dot=init[1],
            theta=init[2],
            theta_dot=init[3],
            steps=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def observation(self, state):
        return jnp.stack(
            [state.x, state.x_dot, state.theta, state.theta_dot]
        ).reshape(1, 1, 4)

    def step(self, state, action, key):
        force = jnp.where(action == 1, FORCE_MAG, -FORCE_MAG)
        cos_t = jnp.cos(state.theta)
        sin_t = jnp.sin(state.theta)
        temp = (
            force + POLE_MASS_LENGTH * state.theta_dot**2 * sin_t
        ) / TOTAL_MASS
        theta_acc = (GRAVITY * sin_t - cos_t * temp) / (
            POLE_HALF_LENGTH
            * (4.0 / 3.0 - MASS_POLE * cos_t**2 / TOTAL_MASS)
        )
        x_acc = temp - POLE_MASS_LENGTH * theta_acc * cos_t / TOTAL_MASS

        x = state.x + TAU * state.x_dot
        x_dot = state.x_dot + TAU * x_acc
        theta = state.theta + TAU * state.theta_dot
        theta_dot = state.theta_dot + TAU * theta_acc
        steps = state.steps + 1

        terminated = (
            (jnp.abs(x) > X_LIMIT)
            | (jnp.abs(theta) > THETA_LIMIT)
            | (steps >= MAX_STEPS)
        )
        # Stepping an already-done state keeps it done with 0 reward.
        reward = jnp.where(state.done, 0.0, 1.0)
        new_state = CartPoleState(
            x=x, x_dot=x_dot, theta=theta, theta_dot=theta_dot,
            steps=steps, done=state.done | terminated,
        )
        return new_state, reward, new_state.done
