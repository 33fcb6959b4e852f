"""Jittable 3x3 GridEnv (reference games/simple_grid.py:192-229).

Down/Right walk to the bottom-right goal; reward 10 on arrival (the
reference Game wrapper scales reward*10, simple_grid.py:144), illegal moves
at the border are no-ops (reference step() passes).
"""

from typing import NamedTuple

import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv

SIZE = 3


class SimpleGridState(NamedTuple):
    row: jnp.ndarray  # int32
    col: jnp.ndarray  # int32
    done: jnp.ndarray  # bool


class SimpleGrid(JaxEnv):
    observation_shape = (1, 1, SIZE * SIZE)
    num_actions = 2  # 0 = Down, 1 = Right
    num_players = 1

    def reset(self, key):
        return SimpleGridState(jnp.int32(0), jnp.int32(0), jnp.bool_(False))

    def observation(self, state):
        flat = jnp.zeros((SIZE * SIZE,), jnp.float32).at[
            state.row * SIZE + state.col
        ].set(1.0)
        return flat.reshape(1, 1, SIZE * SIZE)

    def legal_actions_mask(self, state):
        return jnp.array(
            [True, True]
        ) & jnp.stack([state.row < SIZE - 1, state.col < SIZE - 1])

    def step(self, state, action, key):
        legal = self.legal_actions_mask(state)
        move_ok = legal[action]
        row = jnp.where(move_ok & (action == 0), state.row + 1, state.row)
        col = jnp.where(move_ok & (action == 1), state.col + 1, state.col)
        at_goal = (row == SIZE - 1) & (col == SIZE - 1)
        reward = jnp.where(at_goal & ~state.done, 10.0, 0.0)
        new_state = SimpleGridState(row, col, state.done | at_goal)
        return new_state, reward, new_state.done

    def action_to_string(self, action):
        return f"{action}. {['Down', 'Right'][int(action)]}"
