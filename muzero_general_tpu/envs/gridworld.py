"""Jittable MiniGrid Empty-Random-6x6 (reference games/gridworld.py:130-175
wraps gym_minigrid's MiniGrid-Empty-Random-6x6-v0 + ImgObsWrapper).

Re-implements the minigrid semantics the reference depends on:
- 6x6 grid with boundary walls, goal at inner bottom-right (4,4);
- agent starts at a random inner cell with a random direction;
- actions 0=turn left, 1=turn right, 2=forward (blocked by walls);
- reward on reaching the goal: 1 - 0.9 * step_count / max_steps with
  max_steps = 4 * 6 * 6 = 144 (minigrid's formula);
- observation: the ImgObsWrapper 'image' — a 7x7x3 egocentric view with
  agent at bottom-center facing up, cells encoded (object_idx, color_idx,
  state): out-of-grid (0,0,0), empty floor (1,0,0), wall (2,5,0),
  goal (8,1,0). In an empty room the boundary walls are the only occluders
  and everything beyond them is already out of grid, so the shadow-casting
  visibility reduces to bounds-checking.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv

SIZE = 6
VIEW = 7
MAX_STEPS = 4 * SIZE * SIZE
GOAL = (SIZE - 2, SIZE - 2)  # (x, y) inner bottom-right

# minigrid direction vectors: 0=right, 1=down, 2=left, 3=up, as (dx, dy)
_DIR = jnp.array([[1, 0], [0, 1], [-1, 0], [0, -1]], jnp.int32)


class GridWorldState(NamedTuple):
    x: jnp.ndarray  # int32 agent col
    y: jnp.ndarray  # int32 agent row
    dir: jnp.ndarray  # int32 0..3
    steps: jnp.ndarray  # int32
    done: jnp.ndarray  # bool


class GridWorld(JaxEnv):
    observation_shape = (7, 7, 3)  # raw minigrid image layout (reference parity)
    num_actions = 3
    num_players = 1

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        # Random inner cell excluding the goal (minigrid re-samples on
        # collision; goal occupancy check via rejection-free remap)
        idx = jax.random.randint(k1, (), 0, (SIZE - 2) * (SIZE - 2) - 1)
        goal_idx = (GOAL[1] - 1) * (SIZE - 2) + (GOAL[0] - 1)
        idx = jnp.where(idx >= goal_idx, idx + 1, idx)
        x = idx % (SIZE - 2) + 1
        y = idx // (SIZE - 2) + 1
        d = jax.random.randint(k2, (), 0, 4)
        return GridWorldState(
            x.astype(jnp.int32), y.astype(jnp.int32), d.astype(jnp.int32),
            jnp.int32(0), jnp.bool_(False),
        )

    def observation(self, state):
        """7x7x3 egocentric image, agent at (3, 6) of the view facing up."""
        vx = jnp.arange(VIEW)
        vy = jnp.arange(VIEW)
        # right offset r = vx - 3, forward offset f = 6 - vy
        r = (vx - VIEW // 2)[:, None]  # [7,1]
        f = (VIEW - 1 - vy)[None, :]  # [1,7]
        fwd = _DIR[state.dir]
        right = jnp.stack([-fwd[1], fwd[0]])
        wx = state.x + f * fwd[0] + r * right[0]  # [7,7] world col
        wy = state.y + f * fwd[1] + r * right[1]
        in_grid = (wx >= 0) & (wx < SIZE) & (wy >= 0) & (wy < SIZE)
        is_wall = in_grid & (
            (wx == 0) | (wx == SIZE - 1) | (wy == 0) | (wy == SIZE - 1)
        )
        is_goal = in_grid & (wx == GOAL[0]) & (wy == GOAL[1])
        obj = jnp.where(
            is_goal, 8, jnp.where(is_wall, 2, jnp.where(in_grid, 1, 0))
        )
        color = jnp.where(is_goal, 1, jnp.where(is_wall, 5, 0))
        st = jnp.zeros_like(obj)
        return jnp.stack([obj, color, st], axis=-1).astype(jnp.float32)

    def step(self, state, action, key):
        # 0 = turn left, 1 = turn right, 2 = forward
        d = jnp.where(
            action == 0, (state.dir - 1) % 4,
            jnp.where(action == 1, (state.dir + 1) % 4, state.dir),
        )
        fwd = _DIR[d]
        nx = state.x + jnp.where(action == 2, fwd[0], 0)
        ny = state.y + jnp.where(action == 2, fwd[1], 0)
        # Walls block (inner area is 1..SIZE-2)
        blocked = (nx < 1) | (nx > SIZE - 2) | (ny < 1) | (ny > SIZE - 2)
        nx = jnp.where(blocked, state.x, nx)
        ny = jnp.where(blocked, state.y, ny)
        steps = state.steps + 1
        at_goal = (nx == GOAL[0]) & (ny == GOAL[1])
        reward = jnp.where(
            at_goal & ~state.done,
            1.0 - 0.9 * steps.astype(jnp.float32) / MAX_STEPS,
            0.0,
        )
        done_now = at_goal | (steps >= MAX_STEPS)
        new_state = GridWorldState(
            nx.astype(jnp.int32), ny.astype(jnp.int32), d.astype(jnp.int32),
            steps, state.done | done_now,
        )
        return new_state, reward, new_state.done

    def action_to_string(self, action):
        return f"{action}. {['Turn left', 'Turn right', 'Forward'][int(action)]}"
