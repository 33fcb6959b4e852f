"""Jittable Breakout (96x96 RGB, Atari-class, fully on-device).

The reference's breakout/atari games wrap ALE Breakout-v4 with cv2 resize to
96x96 CHW/255 (reference games/atari.py:146-160). ale-py is not available in
this image, so this is a from-scratch Breakout with the same interface
contract: 4 actions (NOOP/FIRE/RIGHT/LEFT — the ALE Breakout action set),
(3, 96, 96) float observations in [0,1], brick-row scoring (7/7/4/4/1/1),
5 lives. Pixels are drawn with vectorized masks so thousands of boards
render per step on the VPU.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv

W = H = 96
PADDLE_W = 12
PADDLE_Y = 90
PADDLE_SPEED = 4
BALL_SIZE = 2
BRICK_ROWS = 6
BRICK_COLS = 16
BRICK_W = W // BRICK_COLS  # 6 px
BRICK_H = 3
BRICK_Y0 = 24
ROW_SCORES = jnp.array([7.0, 7.0, 4.0, 4.0, 1.0, 1.0])
LIVES = 5

_XS = jnp.arange(W, dtype=jnp.float32)
_YS = jnp.arange(H, dtype=jnp.float32)
# Brick row colors (loosely the Atari palette), [rows, 3]
_ROW_COLORS = jnp.array(
    [
        [0.78, 0.28, 0.28],
        [0.78, 0.45, 0.28],
        [0.70, 0.64, 0.28],
        [0.64, 0.70, 0.28],
        [0.28, 0.70, 0.28],
        [0.28, 0.45, 0.78],
    ]
)


class BreakoutState(NamedTuple):
    paddle_x: jnp.ndarray  # f32 center x
    ball_x: jnp.ndarray  # f32
    ball_y: jnp.ndarray  # f32
    vel_x: jnp.ndarray  # f32
    vel_y: jnp.ndarray  # f32
    ball_live: jnp.ndarray  # bool — ball in play (FIRE launches)
    bricks: jnp.ndarray  # [rows, cols] bool
    lives: jnp.ndarray  # int32
    done: jnp.ndarray  # bool
    key: jnp.ndarray  # PRNG key for serve angles


class BreakoutJax(JaxEnv):
    observation_shape = (3, H, W)
    num_actions = 4  # NOOP, FIRE, RIGHT, LEFT (ALE Breakout minimal set)
    num_players = 1

    def reset(self, key):
        return BreakoutState(
            paddle_x=jnp.float32(W / 2),
            ball_x=jnp.float32(W / 2),
            ball_y=jnp.float32(PADDLE_Y - 2),
            vel_x=jnp.float32(0.0),
            vel_y=jnp.float32(0.0),
            ball_live=jnp.bool_(False),
            bricks=jnp.ones((BRICK_ROWS, BRICK_COLS), bool),
            lives=jnp.int32(LIVES),
            done=jnp.bool_(False),
            key=key,
        )

    def observation(self, state):
        """[3, 96, 96] float RGB in [0,1]."""
        img = jnp.zeros((H, W, 3), jnp.float32)
        # Bricks: upsample the [rows, cols] grid into pixel bands
        brick_img = jnp.repeat(
            jnp.repeat(state.bricks.astype(jnp.float32), BRICK_H, axis=0),
            BRICK_W, axis=1,
        )  # [rows*3, 96]
        colors = jnp.repeat(_ROW_COLORS, BRICK_H, axis=0)  # [rows*3, 3]
        band = brick_img[:, :, None] * colors[:, None, :]
        img = jax.lax.dynamic_update_slice(img, band, (BRICK_Y0, 0, 0))
        # Paddle (grey)
        px = jnp.clip(state.paddle_x, PADDLE_W / 2, W - PADDLE_W / 2)
        paddle_mask = (
            (jnp.abs(_XS[None, :] - px) <= PADDLE_W / 2)
            & (jnp.abs(_YS[:, None] - PADDLE_Y) <= 1)
        )
        img = jnp.where(paddle_mask[:, :, None], 0.7, img)
        # Ball (white)
        ball_mask = (
            (jnp.abs(_XS[None, :] - state.ball_x) <= BALL_SIZE / 2)
            & (jnp.abs(_YS[:, None] - state.ball_y) <= BALL_SIZE / 2)
        )
        img = jnp.where(ball_mask[:, :, None], 1.0, img)
        return jnp.transpose(img, (2, 0, 1))

    def step(self, state, action, key):
        k_serve, k_next = jax.random.split(
            jax.random.fold_in(state.key, 1)
        )
        # Paddle motion (2 = RIGHT, 3 = LEFT)
        px = state.paddle_x + jnp.where(
            action == 2, PADDLE_SPEED, jnp.where(action == 3, -PADDLE_SPEED, 0)
        )
        px = jnp.clip(px, PADDLE_W / 2, W - PADDLE_W / 2)

        # FIRE serves the ball when dead
        serve = (action == 1) & ~state.ball_live
        vx_serve = jax.random.choice(
            k_serve, jnp.array([-1.5, -1.0, 1.0, 1.5], jnp.float32)
        )
        vx = jnp.where(serve, vx_serve, state.vel_x)
        vy = jnp.where(serve, -1.5, state.vel_y)
        live = state.ball_live | serve

        bx = jnp.where(live, state.ball_x + vx, px)
        by = jnp.where(live, state.ball_y + vy, PADDLE_Y - 2.0)

        # Wall bounces
        vx = jnp.where((bx <= 1) | (bx >= W - 2), -vx, vx)
        bx = jnp.clip(bx, 1, W - 2)
        vy = jnp.where(by <= 1, -vy, vy)
        by = jnp.maximum(by, 1)

        # Paddle bounce with angle control by hit offset
        hit_paddle = (
            live & (vy > 0)
            & (jnp.abs(by - PADDLE_Y) <= 2)
            & (jnp.abs(bx - px) <= PADDLE_W / 2 + 1)
        )
        offset = jnp.clip((bx - px) / (PADDLE_W / 2), -1.0, 1.0)
        vy = jnp.where(hit_paddle, -jnp.abs(vy), vy)
        vx = jnp.where(hit_paddle, offset * 1.8 + 0.2 * vx, vx)

        # Brick collision: the cell the ball is in
        row = ((by - BRICK_Y0) / BRICK_H).astype(jnp.int32)
        col = (bx / BRICK_W).astype(jnp.int32)
        in_band = (row >= 0) & (row < BRICK_ROWS) & live
        row_c = jnp.clip(row, 0, BRICK_ROWS - 1)
        col_c = jnp.clip(col, 0, BRICK_COLS - 1)
        hit_brick = in_band & state.bricks[row_c, col_c]
        bricks = state.bricks.at[row_c, col_c].set(
            state.bricks[row_c, col_c] & ~hit_brick
        )
        reward = jnp.where(hit_brick, ROW_SCORES[row_c], 0.0)
        vy = jnp.where(hit_brick, -vy, vy)

        # Ball lost below the paddle
        lost = live & (by > H - 2)
        lives = state.lives - lost.astype(jnp.int32)
        live = live & ~lost

        cleared = ~jnp.any(bricks)
        done_now = (lives <= 0) | cleared
        reward = jnp.where(state.done, 0.0, reward)

        new_state = BreakoutState(
            paddle_x=px,
            ball_x=bx, ball_y=by, vel_x=vx, vel_y=vy,
            ball_live=live,
            bricks=bricks,
            lives=lives,
            done=state.done | done_now,
            key=k_next,
        )
        return new_state, reward, new_state.done

    def action_to_string(self, action):
        return f"{action}. {['NOOP', 'FIRE', 'RIGHT', 'LEFT'][int(action)]}"
