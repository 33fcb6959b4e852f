"""Jittable 11x11 Gomoku (reference games/gomoku.py:220-329).

Five-in-a-row; reward 1 on episode end — including the draw case, a
reference quirk preserved for parity (gomoku.py:242-244: reward = 1 if
done); observation planes [board==+1, board==-1, to_play-plane]; letter
coordinates for human input.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.envs.core import JaxEnv

SIZE = 11


def _five_windows():
    wins = []
    for r in range(SIZE):
        for c in range(SIZE - 4):
            wins.append([(r, c + i) for i in range(5)])
    for r in range(SIZE - 4):
        for c in range(SIZE):
            wins.append([(r + i, c) for i in range(5)])
    for r in range(SIZE - 4):
        for c in range(SIZE - 4):
            wins.append([(r + i, c + i) for i in range(5)])
    for r in range(4, SIZE):
        for c in range(SIZE - 4):
            wins.append([(r - i, c + i) for i in range(5)])
    return jnp.array(wins, jnp.int32)


_WINDOWS = _five_windows()


class GomokuState(NamedTuple):
    board: jnp.ndarray  # [11,11] int8
    player: jnp.ndarray  # int8
    done: jnp.ndarray  # bool


class Gomoku(JaxEnv):
    observation_shape = (3, SIZE, SIZE)
    num_actions = SIZE * SIZE
    num_players = 2

    def reset(self, key):
        return GomokuState(
            board=jnp.zeros((SIZE, SIZE), jnp.int8),
            player=jnp.int8(1),
            done=jnp.bool_(False),
        )

    def observation(self, state):
        b = state.board
        return jnp.stack(
            [
                (b == 1).astype(jnp.float32),
                (b == -1).astype(jnp.float32),
                jnp.full((SIZE, SIZE), state.player, jnp.float32),
            ]
        )

    def to_play(self, state):
        return jnp.where(state.player == 1, 0, 1).astype(jnp.int32)

    def legal_actions_mask(self, state):
        return (state.board.reshape(-1) == 0) & ~state.done

    def step(self, state, action, key):
        r, c = action // SIZE, action % SIZE
        board = state.board.at[r, c].set(state.player.astype(jnp.int8))
        vals = board[_WINDOWS[:, :, 0], _WINDOWS[:, :, 1]].astype(jnp.int32)
        sums = jnp.sum(vals, axis=1)
        five = jnp.any(jnp.abs(sums) == 5)
        full = jnp.all(board != 0)
        done_now = five | full
        # Parity quirk: reward on ANY episode end, draws included
        # (reference gomoku.py:242-244).
        reward = jnp.where(done_now & ~state.done, 1.0, 0.0)
        new_state = GomokuState(
            board=board,
            player=(-state.player).astype(jnp.int8),
            done=state.done | done_now,
        )
        return new_state, reward, new_state.done

    # ---- human-facing (reference gomoku.py:294-329) ---------------------
    def render(self, state):
        board = np.asarray(state.board)
        markers = [chr(ord("A") + i) for i in range(SIZE)]
        print("  " + " ".join(markers))
        for row in range(SIZE):
            cells = [".XO"[int(v) if v >= 0 else 2] for v in board[row]]
            print(markers[row] + " " + " ".join(cells))

    def action_to_string(self, action):
        x, y = action // SIZE, action % SIZE
        return chr(x + 65) + chr(y + 65)

    def human_to_action(self, state):
        legal = np.flatnonzero(np.asarray(self.legal_actions_mask(state)))
        while True:
            s = input("Enter an action (e.g. AB for row A col B): ").strip().upper()
            if len(s) == 2 and all("A" <= ch < chr(ord("A") + SIZE) for ch in s):
                action = (ord(s[0]) - 65) * SIZE + (ord(s[1]) - 65)
                if action in legal:
                    return action
            print("Wrong input, try again")
