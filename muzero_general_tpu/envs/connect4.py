"""Jittable Connect Four (2-player).

Parity with the reference's from-scratch env (reference games/connect4.py:
Connect4 :220-346 and Game.step reward*10 :144): 6x7 board of +1/-1, gravity
drop, win reward 10 from the mover's perspective, observation planes
[board==+1, board==-1, to_play-plane], and the reference's sliding-sub-board
expert heuristic (winning candidate first in scan order, else the last
blocking candidate, gravity-feasibility checked as the reference does).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.envs.core import JaxEnv

ROWS, COLS = 6, 7


def _win_windows():
    """All length-4 windows as [W, 4, 2] (row, col) coordinates."""
    wins = []
    for r in range(ROWS):
        for c in range(COLS - 3):
            wins.append([(r, c + i) for i in range(4)])
    for r in range(ROWS - 3):
        for c in range(COLS):
            wins.append([(r + i, c) for i in range(4)])
    for r in range(ROWS - 3):
        for c in range(COLS - 3):
            wins.append([(r + i, c + i) for i in range(4)])
    for r in range(3, ROWS):
        for c in range(COLS - 3):
            wins.append([(r - i, c + i) for i in range(4)])
    return jnp.array(wins, jnp.int32)  # [69, 4, 2]


_WINDOWS = _win_windows()


def _expert_windows():
    """Candidate windows in the reference's exact scan order
    (connect4.py:307-343): for k in 0..2, l in 0..3 over 4x4 sub-boards —
    4 horizontal rows, 4 vertical cols, diag, anti-diag each.

    Returns (cells [M,4,2], kind [M] 0=row 1=col 2=diag 3=anti, base [M,2]).
    """
    cells, kinds, bases = [], [], []
    for k in range(3):
        for l in range(4):
            for i in range(4):
                cells.append([(k + i, l + j) for j in range(4)])
                kinds.append(0)
                bases.append((k, l))
                cells.append([(k + j, l + i) for j in range(4)])
                kinds.append(1)
                bases.append((k, l))
            cells.append([(k + j, l + j) for j in range(4)])
            kinds.append(2)
            bases.append((k, l))
            cells.append([(k + j, l + 3 - j) for j in range(4)])
            kinds.append(3)
            bases.append((k, l))
    return (
        np.array(cells, np.int32),
        np.array(kinds, np.int32),
        np.array(bases, np.int32),
    )


_EXP_CELLS, _EXP_KINDS, _EXP_BASES = _expert_windows()


class Connect4State(NamedTuple):
    board: jnp.ndarray  # [6,7] int8: +1/-1/0, row 0 = bottom
    player: jnp.ndarray  # int8
    done: jnp.ndarray  # bool


class Connect4(JaxEnv):
    observation_shape = (3, 6, 7)
    num_actions = 7
    num_players = 2

    def reset(self, key):
        return Connect4State(
            board=jnp.zeros((ROWS, COLS), jnp.int8),
            player=jnp.int8(1),
            done=jnp.bool_(False),
        )

    def observation(self, state):
        b = state.board
        return jnp.stack(
            [
                (b == 1).astype(jnp.float32),
                (b == -1).astype(jnp.float32),
                jnp.full((ROWS, COLS), state.player, jnp.float32),
            ]
        )

    def to_play(self, state):
        return jnp.where(state.player == 1, 0, 1).astype(jnp.int32)

    def legal_actions_mask(self, state):
        return (state.board[ROWS - 1] == 0) & ~state.done

    def step(self, state, action, key):
        # Gravity: the lowest empty row of the column (connect4.py:233-237)
        col = state.board[:, action]
        row = jnp.argmax(col == 0)  # first zero from the bottom
        has_space = jnp.any(col == 0)
        board = jnp.where(
            has_space,
            state.board.at[row, action].set(state.player.astype(jnp.int8)),
            state.board,
        )
        vals = board[_WINDOWS[:, :, 0], _WINDOWS[:, :, 1]].astype(jnp.int32)
        won = jnp.any(jnp.sum(vals, axis=1) == 4 * state.player)
        full = jnp.all(board[ROWS - 1] != 0)
        done_now = won | full
        reward = jnp.where(won & ~state.done, 10.0, 0.0)
        new_state = Connect4State(
            board=board,
            player=(-state.player).astype(jnp.int8),
            done=state.done | done_now,
        )
        return new_state, reward, new_state.done

    def expert_action(self, state, key):
        """Reference connect4.py:307-343, vectorized over the 120 windows."""
        board = state.board.astype(jnp.int32)
        player = state.player.astype(jnp.int32)
        cells = jnp.asarray(_EXP_CELLS)  # [M,4,2]
        kinds = jnp.asarray(_EXP_KINDS)
        bases = jnp.asarray(_EXP_BASES)
        vals = board[cells[:, :, 0], cells[:, :, 1]]  # [M,4]
        sums = jnp.sum(vals, axis=1)
        is3 = jnp.abs(sums) == 3

        # Empty slot within the window (exactly one when |sum|==3)
        empty_pos = jnp.argmax(vals == 0, axis=1)  # [M]
        empty_rc = jnp.take_along_axis(
            cells, empty_pos[:, None, None].repeat(2, 2), axis=1
        )[:, 0, :]  # [M, 2] (row, col) of the empty cell

        col_counts = jnp.sum(board != 0, axis=0)  # stones per column

        # Candidate action + gravity feasibility per window kind:
        # rows/diag/anti require count_nonzero(col)==row of the empty cell
        # (connect4.py:312-315, :327-331, :335-339); columns skip the check
        # and the action is the column itself (connect4.py:317-320).
        act = jnp.where(kinds == 1, cells[:, 0, 1], empty_rc[:, 1])
        feasible = jnp.where(
            kinds == 1, True, col_counts[empty_rc[:, 1]] == empty_rc[:, 0]
        )
        candidate = is3 & feasible
        winning = candidate & (player * sums > 0)

        M = kinds.shape[0]
        order = jnp.arange(M)
        first_win = jnp.argmin(jnp.where(winning, order, M))
        last_block = jnp.argmax(jnp.where(candidate, order, -1))
        legal = self.legal_actions_mask(state)
        random_action = jax.random.categorical(key, jnp.where(legal, 0.0, -jnp.inf))
        return jnp.where(
            jnp.any(winning),
            act[first_win],
            jnp.where(jnp.any(candidate), act[last_block], random_action),
        ).astype(jnp.int32)

    # ---- human-facing (reference connect4.py:166-216) -------------------
    def render(self, state):
        print(np.asarray(state.board)[::-1])

    def action_to_string(self, action):
        return f"Play column {action + 1}"

    def human_to_action(self, state):
        legal = np.flatnonzero(np.asarray(self.legal_actions_mask(state)))
        while True:
            try:
                action = int(input("Enter the column to play for the player: ")) - 1
                if action in legal:
                    return action
            except (ValueError, EOFError):
                pass
            print("Wrong input, try again")
