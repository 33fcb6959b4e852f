"""Jittable Tic-Tac-Toe (2-player).

Parity with the reference's from-scratch env (reference games/tictactoe.py:
TicTacToe :243-351 and Game.step reward*20 :143): board of +1/-1, win reward
20 from the mover's perspective, observation planes [board==+1, board==-1,
to_play-plane(player value)], and the same expert heuristic (win move first
in row/col/diag scan order, else last blocking candidate, else random).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv


class TicTacToeState(NamedTuple):
    board: jnp.ndarray  # [3,3] int8: +1 / -1 / 0
    player: jnp.ndarray  # int8: +1 or -1 (reference player encoding)
    done: jnp.ndarray  # bool


def _win_lines(board):
    """[8] line sums in reference scan order: r0,c0,r1,c1,r2,c2,diag,anti."""
    rows = jnp.sum(board, axis=1)
    cols = jnp.sum(board, axis=0)
    diag = board[0, 0] + board[1, 1] + board[2, 2]
    anti = board[2, 0] + board[1, 1] + board[0, 2]
    return jnp.stack(
        [rows[0], cols[0], rows[1], cols[1], rows[2], cols[2], diag, anti]
    )


# Cell indices (flat 0..8) of each line in scan order, [8, 3]
_LINE_CELLS = jnp.array(
    [
        [0, 1, 2], [0, 3, 6],
        [3, 4, 5], [1, 4, 7],
        [6, 7, 8], [2, 5, 8],
        [0, 4, 8], [6, 4, 2],
    ],
    jnp.int32,
)


class TicTacToe(JaxEnv):
    observation_shape = (3, 3, 3)
    num_actions = 9
    num_players = 2

    def reset(self, key):
        return TicTacToeState(
            board=jnp.zeros((3, 3), jnp.int8),
            player=jnp.int8(1),
            done=jnp.bool_(False),
        )

    def observation(self, state):
        b = state.board
        return jnp.stack(
            [
                (b == 1).astype(jnp.float32),
                (b == -1).astype(jnp.float32),
                jnp.full((3, 3), state.player, jnp.float32),
            ]
        )

    def to_play(self, state):
        return jnp.where(state.player == 1, 0, 1).astype(jnp.int32)

    def legal_actions_mask(self, state):
        return (state.board.reshape(-1) == 0) & ~state.done

    def step(self, state, action, key):
        row, col = action // 3, action % 3
        board = state.board.at[row, col].set(state.player.astype(jnp.int8))
        lines = _win_lines(board)
        won = jnp.any(lines == 3 * state.player)
        full = jnp.all(board != 0)
        done_now = won | full
        reward = jnp.where(won & ~state.done, 20.0, 0.0)
        new_state = TicTacToeState(
            board=board,
            player=(-state.player).astype(jnp.int8),
            done=state.done | done_now,
        )
        return new_state, reward, new_state.done

    def expert_action(self, state, key):
        """Reference tictactoe.py:308-348 heuristic, vectorized."""
        board = state.board
        flat = board.reshape(-1)
        player = state.player.astype(jnp.int32)
        sums = _win_lines(board).astype(jnp.int32)  # [8]
        # Empty cell of each line (first empty in cell order, as numpy.where)
        cells = flat[_LINE_CELLS]  # [8, 3]
        empty_pos = jnp.argmax(cells == 0, axis=1)  # first zero per line
        empty_cell = jnp.take_along_axis(
            _LINE_CELLS, empty_pos[:, None], axis=1
        ).squeeze(1)  # [8]
        is2 = jnp.abs(sums) == 2
        iswin = is2 & (player * sums > 0)

        order = jnp.arange(8)
        win_idx = jnp.argmin(jnp.where(iswin, order, 8))  # first winning line
        any_win = jnp.any(iswin)
        block_idx = jnp.argmax(jnp.where(is2, order, -1))  # last |sum|==2 line
        any_block = jnp.any(is2)

        legal = self.legal_actions_mask(state)
        random_action = jax.random.categorical(
            key, jnp.where(legal, 0.0, -jnp.inf)
        )
        return jnp.where(
            any_win,
            empty_cell[win_idx],
            jnp.where(any_block, empty_cell[block_idx], random_action),
        ).astype(jnp.int32)

    # ---- human-facing (reference games/tictactoe.py:180-236) -----------
    def render(self, state):
        import numpy as np

        print(np.asarray(state.board)[::-1])

    def action_to_string(self, action):
        row = action // 3 + 1
        col = action % 3 + 1
        return f"Play row {row}, column {col}"

    def human_to_action(self, state):
        import numpy as np

        legal = np.flatnonzero(np.asarray(self.legal_actions_mask(state)))
        while True:
            try:
                row = int(input("Enter the row (1, 2 or 3) to play: "))
                col = int(input("Enter the column (1, 2 or 3) to play: "))
                choice = (row - 1) * 3 + (col - 1)
                if choice in legal and 1 <= row <= 3 and 1 <= col <= 3:
                    return choice
            except (ValueError, EOFError):
                pass
            print("Wrong input, try again")
