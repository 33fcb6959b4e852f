"""Board env semantics: win/draw/reward parity with reference envs
(reference games/tictactoe.py:243-351, games/connect4.py:220-346)."""

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.envs.connect4 import Connect4
from muzero_general_tpu.envs.tictactoe import TicTacToe


def play(env, actions, key=0):
    k = jax.random.PRNGKey(key)
    s = env.reset(k)
    rewards, dones, players = [], [], [int(env.to_play(s))]
    for a in actions:
        k, sub = jax.random.split(k)
        s, r, d = env.step(s, jnp.int32(a), sub)
        rewards.append(float(r))
        dones.append(bool(d))
        players.append(int(env.to_play(s)))
    return s, rewards, dones, players


class TestTicTacToe:
    env = TicTacToe()

    def test_x_wins_row(self):
        # X: 0,1,2 top... board row 0; O: 3,4
        s, rewards, dones, players = play(self.env, [0, 3, 1, 4, 2])
        assert rewards == [0, 0, 0, 0, 20.0]
        assert dones == [False] * 4 + [True]
        assert players[:5] == [0, 1, 0, 1, 0]

    def test_draw(self):
        # Known draw sequence
        s, rewards, dones, players = play(self.env, [0, 4, 8, 1, 7, 6, 2, 5, 3])
        assert rewards[-1] == 0.0
        assert dones[-1] is True
        assert not any(dones[:-1])

    def test_observation_planes(self):
        k = jax.random.PRNGKey(0)
        s = self.env.reset(k)
        s, _, _ = self.env.step(s, jnp.int32(4), k)
        obs = np.asarray(self.env.observation(s))
        assert obs.shape == (3, 3, 3)
        assert obs[0, 1, 1] == 1  # X at center
        assert obs[1].sum() == 0
        assert (obs[2] == -1).all()  # to_play plane = next player's value

    def test_legal_mask(self):
        k = jax.random.PRNGKey(0)
        s = self.env.reset(k)
        s, _, _ = self.env.step(s, jnp.int32(4), k)
        mask = np.asarray(self.env.legal_actions_mask(s))
        assert not mask[4] and mask.sum() == 8

    def test_expert_takes_win(self):
        # X has 0,1 — X to move should play 2 (complete the row)
        s, *_ = play(self.env, [0, 3, 1, 4])
        a = int(self.env.expert_action(s, jax.random.PRNGKey(0)))
        assert a == 2

    def test_expert_blocks(self):
        # O to move; X threatens 0,1->2. O must block at 2.
        s, *_ = play(self.env, [0, 8, 1])
        a = int(self.env.expert_action(s, jax.random.PRNGKey(0)))
        assert a == 2


class TestConnect4:
    env = Connect4()

    def test_vertical_win(self):
        s, rewards, dones, _ = play(self.env, [3, 4, 3, 4, 3, 4, 3])
        assert rewards == [0, 0, 0, 0, 0, 0, 10.0]
        assert dones[-1] is True

    def test_horizontal_win(self):
        s, rewards, dones, _ = play(self.env, [0, 0, 1, 1, 2, 2, 3])
        assert rewards[-1] == 10.0 and dones[-1]

    def test_diagonal_win(self):
        # Build a positive diagonal for player 1
        moves = [0, 1, 1, 2, 2, 3, 2, 3, 3, 6, 3]
        s, rewards, dones, _ = play(self.env, moves)
        assert rewards[-1] == 10.0 and dones[-1]

    def test_gravity_and_legal(self):
        k = jax.random.PRNGKey(0)
        s = self.env.reset(k)
        for _ in range(6):
            s, _, _ = self.env.step(s, jnp.int32(0), k)
        board = np.asarray(s.board)
        assert (board[:, 0] != 0).all()  # column full
        mask = np.asarray(self.env.legal_actions_mask(s))
        assert not mask[0] and mask[1:].all()

    def test_expert_takes_win(self):
        # P1 has 3 in column 0; P1 to move -> play 0
        s, *_ = play(self.env, [0, 1, 0, 1, 0, 2])
        a = int(self.env.expert_action(s, jax.random.PRNGKey(0)))
        assert a == 0

    def test_expert_blocks_horizontal(self):
        # P1 threatens 0,1,2 on the bottom row; P2 to move must block at 3
        s, *_ = play(self.env, [0, 0, 1, 1, 2])
        a = int(self.env.expert_action(s, jax.random.PRNGKey(0)))
        assert a == 3

    def test_expert_respects_gravity(self):
        # P1 threat on row 1 (needs col 3 row 1); col 3 empty at row 0 →
        # playing 3 fills row 0, NOT the threat: candidate infeasible.
        # Build: P1 at (1,0),(1,1),(1,2) — rows above bottom.
        moves = [0, 0, 1, 1, 2, 2]  # bottom: P1 0,1,2? no: alternation
        # Simpler: directly construct the state
        import jax.numpy as jnp

        from muzero_general_tpu.envs.connect4 import Connect4State

        board = np.zeros((6, 7), np.int8)
        board[0, 0] = board[0, 1] = board[0, 2] = -1  # P2 bottom row
        board[1, 0] = board[1, 1] = board[1, 2] = 1  # P1 row 1 threat at (1,3)
        s = Connect4State(
            board=jnp.asarray(board), player=jnp.int8(1), done=jnp.bool_(False)
        )
        a = int(self.env.expert_action(s, jax.random.PRNGKey(1)))
        # (1,3) is not reachable (column 3 empty below) → no winning move;
        # P2's bottom-row threat at (0,3) IS blockable/completable... P1's
        # fallback: block candidate (0,3) feasible → plays 3 anyway but for
        # the blocking reason; key assertion: the function returns a legal move.
        assert 0 <= a < 7


def test_two_player_selfplay_histories():
    from muzero_general_tpu.games.tictactoe import MuZeroConfig, make_env
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.selfplay import SelfPlayDriver

    cfg = MuZeroConfig()
    cfg.num_simulations = 6
    cfg.parallel_games = 4
    cfg.selfplay_chunk_moves = 9
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0)
    completed = []
    for _ in range(4):
        games, _ = driver.play(variables, temperature=1.0)
        completed.extend(games)
    assert completed
    for gh in completed:
        L = len(gh)
        assert L <= 9
        # players alternate from X
        np.testing.assert_array_equal(gh.to_play[: L + 1], np.arange(L + 1) % 2)
        # all visited actions were legal: replay the game checking masks
        k = jax.random.PRNGKey(0)
        s = env.reset(k)
        for i in range(L):
            mask = np.asarray(env.legal_actions_mask(s))
            assert mask[gh.actions[i + 1]], f"illegal action at move {i}"
            # policy mass only on legal actions
            assert gh.child_visits[i][~mask].sum() == 0
            s, _, _ = env.step(s, jnp.int32(int(gh.actions[i + 1])), k)
