"""DiagnoseModel smoke tests (reference diagnose_model.py:10-140).

Covers the virtual-trajectory path that reads the root hidden state out of
MCTSOutput.root_hidden (regression: ADVICE r3 — the old code read a Tree
field removed by the round-3 edge-array restructure).
"""

import numpy as np

import jax

from muzero_general_tpu import MuZero
from muzero_general_tpu.diagnose import DiagnoseModel


def _make(game="cartpole", **overrides):
    mz = MuZero(game, dict({"num_simulations": 4, "seed": 0}, **overrides))
    state = mz._restore_state()
    return mz, mz._variables(state)


def test_virtual_trajectory_from_obs():
    mz, variables = _make()
    dm = DiagnoseModel(mz.runner, mz.config)
    env = mz.make_env()
    obs0 = np.asarray(env.observation(env.reset(jax.random.PRNGKey(0))))
    info = dm.get_virtual_trajectory_from_obs(variables, obs0, 3, plot=False)
    assert len(info.action_history) == 3
    assert len(info.prior_policies) == 4  # root + horizon
    assert all(np.isfinite(v) for v in info.root_value_after_planning)


def test_compare_virtual_with_real(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # plot_mcts may drop a graphviz file in cwd
    mz, variables = _make()
    dm = DiagnoseModel(mz.runner, mz.config)
    virtual, real, _ = dm.compare_virtual_with_real_trajectories(
        variables, mz.make_env(), 2, plot=False
    )
    assert len(virtual.action_history) == 2
    assert len(real.prior_policies) >= 1


def test_compare_two_player_board_game(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mz, variables = _make("tictactoe")
    dm = DiagnoseModel(mz.runner, mz.config)
    virtual, real, _ = dm.compare_virtual_with_real_trajectories(
        variables, mz.make_env(), 2, plot=False
    )
    assert len(virtual.mcts_depth) >= 1
