"""Gumbel MuZero search (ops/gumbel.py): schedule, invariants, improvement.

The Gumbel search is a TPU-native addition (no reference counterpart, the
reference only has pUCT — self_play.py:380-404); tests verify it against the
published algorithm's properties (Danihelka et al., ICLR 2022) rather than a
reference oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import gumbel as G
from muzero_general_tpu.ops import mcts as M

SUPPORT = 5
NBINS = 2 * SUPPORT + 1


def _det_logits(h, size, salt):
    """Deterministic well-separated logits from state h [B] -> [B, size]."""
    i = jnp.arange(size, dtype=jnp.float32)
    return jnp.sin(0.7 * (h[:, None] + 1.0) * (i[None, :] + 1.0) + salt) * 2.0


def make_model(A):
    def initial_fn(obs):
        value = _det_logits(obs, NBINS, 1.3)
        reward = jnp.zeros((obs.shape[0], NBINS))
        policy = _det_logits(obs, A, 2.7)
        return value, reward, policy, jnp.asarray(obs, jnp.float32)

    def recurrent_fn(hidden, action):
        h2 = (hidden * A + action + 1) % 97.0
        return (
            _det_logits(h2, NBINS, 1.3),
            _det_logits(h2, NBINS, 0.4),
            _det_logits(h2, A, 2.7),
            h2,
        )

    return initial_fn, recurrent_fn


def run(B=8, A=4, sims=12, m=4, legal=None, add_gumbel=True, seed=0,
        num_players=1):
    spec = G.GumbelSpec(
        num_simulations=sims,
        num_players=num_players,
        discount=0.97,
        support_size=SUPPORT,
        max_depth=sims,
        max_considered_actions=m,
    )
    initial_fn, recurrent_fn = make_model(A)
    obs = jnp.arange(B, dtype=jnp.float32)
    if legal is None:
        legal = jnp.ones((B, A), bool)
    to_play = jnp.zeros((B,), jnp.int32)
    return G.run_gumbel_mcts(
        initial_fn, recurrent_fn, obs, legal, to_play,
        jax.random.PRNGKey(seed), spec, add_gumbel=add_gumbel,
    )


# ---------------------------------------------------------------------------
# Sequential-halving schedule
# ---------------------------------------------------------------------------
def test_schedule_length_and_monotone_phases():
    for m in (1, 2, 3, 4, 8, 16):
        for n in (1, 4, 16, 50, 200):
            seq = G.sequence_of_considered_visits(m, n)
            assert len(seq) == n
            assert seq[0] == 0


def test_schedule_m1_is_pure_exploitation():
    # One candidate: visit it every simulation (visit count ticks 0,1,2,...).
    assert G.sequence_of_considered_visits(1, 6) == (0, 1, 2, 3, 4, 5)


def test_schedule_halving_structure():
    # m=4, n=16: phase 1 gives 16/(2*4)=2 visits to each of 4 candidates,
    # phase 2 gives 16/(2*2)=4 more to the surviving 2.
    seq = G.sequence_of_considered_visits(4, 16)
    assert seq == (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5)


def test_table_rows():
    t = G.table_of_considered_visits(4, 10)
    assert t.shape == (5, 10)
    assert tuple(t[2]) == G.sequence_of_considered_visits(2, 10)


# ---------------------------------------------------------------------------
# Search invariants
# ---------------------------------------------------------------------------
def test_visits_sum_and_candidate_cap():
    sims, m = 12, 2
    out = run(B=8, A=6, sims=sims, m=m)
    visits = np.asarray(out.root_visit_counts)
    assert (visits.sum(-1) == sims).all()
    # Sequential halving with m candidates only ever visits m root actions.
    assert ((visits > 0).sum(-1) <= m).all()


def test_legal_masking():
    legal = np.ones((8, 6), bool)
    legal[:, 3] = False
    legal[0, :2] = False
    out = run(B=8, A=6, sims=10, m=4, legal=jnp.asarray(legal))
    visits = np.asarray(out.root_visit_counts)
    assert (visits[:, 3] == 0).all()
    assert (visits[0, :2] == 0).all()
    pol = np.asarray(out.improved_policy)
    assert (pol[:, 3] == 0).all()
    np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-5)
    assert np.asarray(legal)[np.arange(8), np.asarray(out.action)].all()
    assert np.asarray(legal)[np.arange(8), np.asarray(out.greedy_action)].all()


def test_single_legal_action():
    legal = np.zeros((4, 5), bool)
    legal[:, 2] = True
    out = run(B=4, A=5, sims=8, m=4, legal=jnp.asarray(legal))
    assert (np.asarray(out.action) == 2).all()
    assert (np.asarray(out.greedy_action) == 2).all()
    np.testing.assert_allclose(np.asarray(out.improved_policy)[:, 2], 1.0)


def test_greedy_deterministic_without_gumbel():
    out1 = run(B=6, A=4, sims=10, add_gumbel=False, seed=0)
    out2 = run(B=6, A=4, sims=10, add_gumbel=False, seed=123)
    assert (np.asarray(out1.action) == np.asarray(out2.action)).all()
    np.testing.assert_array_equal(
        np.asarray(out1.root_visit_counts), np.asarray(out2.root_visit_counts)
    )


def test_gumbel_varies_with_seed():
    actions = [np.asarray(run(B=16, A=6, sims=8, seed=s).action) for s in range(4)]
    assert any((a != actions[0]).any() for a in actions[1:])


# ---------------------------------------------------------------------------
# Policy improvement: E_{pi'}[q] >= E_{pi}[q] under the completed Q values.
# ---------------------------------------------------------------------------
def test_policy_improvement_on_root_q():
    out = run(B=32, A=5, sims=32, m=4, add_gumbel=False, seed=7)
    spec = G.GumbelSpec(
        num_simulations=32, num_players=1, discount=0.97,
        support_size=SUPPORT, max_depth=32, max_considered_actions=4,
    )
    tree = out.tree
    root0 = jnp.zeros((32,), jnp.int32)
    visits, q, _ = G._children_q(tree, root0, spec)
    visits, q = np.asarray(visits), np.asarray(q)
    prior = np.asarray(tree.children_prior[:, 0])
    pol = np.asarray(out.improved_policy)
    visited = visits > 0
    # Compare expected q over visited actions only (q of unvisited is 0-fill).
    for b in range(32):
        vis = visited[b]
        if vis.sum() < 2:
            continue
        e_prior = (prior[b][vis] / prior[b][vis].sum() * q[b][vis]).sum()
        e_improved = (pol[b][vis] / max(pol[b][vis].sum(), 1e-9) * q[b][vis]).sum()
        assert e_improved >= e_prior - 1e-4


def test_two_player_signs():
    # 2-player mode runs and visits stay consistent.
    out = run(B=8, A=4, sims=12, m=4, num_players=2)
    visits = np.asarray(out.root_visit_counts)
    assert (visits.sum(-1) == 12).all()
    assert np.isfinite(np.asarray(out.root_value)).all()


# ---------------------------------------------------------------------------
# Driver integration
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("thr", [None, 2])
def test_selfplay_driver_gumbel(thr):
    from muzero_general_tpu.games.simple_grid import MuZeroConfig, make_env
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.selfplay import SelfPlayDriver

    cfg = MuZeroConfig()
    cfg.use_gumbel_mcts = True
    cfg.num_simulations = 8
    cfg.gumbel_max_considered_actions = 2
    cfg.parallel_games = 4
    cfg.selfplay_chunk_moves = 6
    cfg.temperature_threshold = thr

    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0)
    completed, stats = driver.play(variables, temperature=1.0)
    assert stats["env_steps"] == 24
    for gh in completed:
        # Policy targets are improved policies: valid distributions.
        np.testing.assert_allclose(gh.child_visits.sum(-1), 1.0, rtol=1e-4)
        assert (gh.child_visits >= 0).all()


@pytest.mark.slow
def test_gumbel_simple_grid_learns():
    """simple_grid solves with Gumbel search at 8 sims (pUCT config uses 10).

    Mirrors tests/test_e2e_learning.py's gate but with use_gumbel_mcts on —
    the sample-efficiency claim behind the feature.
    """
    import pathlib
    import tempfile

    from muzero_general_tpu import MuZero

    mz = MuZero(
        "simple_grid",
        {
            "training_steps": 400,
            "batch_size": 32,
            "use_gumbel_mcts": True,
            "num_simulations": 8,
            "gumbel_max_considered_actions": 2,
            "parallel_games": 16,
            "selfplay_chunk_moves": 6,
            "ratio": 1.0,
            "reanalyse_interval": 50,
        },
    )
    mz.config.results_path = pathlib.Path(tempfile.mkdtemp())
    mz.train(log_in_tensorboard=False)
    result = mz.test(num_tests=5)
    assert result >= 9.0, f"simple_grid (gumbel) mean test reward {result}"
