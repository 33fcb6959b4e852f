"""Batched MCTS invariance tests + golden equivalence against a sequential oracle.

The oracle below is an independent sequential re-derivation of the reference
search semantics (reference self_play.py:249-476) in numpy; with deterministic
tie-breaking both implementations must produce identical trees.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import mcts as M
from muzero_general_tpu.ops.support import support_to_scalar


# ---------------------------------------------------------------------------
# Mock model: hidden state is a single integer encoding the action path.
# Logits are deterministic pseudo-random functions of (hidden, head).
# ---------------------------------------------------------------------------
SUPPORT = 5
NBINS = 2 * SUPPORT + 1


def _det_logits(h, size, salt):
    """Deterministic well-separated logits from integer state h."""
    i = np.arange(size, dtype=np.float64)
    return np.sin(0.7 * (h + 1) * (i + 1) + salt) * 2.0


def mock_initial(obs, A):
    """obs [B] ints -> (value_logits, reward_logits, policy_logits, hidden)."""
    obs = np.asarray(obs)
    B = obs.shape[0]
    value = np.stack([_det_logits(o, NBINS, 1.3) for o in obs])
    reward = np.zeros((B, NBINS))
    policy = np.stack([_det_logits(o, A, 2.7) for o in obs])
    return value, reward, policy, obs.astype(np.float64)


def mock_recurrent(hidden, action, A):
    hidden = np.asarray(hidden)
    action = np.asarray(action)
    # Modulo keeps the path-encoding state exactly representable in float32
    # so the oracle (float64) and the batched search agree bit-for-bit.
    h2 = (hidden * A + action + 1) % 97.0
    value = np.stack([_det_logits(h, NBINS, 1.3) for h in h2])
    reward = np.stack([_det_logits(h, NBINS, 0.4) for h in h2])
    policy = np.stack([_det_logits(h, A, 2.7) for h in h2])
    return value, reward, policy, h2


def np_support_to_scalar(logits):
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    x = (p * np.arange(-SUPPORT, SUPPORT + 1)).sum(-1)
    eps = 0.001
    return np.sign(x) * (
        ((np.sqrt(1 + 4 * eps * (np.abs(x) + 1 + eps)) - 1) / (2 * eps)) ** 2 - 1
    )


# ---------------------------------------------------------------------------
# Sequential oracle (independent re-derivation of the reference search)
# ---------------------------------------------------------------------------
class _Node:
    def __init__(self, prior):
        self.prior = prior
        self.visit = 0
        self.vsum = 0.0
        self.reward = 0.0
        self.to_play = -1
        self.hidden = None
        self.children = {}

    def value(self):
        return self.vsum / self.visit if self.visit else 0.0


def oracle_mcts(obs_scalar, legal, to_play, A, num_players, sims, discount,
                pb_c_base=19652.0, pb_c_init=1.25):
    v, r, p, h = mock_initial(np.array([obs_scalar]), A)
    root = _Node(0)
    root.to_play = to_play
    root.reward = float(np_support_to_scalar(r)[0])
    root.hidden = h[0]
    pol = np.exp(p[0] - p[0].max())
    pol_legal = np.array([pol[a] for a in legal])
    pol_legal = pol_legal / pol_legal.sum()
    for a, pr in zip(legal, pol_legal):
        root.children[a] = _Node(pr)

    mn, mx = math.inf, -math.inf

    def normalize(q):
        return (q - mn) / (mx - mn) if mx > mn else q

    def ucb(parent, child):
        pb_c = (
            math.log((parent.visit + pb_c_base + 1) / pb_c_base) + pb_c_init
        ) * math.sqrt(parent.visit) / (child.visit + 1)
        score = pb_c * child.prior
        if child.visit > 0:
            q = child.reward + discount * (
                child.value() if num_players == 1 else -child.value()
            )
            score += normalize(q)
        return score

    max_depth = 0
    for _ in range(sims):
        node, vt, path = root, to_play, [root]
        last_action = None
        while node.children:
            scores = {a: ucb(node, c) for a, c in node.children.items()}
            last_action = max(scores, key=lambda a: scores[a])  # first max wins
            node = node.children[last_action]
            path.append(node)
            vt = (vt + 1) % num_players
        parent = path[-2]
        v, r, p, h = mock_recurrent(
            np.array([parent.hidden]), np.array([last_action]), A
        )
        value = float(np_support_to_scalar(v)[0])
        node.reward = float(np_support_to_scalar(r)[0])
        node.to_play = vt
        node.hidden = h[0]
        pol = np.exp(p[0] - p[0].max())
        pol = pol / pol.sum()
        for a in range(A):
            node.children[a] = _Node(pol[a])
        max_depth = max(max_depth, len(path) - 1)

        for n in reversed(path):
            if num_players == 1:
                n.vsum += value
                n.visit += 1
                stat = n.reward + discount * n.value()
                mn, mx = min(mn, stat), max(mx, stat)
                value = n.reward + discount * value
            else:
                n.vsum += value if n.to_play == vt else -value
                n.visit += 1
                stat = n.reward + discount * -n.value()
                mn, mx = min(mn, stat), max(mx, stat)
                value = (-n.reward if n.to_play == vt else n.reward) + discount * value

    visits = np.zeros(A)
    for a, c in root.children.items():
        visits[a] = c.visit
    return visits, root.value(), max_depth


def run_batched(obs, legal_mask, to_play, A, num_players, sims, discount,
                deterministic=True, noise=False, seed=0):
    spec = M.SearchSpec(
        num_simulations=sims,
        num_players=num_players,
        pb_c_base=19652.0,
        pb_c_init=1.25,
        discount=discount,
        dirichlet_alpha=0.25,
        exploration_fraction=0.25,
        support_size=SUPPORT,
        max_depth=sims,
        deterministic_tie_break=deterministic,
    )

    def initial_fn(o):
        v, r, p, h = mock_initial(np.asarray(o), A)
        return jnp.array(v), jnp.array(r), jnp.array(p), jnp.array(h)

    def recurrent_fn(h, a):
        v, r, p, h2 = jax.pure_callback(
            lambda hh, aa: tuple(
                x.astype(np.float32) for x in mock_recurrent(hh, aa, A)
            ),
            (
                jax.ShapeDtypeStruct((h.shape[0], NBINS), np.float32),
                jax.ShapeDtypeStruct((h.shape[0], NBINS), np.float32),
                jax.ShapeDtypeStruct((h.shape[0], A), np.float32),
                jax.ShapeDtypeStruct((h.shape[0],), np.float32),
            ),
            h,
            a,
        )
        return v, r, p, h2

    return M.run_mcts(
        initial_fn,
        recurrent_fn,
        jnp.array(obs, jnp.float32),
        jnp.array(legal_mask),
        jnp.array(to_play, jnp.int32),
        jax.random.PRNGKey(seed),
        spec,
        add_exploration_noise=noise,
    )


@pytest.mark.parametrize("num_players,discount", [(1, 0.97), (2, 1.0)])
def test_matches_sequential_oracle(num_players, discount):
    A, sims = 3, 24
    obs = [0.0, 1.0, 2.0, 5.0]
    legal = [[0, 1, 2], [0, 2], [1, 2], [0, 1]]
    legal_mask = np.zeros((4, A), bool)
    for i, la in enumerate(legal):
        legal_mask[i, la] = True
    to_play = [0, 0, num_players - 1, 0]

    out = run_batched(obs, legal_mask, to_play, A, num_players, sims, discount)
    for i in range(4):
        ref_visits, ref_value, ref_depth = oracle_mcts(
            obs[i], legal[i], to_play[i], A, num_players, sims, discount
        )
        np.testing.assert_array_equal(
            np.asarray(out.root_visit_counts[i]), ref_visits,
            err_msg=f"batch element {i}",
        )
        assert np.asarray(out.root_value[i]) == pytest.approx(
            ref_value, rel=1e-3, abs=1e-3
        )
        assert int(out.max_tree_depth[i]) == ref_depth


def test_visit_counts_sum_and_legality():
    A, sims, B = 4, 30, 8
    rng = np.random.default_rng(3)
    obs = rng.normal(size=B) * 3
    legal_mask = rng.random((B, A)) > 0.4
    legal_mask[:, 0] = True  # at least one legal
    out = run_batched(
        obs, legal_mask, [0] * B, A, 1, sims, 0.99, deterministic=False, noise=True
    )
    visits = np.asarray(out.root_visit_counts)
    np.testing.assert_array_equal(visits.sum(-1), sims)
    assert (visits[~legal_mask] == 0).all()
    assert (np.asarray(out.max_tree_depth) <= sims).all()
    assert (np.asarray(out.max_tree_depth) >= 1).all()


def test_select_action_temperatures():
    legal = jnp.array([[True, True, True, False]])
    visits = jnp.array([[10, 30, 5, 0]])
    a0 = M.select_action(jax.random.PRNGKey(0), visits, legal, jnp.float32(0.0))
    assert int(a0[0]) == 1  # argmax
    # T=inf → roughly uniform over legal
    keys = [jax.random.PRNGKey(i) for i in range(200)]
    picks = [
        int(M.select_action(k, visits, legal, jnp.float32(np.inf))[0]) for k in keys
    ]
    counts = np.bincount(picks, minlength=4)
    assert counts[3] == 0 and (counts[:3] > 30).all()
    # T=1 → proportional to visits
    picks = [
        int(M.select_action(k, visits, legal, jnp.float32(1.0))[0]) for k in keys
    ]
    counts = np.bincount(picks, minlength=4)
    assert counts[1] > counts[0] > counts[2] and counts[3] == 0


def test_visit_policy_normalized():
    v = jnp.array([[10, 30, 5, 5]])
    p = np.asarray(M.visit_policy(v))
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(p[0], [0.2, 0.6, 0.1, 0.1], atol=1e-6)
