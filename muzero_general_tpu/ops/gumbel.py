"""Gumbel MuZero root action selection (opt-in, `config.use_gumbel_mcts`).

Implements "Policy improvement by planning with Gumbel" (Danihelka, Guez,
Schrittwieser & Silver, ICLR 2022): at the root, sample K Gumbel variables,
allocate the simulation budget with sequential halving over the top
candidates of g + logits, and pick the final action by
argmax g + logits + sigma(q_hat) among the most-visited candidates. This
guarantees a policy improvement with far fewer simulations than pUCT
(e.g. 16 instead of 50), which matters on TPU where each simulation is a
sequential device step.

This is a TPU-native capability ADDITION — the reference
(self_play.py:380-404) only implements pUCT with Dirichlet noise, which
stays the default (`ops/mcts.py`). Everything below the root (tree storage,
expansion over the full action space, backprop with per-player sign flips,
MinMaxStats) reuses `ops/mcts.py` so the two searches share one verified
substrate.

Design notes (scan/jit-friendly, per-lane legal-action counts):
- Sequential halving is driven by a static "prescribed visit count" table,
  table[m][s] = the visit count a candidate must have to be considered at
  simulation s when m candidates are in play. Visiting argmax-score among
  candidates whose visit count equals the prescribed value reproduces
  sequential halving exactly: within a phase every remaining candidate has
  equal visits, so argmax walks them in score order; at a halving boundary
  the prescribed count jumps and only candidates that kept winning can
  match it. m is per-lane (min(max_considered, num_legal)), so one table
  lookup vectorizes over lanes with different legal sets.
- Q-values of unvisited root children are "completed" with a mixed value
  estimate v_mix (paper eq. 7 / mctx qtransform_completed_by_mix_value),
  then normalized per-node by min/max over visited children, then scaled by
  sigma(q_hat) = (c_visit + max_b N(b)) * c_scale * q_hat.
- Non-root nodes select deterministically by
  argmax_a pi'(a) - N(a) / (1 + sum_b N(b)) with
  pi' = softmax(logits + sigma(completed q)) (paper sec. 5).
- The training policy target is pi' at the root over legal actions —
  emitted through the same `child_visits` slot the pUCT path fills with the
  visit distribution (reference self_play.py:496-509), so replay/targets
  are untouched.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops.support import support_to_scalar


class GumbelSpec(NamedTuple):
    """Static Gumbel-search hyperparameters (defaults from the paper/mctx)."""

    num_simulations: int
    num_players: int
    discount: float
    support_size: int
    max_depth: int
    max_considered_actions: int = 16
    c_visit: float = 50.0
    c_scale: float = 1.0

    @classmethod
    def from_config(cls, config):
        if len(config.players) > 2:
            raise NotImplementedError("More than two player mode not implemented.")
        return cls(
            num_simulations=config.num_simulations,
            num_players=len(config.players),
            discount=float(config.discount),
            support_size=config.support_size,
            max_depth=config.num_simulations,
            max_considered_actions=int(
                getattr(config, "gumbel_max_considered_actions", 16)
            ),
            c_visit=float(getattr(config, "gumbel_c_visit", 50.0)),
            c_scale=float(getattr(config, "gumbel_c_scale", 1.0)),
        )


class GumbelMCTSOutput(NamedTuple):
    action: jnp.ndarray  # [B] sampled-exploration root action (gumbel argmax)
    greedy_action: jnp.ndarray  # [B] argmax of the improved policy (eval)
    improved_policy: jnp.ndarray  # [B, A] pi' — the training policy target
    root_visit_counts: jnp.ndarray  # [B, A]
    root_value: jnp.ndarray  # [B]
    root_predicted_value: jnp.ndarray  # [B]
    max_tree_depth: jnp.ndarray  # [B]
    tree: mcts_ops.Tree


def sequence_of_considered_visits(num_considered: int, num_simulations: int):
    """Prescribed visit count per simulation under sequential halving.

    With m=num_considered candidates and n simulations: repeat phases of
    max(1, n / (log2(m) * m_phase)) extra visits per remaining candidate,
    halving the candidate set between phases (never below 2).
    """
    if num_considered <= 1:
        return tuple(range(num_simulations))
    log2m = max(1, int(math.ceil(math.log2(num_considered))))
    sequence = []
    visits = [0] * num_considered
    considered = num_considered
    while len(sequence) < num_simulations:
        extra = max(1, num_simulations // (log2m * considered))
        for _ in range(extra):
            sequence.extend(visits[:considered])
            for i in range(considered):
                visits[i] += 1
        considered = max(2, considered // 2)
    return tuple(sequence[:num_simulations])


def table_of_considered_visits(max_considered: int, num_simulations: int):
    """[max_considered+1, num_simulations] table, row m = schedule for m."""
    return np.array(
        [
            sequence_of_considered_visits(m, num_simulations)
            for m in range(max_considered + 1)
        ],
        np.int32,
    )


def _children_q(tree: mcts_ops.Tree, node, spec: GumbelSpec):
    """Per-edge (visits, q, prior) of `node` [B]: q = r + discount*sign*value.

    Same q convention as the pUCT value term (ops/mcts.py:_ucb_scores,
    reference self_play.py:394-404); stats read straight off the edge rows.
    """
    cvis, cvsum, crew, cprior = mcts_ops.edge_stats(tree, node)
    cval = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)
    sign = 1.0 if spec.num_players == 1 else -1.0
    q = crew + spec.discount * sign * cval
    return cvis.astype(jnp.int32), q, cprior


def _completed_q_hat(visits, q, node_value, prior, legal, spec: GumbelSpec):
    """sigma(completed q) over [B, A] edges.

    Unvisited edges get v_mix = (v(node) + N * weighted-avg of visited q)
    / (1 + N) with prior weights restricted to visited children; all q are
    then min-max normalized over the node's visited children (+ v_mix) and
    scaled by (c_visit + max_b N(b)) * c_scale.
    """
    visited = visits > 0
    nvis = jnp.sum(visits, axis=-1, keepdims=True).astype(jnp.float32)  # [B,1]
    w = jnp.where(visited, prior, 0.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    q_avg = jnp.sum(w * q, axis=-1, keepdims=True) / jnp.maximum(wsum, 1e-30)
    v_mix = (node_value[:, None] + nvis * q_avg) / (1.0 + nvis)
    # If nothing is visited yet, fall back to the node's network value.
    v_mix = jnp.where(wsum > 0, v_mix, node_value[:, None])
    completed = jnp.where(visited, q, v_mix)

    big = jnp.finfo(jnp.float32).max
    consider = visited | legal  # normalize over edges that can matter
    q_min = jnp.min(jnp.where(consider, completed, big), axis=-1, keepdims=True)
    q_max = jnp.max(jnp.where(consider, completed, -big), axis=-1, keepdims=True)
    q_hat = (completed - q_min) / jnp.maximum(q_max - q_min, 1e-8)
    q_hat = jnp.where(q_max > q_min, q_hat, completed)

    max_visit = jnp.max(visits, axis=-1, keepdims=True).astype(jnp.float32)
    return (spec.c_visit + max_visit) * spec.c_scale * q_hat


def _improved_logits(tree: mcts_ops.Tree, node, node_value, legal, spec):
    """logits + sigma(completed q) for the A edges of `node` [B]."""
    visits, q, prior = _children_q(tree, node, spec)
    sigma_q = _completed_q_hat(visits, q, node_value, prior, legal, spec)
    logits = jnp.log(jnp.maximum(prior, 1e-30))
    return logits + sigma_q, visits


def _simulate_once_gumbel(
    tree, hidden, pending, sim, rng, spec: GumbelSpec, recurrent_fn,
    root_to_play, gumbel, prescribed, num_considered, depth_bound,
):
    """One simulation: gumbel-scheduled root pick, deterministic descent."""
    B, _ = tree.root_legal.shape
    b_idx = jnp.arange(B)
    del rng  # selection is deterministic given the root gumbel draw
    # Flush the previous simulation's leaf write (software-pipelined hidden
    # store — ops/mcts.py module docstring).
    pending_node, pending_leaf = pending
    hidden = jax.lax.dynamic_update_slice(  # DUS, not scatter: ops/mcts.py
        hidden,
        pending_leaf.astype(hidden.dtype)[None],
        (pending_node,) + (0,) * (hidden.ndim - 1),
    )

    path_n0 = jnp.full((B, spec.max_depth + 1), -1, jnp.int32).at[:, 0].set(0)
    path_a0 = jnp.zeros((B, spec.max_depth + 1), jnp.int32)
    trip = jnp.minimum(depth_bound, spec.max_depth)

    def desc_cond(state):
        *_rest, t = state
        return t < trip  # scalar-only condition (ops/mcts.py descent note)

    def desc_body(state):
        (current, node_value, depth, path_n, path_a, active, parent, action,
         t) = state
        at_root = current == 0
        legal = jnp.where(at_root[:, None], tree.root_legal, True)
        cvis_f, cvsum, crew, cprior = mcts_ops.edge_stats(tree, current)
        visits = cvis_f.astype(jnp.int32)
        cval = jnp.where(cvis_f > 0, cvsum / jnp.maximum(cvis_f, 1.0), 0.0)
        sign = 1.0 if spec.num_players == 1 else -1.0
        q = crew + spec.discount * sign * cval
        sigma_q = _completed_q_hat(visits, q, node_value, cprior, legal, spec)
        imp_logits = jnp.log(jnp.maximum(cprior, 1e-30)) + sigma_q

        # Root: among candidates whose visit count equals the prescribed
        # sequential-halving value, argmax of g + logits + sigma(q_hat).
        root_score = gumbel + imp_logits
        considered = legal & (visits == prescribed[:, None])
        has_match = jnp.any(considered, axis=-1, keepdims=True)
        root_score = jnp.where(
            jnp.where(has_match, considered, legal), root_score, -jnp.inf
        )
        sel_root = jnp.argmax(root_score, axis=-1)

        # Interior: argmax pi'(a) - N(a) / (1 + sum_b N(b))  (paper sec. 5).
        pi_prime = jax.nn.softmax(imp_logits, axis=-1)
        nvis = jnp.sum(visits, axis=-1, keepdims=True).astype(jnp.float32)
        sel_int = jnp.argmax(
            pi_prime - visits.astype(jnp.float32) / (1.0 + nvis), axis=-1
        )

        sel = jnp.where(at_root, sel_root, sel_int).astype(jnp.int32)
        path_a = path_a.at[b_idx, depth].set(
            jnp.where(active, sel, path_a[b_idx, depth])
        )
        child = tree.children_index[b_idx, current, sel]
        hits_leaf = active & (child < 0)
        parent = jnp.where(hits_leaf, current, parent)
        action = jnp.where(hits_leaf, sel, action)
        active = active & (child >= 0)
        current = jnp.where(active, child, current)
        # Descending an edge: the next node's value() is that edge's
        # value_sum/visit (edge stats ARE the child's node stats).
        node_value = jnp.where(
            active, cval[b_idx, sel], node_value
        )
        depth = depth + active.astype(jnp.int32)
        path_n = path_n.at[b_idx, depth].set(
            jnp.where(active, current, path_n[b_idx, depth])
        )
        return (current, node_value, depth, path_n, path_a, active, parent,
                action, t + 1)

    z = jnp.zeros((B,), jnp.int32)
    _, _, depth, path_n, path_a, _, parent, action, _ = jax.lax.while_loop(
        desc_cond,
        desc_body,
        (z, tree.root_value(), z, path_n0, path_a0, jnp.ones((B,), bool),
         z, z, jnp.int32(0)),
    )
    leaf_depth = depth + 1

    mcts_spec = mcts_ops.SearchSpec(
        num_simulations=spec.num_simulations,
        num_players=spec.num_players,
        pb_c_base=19652.0,
        pb_c_init=1.25,
        discount=spec.discount,
        dirichlet_alpha=0.0,
        exploration_fraction=0.0,
        support_size=spec.support_size,
        max_depth=spec.max_depth,
    )
    return mcts_ops._expand_and_backprop(
        tree, hidden, sim, mcts_spec, recurrent_fn, parent, action,
        path_n, path_a, leaf_depth,
    )


def run_gumbel_mcts(
    initial_fn,
    recurrent_fn,
    observation,
    legal_mask,
    to_play,
    rng,
    spec: GumbelSpec,
    add_gumbel: bool = True,
) -> GumbelMCTSOutput:
    """Run batched Gumbel MuZero search from `observation` [B, ...].

    add_gumbel=False zeroes the Gumbel draw (deterministic greedy search,
    for evaluation) — the counterpart of the pUCT path's
    add_exploration_noise gate.
    """
    B, A = legal_mask.shape
    N = spec.num_simulations + 1

    value_logits, reward_logits, policy_logits, hidden0 = initial_fn(observation)
    root_predicted_value = support_to_scalar(value_logits, spec.support_size)
    root_reward = support_to_scalar(reward_logits, spec.support_size)
    prior = mcts_ops.masked_softmax(policy_logits, legal_mask)

    if add_gumbel:
        gumbel = jax.random.gumbel(jax.random.fold_in(rng, 0), (B, A))
    else:
        gumbel = jnp.zeros((B, A))
    gumbel = jnp.where(legal_mask, gumbel, -jnp.inf)

    # Per-lane candidate count and the static halving schedule row for it.
    num_legal = jnp.sum(legal_mask, axis=-1).astype(jnp.int32)
    m_cap = min(spec.max_considered_actions, A)
    num_considered = jnp.clip(num_legal, 1, m_cap)  # [B]
    table = jnp.asarray(
        table_of_considered_visits(m_cap, spec.num_simulations)
    )  # [m_cap+1, S]

    tree = mcts_ops.init_tree(N, prior, legal_mask, to_play, root_reward)
    hidden = jnp.zeros((N,) + hidden0.shape, hidden0.dtype)
    pending0 = (jnp.int32(0), hidden0)

    def sim_body(carry, sim):
        tree, hidden, pending, max_depth = carry
        prescribed = table[num_considered, sim]  # [B]
        tree, hidden, pending, leaf_depth = _simulate_once_gumbel(
            tree, hidden, pending, sim, rng, spec, recurrent_fn, to_play,
            gumbel, prescribed, num_considered, jnp.max(max_depth) + 1,
        )
        return (tree, hidden, pending,
                jnp.maximum(max_depth, leaf_depth)), None

    (tree, hidden, pending, max_depth), _ = jax.lax.scan(
        sim_body,
        (tree, hidden, pending0, jnp.zeros((B,), jnp.int32)),
        jnp.arange(spec.num_simulations),
    )

    root0 = jnp.zeros((B,), jnp.int32)
    root_value = tree.root_value()
    imp_logits, root_visits = _improved_logits(
        tree, root0, root_value, legal_mask, spec
    )

    # Improved policy pi' over legal actions — the training target.
    improved_policy = mcts_ops.masked_softmax(imp_logits, legal_mask)
    greedy_action = jnp.argmax(
        jnp.where(legal_mask, improved_policy, -jnp.inf), axis=-1
    ).astype(jnp.int32)

    # Acting: argmax g + logits + sigma(q_hat) among most-visited candidates.
    max_visit = jnp.max(root_visits, axis=-1, keepdims=True)
    final_score = jnp.where(
        legal_mask & (root_visits == max_visit), gumbel + imp_logits, -jnp.inf
    )
    action = jnp.argmax(final_score, axis=-1).astype(jnp.int32)

    return GumbelMCTSOutput(
        action=action,
        greedy_action=greedy_action,
        improved_policy=improved_policy,
        root_visit_counts=root_visits,
        root_value=root_value,
        root_predicted_value=root_predicted_value,
        max_tree_depth=max_depth,
        tree=tree,
    )
