"""Batched, array-based MCTS (mctx-style) under jit.

Replaces the reference's sequential one-Python-object-per-node search
(reference self_play.py:249-476) with preallocated arrays advancing B
independent game trees in lockstep: one batched network call per simulation
instead of one batch-1 call per tree per simulation. Exact semantic parity
with the reference search:

- pUCT score: pb_c = log((N_p + pb_c_base + 1)/pb_c_base) + pb_c_init, scaled
  by sqrt(N_p)/(N_c + 1); value term min-max normalized over the tree and
  negated for the 2-player case (reference self_play.py:380-404).
- Uniform random tie-break among max-score actions (self_play.py:363-378).
- Root expanded over legal actions only with optional Dirichlet noise
  (self_play.py:296-314, :467-476); interior nodes expand the full action
  space (self_play.py:345-351).
- Backpropagation with per-player sign flipping and discount, and MinMaxStats
  tracked over (reward + discount * [-]value) of every updated node
  (self_play.py:406-430, :553-570). 1- and 2-player modes supported; the
  reference raises NotImplementedError for >2 players (self_play.py:430),
  which we check at trace time.

Storage layout (TPU-tuned, round 3):

- **Edge-array statistics**: visit counts, value sums, rewards, and priors
  live on the EDGES of each node — [B, N, A] arrays indexed (lane, node,
  action) — instead of on child nodes. One [A]-row gather per tree level
  replaces the old double gather (children_index then per-child stats), and
  the stats of unexpanded edges are naturally zero (the reference creates
  zero-visit child Nodes carrying only a prior, self_play.py:345-351 — an
  edge row is exactly that). A node's own statistics equal its incoming
  edge's (every path through a node crosses that edge), and its visit count
  satisfies visit(n) = 1 + sum_a edge_visit(n, a) for interior nodes
  (its expansion visit plus one per descent into a child) and
  visit(root) = sum_a edge_visit(root, a) (the root is expanded before
  simulation 0). The root keeps explicit [B] scalars since it has no
  incoming edge.
- **Node-major hidden store with a software-pipelined leaf write**: the
  per-node hidden states are by far the largest tree array (connect4
  200-sim tree at 256 lanes: 553 MB f32) and each simulation reads one
  row (the parent, an XLA gather) and writes one row (the new leaf).
  Writing in the same scan iteration as the gather makes XLA materialize
  full-store copies to protect the read of the pre-update buffer
  (profiler-measured: 1.45 ms/sim — 78% of a connect4 move; an aliased
  Pallas row write and a jax.Ref were no better IN CONTEXT, 5 ms and
  11 ms/sim). Instead each simulation's leaf write is DEFERRED to the
  START of the next simulation: the body runs
  store = store.at[pending_node].set(pending_leaf); ... gather(store) —
  every read is of the post-update value, the pre-update buffer is dead at
  the write, and XLA's in-place dynamic-update-slice pass keeps the store
  in place with zero copies. Correctness is unchanged: the node written at
  simulation s only becomes reachable by descents at s+1, whose body
  flushes the write first.
- **to_play by depth parity**: the player at tree depth t is
  (root_to_play + t) % num_players (the reference advances virtual_to_play
  one player per edge, self_play.py:330-334), so backprop's sign flips are
  arithmetic on depths and nothing is gathered.

Each simulation expands exactly one node, so a search of S simulations needs
S+1 node slots. The root is node 0.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.ops.support import support_to_scalar


def resolve_fast_path_flag(flag, config) -> bool:
    """Resolve a fast-path knob that may be True/False/"auto".

    "auto" = engage on real accelerator backends (where the Pallas kernels
    compile natively); plain CPU runs keep the XLA path unless
    config.pallas_interpret explicitly opts into the interpreter.
    """
    if flag == "auto":
        return jax.default_backend() != "cpu" or bool(
            getattr(config, "pallas_interpret", False)
        )
    return bool(flag)


class SearchSpec(NamedTuple):
    """Static search hyperparameters (config group 'Self-Play', §2.7)."""

    num_simulations: int
    num_players: int
    pb_c_base: float
    pb_c_init: float
    discount: float
    dirichlet_alpha: float
    exploration_fraction: float
    support_size: int
    max_depth: int  # static bound on tree depth (= num_simulations)
    # Testing hook: pick the first max-score action instead of a uniform
    # random choice among ties, for exact equivalence against a sequential
    # oracle. Production default False (= reference self_play.py:371-377).
    deterministic_tie_break: bool = False
    # Fused Pallas descend/backprop kernels (ops/mcts_pallas.py); only for
    # tree sizes that fit VMEM. pallas_interpret runs them in interpreter
    # mode (CPU tests).
    use_pallas: bool = False
    pallas_interpret: bool = False
    # XLA-path descents capture each selected edge's (reward, visit, vsum)
    # into path-aligned arrays so the backprop fold needs no slab gathers
    # (XLA:TPU serializes [B, D]-indexed gathers per element). The capture
    # costs ~4 small ops per tree LEVEL while the gathers cost ~3*D*12ns
    # per SIM — so capture wins on shallow trees and loses on deep ones
    # (measured r4: gomoku's fresh-net 400-sim trees degenerate ~100+
    # levels deep, 30.1 -> 26.6 env-steps/s with capture). from_config
    # disables it above 256 simulations.
    capture_path_stats: bool = True
    # Backprop-ONLY Pallas kernel for big-board games whose descend slabs
    # exceed VMEM (gomoku: N*A ~ 49k): the XLA descent stays, but the
    # leaf->root fold runs in-VMEM instead of XLA's serialized
    # per-element gathers/scatters. Engaged automatically by from_config
    # when use_pallas is gated off by tree size but the backprop working
    # set fits (ops/mcts_pallas.fits_vmem_backprop).
    use_pallas_backprop: bool = False
    # Multi-leaf expansion (sub-tree batching): select K leaves per round
    # with virtual-visit marking between selections, evaluate all K with ONE
    # network call, then backpropagate each. K=1 is the reference-exact
    # search; K>1 trades a mild selection approximation (the classic
    # virtual-loss artifact: in-flight marks depress pUCT before their
    # values land) for K-fold fewer sequential network dispatches.
    batch_leaves: int = 1
    # HBM-streaming descend (ops/mcts_stream.py) for trees too big for the
    # VMEM planar kernels (gomoku class): the whole descent runs as one
    # kernel streaming per-lane node rows from a packed HBM slab
    # (~1.5 us/level measured vs ~14 us/level staged XLA), capturing path
    # stats so the backprop fold is gather-free at any depth. Same
    # tie-jitter caveat as the other Pallas kernels.
    use_stream: bool = False

    @classmethod
    def from_config(cls, config, batch_size=None):
        if len(config.players) > 2:
            raise NotImplementedError("More than two player mode not implemented.")
        batch_leaves = int(getattr(config, "search_batch_leaves", 1))
        if batch_leaves < 1 or config.num_simulations % batch_leaves:
            raise ValueError(
                "search_batch_leaves must be >= 1 and divide num_simulations "
                f"(got {batch_leaves} for {config.num_simulations} simulations)"
            )
        use_pallas = resolve_fast_path_flag(
            getattr(config, "use_pallas_mcts", False), config
        )
        use_pallas_backprop = False
        use_stream = False
        if use_pallas and batch_size is not None:
            from muzero_general_tpu.ops.mcts_pallas import (
                choose_block_backprop,
                choose_block_planar,
            )

            N = config.num_simulations + 1
            A = len(config.action_space)
            # Descend runs on planar [B, A, N] slabs, backprop on the flat
            # slab — both must fit VMEM blocks. When only the backprop
            # fits (gomoku-scale trees), keep the XLA descent but run the
            # leaf->root fold in-VMEM (use_pallas_backprop).
            backprop_ok = choose_block_backprop(batch_size, N, A) is not None
            use_pallas = (
                choose_block_planar(batch_size, N, A) is not None
                and backprop_ok
            )
            # Trees too big for the VMEM kernels stream from HBM instead
            # (K=1 only: multileaf keeps the XLA path's marking machinery;
            # B >= 8 only: batch-1 eval lanes keep the staged XLA search —
            # the kernel's per-lane DMA loop has nothing to amortize there
            # and [1, A] operands are the shapes Mosaic has historically
            # miscompiled).
            use_stream = (
                not use_pallas
                and batch_leaves == 1
                and batch_size >= 8
                and bool(
                    resolve_fast_path_flag(
                        getattr(config, "use_stream_mcts", "auto"), config
                    )
                )
            )
            # NOT auto-engaged: measured SLOWER than the XLA fold at gomoku
            # size (30.1 -> 17.5 env-steps/s, r4) — the kernel's loop-carried
            # [B, N*A] visit/vsum slabs spill to VMEM every level. The XLA
            # fold instead runs gather-free via descent-captured path stats
            # (_select_leaf below). Kept as a tested spec knob for
            # experiments.
            use_pallas_backprop = False
        return cls(
            num_simulations=config.num_simulations,
            num_players=len(config.players),
            pb_c_base=float(config.pb_c_base),
            pb_c_init=float(config.pb_c_init),
            discount=float(config.discount),
            dirichlet_alpha=float(config.root_dirichlet_alpha),
            exploration_fraction=float(config.root_exploration_fraction),
            support_size=config.support_size,
            max_depth=config.num_simulations,
            use_pallas=use_pallas,
            pallas_interpret=bool(getattr(config, "pallas_interpret", False)),
            use_pallas_backprop=use_pallas_backprop,
            capture_path_stats=config.num_simulations <= 256,
            batch_leaves=batch_leaves,
            use_stream=use_stream,
        )


class Tree(NamedTuple):
    """SoA tree storage, N = num_simulations + 1 node slots, root = node 0.

    Statistics are per-EDGE ([B, N, A], see module docstring); hidden states
    are node-major ([N, B, ...]).
    """

    children_index: jnp.ndarray  # [B, N, A] int32, -1 = unexpanded edge
    children_prior: jnp.ndarray  # [B, N, A] float32
    children_visit: jnp.ndarray  # [B, N, A] int32 — edge visit counts
    children_vsum: jnp.ndarray  # [B, N, A] float32 — edge value sums
    children_reward: jnp.ndarray  # [B, N, A] float32 — child node rewards
    root_legal: jnp.ndarray  # [B, A] bool
    root_visit: jnp.ndarray  # [B] int32 — the root has no incoming edge
    root_vsum: jnp.ndarray  # [B] float32
    root_reward: jnp.ndarray  # [B] float32
    root_to_play: jnp.ndarray  # [B] int32
    min_value: jnp.ndarray  # [B] MinMaxStats minimum
    max_value: jnp.ndarray  # [B] MinMaxStats maximum

    def root_value(self):
        """Root Node.value(): value_sum/visit_count, 0 if unvisited
        (reference self_play.py:446-449)."""
        v = self.root_visit
        return jnp.where(v > 0, self.root_vsum / jnp.maximum(v, 1), 0.0)


class MCTSOutput(NamedTuple):
    root_visit_counts: jnp.ndarray  # [B, A] int32
    root_value: jnp.ndarray  # [B]
    root_predicted_value: jnp.ndarray  # [B] network value at the root
    max_tree_depth: jnp.ndarray  # [B] int32
    tree: Tree
    root_hidden: jnp.ndarray = None  # [B, ...] the root's hidden state


def masked_softmax(logits, mask):
    """Softmax over masked entries; masked-out entries get exactly 0."""
    neg = jnp.finfo(logits.dtype).min
    z = jnp.where(mask, logits, neg)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(z), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def _normalize(tree: Tree, q):
    """MinMaxStats.normalize over [B, A] q values (reference self_play.py:566-570)."""
    mn = tree.min_value[:, None]
    mx = tree.max_value[:, None]
    return jnp.where(mx > mn, (q - mn) / jnp.maximum(mx - mn, 1e-30), q)


def _random_argmax(rng, scores):
    """Uniform choice among all entries equal to the row max (self_play.py:371-377)."""
    winners = scores >= jnp.max(scores, axis=-1, keepdims=True)
    logits = jnp.where(winners, 0.0, -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1)


def edge_stats(tree: Tree, node):
    """The A edge rows of `node` [B]: (visit f32, vsum, reward, prior), one
    gather each — the edge-array replacement for the old double gather.

    (A one-hot mask+reduce formulation was measured SLOWER on TPU at gomoku
    size — 30.1 -> 18.4 env-steps/s, r4: the [B, N, A] masked operands are
    bandwidth-bound at ~4 slab passes per level, while the row gather only
    touches B*A output elements. Gathers win when the indexed rows are a
    small fraction of the slab.)
    """
    B = tree.children_index.shape[0]
    b_idx = jnp.arange(B)
    cvis = tree.children_visit[b_idx, node].astype(jnp.float32)
    cvsum = tree.children_vsum[b_idx, node]
    crew = tree.children_reward[b_idx, node]
    cprior = tree.children_prior[b_idx, node]
    return cvis, cvsum, crew, cprior


def parent_visit_from_edges(node, cvis):
    """visit(node) from its edge rows: 1 + sum(edges) interior, sum at root."""
    return jnp.sum(cvis, axis=-1) + (node != 0).astype(jnp.float32)


def _ucb_scores(tree: Tree, node, spec: SearchSpec):
    """Vectorized pUCT over all A child edges of `node` [B] (self_play.py:380-404).

    Returns (scores, cvis, cvsum, crew) — the per-edge stats ride along so
    the descent can capture the selected edge's values for a gather-free
    backprop (see _select_leaf)."""
    cvis, cvsum, crew, cprior = edge_stats(tree, node)
    parent_visit = parent_visit_from_edges(node, cvis)  # [B]
    child_value = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)

    pb_c = (
        jnp.log((parent_visit + spec.pb_c_base + 1.0) / spec.pb_c_base)
        + spec.pb_c_init
    )
    pb_c = pb_c[:, None] * jnp.sqrt(parent_visit)[:, None] / (cvis + 1.0)
    prior_score = pb_c * cprior

    sign = 1.0 if spec.num_players == 1 else -1.0
    q = crew + spec.discount * sign * child_value
    value_score = jnp.where(cvis > 0, _normalize(tree, q), 0.0)

    scores = prior_score + value_score
    # At the root only legal actions are candidate children (self_play.py:296-308).
    at_root = (node == 0)[:, None]
    scores = jnp.where(at_root & ~tree.root_legal, -jnp.inf, scores)
    return scores, cvis, cvsum, crew


def _to_planar(tree: Tree) -> Tree:
    """[B, N, A] edge slabs -> [B, A, N] planar slabs (Pallas-path carry)."""
    t = lambda x: x.transpose(0, 2, 1)
    return tree._replace(
        children_index=t(tree.children_index),
        children_prior=t(tree.children_prior),
        children_visit=t(tree.children_visit),
        children_vsum=t(tree.children_vsum),
        children_reward=t(tree.children_reward),
    )


def _from_planar(tree: Tree) -> Tree:
    """Inverse of _to_planar (the transpose is an involution)."""
    return _to_planar(tree)


def _flush_pending(hidden, pending):
    """Write the previous simulation's leaf hidden into the store.

    Explicit dynamic-update-slice: .at[node].set lowers to a scatter that
    XLA:TPU turns into a whole-store kLoop fusion (~6 ms estimated at
    connect4 size); DUS is recognized by the in-place pass.
    """
    pending_node, pending_leaf = pending
    return jax.lax.dynamic_update_slice(
        hidden,
        pending_leaf.astype(hidden.dtype)[None],
        (pending_node,) + (0,) * (hidden.ndim - 1),
    )


class SelectOut(NamedTuple):
    """One descent's result. path_stats ([B, D, 3]: per-edge reward/visit/
    vsum captured during the descent) is XLA-path only; marked_visits (the
    visit slab with in-kernel virtual marks) is Pallas-path only."""

    parent: jnp.ndarray  # [B]
    action: jnp.ndarray  # [B]
    path_nodes: jnp.ndarray  # [B, D]
    path_actions: jnp.ndarray  # [B, D]
    leaf_depth: jnp.ndarray  # [B]
    path_stats: jnp.ndarray = None
    marked_visits: jnp.ndarray = None


def _select_leaf(tree: Tree, rng, spec: SearchSpec, depth_bound,
                 mark_visits=False) -> SelectOut:
    """Descend all B trees to an unexpanded edge.

    depth_bound: scalar i32 upper bound on the descent length — loop trip
    counts are scalar so no per-level vector sync.

    mark_visits (Pallas path only): SelectOut.marked_visits carries the
    children_visit slab with +1 on every traversed edge (in-kernel virtual
    marking for multi-leaf rounds; the XLA path marks with
    _apply_virtual_marks).
    """
    B = tree.children_index.shape[0]
    b_idx = jnp.arange(B)

    if spec.use_pallas:
        # Planar-path tree: the children_* slabs are [B, A, N] (see
        # run_mcts's _to_planar transpose).
        from muzero_general_tpu.ops import mcts_pallas

        seed = jax.random.randint(rng, (), 0, 2**31 - 1)
        res = mcts_pallas.descend_planar(
            seed,
            depth_bound,
            tree.children_index,
            tree.children_prior,
            tree.children_visit,
            tree.children_vsum,
            tree.children_reward,
            tree.root_legal,
            tree.min_value,
            tree.max_value,
            num_players=spec.num_players,
            pb_c_base=spec.pb_c_base,
            pb_c_init=spec.pb_c_init,
            discount=spec.discount,
            A=tree.root_legal.shape[1],
            max_depth=spec.max_depth,
            # Same zeroing rule as mcts_fused.FusedSpec.from_config:
            # interpret runs use deterministic lowest-index tie-break
            # (see the TIE_JITTER note in ops/mcts_pallas.py).
            tie_jitter=(
                0.0
                if (spec.deterministic_tie_break or spec.pallas_interpret)
                else mcts_pallas.TIE_JITTER
            ),
            interpret=spec.pallas_interpret,
            mark_visits=mark_visits,
        )
        parent, action, leaf_depth, path_n, path_a = res[:5]
        return SelectOut(
            parent, action, path_n, path_a, leaf_depth,
            marked_visits=res[5] if mark_visits else None,
        )

    # ---- Descent: follow max-UCB edges until an unexpanded edge ----------
    # path_nodes[b, t] = node visited at depth t (root = depth 0);
    # path_actions[b, t] = action taken FROM that node; -1/0 padding.
    # The selected edge's (reward, visit, vsum) are CAPTURED per level into
    # path-aligned arrays — they are byproducts of the per-level stat
    # extraction, and handing them to the backprop makes it gather-free
    # (XLA:TPU serializes [B, D]-indexed gathers per element: the three
    # path gathers cost ~0.9 ms/sim at gomoku size, r4 trace).
    D = spec.max_depth + 1
    path_n0 = jnp.full((B, D), -1, jnp.int32).at[:, 0].set(0)
    path_a0 = jnp.zeros((B, D), jnp.int32)
    stats0 = jnp.zeros((B, D, 3), jnp.float32)  # (reward, visit, vsum)

    trip = jnp.minimum(depth_bound, spec.max_depth)

    def desc_cond(state):
        *_rest, t = state
        return t < trip  # scalar-only condition; lanes self-mask via active

    def desc_body(state):
        (current, depth, path_n, path_a, path_s, active, parent, action,
         t) = state
        key = jax.random.fold_in(rng, t + 1)
        scores, cvis, cvsum, crew = _ucb_scores(tree, current, spec)
        if spec.deterministic_tie_break:
            sel = jnp.argmax(scores, axis=-1)
        else:
            sel = _random_argmax(key, scores)  # [B]
        path_a = path_a.at[b_idx, depth].set(
            jnp.where(active, sel, path_a[b_idx, depth])
        )
        if spec.capture_path_stats:
            sel_stats = jnp.stack(
                [crew[b_idx, sel], cvis[b_idx, sel], cvsum[b_idx, sel]],
                axis=-1,
            )
            path_s = path_s.at[b_idx, depth].set(
                jnp.where(active[:, None], sel_stats, path_s[b_idx, depth])
            )
        child = tree.children_index[b_idx, current, sel]
        hits_leaf = active & (child < 0)
        parent = jnp.where(hits_leaf, current, parent)
        action = jnp.where(hits_leaf, sel, action)
        active = active & (child >= 0)
        current = jnp.where(active, child, current)
        depth = depth + active.astype(jnp.int32)
        path_n = path_n.at[b_idx, depth].set(
            jnp.where(active, current, path_n[b_idx, depth])
        )
        return (current, depth, path_n, path_a, path_s, active, parent,
                action, t + 1)

    current0 = jnp.zeros((B,), jnp.int32)
    depth0 = jnp.zeros((B,), jnp.int32)
    parent0 = jnp.zeros((B,), jnp.int32)
    action0 = jnp.zeros((B,), jnp.int32)
    active0 = jnp.ones((B,), bool)
    _, depth, path_n, path_a, path_s, _, parent, action, _ = (
        jax.lax.while_loop(
            desc_cond,
            desc_body,
            (current0, depth0, path_n0, path_a0, stats0, active0, parent0,
             action0, jnp.int32(0)),
        )
    )
    # The new node sits one edge below the deepest recorded node.
    leaf_depth = depth + 1  # edges from root to the new node
    return SelectOut(
        parent, action, path_n, path_a, leaf_depth,
        path_stats=path_s if spec.capture_path_stats else None,
    )


def _simulate_once(tree: Tree, hidden, pending, sim, rng, spec: SearchSpec,
                   recurrent_fn, depth_bound):
    """One simulation for all B trees: descend, expand node sim+1, backprop.

    hidden: the [N, B, ...] node-major hidden store. pending =
    (node, leaf_hidden) from the PREVIOUS simulation, flushed into the
    store first (software-pipelined write — module docstring). Returns the
    new pending write instead of writing this sim's leaf itself.
    """
    hidden = _flush_pending(hidden, pending)
    s = _select_leaf(tree, rng, spec, depth_bound)
    return _expand_and_backprop(
        tree, hidden, sim, spec, recurrent_fn, s.parent, s.action,
        s.path_nodes, s.path_actions, s.leaf_depth, path_stats=s.path_stats,
    )


def _expand_and_backprop(
    tree: Tree, hidden, sim, spec: SearchSpec, recurrent_fn, parent,
    action, path_nodes, path_actions, leaf_depth, path_stats=None,
):
    """Shared tail of one simulation: expand node sim+1, backpropagate.

    path_nodes[b, t] = node at depth t for t < leaf_depth (the new leaf
    itself is NOT required to be recorded: its statistics live on the edge
    (parent, action) = (path_nodes[leaf_depth-1], path_actions[leaf_depth-1])).
    """
    B = tree.children_index.shape[0]
    b_idx = jnp.arange(B)
    new_node = sim + 1

    # ---- Expansion: one batched recurrent inference ----------------------
    parent_hidden = hidden[parent, b_idx]  # post-flush store: see pipeline note
    value_logits, reward_logits, policy_logits, hidden_leaf = recurrent_fn(
        parent_hidden, action
    )
    leaf_value = support_to_scalar(value_logits, spec.support_size)
    leaf_reward = support_to_scalar(reward_logits, spec.support_size)
    # Interior nodes expand over the FULL action space (self_play.py:345-351).
    prior_leaf = jax.nn.softmax(policy_logits, axis=-1)

    if spec.use_pallas:
        # Planar [B, A, N] slabs: edge (parent, action) lives at
        # [b, action, parent]; node new_node's prior row is lane column
        # new_node of every action plane.
        tree = tree._replace(
            children_index=tree.children_index.at[b_idx, action, parent].set(
                new_node
            ),
            children_reward=tree.children_reward.at[b_idx, action, parent].set(
                leaf_reward
            ),
            children_prior=tree.children_prior.at[:, :, new_node].set(
                prior_leaf
            ),
        )
    else:
        tree = tree._replace(
            children_index=tree.children_index.at[b_idx, parent, action].set(
                new_node
            ),
            children_reward=tree.children_reward.at[b_idx, parent, action].set(
                leaf_reward
            ),
            children_prior=tree.children_prior.at[:, new_node].set(prior_leaf),
        )
    pending = (new_node, hidden_leaf)  # written at the NEXT sim's start

    # ---- Backpropagation (self_play.py:406-430) --------------------------
    if spec.use_pallas:
        from muzero_general_tpu.ops import mcts_pallas

        cvis, cvsum, rvis, rvsum, mn, mx = mcts_pallas.backprop(
            path_nodes, path_actions, leaf_depth, leaf_value,
            tree.children_visit, tree.children_vsum, tree.children_reward,
            tree.root_visit, tree.root_vsum, tree.root_reward,
            tree.min_value, tree.max_value,
            num_players=spec.num_players, discount=spec.discount,
            interpret=spec.pallas_interpret, planar=True,
        )
        tree = tree._replace(
            children_visit=cvis, children_vsum=cvsum,
            root_visit=rvis, root_vsum=rvsum, min_value=mn, max_value=mx,
        )
        return tree, hidden, pending, leaf_depth

    if path_stats is not None:
        # The leaf edge's reward was 0 at descent time (unexpanded); patch
        # the freshly decoded one so the captured stats match what a
        # post-expansion gather would read.
        path_stats = path_stats.at[b_idx, leaf_depth - 1, 0].set(leaf_reward)

    if spec.use_pallas_backprop:
        # Big-board fast path: XLA descend + in-VMEM backprop on the
        # node-major slabs (the XLA fold's [B, D] gathers/scatters are
        # serialized per element on TPU — see the multileaf note above).
        from muzero_general_tpu.ops import mcts_pallas

        cvis, cvsum, rvis, rvsum, mn, mx = mcts_pallas.backprop(
            path_nodes, path_actions, leaf_depth, leaf_value,
            tree.children_visit, tree.children_vsum, tree.children_reward,
            tree.root_visit, tree.root_vsum, tree.root_reward,
            tree.min_value, tree.max_value,
            num_players=spec.num_players, discount=spec.discount,
            interpret=spec.pallas_interpret, planar=False,
        )
        tree = tree._replace(
            children_visit=cvis, children_vsum=cvsum,
            root_visit=rvis, root_vsum=rvsum, min_value=mn, max_value=mx,
        )
        return tree, hidden, pending, leaf_depth

    tree = _backprop_vectorized(
        tree, path_nodes, path_actions, leaf_depth, leaf_value, spec,
        path_stats=path_stats,
    )
    return tree, hidden, pending, leaf_depth


def _backprop_vectorized(tree: Tree, path_nodes, path_actions, leaf_depth,
                         leaf_value, spec: SearchSpec, pre_marked=False,
                         planar=False, path_stats=None, packed_edges=None):
    """Whole-path backpropagation with NO sequential walk.

    Exact re-formulation of the reference's leaf->root loop
    (self_play.py:406-430): the per-depth propagated values
    v(t) = s_{t+1} r_{t+1} + discount * v(t+1), v(L) = leaf value, are an
    affine recurrence computed with one reverse associative scan over the
    path (log-depth), and the edge updates become two scatters over the
    path arrays. Min/max stats are order-free (they only accumulate
    extrema of the post-update per-node stats), so one masked reduce
    replaces the walk. Replaces a D-iteration while_loop of gathers and
    scatters per simulation.

    pre_marked: visit counts along the path (and the root's) were already
    incremented by a virtual-loss marking pass (multi-leaf expansion); only
    value sums are added and the gathered visit counts are taken as the
    post-update counts.

    planar: the tree's children_* slabs are [B, A, N] (pallas planar path).

    path_nodes/path_actions/leaf_depth/leaf_value may carry a leading K
    axis ([K, B, D] / [K, B]): ALL K paths of a multi-leaf round are folded
    in with ONE pair of scatter-adds (value-sum scatters with repeated
    targets accumulate; requires pre_marked=True). The only divergence from
    K sequential backprops is the min/max bookkeeping: each path's node
    values are computed against the pre-round value sums, so a round's
    extrema ignore its sibling paths' in-flight contributions (within the
    virtual-loss approximation multi-leaf already accepts).

    path_stats ([..., D, 3] = per-edge reward/visit/vsum captured by the
    descent, leaf-edge reward patched by the expansion): when provided the
    three [.., D]-indexed slab gathers are skipped — XLA:TPU serializes
    such gathers per element (~0.9 ms/sim at gomoku size, r4 trace); the
    captured values are identical for K=1 (the tree does not change
    between selection and backprop).
    """
    multi = path_nodes.ndim == 3
    B = tree.children_index.shape[0]
    if multi:
        assert pre_marked, "multi-path backprop requires pre-marked visits"
        K, _, D = path_nodes.shape
        path_nodes = path_nodes.reshape(K * B, D)
        path_actions = path_actions.reshape(K * B, D)
        leaf_depth = leaf_depth.reshape(K * B)
        leaf_value = leaf_value.reshape(K * B)
        bcol = jnp.tile(jnp.arange(B), K)[:, None]
    else:
        K = 1
        D = path_nodes.shape[1]
        bcol = jnp.arange(B)[:, None]
    M = K * B
    t_idx = jnp.arange(D)[None, :]  # depth index, [1, D]
    L = leaf_depth[:, None]  # [M, 1]
    sign = 1.0 if spec.num_players == 1 else -1.0

    # Edge j (0-based) = (path_nodes[j], path_actions[j]) leads to the node
    # at depth j+1; it exists for j < L. Beyond L the path arrays hold
    # -1/0 padding — clamp to 0 and mask every use.
    edge_mask = t_idx < L  # [M, D]
    pn = jnp.where(edge_mask, path_nodes, 0)
    pa = jnp.where(edge_mask, path_actions, 0)
    if planar:
        i1, i2 = pa, pn  # [B, A, N] slabs: edge (n, a) at [b, a, n]
    else:
        i1, i2 = pn, pa
    if path_stats is not None:
        ps = path_stats.reshape(M, D, 3)
        r_edge = jnp.where(edge_mask, ps[..., 0], 0.0)
        ev_old = jnp.where(edge_mask, ps[..., 1], 0.0)
        es_old = jnp.where(edge_mask, ps[..., 2], 0.0)
    else:
        r_edge = tree.children_reward[bcol, i1, i2]  # [M, D] edge rewards
        ev_old = tree.children_visit[bcol, i1, i2].astype(jnp.float32)
        es_old = tree.children_vsum[bcol, i1, i2]

    # node_to_play == vt_leaf  ⟺  t ≡ L (mod num_players)
    if spec.num_players == 1:
        same = jnp.ones((M, D), bool)
        s_next = jnp.ones((M, D))
    else:
        same = ((L - t_idx) % 2) == 0  # at node depth t
        s_next = jnp.where(((L - (t_idx + 1)) % 2) == 0, -1.0, 1.0)

    # v(t) via reverse associative scan of affine maps f_t(x) = a_t x + b_t:
    #   t <  L: a = discount, b = s_{t+1} * reward_{t+1}
    #   t == L: a = 0,        b = leaf value          (absorbs the start)
    #   t >  L: a = 0,        b = 0                   (masked out later)
    a_coef = jnp.where(edge_mask, spec.discount, 0.0)
    b_coef = jnp.where(
        edge_mask, s_next * r_edge,
        jnp.where(t_idx == L, leaf_value[:, None], 0.0),
    )

    def compose(acc, elem):
        # Under reverse=True jax scans the flipped sequence forward, so
        # `acc` combines the HIGHER depths and `elem` is the new lower
        # depth: the result must be f_elem(f_acc(x)).
        a_l, b_l = acc
        a_r, b_r = elem
        return a_r * a_l, a_r * b_l + b_r

    _, v = jax.lax.associative_scan(
        compose, (a_coef, b_coef), reverse=True, axis=1
    )  # v[:, t] = value propagated into the node at depth t

    node_mask = t_idx <= L
    delta = jnp.where(same, v, -v)  # value-sum contribution at depth t

    # ---- scatters: edge j gets node (j+1)'s delta -----------------------
    # (multi: one scatter-add folds all K paths; repeated targets accumulate)
    edge_delta = jnp.concatenate(
        [delta[:, 1:], jnp.zeros((M, 1))], axis=1
    )
    if packed_edges is not None:
        # Streaming path: the tree's edge stats live in the packed HBM slab
        # (ops/mcts_stream.py); scatter into its visit/vsum planes and keep
        # the Tree's (stale, unused) slabs untouched.
        from muzero_general_tpu.ops.mcts_stream import P_VISIT, P_VSUM

        packed_edges = packed_edges.at[bcol, pn, P_VSUM, pa].add(
            jnp.where(edge_mask, edge_delta, 0.0)
        )
        children_vsum = tree.children_vsum
        if pre_marked:
            children_visit = tree.children_visit
            root_visit = tree.root_visit
            visit_inc = 0.0
        else:
            packed_edges = packed_edges.at[bcol, pn, P_VISIT, pa].add(
                edge_mask.astype(jnp.float32)
            )
            children_visit = tree.children_visit
            root_visit = tree.root_visit + 1
            visit_inc = 1.0
    else:
        children_vsum = tree.children_vsum.at[bcol, i1, i2].add(
            jnp.where(edge_mask, edge_delta, 0.0)
        )
        if pre_marked:
            children_visit = tree.children_visit
            root_visit = tree.root_visit
            visit_inc = 0.0
        else:
            children_visit = tree.children_visit.at[bcol, i1, i2].add(
                edge_mask.astype(jnp.int32)
            )
            root_visit = tree.root_visit + 1
            visit_inc = 1.0
    delta0 = delta[:, 0]
    if multi:
        delta0 = delta0.reshape(K, B).sum(axis=0)
    root_vsum = tree.root_vsum + delta0

    # ---- min/max over post-update node stats ----------------------------
    # Node at depth t >= 1 owns edge t-1's stats; depth 0 is the root.
    def node_shift(edge_arr, root_col):
        root_col = jnp.broadcast_to(root_col, (M,))
        return jnp.concatenate([root_col[:, None], edge_arr[:, :-1]], axis=1)

    def tileK(x):
        return jnp.tile(x, (K,)) if multi else x

    nvis = node_shift(ev_old, tileK(tree.root_visit.astype(jnp.float32)))
    nvis = nvis + visit_inc
    nsum = node_shift(es_old, tileK(tree.root_vsum))
    nrew = node_shift(r_edge, tileK(tree.root_reward))
    node_val = (nsum + delta) / jnp.maximum(nvis, 1.0)
    stat = nrew + spec.discount * sign * node_val
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    stat_min = jnp.min(jnp.where(node_mask, stat, big), axis=1)
    stat_max = jnp.max(jnp.where(node_mask, stat, -big), axis=1)
    if multi:
        stat_min = stat_min.reshape(K, B).min(axis=0)
        stat_max = stat_max.reshape(K, B).max(axis=0)
    min_value = jnp.minimum(tree.min_value, stat_min)
    max_value = jnp.maximum(tree.max_value, stat_max)

    tree = tree._replace(
        children_visit=children_visit,
        children_vsum=children_vsum,
        root_visit=root_visit,
        root_vsum=root_vsum,
        min_value=min_value,
        max_value=max_value,
    )
    if packed_edges is not None:
        return tree, packed_edges
    return tree


def _apply_virtual_marks(tree: Tree, path_nodes, path_actions, leaf_depth,
                         planar=False):
    """Virtual-visit marking: +1 visit on every path edge and the root.

    Applied between the K leaf selections of a multi-leaf round so later
    selections are steered away from in-flight leaves; the matching
    backprops then run with pre_marked=True (values only). planar: the
    tree's children_* slabs are [B, A, N].
    """
    B, D = path_nodes.shape
    bcol = jnp.arange(B)[:, None]
    t_idx = jnp.arange(D)[None, :]
    edge_mask = t_idx < leaf_depth[:, None]
    pn = jnp.where(edge_mask, path_nodes, 0)
    pa = jnp.where(edge_mask, path_actions, 0)
    i1, i2 = (pa, pn) if planar else (pn, pa)
    return tree._replace(
        children_visit=tree.children_visit.at[bcol, i1, i2].add(
            edge_mask.astype(jnp.int32)
        ),
        root_visit=tree.root_visit + 1,
    )


def _run_rounds_multileaf(tree, hidden, pending0, rng, spec, recurrent_fn):
    """num_simulations/K rounds of K-leaf expansion (SearchSpec.batch_leaves).

    Per round: K sequential selections with virtual-visit marks between
    them (inherently serial — that IS the algorithm), then everything else
    batched over the K paths in ONE pass each:

    - ONE gather of all K parent rows from the hidden store (the r3 shipped
      version issued K separate gathers between the round's K pending-row
      flushes, which defeated XLA's in-place pass on the store — the
      553 MB-scale copy the software pipelining exists to avoid; judge-
      measured 7.6x SLOWER than K=1 at connect4 size, VERDICT r3 weak #1);
    - ONE recurrent inference over the K*B stacked leaves;
    - ONE batched expansion scatter per stat slab over all K (parent,
      action) targets, with intra-round duplicate selections MASKED: if two
      selections of a round picked the same unexpanded edge (marks cannot
      diversify, e.g. a single legal action), only the FIRST expands the
      edge — later duplicates keep their value credit in backprop but do
      not re-expand, so no edge mixes two network evaluations and no
      children_index write targets collide (ADVICE r3);
    - ONE folded K-path backprop (see _backprop_vectorized multi).

    Returns (tree, hidden, max_depth).
    """
    K = spec.batch_leaves
    R = spec.num_simulations // K
    B = tree.children_index.shape[0]
    A = tree.root_legal.shape[1]
    b_idx = jnp.arange(B)
    planar = spec.use_pallas

    # The K pending rows of a round are CONSECUTIVE node slots
    # (r*K+1 .. r*K+K), so the deferred write is ONE contiguous [K, B, ...]
    # dynamic-update-slice — K separate row writes on the scan-carried store
    # defeat XLA's in-place pass and each forces a whole-store copy
    # (~2.5 ms per copy at connect4 size, traced r4; the same failure mode
    # as r3's .at[].set story). Initially the block sits at node 0: row 0
    # gets the root hidden and rows 1..K-1 transient garbage that round 0
    # cannot reach (descents only see expanded edges) and round 1's flush
    # overwrites before node 1..K become reachable.
    pend_start0 = jnp.int32(0)
    pend_hid0 = jnp.broadcast_to(
        pending0[1][None], (K,) + pending0[1].shape
    )

    def round_body(carry, r):
        tree, hidden, pend_start, pend_hid, maxd = carry
        hidden = jax.lax.dynamic_update_slice(
            hidden,
            pend_hid.astype(hidden.dtype),
            (pend_start,) + (0,) * (hidden.ndim - 1),
        )
        depth_bound = jnp.max(maxd) + 1

        sels = []
        for k in range(K):
            key = jax.random.fold_in(rng, r * K + k + 1)
            if spec.use_pallas:
                # Selection + virtual-visit marking in ONE kernel (the XLA
                # mark scatter costs 446 us/mark at connect4 size, r4
                # trace); only the root's scalar counter stays outside.
                s = _select_leaf(tree, key, spec, depth_bound,
                                 mark_visits=True)
                tree = tree._replace(
                    children_visit=s.marked_visits,
                    root_visit=tree.root_visit + 1,
                )
            else:
                s = _select_leaf(tree, key, spec, depth_bound)
                tree = _apply_virtual_marks(
                    tree, s.path_nodes, s.path_actions, s.leaf_depth,
                    planar=planar,
                )
            sels.append(s)

        parents = jnp.stack([s.parent for s in sels])  # [K, B]
        actions = jnp.stack([s.action for s in sels])
        path_n = jnp.stack([s.path_nodes for s in sels])  # [K, B, D]
        path_a = jnp.stack([s.path_actions for s in sels])
        leaf_depth = jnp.stack([s.leaf_depth for s in sels])  # [K, B]

        # ---- ONE hidden gather + ONE recurrent inference -----------------
        ph = hidden[parents, b_idx[None]]  # [K, B, ...]
        ph = ph.reshape((K * B,) + ph.shape[2:])
        v_l, r_l, p_l, h2 = recurrent_fn(ph, actions.reshape(-1))
        leaf_values = support_to_scalar(v_l, spec.support_size).reshape(K, B)
        leaf_rewards = support_to_scalar(r_l, spec.support_size).reshape(K, B)
        priors = jax.nn.softmax(p_l, axis=-1).reshape(K, B, A)
        h2 = h2.reshape((K, B) + h2.shape[1:])

        # ---- duplicate-selection mask (first k keeps the edge) -----------
        eid = parents * A + actions  # [K, B]
        dup = jnp.zeros((K, B), bool)
        for k in range(1, K):
            seen = jnp.zeros((B,), bool)
            for kp in range(k):
                seen = seen | (eid[kp] == eid[k])
            dup = dup.at[k].set(seen)
        keep = ~dup  # [K, B]

        # ---- ONE batched expansion over all K leaves ---------------------
        new_nodes = r * K + 1 + jnp.arange(K)  # [K]
        nn2 = jnp.broadcast_to(new_nodes[:, None], (K, B))
        bcol = jnp.broadcast_to(b_idx[None], (K, B))
        # Masked scatter: duplicates redirect to their own (orphan) node
        # slot's self-loop-free parking spot — simplest is to scatter the
        # duplicate's write onto its own node row (never referenced).
        p_t = jnp.where(keep, parents, nn2)
        a_t = jnp.where(keep, actions, 0)
        i1, i2 = (a_t, p_t) if planar else (p_t, a_t)
        cidx = tree.children_index.at[bcol, i1, i2].set(nn2)
        crew = tree.children_reward.at[bcol, i1, i2].set(
            jnp.where(keep, leaf_rewards, 0.0)
        )
        cprior = tree.children_prior
        for k in range(K):  # K small; row/column DUS writes stay in place
            if planar:
                cprior = cprior.at[:, :, new_nodes[k]].set(priors[k])
            else:
                cprior = cprior.at[:, new_nodes[k]].set(priors[k])
        tree = tree._replace(
            children_index=cidx, children_reward=crew, children_prior=cprior
        )

        # ---- backprop the K paths ----------------------------------------
        if spec.use_pallas:
            # K in-VMEM kernel passes (values only — visits pre-marked).
            # The XLA multi-path fold below costs 3 serialized [K*B, D]
            # gathers + 1 scatter = ~9.4 ms/round at connect4 size (r4
            # trace: TPU gathers/scatters with per-element dynamic indices
            # run ~12 ns/element); the kernel's mask-reduce walk is ~37 us.
            from muzero_general_tpu.ops import mcts_pallas

            for k in range(K):
                sk = sels[k]
                cvis, cvsum, rvis, rvsum, mn, mx = mcts_pallas.backprop(
                    sk.path_nodes, sk.path_actions, sk.leaf_depth,
                    leaf_values[k],
                    tree.children_visit, tree.children_vsum,
                    tree.children_reward, tree.root_visit, tree.root_vsum,
                    tree.root_reward, tree.min_value, tree.max_value,
                    num_players=spec.num_players, discount=spec.discount,
                    interpret=spec.pallas_interpret, planar=True,
                    pre_marked=True,
                )
                tree = tree._replace(
                    children_visit=cvis, children_vsum=cvsum,
                    root_visit=rvis, root_vsum=rvsum,
                    min_value=mn, max_value=mx,
                )
        else:
            # Captured path stats (gather-free fold); each path's leaf-edge
            # reward patched with its OWN network reward — under duplicate
            # selection that keeps the duplicate's value credit while the
            # edge stores the first expansion's reward (see the dup mask).
            ps = None
            if sels[0].path_stats is not None:
                ps = jnp.stack([s.path_stats for s in sels])  # [K, B, D, 3]
                kcol = jnp.arange(K)[:, None]
                ps = ps.at[kcol, b_idx[None], leaf_depth - 1, 0].set(
                    leaf_rewards
                )
            tree = _backprop_vectorized(
                tree, path_n, path_a, leaf_depth, leaf_values, spec,
                pre_marked=True, planar=planar, path_stats=ps,
            )
        maxd = jnp.maximum(maxd, jnp.max(leaf_depth, axis=0))
        return (tree, hidden, new_nodes[0].astype(jnp.int32), h2, maxd), None

    (tree, hidden, _, _, maxd), _ = jax.lax.scan(
        round_body,
        (tree, hidden, pend_start0, pend_hid0,
         jnp.zeros((B,), jnp.int32)),
        jnp.arange(R),
    )
    return tree, hidden, maxd


def run_mcts(
    initial_fn,
    recurrent_fn,
    observation,
    legal_mask,
    to_play,
    rng,
    spec: SearchSpec,
    add_exploration_noise: bool = True,
    root_outputs=None,
) -> MCTSOutput:
    """Run batched MCTS from `observation` [B, ...].

    initial_fn(obs) -> (value_logits, reward_logits, policy_logits, hidden)
    recurrent_fn(hidden, action) -> same tuple
    legal_mask: [B, A] bool — legal root actions.
    to_play: [B] int32 — player to act at each root.
    root_outputs: optional precomputed (value_logits, reward_logits,
        policy_logits, hidden) to seed the root instead of initial_fn — the
        counterpart of the reference's override_root_with
        (self_play.py:267-277, used by diagnose_model.py:54-72).
    """
    B, A = legal_mask.shape
    N = spec.num_simulations + 1

    value_logits, reward_logits, policy_logits, hidden0 = (
        root_outputs if root_outputs is not None else initial_fn(observation)
    )
    root_predicted_value = support_to_scalar(value_logits, spec.support_size)
    root_reward = support_to_scalar(reward_logits, spec.support_size)
    prior = masked_softmax(policy_logits, legal_mask)

    if add_exploration_noise:
        # Dirichlet over the legal subset == normalized masked Gammas
        # (self_play.py:467-476).
        g = jax.random.gamma(
            jax.random.fold_in(rng, 0), spec.dirichlet_alpha, (B, A)
        )
        g = jnp.where(legal_mask, g, 0.0)
        noise = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
        frac = spec.exploration_fraction
        prior = jnp.where(legal_mask, prior * (1 - frac) + noise * frac, 0.0)

    tree = init_tree(N, prior, legal_mask, to_play, root_reward)
    if spec.use_pallas:
        # Planar-slab carry for the Pallas kernels: [B, N, A] -> [B, A, N]
        # ONCE per move (the kernels' per-level extraction is ~7x cheaper on
        # action planes — ops/mcts_pallas._descend_kernel_planar); transposed
        # back once at the end. Two relayout copies per move, not per sim.
        tree = _to_planar(tree)
    hidden = jnp.zeros((N,) + hidden0.shape, hidden0.dtype)
    # The root row is the first pipelined write (flushed at sim 0's start).
    pending0 = (jnp.int32(0), hidden0)

    if spec.batch_leaves > 1:
        tree, hidden, max_depth = _run_rounds_multileaf(
            tree, hidden, pending0, rng, spec, recurrent_fn
        )
        if spec.use_pallas:
            tree = _from_planar(tree)
        return MCTSOutput(
            root_visit_counts=tree.children_visit[:, 0],
            root_value=tree.root_value(),
            root_predicted_value=root_predicted_value,
            max_tree_depth=max_depth,
            tree=tree,
            root_hidden=hidden0,
        )

    if spec.use_stream:
        # -- HBM-streaming path (big boards; ops/mcts_stream.py) ----------
        from muzero_general_tpu.ops import mcts_stream

        b_idx = jnp.arange(B)
        edges0 = mcts_stream.pack_tree(tree, A)

        def stream_body(carry, sim):
            tree, edges, hidden, pending, max_depth = carry
            key = jax.random.fold_in(rng, sim + 1)
            depth_bound = jnp.max(max_depth) + 1
            hidden = _flush_pending(hidden, pending)
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            parent, action, leaf_depth, path_n, path_a, path_stats = (
                mcts_stream.descend_stream(
                    seed, depth_bound, edges, tree.root_legal,
                    tree.min_value, tree.max_value,
                    num_players=spec.num_players,
                    pb_c_base=spec.pb_c_base, pb_c_init=spec.pb_c_init,
                    discount=spec.discount, A=A, max_depth=spec.max_depth,
                    tie_jitter=(
                        0.0
                        if (
                            spec.deterministic_tie_break
                            or spec.pallas_interpret
                        )
                        else mcts_stream.TIE_JITTER
                    ),
                    interpret=spec.pallas_interpret,
                )
            )
            new_node = sim + 1
            parent_hidden = hidden[parent, b_idx]
            value_logits, reward_logits, policy_logits, hidden_leaf = (
                recurrent_fn(parent_hidden, action)
            )
            leaf_value = support_to_scalar(value_logits, spec.support_size)
            leaf_reward = support_to_scalar(reward_logits, spec.support_size)
            prior_leaf = jax.nn.softmax(policy_logits, axis=-1)
            edges = mcts_stream.expand_packed(
                edges, parent, action, new_node, leaf_reward, prior_leaf, A
            )
            # Patch the leaf edge's freshly decoded reward into the captured
            # stats (it was 0 at descent time — unexpanded edge). All path
            # arrays stay DEPTH-MAJOR [D, B] end to end (each [D, B] ->
            # [B, D] relayout costs ~40 us on TPU).
            pr_dm, pv_dm, ps_dm = path_stats
            pr_dm = pr_dm.at[leaf_depth - 1, b_idx].set(leaf_reward)
            # NOTE (measured r5): bucketing this fold to the live max depth
            # via lax.switch over prefix widths {64,128,256,D} was tried and
            # is a LOSS (104 -> 81 env-steps/s): XLA conditionals copy the
            # ~105 MB packed slab at the branch boundary every simulation,
            # which dwarfs the scan/scatter savings. Full-width fold kept.
            tree, edges = mcts_stream.backprop_stream(
                tree, edges, path_n, path_a, leaf_depth, leaf_value,
                (pr_dm, pv_dm, ps_dm), spec,
                interpret=spec.pallas_interpret,
            )
            pending = (new_node, hidden_leaf)
            max_depth = jnp.maximum(max_depth, leaf_depth)
            return (tree, edges, hidden, pending, max_depth), None

        (tree, edges, hidden, pending, max_depth), _ = jax.lax.scan(
            stream_body,
            (tree, edges0, hidden, pending0, jnp.zeros((B,), jnp.int32)),
            jnp.arange(spec.num_simulations),
        )
        tree = mcts_stream.unpack_tree(tree, edges, A)
        return MCTSOutput(
            root_visit_counts=tree.children_visit[:, 0],
            root_value=tree.root_value(),
            root_predicted_value=root_predicted_value,
            max_tree_depth=max_depth,
            tree=tree,
            root_hidden=hidden0,
        )

    def sim_body(carry, sim):
        tree, hidden, pending, max_depth = carry
        key = jax.random.fold_in(rng, sim + 1)
        # A descent can go at most one edge below the deepest existing node.
        depth_bound = jnp.max(max_depth) + 1
        tree, hidden, pending, leaf_depth = _simulate_once(
            tree, hidden, pending, sim, key, spec, recurrent_fn, depth_bound
        )
        # max_tree_depth counts edges descended including the final edge to
        # the unexpanded child, matching reference current_tree_depth
        # (self_play.py:319-355).
        max_depth = jnp.maximum(max_depth, leaf_depth)
        return (tree, hidden, pending, max_depth), None

    (tree, hidden, pending, max_depth), _ = jax.lax.scan(
        sim_body,
        (tree, hidden, pending0, jnp.zeros((B,), jnp.int32)),
        jnp.arange(spec.num_simulations),
    )
    if spec.use_pallas:
        tree = _from_planar(tree)

    return MCTSOutput(
        root_visit_counts=tree.children_visit[:, 0],
        root_value=tree.root_value(),
        root_predicted_value=root_predicted_value,
        max_tree_depth=max_depth,
        tree=tree,
        root_hidden=hidden0,
    )


def init_tree(N, root_prior, legal_mask, to_play, root_reward):
    """Fresh Tree with the root (node 0) expanded (self_play.py:279-314)."""
    B, A = legal_mask.shape
    return Tree(
        children_index=jnp.full((B, N, A), -1, jnp.int32),
        children_prior=jnp.zeros((B, N, A), jnp.float32)
        .at[:, 0]
        .set(root_prior),
        children_visit=jnp.zeros((B, N, A), jnp.int32),
        children_vsum=jnp.zeros((B, N, A), jnp.float32),
        children_reward=jnp.zeros((B, N, A), jnp.float32),
        root_legal=legal_mask,
        root_visit=jnp.zeros((B,), jnp.int32),
        root_vsum=jnp.zeros((B,), jnp.float32),
        root_reward=root_reward,
        root_to_play=jnp.asarray(to_play, jnp.int32),
        min_value=jnp.full((B,), jnp.inf),
        max_value=jnp.full((B,), -jnp.inf),
    )


def select_action(rng, visit_counts, legal_mask, temperature):
    """Sample an action from root visit counts with temperature.

    Parity: reference self_play.py:222-245 — T=0 → argmax, T=inf → uniform
    over root children (legal actions), else visits^(1/T) distribution.
    `temperature` is a traced scalar (so the schedule changes without
    recompile) or a per-lane [B] vector (the folded-in greedy eval lane
    plays at temperature 0 inside the same batch).
    """
    visits = visit_counts.astype(jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)
    if temperature.ndim == visits.ndim - 1:
        temperature = temperature[..., None]  # [B] -> [B, 1] broadcast
    t_safe = jnp.where(
        (temperature <= 0) | ~jnp.isfinite(temperature), 1.0, temperature
    )
    powed = jnp.where(legal_mask, visits ** (1.0 / t_safe), 0.0)
    powed = powed / jnp.maximum(jnp.sum(powed, axis=-1, keepdims=True), 1e-30)
    uniform = legal_mask.astype(jnp.float32)
    uniform = uniform / jnp.maximum(jnp.sum(uniform, axis=-1, keepdims=True), 1e-30)
    greedy = jax.nn.one_hot(
        jnp.argmax(jnp.where(legal_mask, visits, -1.0), axis=-1),
        visits.shape[-1],
    )
    probs = jnp.where(
        temperature == 0,
        greedy,
        jnp.where(jnp.isinf(temperature), uniform, powed),
    )
    return jax.random.categorical(rng, jnp.log(probs + 1e-30), axis=-1)


def visit_policy(visit_counts):
    """Normalized visit distribution over the full action space.

    Parity: reference GameHistory.store_search_statistics (self_play.py:496-509).
    """
    v = visit_counts.astype(jnp.float32)
    return v / jnp.maximum(jnp.sum(v, axis=-1, keepdims=True), 1e-30)
