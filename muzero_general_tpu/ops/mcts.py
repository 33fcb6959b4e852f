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

    @classmethod
    def from_config(cls, config, batch_size=None):
        if len(config.players) > 2:
            raise NotImplementedError("More than two player mode not implemented.")
        use_pallas = resolve_fast_path_flag(
            getattr(config, "use_pallas_mcts", False), config
        )
        if use_pallas and batch_size is not None:
            from muzero_general_tpu.ops.mcts_pallas import choose_block

            use_pallas = (
                choose_block(
                    batch_size,
                    config.num_simulations + 1,
                    len(config.action_space),
                )
                is not None
            )
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
        )


class Tree(NamedTuple):
    """SoA tree storage, leading dims [B, N] with N = num_simulations + 1."""

    visit_count: jnp.ndarray  # [B, N] int32
    value_sum: jnp.ndarray  # [B, N] float32
    reward: jnp.ndarray  # [B, N] float32 (decoded scalar)
    to_play: jnp.ndarray  # [B, N] int32
    children_index: jnp.ndarray  # [B, N, A] int32, -1 = unexpanded edge
    children_prior: jnp.ndarray  # [B, N, A] float32
    hidden: jnp.ndarray  # [B, N, ...] network hidden states
    root_legal: jnp.ndarray  # [B, A] bool
    min_value: jnp.ndarray  # [B] MinMaxStats minimum
    max_value: jnp.ndarray  # [B] MinMaxStats maximum

    def node_value(self, b_idx, node):
        """Node.value(): value_sum/visit_count, 0 if unvisited (self_play.py:446-449)."""
        v = self.visit_count[b_idx, node]
        return jnp.where(v > 0, self.value_sum[b_idx, node] / jnp.maximum(v, 1), 0.0)


class MCTSOutput(NamedTuple):
    root_visit_counts: jnp.ndarray  # [B, A] int32
    root_value: jnp.ndarray  # [B]
    root_predicted_value: jnp.ndarray  # [B] network value at the root
    max_tree_depth: jnp.ndarray  # [B] int32
    tree: Tree


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


def _ucb_scores(tree: Tree, node, spec: SearchSpec):
    """Vectorized pUCT over all A child edges of `node` [B] (self_play.py:380-404)."""
    B = tree.visit_count.shape[0]
    b_idx = jnp.arange(B)
    parent_visit = tree.visit_count[b_idx, node].astype(jnp.float32)  # [B]
    child_idx = tree.children_index[b_idx, node]  # [B, A]
    exists = child_idx >= 0
    safe_idx = jnp.maximum(child_idx, 0)
    child_visit = jnp.where(exists, tree.visit_count[b_idx[:, None], safe_idx], 0)
    child_vsum = jnp.where(exists, tree.value_sum[b_idx[:, None], safe_idx], 0.0)
    child_reward = jnp.where(exists, tree.reward[b_idx[:, None], safe_idx], 0.0)
    child_value = jnp.where(
        child_visit > 0, child_vsum / jnp.maximum(child_visit, 1), 0.0
    )

    pb_c = (
        jnp.log((parent_visit + spec.pb_c_base + 1.0) / spec.pb_c_base)
        + spec.pb_c_init
    )
    pb_c = pb_c[:, None] * jnp.sqrt(parent_visit)[:, None] / (child_visit + 1.0)
    prior_score = pb_c * tree.children_prior[b_idx, node]

    sign = 1.0 if spec.num_players == 1 else -1.0
    q = child_reward + spec.discount * sign * child_value
    value_score = jnp.where(child_visit > 0, _normalize(tree, q), 0.0)

    scores = prior_score + value_score
    # At the root only legal actions are candidate children (self_play.py:296-308).
    at_root = (node == 0)[:, None]
    scores = jnp.where(at_root & ~tree.root_legal, -jnp.inf, scores)
    return scores


def _simulate_once(tree: Tree, sim, rng, spec: SearchSpec, recurrent_fn, root_to_play):
    """One simulation for all B trees: descend, expand node sim+1, backprop."""
    B = tree.visit_count.shape[0]
    b_idx = jnp.arange(B)
    new_node = sim + 1

    if spec.use_pallas:
        from muzero_general_tpu.ops import mcts_pallas

        seed = jax.random.randint(rng, (), 0, 2**31 - 1)
        parent, action, leaf_depth, path = mcts_pallas.descend(
            seed,
            tree.visit_count,
            tree.value_sum,
            tree.reward,
            tree.children_index,
            tree.children_prior,
            tree.root_legal,
            tree.min_value,
            tree.max_value,
            num_players=spec.num_players,
            pb_c_base=spec.pb_c_base,
            pb_c_init=spec.pb_c_init,
            discount=spec.discount,
            A=tree.root_legal.shape[1],
            max_depth=spec.max_depth,
            # Same zeroing rule as mcts_fused.FusedSpec.from_config: interpret
            # runs use deterministic lowest-index tie-break (see the
            # TIE_JITTER note in ops/mcts_pallas.py).
            tie_jitter=(
                0.0
                if (spec.deterministic_tie_break or spec.pallas_interpret)
                else mcts_pallas.TIE_JITTER
            ),
            interpret=spec.pallas_interpret,
        )
        path = path.at[b_idx, leaf_depth].set(new_node)
        vt_leaf = (root_to_play + leaf_depth) % spec.num_players
        return _expand_and_backprop(
            tree, sim, spec, recurrent_fn, parent, action, path, leaf_depth,
            vt_leaf,
        )

    # ---- Descent: follow max-UCB edges until an unexpanded edge ----------
    # path[b, t] = node visited at depth t (root = depth 0); -1 padding.
    path0 = jnp.full((B, spec.max_depth + 1), -1, jnp.int32).at[:, 0].set(0)

    def desc_cond(state):
        _, _, _, active, _, _ = state
        return jnp.any(active)

    def desc_body(state):
        current, depth, path, active, parent, action = state
        key = jax.random.fold_in(rng, jnp.max(depth) + 1)
        scores = _ucb_scores(tree, current, spec)
        if spec.deterministic_tie_break:
            sel = jnp.argmax(scores, axis=-1)
        else:
            sel = _random_argmax(key, scores)  # [B]
        child = tree.children_index[b_idx, current, sel]
        hits_leaf = active & (child < 0)
        parent = jnp.where(hits_leaf, current, parent)
        action = jnp.where(hits_leaf, sel, action)
        active = active & (child >= 0)
        current = jnp.where(active, child, current)
        depth = depth + active.astype(jnp.int32)
        path = path.at[b_idx, depth].set(jnp.where(active, current, path[b_idx, depth]))
        return current, depth, path, active, parent, action

    current0 = jnp.zeros((B,), jnp.int32)
    depth0 = jnp.zeros((B,), jnp.int32)
    parent0 = jnp.zeros((B,), jnp.int32)
    action0 = jnp.zeros((B,), jnp.int32)
    active0 = jnp.ones((B,), bool)
    _, depth, path, _, parent, action = jax.lax.while_loop(
        desc_cond, desc_body, (current0, depth0, path0, active0, parent0, action0)
    )
    # The new node sits one edge below the deepest recorded node.
    leaf_depth = depth + 1  # edges from root to the new node
    path = path.at[b_idx, leaf_depth].set(new_node)

    # virtual_to_play advances one player per edge (self_play.py:330-334).
    vt_leaf = (root_to_play + leaf_depth) % spec.num_players
    return _expand_and_backprop(
        tree, sim, spec, recurrent_fn, parent, action, path, leaf_depth, vt_leaf
    )


def _expand_and_backprop(
    tree: Tree, sim, spec: SearchSpec, recurrent_fn, parent, action, path,
    leaf_depth, vt_leaf,
):
    """Shared tail of one simulation: expand node sim+1, backpropagate."""
    B = tree.visit_count.shape[0]
    b_idx = jnp.arange(B)
    new_node = sim + 1

    # ---- Expansion: one batched recurrent inference ----------------------
    parent_hidden = tree.hidden[b_idx, parent]
    value_logits, reward_logits, policy_logits, hidden_leaf = recurrent_fn(
        parent_hidden, action
    )
    leaf_value = support_to_scalar(value_logits, spec.support_size)
    leaf_reward = support_to_scalar(reward_logits, spec.support_size)
    # Interior nodes expand over the FULL action space (self_play.py:345-351).
    prior_leaf = jax.nn.softmax(policy_logits, axis=-1)

    tree = tree._replace(
        reward=tree.reward.at[:, new_node].set(leaf_reward),
        to_play=tree.to_play.at[:, new_node].set(vt_leaf),
        children_prior=tree.children_prior.at[:, new_node].set(prior_leaf),
        children_index=tree.children_index.at[b_idx, parent, action].set(new_node),
        hidden=tree.hidden.at[:, new_node].set(hidden_leaf),
    )

    # ---- Backpropagation (self_play.py:406-430) --------------------------
    if spec.use_pallas:
        from muzero_general_tpu.ops import mcts_pallas

        visit, vsum, mn, mx = mcts_pallas.backprop(
            path, leaf_depth, leaf_value, vt_leaf, tree.to_play, tree.reward,
            tree.visit_count, tree.value_sum, tree.min_value, tree.max_value,
            num_players=spec.num_players, discount=spec.discount,
            interpret=spec.pallas_interpret,
        )
        tree = tree._replace(
            visit_count=visit, value_sum=vsum, min_value=mn, max_value=mx
        )
        return tree, leaf_depth

    # Walk leaf -> root with a while_loop that exits once every lane has
    # passed its root: iterations = max real path length over the batch,
    # not the static worst case (typical tree depth ≪ num_simulations).
    def backprop_cond(carry):
        _, _, t_rev = carry
        return jnp.any(leaf_depth - t_rev >= 0)

    def backprop_body(carry):
        tree, value, t_rev = carry
        t = leaf_depth - t_rev  # per-batch depth index, walks leaf -> root
        valid = t >= 0
        node = path[b_idx, jnp.maximum(t, 0)]

        node_to_play = tree.to_play[b_idx, node]
        same = node_to_play == vt_leaf
        if spec.num_players == 1:
            delta = value
        else:
            delta = jnp.where(same, value, -value)

        new_vsum = tree.value_sum.at[b_idx, node].add(
            jnp.where(valid, delta, 0.0)
        )
        new_visit = tree.visit_count.at[b_idx, node].add(valid.astype(jnp.int32))
        tree = tree._replace(value_sum=new_vsum, visit_count=new_visit)

        node_value = tree.node_value(b_idx, node)
        sign = 1.0 if spec.num_players == 1 else -1.0
        stat = tree.reward[b_idx, node] + spec.discount * sign * node_value
        tree = tree._replace(
            min_value=jnp.where(
                valid, jnp.minimum(tree.min_value, stat), tree.min_value
            ),
            max_value=jnp.where(
                valid, jnp.maximum(tree.max_value, stat), tree.max_value
            ),
        )

        if spec.num_players == 1:
            value_next = tree.reward[b_idx, node] + spec.discount * value
        else:
            value_next = (
                jnp.where(same, -tree.reward[b_idx, node], tree.reward[b_idx, node])
                + spec.discount * value
            )
        value = jnp.where(valid, value_next, value)
        return tree, value, t_rev + 1

    tree, _, _ = jax.lax.while_loop(
        backprop_cond, backprop_body, (tree, leaf_value, jnp.int32(0))
    )
    return tree, leaf_depth


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

    hidden_store = jnp.zeros((B, N) + hidden0.shape[1:], hidden0.dtype)
    hidden_store = hidden_store.at[:, 0].set(hidden0)

    tree = Tree(
        visit_count=jnp.zeros((B, N), jnp.int32),
        value_sum=jnp.zeros((B, N), jnp.float32),
        reward=jnp.zeros((B, N), jnp.float32).at[:, 0].set(root_reward),
        to_play=jnp.zeros((B, N), jnp.int32).at[:, 0].set(to_play),
        children_index=jnp.full((B, N, A), -1, jnp.int32),
        children_prior=jnp.zeros((B, N, A), jnp.float32).at[:, 0].set(prior),
        hidden=hidden_store,
        root_legal=legal_mask,
        min_value=jnp.full((B,), jnp.inf),
        max_value=jnp.full((B,), -jnp.inf),
    )

    def sim_body(carry, sim):
        tree, max_depth = carry
        key = jax.random.fold_in(rng, sim + 1)
        tree, leaf_depth = _simulate_once(
            tree, sim, key, spec, recurrent_fn, to_play
        )
        # max_tree_depth counts edges descended including the final edge to
        # the unexpanded child, matching reference current_tree_depth
        # (self_play.py:319-355).
        max_depth = jnp.maximum(max_depth, leaf_depth)
        return (tree, max_depth), None

    (tree, max_depth), _ = jax.lax.scan(
        sim_body,
        (tree, jnp.zeros((B,), jnp.int32)),
        jnp.arange(spec.num_simulations),
    )

    b_idx = jnp.arange(B)
    root_children = tree.children_index[:, 0, :]  # [B, A]
    exists = root_children >= 0
    root_visits = jnp.where(
        exists,
        tree.visit_count[b_idx[:, None], jnp.maximum(root_children, 0)],
        0,
    )
    root_value = tree.node_value(b_idx, jnp.zeros((B,), jnp.int32))

    return MCTSOutput(
        root_visit_counts=root_visits,
        root_value=root_value,
        root_predicted_value=root_predicted_value,
        max_tree_depth=max_depth,
        tree=tree,
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
