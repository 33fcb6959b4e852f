"""Pallas-fused MCTS phases: in-VMEM descend and backprop kernels.

The XLA search (ops/mcts.py) is bound by per-op sequencing overhead inside
its while/fori loops (~dozens of small gathers per tree level). These
kernels run the whole descent (root -> unexpanded edge) and the whole
backpropagation as ONE kernel launch each, with the tree arrays resident in
VMEM and the loop iterations costing VPU vector ops only.

Scope: tree sizes that fit VMEM — B*(N*(3+2A)+A) * 4 bytes ≲ a few MB
(true for all FC-net games; big-board games keep the XLA path). Semantics
match ops/mcts.py except tie-breaking: a tiny uniform jitter on the pUCT
scores replaces the categorical draw among exact ties — argmax over iid
jitter on equal scores is still a uniform choice among them
(reference self_play.py:371-377), while unequal scores are perturbed by
≤1e-5 of scale.

Used by SelfPlayDriver when `config.use_pallas_mcts` and shapes allow.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Uniform score jitter replacing the reference's categorical draw among exact
# ties (self_play.py:371-377): argmax over iid jitter on equal scores is still
# a uniform choice among them. SINGLE caveat shared by both Pallas paths
# (staged here, fused in ops/mcts_fused.py): interpret-mode runs zero the
# jitter and fall back to deterministic lowest-index tie-break, because the
# TPU PRNG primitives are only exercised on real hardware.
TIE_JITTER = 1e-5

# Selection matmuls (0/1 matrices) must not truncate the data operand: the
# MXU's default f32 precision runs bf16 passes, which loses ~8 mantissa bits
# of child priors/values and flips near-tie pUCT argmax decisions vs the XLA
# oracle (observed on-chip: 64% visit mismatch). HIGHEST = 6-pass bf16x3
# decomposition of both operands — exact for products against exact 1.0, so
# these gathers are bit-exact f32.
EXACT = jax.lax.Precision.HIGHEST


def _descend_kernel(
    seed_ref,  # [1] int32 (SMEM)
    visit_ref,  # [B, N] i32
    value_sum_ref,  # [B, N] f32
    reward_ref,  # [B, N] f32
    child_index_ref,  # [B, N*A] i32
    child_prior_ref,  # [B, N*A] f32
    root_legal_ref,  # [B, A] bool->i32
    min_ref,  # [B, 1] f32
    max_ref,  # [B, 1] f32
    parent_ref,  # out [B, 1] i32
    action_ref,  # out [B, 1] i32
    depth_ref,  # out [B, 1] i32  (edges to the new leaf)
    path_ref,  # out [B, D] i32  (path node at depth t; -1 padded)
    *,
    num_players: int,
    pb_c_base: float,
    pb_c_init: float,
    discount: float,
    A: int,
    max_depth: int,
    tie_jitter: float,
):
    B = visit_ref.shape[0]
    if tie_jitter > 0:  # PRNG only on the real TPU path (no interpret impl)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    visit = visit_ref[:]
    value_sum = value_sum_ref[:]
    reward = reward_ref[:]
    child_index = child_index_ref[:]  # [B, N*A]
    child_prior = child_prior_ref[:]
    legal = root_legal_ref[:] != 0  # [B, A]
    mn = min_ref[:]  # [B, 1]
    mx = max_ref[:]
    span_ok = mx > mn
    inv_span = 1.0 / jnp.maximum(mx - mn, 1e-30)

    sign = 1.0 if num_players == 1 else -1.0
    D = path_ref.shape[1]
    N = visit.shape[1]
    NA = N * A

    # Mosaic has no narrow gathers: per-row indexing is done with
    # iota-mask reductions, and "the A edges of node n" with a one-hot
    # masked matmul against a static [N*A, A] selection matrix.
    iota_NA = jax.lax.broadcasted_iota(jnp.int32, (B, NA), 1)
    sel_matrix = (
        jax.lax.broadcasted_iota(jnp.int32, (NA, A), 0) % A
        == jax.lax.broadcasted_iota(jnp.int32, (NA, A), 1)
    ).astype(jnp.float32)

    def row_gather(arr, idx_col):
        """arr [B, L], idx_col [B, 1] i32 -> [B, 1] (mask-reduce).

        All loop carriers stay 2D 32-bit: Mosaic cannot yield 1-bit or 1-D
        vectors from scf loops.
        """
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def take_edges(arr_f32, node_col):
        """arr [B, N*A] f32 -> [B, A]: the A edge entries of `node`."""
        mask = (iota_NA // A) == node_col
        return jnp.dot(
            jnp.where(mask, arr_f32, 0.0),
            sel_matrix,
            preferred_element_type=jnp.float32,
            precision=EXACT,
        )

    visit_f = visit.astype(jnp.float32)

    def body(state):
        current, depth, active, parent, action, path, t = state
        idx = take_edges(child_index.astype(jnp.float32), current)  # [B, A]
        exists = idx >= 0
        # Per-edge child stats, one mask-reduce per action slot (A is small
        # for VMEM-eligible games; big-A games use the XLA path).
        idx_cols = [
            jnp.maximum(idx[:, a : a + 1].astype(jnp.int32), 0)
            for a in range(A)
        ]
        cvis = jnp.concatenate(
            [row_gather(visit_f, c) for c in idx_cols], axis=1
        )
        cvsum = jnp.concatenate(
            [row_gather(value_sum, c) for c in idx_cols], axis=1
        )
        crew = jnp.concatenate(
            [row_gather(reward, c) for c in idx_cols], axis=1
        )
        cvis = jnp.where(exists, cvis, 0.0)
        cvsum = jnp.where(exists, cvsum, 0.0)
        crew = jnp.where(exists, crew, 0.0)
        cval = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)

        pvis = row_gather(visit_f, current)  # [B, 1]
        pb_c = (
            jnp.log((pvis + pb_c_base + 1.0) / pb_c_base) + pb_c_init
        ) * jnp.sqrt(pvis) / (cvis + 1.0)
        prior_score = pb_c * take_edges(child_prior, current)
        q = crew + discount * sign * cval
        qn = jnp.where(span_ok, (q - mn) * inv_span, q)
        score = prior_score + jnp.where(cvis > 0, qn, 0.0)
        score = jnp.where((current == 0) & ~legal, -jnp.inf, score)

        if tie_jitter > 0:
            bits = pltpu.prng_random_bits((B, A))
            score = score + bits.astype(jnp.float32) * (
                tie_jitter / 4.2949673e9
            )
        # First-index argmax, spelled out: Mosaic's jnp.argmax returns the
        # LAST max index on ties (XLA returns the first), which diverges from
        # the oracle at every exact tie — e.g. all root actions at sim 0,
        # where parent_visit=0 zeroes every pUCT score.
        m = jnp.max(score, axis=1, keepdims=True)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
        sel = jnp.min(jnp.where(score >= m, iota_a, A), axis=1, keepdims=True)

        child = row_gather(child_index, current * A + sel)
        hits = active * (child < 0).astype(jnp.int32)
        parent = jnp.where(hits == 1, current, parent)
        action = jnp.where(hits == 1, sel, action)
        active = active * (child >= 0).astype(jnp.int32)
        current = jnp.where(active == 1, child, current)
        depth = depth + active
        # record path[:, t+1] = current for still-active rows
        col = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1) == (t + 1)
        path = jnp.where(col & (active == 1), current, path)
        return current, depth, active, parent, action, path, t + 1

    def cond(state):
        _, _, active, _, _, _, t = state
        return jnp.logical_and(jnp.any(active == 1), t < max_depth - 1)

    col0 = jnp.zeros((B, 1), jnp.int32)
    one0 = jnp.ones((B, 1), jnp.int32)
    path0 = jnp.full((B, D), -1, jnp.int32)
    path0 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, D), 1) == 0, 0, path0
    )
    _, depth, _, parent, action, path, _ = jax.lax.while_loop(
        cond,
        body,
        (col0, col0, one0, col0, col0, path0, jnp.int32(0)),
    )
    parent_ref[:] = parent
    action_ref[:] = action
    depth_ref[:] = depth + 1  # leaf sits one edge below
    path_ref[:] = path


def _backprop_kernel(
    path_ref,  # [B, D] i32
    leaf_depth_ref,  # [B, 1] i32
    leaf_value_ref,  # [B, 1] f32
    vt_leaf_ref,  # [B, 1] i32
    to_play_ref,  # [B, N] i32
    reward_ref,  # [B, N] f32
    visit_in_ref,  # [B, N] i32  (aliased -> visit_out)
    vsum_in_ref,  # [B, N] f32  (aliased -> vsum_out)
    min_in_ref,  # [B, 1] f32  (aliased)
    max_in_ref,  # [B, 1] f32  (aliased)
    visit_out_ref,
    vsum_out_ref,
    min_out_ref,
    max_out_ref,
    *,
    num_players: int,
    discount: float,
):
    B, N = visit_in_ref.shape
    path = path_ref[:]
    leaf_depth = leaf_depth_ref[:]  # [B, 1]
    vt_leaf = vt_leaf_ref[:]  # [B, 1]
    to_play = to_play_ref[:]
    reward = reward_ref[:]
    sign = 1.0 if num_players == 1 else -1.0

    def row_gather(arr, idx_col):
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def body(state):
        visit, vsum, mn, mx, value, t_rev = state
        t = leaf_depth - t_rev  # [B, 1]
        valid = t >= 0  # [B, 1]
        node = row_gather(path, jnp.maximum(t, 0))  # [B, 1]
        node_oh = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1) == node
        ntp = row_gather(to_play, node)
        nrew = row_gather(reward, node)
        same = ntp == vt_leaf
        if num_players == 1:
            delta = value
        else:
            delta = jnp.where(same, value, -value)

        vsum = vsum + jnp.where(node_oh & valid, delta, 0.0)
        visit = visit + (node_oh & valid).astype(jnp.int32)

        nvis = row_gather(visit, node).astype(jnp.float32)
        nvsum = row_gather(vsum, node)
        nval = jnp.where(nvis > 0, nvsum / jnp.maximum(nvis, 1.0), 0.0)
        stat = nrew + discount * sign * nval
        mn = jnp.where(valid, jnp.minimum(mn, stat), mn)
        mx = jnp.where(valid, jnp.maximum(mx, stat), mx)

        if num_players == 1:
            vnext = nrew + discount * value
        else:
            vnext = jnp.where(same, -nrew, nrew) + discount * value
        value = jnp.where(valid, vnext, value)
        return visit, vsum, mn, mx, value, t_rev + 1

    def cond(state):
        *_, t_rev = state
        return jnp.any(leaf_depth - t_rev >= 0)

    visit, vsum, mn, mx, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            visit_in_ref[:],
            vsum_in_ref[:],
            min_in_ref[:],
            max_in_ref[:],
            leaf_value_ref[:],
            jnp.int32(0),
        ),
    )
    visit_out_ref[:] = visit
    vsum_out_ref[:] = vsum
    min_out_ref[:] = mn
    max_out_ref[:] = mx


def fits_vmem(B, N, A, budget_bytes=8 * 1024 * 1024):
    """Conservative VMEM budget check for the fused kernels.

    Counts lane-padded (multiples of 128) array footprints and a 2x factor
    for while-loop carry double-buffering; calibrated against the observed
    limit (B=1024, N=51, A=2 fits in 16MB VMEM; B=2048 does not).
    """

    def pad(x):
        return -(-x // 128) * 128

    tree_bytes = B * 4 * (pad(N) * 3 + pad(N * A) * 2 + pad(A) + pad(N + 1))
    return 2 * tree_bytes < budget_bytes


def choose_block(B, N, A):
    """Largest divisor block of B whose tree slice fits VMEM; None if none."""
    block = B
    while block >= 8:
        if fits_vmem(block, N, A):
            return block
        if block % 2:
            return None
        block //= 2
    return None


@functools.partial(
    jax.jit,
    static_argnames=("num_players", "pb_c_base", "pb_c_init", "discount",
                     "A", "max_depth", "tie_jitter", "interpret"),
)
def descend(seed, visit, value_sum, reward, children_index, children_prior,
            root_legal, min_value, max_value, *, num_players, pb_c_base,
            pb_c_init, discount, A, max_depth, tie_jitter=TIE_JITTER,
            interpret=False):
    """Fused descent. Returns (parent [B], action [B], leaf_depth [B],
    path [B, max_depth+1])."""
    B, N = visit.shape
    D = max_depth + 1
    # Grid over lane blocks: each program handles `block` trees in VMEM, so
    # total batch size is unbounded by the 16MB VMEM (blocks pipeline).
    block = choose_block(B, N, A) or B
    grid = B // block
    kernel = functools.partial(
        _descend_kernel,
        num_players=num_players, pb_c_base=pb_c_base, pb_c_init=pb_c_init,
        discount=discount, A=A, max_depth=D, tie_jitter=tie_jitter,
    )

    def bspec(cols):
        return pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    parent, action, depth, path = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, D), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(N),
            bspec(N),
            bspec(N),
            bspec(N * A),
            bspec(N * A),
            bspec(A),
            bspec(1),
            bspec(1),
        ],
        out_specs=(bspec(1), bspec(1), bspec(1), bspec(D)),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        visit,
        value_sum,
        reward,
        children_index.reshape(B, -1),
        children_prior.reshape(B, -1),
        root_legal.astype(jnp.int32),
        min_value[:, None],
        max_value[:, None],
    )
    return parent[:, 0], action[:, 0], depth[:, 0], path


@functools.partial(
    jax.jit, static_argnames=("num_players", "discount", "interpret")
)
def backprop(path, leaf_depth, leaf_value, vt_leaf, to_play, reward, visit,
             value_sum, min_value, max_value, *, num_players, discount,
             interpret=False):
    """Fused backprop. Returns updated (visit, value_sum, min, max)."""
    B, N = visit.shape
    D = path.shape[1]
    block = choose_block(B, N, 1) or B
    grid = B // block
    kernel = functools.partial(
        _backprop_kernel, num_players=num_players, discount=discount
    )

    def bspec(cols):
        return pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    visit2, vsum2, mn2, mx2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, N), jnp.int32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        in_specs=[
            bspec(D), bspec(1), bspec(1), bspec(1), bspec(N), bspec(N),
            bspec(N), bspec(N), bspec(1), bspec(1),
        ],
        out_specs=(bspec(N), bspec(N), bspec(1), bspec(1)),
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(
        path,
        leaf_depth[:, None],
        leaf_value[:, None],
        vt_leaf[:, None],
        to_play,
        reward,
        visit,
        value_sum,
        min_value[:, None],
        max_value[:, None],
    )
    return visit2, vsum2, mn2[:, 0], mx2[:, 0]
