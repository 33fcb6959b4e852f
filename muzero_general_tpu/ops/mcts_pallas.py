"""Pallas-fused MCTS phases: in-VMEM descend and backprop kernels.

The XLA search (ops/mcts.py) is bound by per-op sequencing overhead inside
its while/fori loops (~dozens of small gathers per tree level). These
kernels run the whole descent (root -> unexpanded edge) and the whole
backpropagation as ONE kernel launch each, with the tree arrays resident in
VMEM and the loop iterations costing VPU vector ops only.

Round 3: the kernels work on the EDGE-ARRAY tree (ops/mcts.py Tree — stats
on [B, N*A] edge slabs, to_play by depth parity, root scalars). Per descent
level this is 4 masked-matmul edge-row extractions and one flat gather,
replacing the old 2 extractions + 3*A per-action mask-reductions; the
backprop level is 3 flat gathers + 2 flat scatters and no to_play lookup.

Scope: tree sizes that fit VMEM (per-lane working set ~5 edge slabs of
N*A f32). Big-board games (gomoku: N*A ≈ 49k) keep the XLA path. Semantics
match ops/mcts.py except tie-breaking: a tiny uniform jitter on the pUCT
scores replaces the categorical draw among exact ties — argmax over iid
jitter on equal scores is still a uniform choice among them
(reference self_play.py:371-377), while unequal scores are perturbed by
≤1e-5 of scale.

Used by SelfPlayDriver when `config.use_pallas_mcts` and shapes allow.
"""

import functools
import os

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
    seed_ref,  # [2] int32 (SMEM): (PRNG seed, depth bound)
    e_child_ref,  # [B, N*A] i32
    e_prior_ref,  # [B, N*A] f32
    e_visit_ref,  # [B, N*A] i32
    e_vsum_ref,  # [B, N*A] f32
    e_reward_ref,  # [B, N*A] f32
    root_legal_ref,  # [B, A] bool->i32
    min_ref,  # [B, 1] f32
    max_ref,  # [B, 1] f32
    parent_ref,  # out [B, 1] i32
    action_ref,  # out [B, 1] i32
    depth_ref,  # out [B, 1] i32  (edges to the new leaf)
    path_n_ref,  # out [B, D] i32  (node at depth t; -1 padded)
    path_a_ref,  # out [B, D] i32  (action taken from depth t; 0 padded)
    *,
    num_players: int,
    pb_c_base: float,
    pb_c_init: float,
    discount: float,
    A: int,
    max_depth: int,
    tie_jitter: float,
):
    B = e_child_ref.shape[0]
    if tie_jitter > 0:  # PRNG only on the real TPU path (no interpret impl)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # Loop trip count: the tree after s simulations is at most
    # (max leaf depth so far) deep, so the next descent takes at most
    # bound = maxd + 1 selections (run_mcts threads it in). A scalar-only
    # loop condition avoids the vector->scalar sync per tree level that a
    # while(any(active)) costs — the dominant overhead of the round-2 kernel
    # (~30 ms per descend on a deep connect4 tree).
    bound = jnp.minimum(seed_ref[1], max_depth - 1)

    e_child = e_child_ref[:]  # [B, NA]
    e_prior = e_prior_ref[:]
    e_visit_f = e_visit_ref[:].astype(jnp.float32)
    e_vsum = e_vsum_ref[:]
    e_reward = e_reward_ref[:]
    legal = root_legal_ref[:] != 0  # [B, A]
    mn = min_ref[:]  # [B, 1]
    mx = max_ref[:]
    span_ok = mx > mn
    inv_span = 1.0 / jnp.maximum(mx - mn, 1e-30)

    sign = 1.0 if num_players == 1 else -1.0
    D = path_n_ref.shape[1]
    NA = e_child.shape[1]

    # Mosaic has no narrow gathers: flat [B, NA] entries are picked with
    # iota-mask reductions, and "the A edges of node n" with a one-hot
    # masked matmul against a static [N*A, A] selection matrix.
    iota_NA = jax.lax.broadcasted_iota(jnp.int32, (B, NA), 1)
    iota_A = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
    iota_D = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
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

    # Edge visits are integers bounded by the simulation count; when they
    # fit bf16's exact-integer range (< 2^8) the visit extraction can run at
    # DEFAULT (single-pass) precision with no loss. Value sums / rewards /
    # priors are arbitrary f32 and stay at HIGHEST.
    vis_precision = (
        jax.lax.Precision.DEFAULT if max_depth <= 256 else EXACT
    )

    def body(state):
        current, depth, active, parent, action, path_n, path_a, t = state
        # The A edge rows of `current`, all via one shared window mask.
        # Range compare, NOT division: // by a non-power-of-2 A expands to a
        # multi-op sequence per element on the VPU.
        base = current * A
        window = (iota_NA >= base) & (iota_NA < base + A)

        def take(arr_f32, precision=EXACT):
            return jnp.dot(
                jnp.where(window, arr_f32, 0.0),
                sel_matrix,
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        cvis = take(e_visit_f, vis_precision)  # [B, A]
        cvsum = take(e_vsum)
        crew = take(e_reward)
        cprior = take(e_prior)
        cval = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)
        # visit(node) = 1 + sum of its edge visits (root: 0 +) — see
        # ops/mcts.py parent_visit_from_edges.
        pvis = jnp.sum(cvis, axis=1, keepdims=True) + jnp.where(
            current != 0, 1.0, 0.0
        )

        pb_c = (
            jnp.log((pvis + pb_c_base + 1.0) / pb_c_base) + pb_c_init
        ) * jnp.sqrt(pvis) / (cvis + 1.0)
        prior_score = pb_c * cprior
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
        sel = jnp.min(jnp.where(score >= m, iota_A, A), axis=1, keepdims=True)

        # Active lanes all sit at depth t: record the action taken from it.
        path_a = jnp.where((iota_D == t) & (active == 1), sel, path_a)

        child = row_gather(e_child, current * A + sel)
        hits = active * (child < 0).astype(jnp.int32)
        parent = jnp.where(hits == 1, current, parent)
        action = jnp.where(hits == 1, sel, action)
        active = active * (child >= 0).astype(jnp.int32)
        current = jnp.where(active == 1, child, current)
        depth = depth + active
        # Still-active lanes moved to depth t+1: record the node there.
        path_n = jnp.where((iota_D == (t + 1)) & (active == 1), current, path_n)
        return current, depth, active, parent, action, path_n, path_a, t + 1

    def cond(state):
        *_rest, t = state
        return t < bound  # scalar-only condition; lanes self-mask via active

    col0 = jnp.zeros((B, 1), jnp.int32)
    one0 = jnp.ones((B, 1), jnp.int32)
    path_n0 = jnp.where(iota_D == 0, 0, jnp.full((B, D), -1, jnp.int32))
    path_a0 = jnp.zeros((B, D), jnp.int32)
    _, depth, active, parent, action, path_n, path_a, _ = jax.lax.while_loop(
        cond,
        body,
        (col0, col0, one0, col0, col0, path_n0, path_a0, jnp.int32(0)),
    )
    parent_ref[:] = parent
    action_ref[:] = action
    # A lane still active after `bound` iterations never reached an
    # unexpanded edge — the caller's depth_bound contract was violated.
    # Mark it with depth = -1 so the corruption is detectable instead of
    # silently overwriting root edge 0 (ADVICE r3).
    depth_ref[:] = jnp.where(active == 1, -1, depth + 1)
    path_n_ref[:] = path_n
    path_a_ref[:] = path_a


def _descend_kernel_planar(
    seed_ref,  # [2] int32 (SMEM): (PRNG seed, depth bound)
    e_child_ref,  # [B, A, N] i32   (planar per-action slabs)
    e_prior_ref,  # [B, A, N] f32
    e_visit_ref,  # [B, A, N] i32   (aliased -> e_visit_out when mark_visits)
    e_vsum_ref,  # [B, A, N] f32
    e_reward_ref,  # [B, A, N] f32
    root_legal_ref,  # [B, A] bool->i32
    min_ref,  # [B, 1] f32
    max_ref,  # [B, 1] f32
    parent_ref,  # out [B, 1] i32
    action_ref,  # out [B, 1] i32
    depth_ref,  # out [B, 1] i32  (edges to the new leaf)
    path_n_ref,  # out [B, D] i32  (node at depth t; -1 padded)
    path_a_ref,  # out [B, D] i32  (action taken from depth t; 0 padded)
    *rest,  # (e_visit_out_ref,) when mark_visits
    num_players: int,
    pb_c_base: float,
    pb_c_init: float,
    discount: float,
    A: int,
    max_depth: int,
    tie_jitter: float,
    mark_visits: bool = False,
):
    """Planar-slab descend: stats laid out [B, A, N] (one [B, N] plane per
    action) instead of the flat [B, N*A] edge slab.

    Per tree level the node-row extraction becomes ONE [B, A, N] one-hot
    mask + multiply + lane-reduce per stat (pure VPU, exact — no masked
    matmul): the node-major kernel's 4 HIGHEST-precision [B, N*A] x
    [N*A, A] MXU matmuls (6 bf16 passes each, output lanes padded A->128)
    are gone, which is where ~all of its per-level time went (descend was
    27 of 74 ms per 200-sim connect4 move in the r3 profile).

    mark_visits (multi-leaf rounds): every traversed edge, including the
    final unexpanded one, gets +1 visit in-kernel (aliased slab). Bumping
    the edge just taken cannot change the remainder of the same descent (a
    descent never revisits a node), so this is EXACTLY the reference
    virtual-visit marking applied after the selection — without the XLA
    scatter that cost 446 us per mark at connect4 size (r4 trace). The
    root's scalar visit counter is incremented by the caller.
    """
    B = e_child_ref.shape[0]
    if tie_jitter > 0:  # PRNG only on the real TPU path (no interpret impl)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bound = jnp.minimum(seed_ref[1], max_depth - 1)

    e_child = e_child_ref[:].astype(jnp.float32)  # [B, A, N]; N < 2^24 exact
    e_prior = e_prior_ref[:]
    e_visit_f = e_visit_ref[:].astype(jnp.float32)
    e_vsum = e_vsum_ref[:]
    e_reward = e_reward_ref[:]
    legal = root_legal_ref[:] != 0  # [B, A]
    mn = min_ref[:]  # [B, 1]
    mx = max_ref[:]
    span_ok = mx > mn
    inv_span = 1.0 / jnp.maximum(mx - mn, 1e-30)

    sign = 1.0 if num_players == 1 else -1.0
    D = path_n_ref.shape[1]
    N = e_child.shape[2]

    iota_N3 = jax.lax.broadcasted_iota(jnp.int32, (B, A, N), 2)
    iota_A = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
    iota_D = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)

    def row_gather(arr, idx_col):
        """arr [B, L], idx_col [B, 1] i32 -> [B, 1] (mask-reduce)."""
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def body(state):
        # The visit slab is loop-carried ONLY when marking (the K=1 path
        # keeps it a loop-invariant closure value — no extra carry buffers).
        if mark_visits:
            (current, depth, active, parent, action, path_n, path_a,
             e_visit_c, t) = state
        else:
            current, depth, active, parent, action, path_n, path_a, t = state
            e_visit_c = e_visit_f
        # One-hot over the node axis, shared by every stat extraction.
        mask = iota_N3 == current[:, :, None]  # [B, A, N] (broadcast B,1,1)

        def take(arr):
            return jnp.sum(jnp.where(mask, arr, 0.0), axis=2)  # [B, A]

        cvis = take(e_visit_c)
        cvsum = take(e_vsum)
        crew = take(e_reward)
        cprior = take(e_prior)
        cchild = take(e_child)  # [B, A] f32 (unexpanded edge = -1)
        cval = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)
        pvis = jnp.sum(cvis, axis=1, keepdims=True) + jnp.where(
            current != 0, 1.0, 0.0
        )

        pb_c = (
            jnp.log((pvis + pb_c_base + 1.0) / pb_c_base) + pb_c_init
        ) * jnp.sqrt(pvis) / (cvis + 1.0)
        prior_score = pb_c * cprior
        q = crew + discount * sign * cval
        qn = jnp.where(span_ok, (q - mn) * inv_span, q)
        score = prior_score + jnp.where(cvis > 0, qn, 0.0)
        score = jnp.where((current == 0) & ~legal, -jnp.inf, score)

        if tie_jitter > 0:
            bits = pltpu.prng_random_bits((B, A))
            score = score + bits.astype(jnp.float32) * (
                tie_jitter / 4.2949673e9
            )
        # First-index argmax (Mosaic argmax picks the LAST max on ties).
        m = jnp.max(score, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(score >= m, iota_A, A), axis=1, keepdims=True)

        path_a = jnp.where((iota_D == t) & (active == 1), sel, path_a)

        if mark_visits:
            # +1 on the selected edge of every still-active lane (the edge
            # one-hot = node mask AND action one-hot, float-exact adds).
            # f32 casts BEFORE the minor-dim inserts: Mosaic only reshapes
            # 32-bit vectors into new minor dims (i1 reshape is rejected).
            sel_f = (iota_A == sel).astype(jnp.float32)  # [B, A]
            act_f = active.astype(jnp.float32)  # [B, 1]
            e_visit_c = e_visit_c + jnp.where(
                mask, sel_f[:, :, None] * act_f[:, :, None], 0.0
            )

        child = row_gather(cchild, sel).astype(jnp.int32)  # [B, 1]
        hits = active * (child < 0).astype(jnp.int32)
        parent = jnp.where(hits == 1, current, parent)
        action = jnp.where(hits == 1, sel, action)
        active = active * (child >= 0).astype(jnp.int32)
        current = jnp.where(active == 1, child, current)
        depth = depth + active
        path_n = jnp.where((iota_D == (t + 1)) & (active == 1), current, path_n)
        if mark_visits:
            return (current, depth, active, parent, action, path_n, path_a,
                    e_visit_c, t + 1)
        return current, depth, active, parent, action, path_n, path_a, t + 1

    def cond(state):
        *_rest, t = state
        return t < bound  # scalar-only condition; lanes self-mask via active

    col0 = jnp.zeros((B, 1), jnp.int32)
    one0 = jnp.ones((B, 1), jnp.int32)
    path_n0 = jnp.where(iota_D == 0, 0, jnp.full((B, D), -1, jnp.int32))
    path_a0 = jnp.zeros((B, D), jnp.int32)
    init = (col0, col0, one0, col0, col0, path_n0, path_a0)
    if mark_visits:
        out = jax.lax.while_loop(
            cond, body, init + (e_visit_f, jnp.int32(0))
        )
        (_, depth, active, parent, action, path_n, path_a, e_visit_end,
         _) = out
        rest[0][:] = e_visit_end.astype(jnp.int32)
    else:
        out = jax.lax.while_loop(cond, body, init + (jnp.int32(0),))
        _, depth, active, parent, action, path_n, path_a, _ = out
    parent_ref[:] = parent
    action_ref[:] = action
    # Truncated-lane marking: see _descend_kernel.
    depth_ref[:] = jnp.where(active == 1, -1, depth + 1)
    path_n_ref[:] = path_n
    path_a_ref[:] = path_a


def _backprop_kernel(
    bound_ref,  # [1] i32 (SMEM): max leaf depth over the whole batch
    path_n_ref,  # [B, D] i32
    path_a_ref,  # [B, D] i32
    leaf_depth_ref,  # [B, 1] i32
    leaf_value_ref,  # [B, 1] f32
    e_reward_ref,  # [B, N*A] f32
    root_reward_ref,  # [B, 1] f32
    e_visit_in_ref,  # [B, N*A] i32  (aliased -> e_visit_out)
    e_vsum_in_ref,  # [B, N*A] f32  (aliased -> e_vsum_out)
    root_visit_in_ref,  # [B, 1] i32  (aliased)
    root_vsum_in_ref,  # [B, 1] f32  (aliased)
    min_in_ref,  # [B, 1] f32  (aliased)
    max_in_ref,  # [B, 1] f32  (aliased)
    e_visit_out_ref,
    e_vsum_out_ref,
    root_visit_out_ref,
    root_vsum_out_ref,
    min_out_ref,
    max_out_ref,
    *,
    num_players: int,
    discount: float,
    stride_n: int,
    stride_a: int,
    pre_marked: bool = False,
):
    """Flat-slab backprop; edge (node, action) sits at flat index
    node*stride_n + action*stride_a — (A, 1) for the node-major [B, N*A]
    layout, (1, N) for the planar action-major [B, A*N] layout.

    pre_marked (multi-leaf rounds): visit counts along the path and at the
    root were already incremented by in-descend virtual marking — only
    value sums are folded in, and the gathered counts are taken as the
    post-update denominators."""
    B, NA = e_visit_in_ref.shape
    path_n = path_n_ref[:]
    path_a = path_a_ref[:]
    leaf_depth = leaf_depth_ref[:]  # [B, 1]
    e_reward = e_reward_ref[:]
    root_reward = root_reward_ref[:]
    sign = 1.0 if num_players == 1 else -1.0
    iota_NA = jax.lax.broadcasted_iota(jnp.int32, (B, NA), 1)

    def row_gather(arr, idx_col):
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def body(state):
        e_visit, e_vsum, rvis, rvsum, mn, mx, value, t_rev = state
        t = leaf_depth - t_rev  # [B, 1]
        valid = t >= 0
        at_root = valid & (t == 0)
        on_edge = valid & (t >= 1)
        # node_to_play == vt_leaf ⟺ t ≡ leaf_depth (mod players); t_rev is
        # shared by every lane, so the sign is a scalar (ops/mcts.py
        # backprop_body) — the reference's per-node to_play comparison
        # (self_play.py:406-430) reduced to depth parity.
        if num_players == 1:
            sgn = 1.0
        else:
            sgn = (1 - 2 * jnp.bitwise_and(t_rev, 1)).astype(jnp.float32)
        delta = value * sgn  # [B, 1]

        # The node's stats are its incoming edge's:
        # (path_n[t-1], path_a[t-1]); the root keeps explicit scalars.
        en = row_gather(path_n, jnp.maximum(t - 1, 0))
        ea = row_gather(path_a, jnp.maximum(t - 1, 0))
        eidx = en * stride_n + ea * stride_a
        gmask = iota_NA == eidx
        ev_old = jnp.sum(
            jnp.where(gmask, e_visit.astype(jnp.float32), 0.0),
            axis=1, keepdims=True,
        )
        es_old = jnp.sum(jnp.where(gmask, e_vsum, 0.0), axis=1, keepdims=True)
        erew = jnp.sum(jnp.where(gmask, e_reward, 0.0), axis=1, keepdims=True)

        emask = gmask & on_edge
        e_vsum = e_vsum + jnp.where(emask, delta, 0.0)
        rvsum = rvsum + jnp.where(at_root, delta, 0.0)
        if not pre_marked:
            e_visit = e_visit + emask.astype(jnp.int32)
            rvis = rvis + at_root.astype(jnp.int32)

        nval = jnp.where(
            at_root,
            rvsum / jnp.maximum(rvis, 1).astype(jnp.float32),
            (es_old + delta)
            / (jnp.maximum(ev_old, 1.0) if pre_marked else ev_old + 1.0),
        )
        nrew = jnp.where(at_root, root_reward, erew)
        stat = nrew + discount * sign * nval
        mn = jnp.where(valid, jnp.minimum(mn, stat), mn)
        mx = jnp.where(valid, jnp.maximum(mx, stat), mx)

        if num_players == 1:
            vnext = nrew + discount * value
        else:
            # where(same, -nrew, nrew) == -sgn * nrew
            vnext = -sgn * nrew + discount * value
        value = jnp.where(valid, vnext, value)
        return e_visit, e_vsum, rvis, rvsum, mn, mx, value, t_rev + 1

    # Scalar-only loop condition (XLA computes max(leaf_depth) once and
    # passes it in SMEM): while(any(...)) would sync the scalar unit on the
    # vector pipeline at every level — see the descend kernel's bound note.
    bound = bound_ref[0]

    def cond(state):
        *_, t_rev = state
        return t_rev <= bound

    e_visit, e_vsum, rvis, rvsum, mn, mx, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            e_visit_in_ref[:],
            e_vsum_in_ref[:],
            root_visit_in_ref[:],
            root_vsum_in_ref[:],
            min_in_ref[:],
            max_in_ref[:],
            leaf_value_ref[:],
            jnp.int32(0),
        ),
    )
    e_visit_out_ref[:] = e_visit
    e_vsum_out_ref[:] = e_vsum
    root_visit_out_ref[:] = rvis
    root_vsum_out_ref[:] = rvsum
    min_out_ref[:] = mn
    max_out_ref[:] = mx


# Default per-kernel VMEM budget for choosing the lane block: 12MB of the
# 16MB scoped VMEM. Calibrated r4 on-chip: at connect4 size (N=201, A=7)
# the planar descend kernel's Mosaic-reported stack is 10.2MB at block 128
# (runs; +11% over block 64) and 20.3MB at block 256 (VMEM OOM), so the
# conservative formulas below sit within ~1.3x of the real footprint.
# Overridable per-call via MUZERO_PALLAS_VMEM_BUDGET (bytes) — read at CALL
# time inside fits_vmem so setting the env var after import is honored
# (ADVICE r3).
DEFAULT_VMEM_BUDGET = 12 * 1024 * 1024


def fits_vmem(B, N, A, budget_bytes=None):
    """Conservative VMEM budget check for the fused kernels.

    Counts lane-padded (multiples of 128) array footprints and a 2x factor
    for while-loop carry double-buffering, plus the block-size-independent
    [N*A, A] selection matrix; calibrated with the same methodology as round
    1 (observed: B=1024, N=51, A=2 fits in 16MB VMEM; B=2048 does not).
    The descend kernel is the high-water mark: 5 edge slabs + legal + 2
    paths + small columns.
    """

    def pad(x):
        return -(-x // 128) * 128

    def pad8(x):
        return -(-x // 8) * 8

    if budget_bytes is None:
        budget_bytes = int(
            os.environ.get("MUZERO_PALLAS_VMEM_BUDGET", DEFAULT_VMEM_BUDGET)
        )
    per = B * 4 * (pad(N * A) * 5 + pad(A) + pad(N + 1) * 2 + 8 * pad(1))
    fixed = 4 * pad8(N * A) * pad(A)  # selection matrix
    return 2 * per + fixed < budget_bytes


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
def descend(seed, depth_bound, children_index, children_prior, children_visit,
            children_vsum, children_reward, root_legal, min_value, max_value,
            *, num_players, pb_c_base, pb_c_init, discount, A, max_depth,
            tie_jitter=TIE_JITTER, interpret=False):
    """Fused descent. Returns (parent [B], action [B], leaf_depth [B],
    path_nodes [B, max_depth+1], path_actions [B, max_depth+1]).

    depth_bound: scalar i32 >= the deepest possible descent (max leaf depth
    of all previous simulations + 1); the kernel loops exactly that many
    levels with inactive lanes masked, avoiding a per-level vector sync.
    """
    B, N = children_index.shape[:2]
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

    parent, action, depth, path_n, path_a = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, D), jnp.int32),
            jax.ShapeDtypeStruct((B, D), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(N * A),
            bspec(N * A),
            bspec(N * A),
            bspec(N * A),
            bspec(N * A),
            bspec(A),
            bspec(1),
            bspec(1),
        ],
        out_specs=(bspec(1), bspec(1), bspec(1), bspec(D), bspec(D)),
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(depth_bound, jnp.int32)]),
        children_index.reshape(B, -1),
        children_prior.reshape(B, -1),
        children_visit.reshape(B, -1),
        children_vsum.reshape(B, -1),
        children_reward.reshape(B, -1),
        root_legal.astype(jnp.int32),
        min_value[:, None],
        max_value[:, None],
    )
    return parent[:, 0], action[:, 0], depth[:, 0], path_n, path_a


def fits_vmem_planar(B, N, A, budget_bytes=None):
    """VMEM budget check for the planar descend kernel.

    [B, A, N] slabs pad to B * pad8(A) * pad128(N) f32 each; 5 stat slabs
    stay resident for the whole kernel plus ~3 slab-sized temporaries
    (one-hot mask + masked operand + iota). The small 2-D arrays (paths,
    legal, columns) pad over [pad8(B), pad128(cols)].
    """

    def pad(x):
        return -(-x // 128) * 128

    def pad8(x):
        return -(-x // 8) * 8

    if budget_bytes is None:
        budget_bytes = int(
            os.environ.get("MUZERO_PALLAS_VMEM_BUDGET", DEFAULT_VMEM_BUDGET)
        )
    slab = pad8(A) * pad(N)
    per = B * 4 * slab * 8  # 5 resident + ~3 temporaries
    small = 4 * pad8(B) * (2 * pad(A) + 4 * pad(N + 1) + 8 * pad(1))
    return per + small < budget_bytes


def choose_block_planar(B, N, A):
    """Largest divisor block of B whose planar working set fits VMEM."""
    block = B
    while block >= 8:
        if fits_vmem_planar(block, N, A):
            return block
        if block % 2:
            return None
        block //= 2
    return None


def fits_vmem_backprop(B, N, A, budget_bytes=None):
    """VMEM check for the backprop kernel ALONE (big-board games: gomoku's
    N*A ~ 49k rejects the descend kernels, but backprop carries only
    3 flat slabs — visit/vsum doubled as loop carries, reward resident —
    plus 2 path arrays, so it still fits at small lane blocks)."""

    def pad(x):
        return -(-x // 128) * 128

    def pad8(x):
        return -(-x // 8) * 8

    if budget_bytes is None:
        budget_bytes = int(
            os.environ.get("MUZERO_PALLAS_VMEM_BUDGET", DEFAULT_VMEM_BUDGET)
        )
    per = B * 4 * (5 * pad(N * A) + 2 * pad(N + 1) + 8 * pad(1))
    return per + 4 * pad8(B) * pad(N + 1) < budget_bytes


def choose_block_backprop(B, N, A):
    """Largest divisor block of B whose backprop working set fits VMEM."""
    block = B
    while block >= 8:
        if fits_vmem_backprop(block, N, A):
            return block
        if block % 2:
            return None
        block //= 2
    return None


@functools.partial(
    jax.jit,
    static_argnames=("num_players", "pb_c_base", "pb_c_init", "discount",
                     "A", "max_depth", "tie_jitter", "interpret",
                     "mark_visits"),
)
def descend_planar(seed, depth_bound, children_index, children_prior,
                   children_visit, children_vsum, children_reward, root_legal,
                   min_value, max_value, *, num_players, pb_c_base, pb_c_init,
                   discount, A, max_depth, tie_jitter=TIE_JITTER,
                   interpret=False, mark_visits=False):
    """Planar-slab fused descent: children_* are [B, A, N] action-major
    slabs. Same contract/outputs as descend(); with mark_visits=True the
    return gains a 6th element — children_visit with +1 on every traversed
    edge (virtual-visit marking for multi-leaf rounds, slab aliased
    in-place)."""
    B, A_, N = children_index.shape
    assert A_ == A
    D = max_depth + 1
    block = choose_block_planar(B, N, A) or B
    grid = B // block
    kernel = functools.partial(
        _descend_kernel_planar,
        num_players=num_players, pb_c_base=pb_c_base, pb_c_init=pb_c_init,
        discount=discount, A=A, max_depth=D, tie_jitter=tie_jitter,
        mark_visits=mark_visits,
    )

    def bspec(cols):
        return pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def bspec3():
        return pl.BlockSpec(
            (block, A, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, D), jnp.int32),
        jax.ShapeDtypeStruct((B, D), jnp.int32),
    ]
    out_specs = [bspec(1), bspec(1), bspec(1), bspec(D), bspec(D)]
    aliases = {}
    if mark_visits:
        out_shape.append(jax.ShapeDtypeStruct((B, A, N), jnp.int32))
        out_specs.append(bspec3())
        aliases = {3: 5}  # children_visit operand -> marked-visit output

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=tuple(out_shape),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec3(), bspec3(), bspec3(), bspec3(), bspec3(),
            bspec(A), bspec(1), bspec(1),
        ],
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(depth_bound, jnp.int32)]),
        children_index,
        children_prior,
        children_visit,
        children_vsum,
        children_reward,
        root_legal.astype(jnp.int32),
        min_value[:, None],
        max_value[:, None],
    )
    parent, action, depth, path_n, path_a = outs[:5]
    ret = (parent[:, 0], action[:, 0], depth[:, 0], path_n, path_a)
    if mark_visits:
        ret = ret + (outs[5],)
    return ret


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_players", "discount", "interpret", "planar", "pre_marked"
    ),
)
def backprop(path_nodes, path_actions, leaf_depth, leaf_value,
             children_visit, children_vsum, children_reward,
             root_visit, root_vsum, root_reward, min_value, max_value, *,
             num_players, discount, interpret=False, planar=False,
             pre_marked=False):
    """Fused backprop. Returns updated (children_visit, children_vsum,
    root_visit, root_vsum, min, max).

    planar: the children_* arrays are [B, A, N] action-major slabs (the
    planar descend layout); outputs keep that layout."""
    if planar:
        B, A, N = children_visit.shape
        strides = {"stride_n": 1, "stride_a": N}
    else:
        B, N, A = children_visit.shape
        strides = {"stride_n": A, "stride_a": 1}
    D = path_nodes.shape[1]
    block = choose_block_backprop(B, N, A) or B
    grid = B // block
    kernel = functools.partial(
        _backprop_kernel, num_players=num_players, discount=discount,
        pre_marked=pre_marked, **strides
    )

    def bspec(cols):
        return pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    evis2, evsum2, rvis2, rvsum2, mn2, mx2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, N * A), jnp.int32),
            jax.ShapeDtypeStruct((B, N * A), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(D), bspec(D), bspec(1), bspec(1), bspec(N * A), bspec(1),
            bspec(N * A), bspec(N * A), bspec(1), bspec(1), bspec(1),
            bspec(1),
        ],
        out_specs=(
            bspec(N * A), bspec(N * A), bspec(1), bspec(1), bspec(1),
            bspec(1),
        ),
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3, 11: 4, 12: 5},
        interpret=interpret,
    )(
        jnp.max(leaf_depth)[None],
        path_nodes,
        path_actions,
        leaf_depth[:, None],
        leaf_value[:, None],
        children_reward.reshape(B, -1),
        root_reward[:, None],
        children_visit.reshape(B, -1),
        children_vsum.reshape(B, -1),
        root_visit[:, None],
        root_vsum[:, None],
        min_value[:, None],
        max_value[:, None],
    )
    return (
        evis2.reshape(children_visit.shape),
        evsum2.reshape(children_visit.shape),
        rvis2[:, 0],
        rvsum2[:, 0],
        mn2[:, 0],
        mx2[:, 0],
    )
