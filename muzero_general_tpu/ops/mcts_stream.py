"""HBM-streaming MCTS descend for big-board games (gomoku class).

The planar VMEM kernels (ops/mcts_pallas.py) require the whole edge tree
resident in VMEM — impossible at gomoku scale (N*A ~ 49k edges/lane, ~66 MB
of slabs). The XLA staged descent instead pays ~18 us of op-issue per tree
LEVEL, and fresh-net 400-sim gomoku trees degenerate into ~100+-level lines
(RESULTS r4), so one move costs seconds.

This kernel keeps the tree in HBM as ONE packed slab edges[B, N, S, A]
(planes: 0=visit, 1=vsum, 2=reward, 3=prior, 4=child index as f32) and runs
the whole descent in a single launch: per tree level it issues B scattered
row DMAs (edges[b, cur_b] -> VMEM), computes pUCT on the [B, S, A] rows,
argmaxes, and ships the new per-lane node indices VMEM->SMEM for the next
level's DMA offsets. Measured on-chip (tools/stream_probe.py): ~1.5 us per
level marginal for B=64 — ~12x below the staged path's op-issue cost.

The selected edge's (reward, visit, vsum) are captured per level
(capture_path_stats semantics) so the XLA backprop fold needs no slab
gathers at any depth.

Semantics match ops/mcts.py's descent except tie-breaking, which uses the
same PRNG score jitter as the other Pallas kernels (ops/mcts_pallas.py
TIE_JITTER note); interpret runs zero the jitter (deterministic
lowest-index tie-break). Reference: self_play.py:319-404.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muzero_general_tpu.ops.mcts_pallas import TIE_JITTER

# Packed-slab stat planes (S axis).
P_VISIT, P_VSUM, P_REWARD, P_PRIOR, P_CHILD = 0, 1, 2, 3, 4
S_PLANES = 8  # padded plane count (sublane-friendly)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _descend_stream_kernel(
    seed_ref,  # [2] i32 (SMEM): (PRNG seed, depth bound)
    edges_ref,  # [B, N, S, A_pad] f32 (ANY/HBM — streamed)
    root_legal_ref,  # [B, A_pad] i32
    min_ref,  # [B, 1] f32
    max_ref,  # [B, 1] f32
    parent_ref,  # out [B, 1] i32
    action_ref,  # out [B, 1] i32
    depth_ref,  # out [B, 1] i32
    path_n_ref,  # out [D, B] i32 (depth-major: dynamic per-level stores
    #              index the SUBLANE dim — Mosaic rejects dynamic lane-dim
    #              offsets that are not 128-aligned)
    path_a_ref,  # out [D, B] i32
    path_r_ref,  # out [D, B] f32  captured edge reward
    path_v_ref,  # out [D, B] f32  captured edge visit
    path_s_ref,  # out [D, B] f32  captured edge vsum
    row_vmem,  # scratch [B, 1, S, A_pad] f32
    nxt_vmem,  # scratch [1, B] i32
    cur_smem,  # scratch [1, B] i32
    copy_sems,  # DMA sems [B]
    idx_sem,  # DMA sem
    *,
    num_players: int,
    pb_c_base: float,
    pb_c_init: float,
    discount: float,
    A: int,
    tie_jitter: float,
):
    B = root_legal_ref.shape[0]
    A_pad = root_legal_ref.shape[1]
    D = path_n_ref.shape[0]
    if tie_jitter > 0:  # PRNG only on the real TPU path (no interpret impl)
        pltpu.prng_seed(seed_ref[0])
    bound = jnp.minimum(seed_ref[1], D - 1)

    legal = root_legal_ref[:] != 0  # [B, A_pad] (padding columns are 0)
    mn = min_ref[:]
    mx = max_ref[:]
    span_ok = mx > mn
    inv_span = 1.0 / jnp.maximum(mx - mn, 1e-30)
    sign = 1.0 if num_players == 1 else -1.0

    iota_A = jax.lax.broadcasted_iota(jnp.int32, (B, A_pad), 1)
    iota_Dm = jax.lax.broadcasted_iota(jnp.int32, (D, B), 0)
    pad_col = iota_A >= A  # padded action columns: never selectable

    for b in range(B):
        cur_smem[0, b] = 0  # every descent starts at the root

    def row_gather(arr, idx_col):
        """arr [B, L], idx_col [B, 1] i32 -> [B, 1] (mask-reduce)."""
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def body(state):
        # Path entries are stored straight into the OUTPUT refs, one [B, 1]
        # column per level — [B, D]-wide loop carries would rewrite five
        # whole slabs every level (measured the dominant in-kernel cost).
        current, depth, active, parent, action, t = state

        # ---- stream this level's rows: edges[b, current_b] --------------
        # NOTE (measured r5): guarding each lane's DMA behind
        # `@pl.when(active)` to skip finished lanes is a LOSS (the 64
        # scalar branches per level cost more than the skipped ~4 KB DMAs
        # and break the issue pipeline); unconditional chains kept.
        for b in range(B):
            pltpu.make_async_copy(
                edges_ref.at[b, pl.ds(cur_smem[0, b], 1)],
                row_vmem.at[b],
                copy_sems.at[b],
            ).start()
        for b in range(B):
            pltpu.make_async_copy(
                edges_ref.at[b, pl.ds(cur_smem[0, b], 1)],
                row_vmem.at[b],
                copy_sems.at[b],
            ).wait()
        rows = row_vmem[:, 0]  # [B, S, A_pad]
        cvis = rows[:, P_VISIT]
        cvsum = rows[:, P_VSUM]
        crew = rows[:, P_REWARD]
        cprior = rows[:, P_PRIOR]
        cchild = rows[:, P_CHILD]

        # ---- pUCT over the A children (self_play.py:380-404) ------------
        cval = jnp.where(cvis > 0, cvsum / jnp.maximum(cvis, 1.0), 0.0)
        pvis = jnp.sum(jnp.where(pad_col, 0.0, cvis), axis=1, keepdims=True)
        pvis = pvis + jnp.where(current != 0, 1.0, 0.0)
        pb_c = (
            jnp.log((pvis + pb_c_base + 1.0) / pb_c_base) + pb_c_init
        ) * jnp.sqrt(pvis) / (cvis + 1.0)
        q = crew + discount * sign * cval
        qn = jnp.where(span_ok, (q - mn) * inv_span, q)
        score = pb_c * cprior + jnp.where(cvis > 0, qn, 0.0)
        score = jnp.where((current == 0) & ~legal, -jnp.inf, score)
        score = jnp.where(pad_col, -jnp.inf, score)
        if tie_jitter > 0:
            bits = pltpu.prng_random_bits((B, A_pad))
            score = score + bits.astype(jnp.float32) * (
                tie_jitter / 4.2949673e9
            )
        # First-index argmax (Mosaic argmax picks the LAST max on ties).
        m = jnp.max(score, axis=1, keepdims=True)
        sel = jnp.min(
            jnp.where(score >= m, iota_A, A_pad), axis=1, keepdims=True
        )

        # ---- record path + captured edge stats (one [1, B] row each) ----
        lane_on = active == 1
        row = (pl.ds(t, 1), slice(None))
        path_a_ref[row] = jnp.transpose(jnp.where(lane_on, sel, 0))
        path_r_ref[row] = jnp.transpose(
            jnp.where(lane_on, row_gather(crew, sel), 0.0)
        )
        path_v_ref[row] = jnp.transpose(
            jnp.where(lane_on, row_gather(cvis, sel), 0.0)
        )
        path_s_ref[row] = jnp.transpose(
            jnp.where(lane_on, row_gather(cvsum, sel), 0.0)
        )

        child = row_gather(cchild, sel).astype(jnp.int32)  # [B, 1]
        hits = active * (child < 0).astype(jnp.int32)
        parent = jnp.where(hits == 1, current, parent)
        action = jnp.where(hits == 1, sel, action)
        active = active * (child >= 0).astype(jnp.int32)
        current = jnp.where(active == 1, child, current)
        depth = depth + active
        path_n_ref[pl.ds(t + 1, 1), :] = jnp.transpose(
            jnp.where(active == 1, current, -1)
        )

        # ---- ship next level's DMA offsets to SMEM ----------------------
        nxt_vmem[:] = jnp.transpose(current)  # [1, B]
        dma = pltpu.make_async_copy(nxt_vmem, cur_smem, idx_sem)
        dma.start()
        dma.wait()
        return (current, depth, active, parent, action, t + 1)

    def cond(state):
        *_rest, t = state
        return t < bound  # scalar-only condition; lanes self-mask

    # Initialize path outputs (rows beyond the descent keep these).
    path_n_ref[:] = jnp.where(
        iota_Dm == 0, 0, jnp.full((D, B), -1, jnp.int32)
    )
    path_a_ref[:] = jnp.zeros((D, B), jnp.int32)
    path_r_ref[:] = jnp.zeros((D, B), jnp.float32)
    path_v_ref[:] = jnp.zeros((D, B), jnp.float32)
    path_s_ref[:] = jnp.zeros((D, B), jnp.float32)

    col0 = jnp.zeros((B, 1), jnp.int32)
    one0 = jnp.ones((B, 1), jnp.int32)
    out = jax.lax.while_loop(
        cond, body, (col0, col0, one0, col0, col0, jnp.int32(0))
    )
    _, depth, active, parent, action, _ = out
    parent_ref[:] = parent
    action_ref[:] = action
    # Truncated-lane marking: same contract as _descend_kernel (depth -1
    # means the bound cut this lane mid-descent; run_mcts's bound threading
    # guarantees this cannot happen for a correctly-threaded bound).
    depth_ref[:] = jnp.where(active == 1, -1, depth + 1)


def descend_stream(seed, depth_bound, edges, root_legal, min_value,
                   max_value, *, num_players, pb_c_base, pb_c_init,
                   discount, A, max_depth, tie_jitter=TIE_JITTER,
                   interpret=False):
    """One full descent for all B lanes over the packed HBM slab.

    edges: [B, N, S_PLANES, A_pad] f32. Returns (parent [B], action [B],
    leaf_depth [B], path_n [B, D], path_a [B, D], path_stats [B, D, 3])."""
    B, N, S, A_pad = edges.shape
    D = max_depth + 1
    if interpret:
        tie_jitter = 0.0

    kern = functools.partial(
        _descend_stream_kernel,
        num_players=num_players,
        pb_c_base=float(pb_c_base),
        pb_c_init=float(pb_c_init),
        discount=float(discount),
        A=A,
        tie_jitter=tie_jitter,
    )
    outs = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.int32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1, S, A_pad), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.SMEM((1, B), jnp.int32),
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(depth_bound, jnp.int32)]),
        edges,
        jnp.pad(
            root_legal.astype(jnp.int32), ((0, 0), (0, A_pad - A))
        ),
        min_value.reshape(B, 1).astype(jnp.float32),
        max_value.reshape(B, 1).astype(jnp.float32),
    )
    parent, action, depth, path_n, path_a, pr, pv, ps = outs
    # Everything depth-major [D, B]: transposing to [B, D] costs ~40 us of
    # TPU relayout per array per simulation (measured r5 — the old
    # reshape.119x ops); the stream backprop fold consumes [D, B] directly.
    return (
        parent[:, 0], action[:, 0], depth[:, 0], path_n, path_a,
        (pr, pv, ps),
    )


def _update_edges_kernel(
    scal_ref,  # [1] i32 (SMEM): live max depth this sim (loop trip count)
    edges_in_ref,  # [B, N, S, A_pad] f32 (ANY — aliased to edges_out_ref)
    path_n_ref,  # [D, B] i32 (VMEM) path node indices, 0 where masked
    path_a_ref,  # [D, B] i32 (VMEM) path actions, 0 where masked
    delta_ref,  # [D, B] f32 (VMEM) vsum increments, 0 where masked
    mask_ref,  # [D, B] f32 (VMEM) 1.0 on live path edges
    edges_out_ref,  # [B, N, S, A_pad] f32 (ANY — same HBM as edges_in_ref)
    row_vmem,  # scratch [2, B, 1, S, A_pad] f32 (double-buffered rows)
    pathn_smem,  # scratch [D, B] i32 (all levels' DMA offsets, upfront)
    copy_sems,  # DMA sems [2, B] — shared by reads and writes: level t's
    #             writes ride slot t%2 while level t+1's reads ride slot
    #             (t+1)%2, so a (slot, lane) sem is never doubly in flight
    #             (two separate [2, B] arrays exceeded the chip's 2 KB
    #             sflag space at B=128)
    idx_sem,  # DMA sem
):
    del edges_in_ref  # all RMW goes through the aliased output ref: on TPU
    # the two refs are the same HBM buffer; in interpret mode the output is
    # pre-filled with the input, so reading the OUTPUT is correct in both.
    D, B = path_n_ref.shape
    A_pad = row_vmem.shape[4]
    iota_A = jax.lax.broadcasted_iota(jnp.int32, (B, A_pad), 1)
    bound = scal_ref[0]

    # Unlike the descend (whose next index depends on this level's pUCT),
    # ALL levels' DMA offsets are known upfront — ship the whole path
    # VMEM -> SMEM once instead of one round trip per level.
    dma = pltpu.make_async_copy(path_n_ref, pathn_smem, idx_sem)
    dma.start()
    dma.wait()

    def start_reads(t, slot):
        for b in range(B):
            pltpu.make_async_copy(
                edges_out_ref.at[b, pl.ds(pathn_smem[t, b], 1)],
                row_vmem.at[slot, b],
                copy_sems.at[slot, b],
            ).start()

    # Double-buffered software pipeline: level t+1's row reads are in
    # flight while level t computes and writes back. Safe because a
    # descent path never repeats a (lane, node) row — level t's writes
    # and level t+1's reads target disjoint LIVE slab rows, and masked
    # levels aim at the dummy scratch row (pack_tree), whose content is
    # never read back. NOTE (measured r5): guarding each lane's DMAs behind
    # `@pl.when(t < lane_depth_b)` to skip finished lanes is a LOSS
    # (125.4 -> 108.0 env-steps/s) — the per-lane scalar branches
    # outweigh the skipped ~4 KB no-op rewrites. Unconditional chains.
    @pl.when(bound > 0)
    def _():
        start_reads(0, 0)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < bound)
        def _():
            start_reads(t + 1, 1 - slot)

        for b in range(B):
            pltpu.make_async_copy(
                edges_out_ref.at[b, pl.ds(pathn_smem[t, b], 1)],
                row_vmem.at[slot, b],
                copy_sems.at[slot, b],
            ).wait()
        # One-hot the per-lane action column; masked levels add zero
        # and RMW the dummy scratch row (see pack_tree).
        pa = jnp.transpose(path_a_ref[pl.ds(t, 1), :])  # [B, 1]
        dl = jnp.transpose(delta_ref[pl.ds(t, 1), :])
        mk = jnp.transpose(mask_ref[pl.ds(t, 1), :])
        onehot = (iota_A == pa).astype(jnp.float32)  # [B, A_pad]
        row_vmem[slot, :, 0, P_VISIT] = (
            row_vmem[slot, :, 0, P_VISIT] + onehot * mk
        )
        row_vmem[slot, :, 0, P_VSUM] = (
            row_vmem[slot, :, 0, P_VSUM] + onehot * dl
        )
        for b in range(B):
            pltpu.make_async_copy(
                row_vmem.at[slot, b],
                edges_out_ref.at[b, pl.ds(pathn_smem[t, b], 1)],
                copy_sems.at[slot, b],
            ).start()
        # Wait the writes before this slot's buffer is refilled at t + 2
        # (the t+1 reads already in flight target disjoint rows).
        for b in range(B):
            pltpu.make_async_copy(
                row_vmem.at[slot, b],
                edges_out_ref.at[b, pl.ds(pathn_smem[t, b], 1)],
                copy_sems.at[slot, b],
            ).wait()
        return 0

    jax.lax.fori_loop(0, bound, body, 0)


def update_edges_stream(edges, path_n, path_a, edge_delta, edge_mask,
                        bound, *, interpret=False):
    """Apply one simulation's backprop edge updates to the packed HBM slab
    with per-lane row DMA read-modify-write chains instead of XLA scatters.

    The two XLA scatters this replaces serialize at ~12 ns per update over
    the FULL static [D, B] path arrays (D = max_depth + 1 = 401 for gomoku:
    2 x 25.7k updates = ~0.5 ms/sim — the measured r5 floor's biggest
    slice), because scatter cost is shape-, not occupancy-, bound. This
    kernel (a) walks only the LIVE depth (scalar `bound` = max leaf depth,
    typically ~90-120 of 401), and (b) pays ~2 row DMAs per lane-level
    (~4 KB each) instead of serialized per-element scatter traffic. Within
    a simulation every (node, action) path edge is distinct (it is a tree
    descent), so the per-level RMWs never collide across levels; lanes
    never collide because the leading slab index is the lane.

    edges is donated/aliased: the update happens in place on HBM.
    Math parity: the scatter path in backprop_stream (reference
    self_play.py:406-430 visit/value_sum accumulation).
    """
    B, N, S, A_pad = edges.shape
    D = path_n.shape[0]
    return pl.pallas_call(
        _update_edges_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, N, S, A_pad), jnp.float32),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, B, 1, S, A_pad), jnp.float32),
            pltpu.SMEM((D, B), jnp.int32),
            pltpu.SemaphoreType.DMA((2, B)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        jnp.asarray(bound, jnp.int32).reshape(1),
        edges,
        path_n.astype(jnp.int32),
        path_a.astype(jnp.int32),
        edge_delta.astype(jnp.float32),
        edge_mask.astype(jnp.float32),
    )


def backprop_stream(tree, edges, path_n, path_a, leaf_depth, leaf_value,
                    path_stats, spec, *, use_update_kernel=True,
                    interpret=False):
    """Depth-major backprop fold for the stream path.

    Same math as ops/mcts._backprop_vectorized (reference
    self_play.py:406-430 as a reverse associative scan + two scatters),
    specialized to the kernel's [D, B] path layout so NO transposes are
    needed (each [D, B] -> [B, D] relayout costs ~40 us on TPU), to the
    packed HBM slab, to captured path stats, and to K=1.

    path_stats: (reward, visit, vsum) each [D, B], leaf-edge reward
    already patched. Returns (tree with scalar/minmax updates, edges).
    """
    D, B = path_n.shape
    t_idx = jnp.arange(D)[:, None]  # [D, 1]
    L = leaf_depth[None, :]  # [1, B]
    sign = 1.0 if spec.num_players == 1 else -1.0
    brow = jnp.broadcast_to(jnp.arange(B)[None, :], (D, B))

    edge_mask = t_idx < L  # [D, B]
    # Masked levels target the dummy scratch row (slab index N - 1, see
    # pack_tree) so the update kernel's unconditional RMWs never alias a
    # live row; the scatter fallback adds zero there just the same.
    pn = jnp.where(edge_mask, path_n, edges.shape[1] - 1)
    pa = jnp.where(edge_mask, path_a, 0)
    r_edge = jnp.where(edge_mask, path_stats[0], 0.0)
    ev_old = jnp.where(edge_mask, path_stats[1], 0.0)
    es_old = jnp.where(edge_mask, path_stats[2], 0.0)

    if spec.num_players == 1:
        same = jnp.ones((D, B), bool)
        s_next = jnp.ones((D, B))
    else:
        same = ((L - t_idx) % 2) == 0
        s_next = jnp.where(((L - (t_idx + 1)) % 2) == 0, -1.0, 1.0)

    a_coef = jnp.where(edge_mask, spec.discount, 0.0)
    b_coef = jnp.where(
        edge_mask, s_next * r_edge,
        jnp.where(t_idx == L, leaf_value[None, :], 0.0),
    )

    def compose(acc, elem):
        a_l, b_l = acc
        a_r, b_r = elem
        return a_r * a_l, a_r * b_l + b_r

    _, v = jax.lax.associative_scan(
        compose, (a_coef, b_coef), reverse=True, axis=0
    )
    node_mask = t_idx <= L
    delta = jnp.where(same, v, -v)

    edge_delta = jnp.concatenate([delta[1:], jnp.zeros((1, B))], axis=0)
    if use_update_kernel:
        # In-kernel RMW chains bounded to the live depth (see
        # update_edges_stream docstring) — replaces the two full-width
        # XLA scatters that were the r5 floor's biggest slice.
        edges = update_edges_stream(
            edges, pn, pa, jnp.where(edge_mask, edge_delta, 0.0),
            edge_mask.astype(jnp.float32), jnp.max(leaf_depth),
            interpret=interpret,
        )
    else:
        edges = edges.at[brow, pn, P_VSUM, pa].add(
            jnp.where(edge_mask, edge_delta, 0.0)
        )
        edges = edges.at[brow, pn, P_VISIT, pa].add(
            edge_mask.astype(jnp.float32)
        )
    root_visit = tree.root_visit + 1
    root_vsum = tree.root_vsum + delta[0]

    def node_shift(edge_arr, root_row):
        return jnp.concatenate([root_row[None, :], edge_arr[:-1]], axis=0)

    nvis = node_shift(ev_old, tree.root_visit.astype(jnp.float32)) + 1.0
    nsum = node_shift(es_old, tree.root_vsum)
    nrew = node_shift(r_edge, tree.root_reward)
    node_val = (nsum + delta) / jnp.maximum(nvis, 1.0)
    stat = nrew + spec.discount * sign * node_val
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    stat_min = jnp.min(jnp.where(node_mask, stat, big), axis=0)
    stat_max = jnp.max(jnp.where(node_mask, stat, -big), axis=0)

    tree = tree._replace(
        root_visit=root_visit,
        root_vsum=root_vsum,
        min_value=jnp.minimum(tree.min_value, stat_min),
        max_value=jnp.maximum(tree.max_value, stat_max),
    )
    return tree, edges


# ---------------------------------------------------------------------------
# Packed-slab construction and maintenance (XLA side)
# ---------------------------------------------------------------------------

def pack_tree(tree, A):
    """Tree ([B, N, A] slabs) -> packed edges [B, N, S_PLANES, A_pad] f32.

    Child indices ride as f32 (N < 2^24: exact). Run once per move."""
    B, N, _ = tree.children_index.shape
    A_pad = _round_up(A, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, A_pad - A)))

    planes = [
        pad(tree.children_visit.astype(jnp.float32)),
        pad(tree.children_vsum),
        pad(tree.children_reward),
        pad(tree.children_prior),
        # padding columns must read as "unexpanded" (-1), not 0 = root
        jnp.pad(
            tree.children_index.astype(jnp.float32),
            ((0, 0), (0, 0), (0, A_pad - A)), constant_values=-1.0,
        ),
    ]
    planes += [jnp.zeros_like(planes[0])] * (S_PLANES - len(planes))
    packed = jnp.stack(planes, axis=2)  # [B, N, S, A_pad]
    # One DUMMY node row (index N) per lane: masked path levels in the
    # backprop update kernel aim their unconditional RMW DMAs here, so
    # they can never race a LIVE row's in-flight write (a depth-1 lane's
    # masked level-1 read of the root row raced the level-0 root write in
    # the pipelined kernel and undid the visit — caught by
    # test_stream_matches_xla_deterministic).
    return jnp.pad(packed, ((0, 0), (0, 1), (0, 0), (0, 0)))


def unpack_tree(tree, edges, A):
    """Packed slab -> Tree slab fields (end of move; drops the dummy
    scratch row pack_tree appended)."""
    N = tree.children_index.shape[1]
    return tree._replace(
        children_visit=edges[:, :N, P_VISIT, :A].astype(jnp.int32),
        children_vsum=edges[:, :N, P_VSUM, :A],
        children_reward=edges[:, :N, P_REWARD, :A],
        children_prior=edges[:, :N, P_PRIOR, :A],
        children_index=edges[:, :N, P_CHILD, :A].astype(jnp.int32),
    )


def expand_packed(edges, parent, action, new_node, leaf_reward, prior, A):
    """Expansion writes on the packed slab (ops/mcts._expand_and_backprop
    parity): edge (parent, action) gets the child index + decoded reward;
    the new node's prior row is one dynamic-update-slice (new_node is the
    same scalar for every lane — node slots are allocated per simulation)."""
    B = edges.shape[0]
    A_pad = edges.shape[3]
    b_idx = jnp.arange(B)
    edges = edges.at[b_idx, parent, P_CHILD, action].set(
        new_node.astype(jnp.float32)
    )
    edges = edges.at[b_idx, parent, P_REWARD, action].set(leaf_reward)
    prior_p = jnp.pad(prior, ((0, 0), (0, A_pad - A)))
    return jax.lax.dynamic_update_slice(
        edges, prior_p[:, None, None, :], (0, new_node, P_PRIOR, 0)
    )
