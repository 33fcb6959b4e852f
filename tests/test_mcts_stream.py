"""HBM-streaming descend (ops/mcts_stream.py) vs the XLA reference path.

Interpret mode runs the kernel's DMA/pointer machinery on CPU with the
jitter zeroed (deterministic lowest-index tie-break), so the stream path
must agree EXACTLY with the XLA staged search — visits, values, depths,
min/max — including the packed-slab expand and the gather-free backprop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import mcts as M
from muzero_general_tpu.ops import mcts_stream

from test_mcts_pallas import _mock_fns


def _spec(sims, num_players, use_stream):
    return M.SearchSpec(
        num_simulations=sims,
        num_players=num_players,
        pb_c_base=19652.0,
        pb_c_init=1.25,
        discount=0.97,
        dirichlet_alpha=0.25,
        exploration_fraction=0.25,
        support_size=5,
        max_depth=sims,
        deterministic_tie_break=True,
        use_stream=use_stream,
        pallas_interpret=use_stream,
    )


@pytest.mark.parametrize("num_players", [1, 2])
def test_stream_matches_xla_deterministic(num_players):
    A, sims, B = 3, 14, 4
    initial_fn, recurrent_fn = _mock_fns(A)
    legal = np.ones((B, A), bool)
    legal[1, 0] = False
    obs = jnp.zeros((B, 4))
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(3)

    def run(use_stream):
        return M.run_mcts(
            initial_fn, recurrent_fn, obs, jnp.asarray(legal), to_play,
            rng, _spec(sims, num_players, use_stream),
            add_exploration_noise=False,
        )

    out_x = run(False)
    out_s = run(True)
    np.testing.assert_array_equal(
        np.asarray(out_x.root_visit_counts),
        np.asarray(out_s.root_visit_counts),
    )
    np.testing.assert_allclose(
        np.asarray(out_x.root_value), np.asarray(out_s.root_value), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_x.max_tree_depth), np.asarray(out_s.max_tree_depth)
    )
    for field in (
        "children_index", "children_visit", "children_prior",
        "children_reward", "children_vsum", "min_value", "max_value",
    ):
        a = np.asarray(getattr(out_x.tree, field))
        b = np.asarray(getattr(out_s.tree, field))
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=field)
        else:
            np.testing.assert_array_equal(a, b, err_msg=field)


def test_stream_invariants_masked_root():
    A, sims, B = 4, 10, 3
    initial_fn, recurrent_fn = _mock_fns(A)
    legal = np.ones((B, A), bool)
    legal[:, 3] = False
    obs = jnp.zeros((B, 4))
    out = M.run_mcts(
        initial_fn, recurrent_fn, obs, jnp.asarray(legal),
        jnp.zeros((B,), jnp.int32), jax.random.PRNGKey(0),
        _spec(sims, 2, True), add_exploration_noise=True,
    )
    counts = np.asarray(out.root_visit_counts)
    assert (counts.sum(-1) == sims).all()
    assert (counts[:, 3] == 0).all()


def test_update_kernel_matches_scatter():
    """update_edges_stream (in-kernel RMW chains) vs the XLA scatter path,
    random masked paths with distinct (node, action) edges per lane."""
    B, N, A_pad, D = 4, 16, 128, 12
    rng = np.random.default_rng(7)
    edges = rng.normal(size=(B, N, mcts_stream.S_PLANES, A_pad)).astype(
        np.float32
    )
    depths = rng.integers(1, D, B)
    path_n = np.zeros((D, B), np.int32)
    path_a = np.zeros((D, B), np.int32)
    delta = np.zeros((D, B), np.float32)
    mask = np.zeros((D, B), np.float32)
    for b in range(B):
        L = depths[b]
        nodes = rng.choice(N, L, replace=False)  # tree path: distinct nodes
        path_n[:L, b] = nodes
        path_a[:L, b] = rng.integers(0, A_pad, L)
        delta[:L, b] = rng.normal(size=L)
        mask[:L, b] = 1.0

    got = np.asarray(
        mcts_stream.update_edges_stream(
            jnp.asarray(edges), jnp.asarray(path_n), jnp.asarray(path_a),
            jnp.asarray(delta), jnp.asarray(mask),
            int(depths.max()), interpret=True,
        )
    )
    want = edges.copy()
    for b in range(B):
        for t in range(depths[b]):
            want[b, path_n[t, b], mcts_stream.P_VISIT, path_a[t, b]] += 1.0
            want[b, path_n[t, b], mcts_stream.P_VSUM, path_a[t, b]] += (
                delta[t, b]
            )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pack_unpack_roundtrip():
    B, N, A = 2, 5, 3
    rng = np.random.default_rng(0)
    tree = M.init_tree(
        N,
        jnp.asarray(rng.dirichlet(np.ones(A), B).astype(np.float32)),
        jnp.ones((B, A), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.float32),
    )
    tree = tree._replace(
        children_index=jnp.asarray(
            rng.integers(-1, N, (B, N, A)).astype(np.int32)
        ),
        children_visit=jnp.asarray(
            rng.integers(0, 9, (B, N, A)).astype(np.int32)
        ),
        children_vsum=jnp.asarray(
            rng.normal(size=(B, N, A)).astype(np.float32)
        ),
        children_reward=jnp.asarray(
            rng.normal(size=(B, N, A)).astype(np.float32)
        ),
    )
    packed = mcts_stream.pack_tree(tree, A)
    # + 1: the dummy scratch row masked backprop RMWs aim at
    assert packed.shape == (B, N + 1, mcts_stream.S_PLANES, 128)
    # padded action columns must read as unexpanded edges, not node 0
    # (live rows only — the dummy scratch row's content is never read)
    assert (np.asarray(packed[:, :N, mcts_stream.P_CHILD, A:]) == -1).all()
    back = mcts_stream.unpack_tree(tree, packed, A)
    for field in ("children_index", "children_visit", "children_prior",
                  "children_reward", "children_vsum"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, field)),
            np.asarray(getattr(tree, field)),
            err_msg=field,
        )
