"""Pallas fused MCTS kernels vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import mcts as M


def _mock_fns(A, E=8):
    def initial_fn(obs):
        B = obs.shape[0]
        k = jax.random.PRNGKey(0)
        return (
            jax.random.normal(k, (B, 11)),
            jnp.zeros((B, 11)),
            jax.random.normal(jax.random.fold_in(k, 1), (B, A)),
            jax.random.normal(jax.random.fold_in(k, 2), (B, E)),
        )

    def recurrent_fn(h, a):
        B = h.shape[0]
        key = jax.random.fold_in(
            jax.random.PRNGKey(7), 0
        )
        # deterministic pseudo-random outputs from (h, a)
        seed = jnp.sum(h, axis=-1) + a.astype(jnp.float32)
        base = jnp.sin(seed[:, None] * jnp.arange(1, 12)[None, :] * 0.7)
        pol = jnp.sin(seed[:, None] * jnp.arange(1, A + 1)[None, :] * 1.3)
        h2 = jnp.sin(seed[:, None] * jnp.arange(1, E + 1)[None, :] * 2.1)
        return base * 2, base * 0.5, pol * 2, h2

    return initial_fn, recurrent_fn


@pytest.mark.parametrize("num_players", [1, 2])
def test_pallas_matches_xla_deterministic(num_players):
    """With deterministic tie-break and no jitter both paths must agree
    exactly on visit counts and root values."""
    A, sims, B = 3, 20, 6
    initial_fn, recurrent_fn = _mock_fns(A)
    legal = np.ones((B, A), bool)
    legal[1, 0] = False
    obs = jnp.zeros((B, 4))
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(3)

    def run(use_pallas):
        spec = M.SearchSpec(
            num_simulations=sims,
            num_players=num_players,
            pb_c_base=19652.0,
            pb_c_init=1.25,
            discount=0.98,
            dirichlet_alpha=0.25,
            exploration_fraction=0.25,
            support_size=5,
            max_depth=sims,
            deterministic_tie_break=True,
            use_pallas=use_pallas,
            pallas_interpret=use_pallas,
        )
        return M.run_mcts(
            initial_fn, recurrent_fn, obs, jnp.asarray(legal), to_play,
            rng, spec, add_exploration_noise=False,
        )

    out_x = run(False)
    out_p = run(True)
    np.testing.assert_array_equal(
        np.asarray(out_x.root_visit_counts), np.asarray(out_p.root_visit_counts)
    )
    np.testing.assert_allclose(
        np.asarray(out_x.root_value), np.asarray(out_p.root_value), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_x.max_tree_depth), np.asarray(out_p.max_tree_depth)
    )
    np.testing.assert_allclose(
        np.asarray(out_x.tree.min_value), np.asarray(out_p.tree.min_value),
        rtol=1e-5,
    )


def test_pallas_invariants_with_jitter():
    A, sims, B = 4, 25, 5
    initial_fn, recurrent_fn = _mock_fns(A)
    legal = np.ones((B, A), bool)
    legal[:, 3] = False
    spec = M.SearchSpec(
        num_simulations=sims, num_players=1, pb_c_base=19652.0,
        pb_c_init=1.25, discount=0.99, dirichlet_alpha=0.3,
        exploration_fraction=0.25, support_size=5, max_depth=sims,
        # deterministic => tie_jitter 0: the in-kernel PRNG has no
        # interpret-mode implementation; jitter is exercised on real TPU.
        deterministic_tie_break=True,
        use_pallas=True, pallas_interpret=True,
    )
    out = M.run_mcts(
        initial_fn, recurrent_fn, jnp.zeros((B, 4)), jnp.asarray(legal),
        jnp.zeros((B,), jnp.int32), jax.random.PRNGKey(0), spec,
        add_exploration_noise=True,
    )
    visits = np.asarray(out.root_visit_counts)
    np.testing.assert_array_equal(visits.sum(-1), sims)
    assert (visits[:, 3] == 0).all()


def test_fits_vmem():
    from muzero_general_tpu.ops.mcts_pallas import choose_block, fits_vmem

    # cartpole-scale: the kernels engage (possibly gridded over lane blocks)
    assert choose_block(1024, 51, 2) >= 256
    # connect4-scale: engages with a meaningful block
    assert choose_block(256, 201, 7) >= 32
    # gomoku-scale: the edge slabs (N*A ≈ 49k) can never fit — XLA path
    assert not fits_vmem(8, 401, 121)
    assert choose_block(256, 401, 121) is None


@pytest.mark.parametrize("num_players", [1, 2])
def test_backprop_only_pallas_matches_xla(num_players):
    """use_pallas_backprop (big-board mode: XLA descend + in-VMEM backprop,
    gomoku-scale trees) must match the all-XLA search exactly."""
    A, sims, B = 3, 16, 6
    initial_fn, recurrent_fn = _mock_fns(A)
    legal = np.ones((B, A), bool)
    legal[2, 1] = False
    obs = jnp.zeros((B, 4))
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(5)

    def run(backprop_pallas):
        spec = M.SearchSpec(
            num_simulations=sims,
            num_players=num_players,
            pb_c_base=19652.0,
            pb_c_init=1.25,
            discount=0.98,
            dirichlet_alpha=0.25,
            exploration_fraction=0.25,
            support_size=5,
            max_depth=sims,
            deterministic_tie_break=True,
            use_pallas=False,
            pallas_interpret=backprop_pallas,
            use_pallas_backprop=backprop_pallas,
        )
        return M.run_mcts(
            initial_fn, recurrent_fn, obs, jnp.asarray(legal), to_play,
            rng, spec, add_exploration_noise=False,
        )

    out_x = run(False)
    out_p = run(True)
    np.testing.assert_array_equal(
        np.asarray(out_x.root_visit_counts), np.asarray(out_p.root_visit_counts)
    )
    np.testing.assert_allclose(
        np.asarray(out_x.root_value), np.asarray(out_p.root_value), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_x.tree.max_value), np.asarray(out_p.tree.max_value),
        rtol=1e-5,
    )
