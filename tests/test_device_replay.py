"""Device replay (ops/device_replay.py) parity vs the numpy ReplayBuffer.

The numpy path (replay.py) is the behavioral reference (itself golden-tested
against re-derived reference replay_buffer.py semantics); these tests force
identical sampled (game, position) pairs through both and require identical
priorities, targets, stacked observations, IS weights and write-back
behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import device_replay as dr
from muzero_general_tpu.replay import (
    GameHistory,
    ReplayBuffer,
    compute_target_values,
    make_target,
)
from muzero_general_tpu.ops.stacking import stack_observations_np


class Cfg:
    seed = 0
    PER = True
    PER_alpha = 0.7
    td_steps = 5
    discount = 0.95
    num_unroll_steps = 4
    batch_size = 6
    replay_buffer_size = 8
    action_space = list(range(3))
    stacked_observations = 1
    observation_shape = (2, 3, 3)
    max_moves = 9


def _rand_game(rng, L, cfg):
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    return GameHistory(
        observations=rng.normal(size=(L, c, h, w)).astype(np.float32),
        actions=np.concatenate([[0], rng.integers(0, A, L)]).astype(np.int32),
        rewards=np.concatenate([[0.0], rng.normal(size=L)]).astype(np.float32),
        to_play=rng.integers(0, 2, L + 1).astype(np.int32),
        child_visits=rng.dirichlet(np.ones(A), L).astype(np.float32),
        root_values=rng.normal(size=L).astype(np.float32),
    )


def _pad_games(ghs, cfg):
    Lmax = cfg.max_moves
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    K = len(ghs)
    out = {
        "observation": np.zeros((K, Lmax, c, h, w), np.float32),
        "action": np.zeros((K, Lmax + 1), np.int32),
        "reward": np.zeros((K, Lmax + 1), np.float32),
        "to_play": np.zeros((K, Lmax + 1), np.int32),
        "child_visits": np.zeros((K, Lmax, A), np.float32),
        "root_values": np.zeros((K, Lmax), np.float32),
        "length": np.zeros((K,), np.int32),
    }
    for k, gh in enumerate(ghs):
        L = len(gh)
        out["observation"][k, :L] = gh.observations
        out["action"][k, : L + 1] = gh.actions
        out["reward"][k, : L + 1] = gh.rewards
        out["to_play"][k, : L + 1] = gh.to_play
        out["child_visits"][k, :L] = gh.child_visits
        out["root_values"][k, :L] = gh.root_values
        out["length"][k] = L
    return {k: jnp.asarray(v) for k, v in out.items()}


def _fresh(cfg, ghs):
    state = dr.init_replay(
        cfg.replay_buffer_size, cfg.max_moves, cfg.observation_shape,
        len(cfg.action_space),
    )
    return dr.save_games(
        state, _pad_games(ghs, cfg), jnp.ones(len(ghs), bool),
        td_steps=cfg.td_steps, discount=cfg.discount,
        per_alpha=cfg.PER_alpha, use_per=cfg.PER,
    )


def test_save_games_matches_host_priorities():
    cfg = Cfg()
    rng = np.random.default_rng(0)
    ghs = [_rand_game(rng, L, cfg) for L in (5, 9, 3)]
    state = _fresh(cfg, ghs)

    host = ReplayBuffer(cfg)
    for gh in ghs:
        host.save_game(gh)

    for k, gh in enumerate(ghs):
        L = len(gh)
        np.testing.assert_allclose(
            np.asarray(state.priorities[k][:L]), gh.priorities, rtol=1e-5
        )
        assert np.asarray(state.priorities[k][L:]).max(initial=0.0) == 0.0
        assert np.isclose(
            float(state.game_priority[k]), gh.game_priority, rtol=1e-5
        )
    assert int(state.total_samples) == host.total_samples
    assert int(state.num_played_games) == host.num_played_games


def test_assemble_batch_matches_numpy_targets():
    cfg = Cfg()
    rng = np.random.default_rng(1)
    ghs = [_rand_game(rng, L, cfg) for L in (7, 9, 4)]
    state = _fresh(cfg, ghs)

    # Force the sampled pairs; include boundary/absorbing positions.
    slots = jnp.array([0, 0, 1, 2, 2, 2], jnp.int32)
    pos = jnp.array([0, 6, 8, 0, 2, 3], jnp.int32)
    gprob = jnp.full((6,), 0.25)
    pprob = jnp.full((6,), 0.125)
    index_batch, batch = jax.jit(
        lambda s, r: dr.assemble_batch(
            s, r, slots, pos, gprob, pprob,
            num_unroll_steps=cfg.num_unroll_steps, td_steps=cfg.td_steps,
            discount=cfg.discount, num_actions=len(cfg.action_space),
            num_stacked=cfg.stacked_observations, use_per=True,
        )
    )(state, jax.random.PRNGKey(3))

    nrng = np.random.default_rng(7)
    for i in range(6):
        gh = ghs[int(slots[i])]
        p = int(pos[i])
        v, r, pol, a = make_target(
            gh, p, cfg.num_unroll_steps, cfg.td_steps, cfg.discount,
            len(cfg.action_space), nrng,
        )
        np.testing.assert_allclose(
            np.asarray(batch["target_value"][i]), v, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batch["target_reward"][i]), r, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batch["target_policy"][i]), pol, rtol=1e-5
        )
        # Actions agree wherever they are determined by the game (the
        # beyond-game fill is random on both sides).
        L = len(gh)
        idx = p + np.arange(cfg.num_unroll_steps + 1)
        det = idx <= L
        np.testing.assert_array_equal(
            np.asarray(batch["action"][i])[det], a[det]
        )
        np.testing.assert_allclose(
            np.asarray(batch["observation"][i]),
            stack_observations_np(
                gh.observations, gh.actions, p, cfg.stacked_observations,
                len(cfg.action_space),
            ),
            rtol=1e-6,
        )
        assert np.allclose(
            np.asarray(batch["gradient_scale"][i]),
            min(cfg.num_unroll_steps, L + 1 - p),
        )
    # IS weights: 1/(total*gprob*pprob), normalized by max — all equal here.
    np.testing.assert_allclose(np.asarray(batch["weight"]), 1.0, rtol=1e-6)
    # index_batch carries (game_id, pos, slot)
    np.testing.assert_array_equal(
        np.asarray(index_batch[:, 2]), np.asarray(slots)
    )


def test_ring_eviction_and_total_samples():
    cfg = Cfg()
    rng = np.random.default_rng(2)
    lens = [4, 5, 6, 7, 8, 9, 3, 2, 5, 6]  # 10 games into capacity 8
    ghs = [_rand_game(rng, L, cfg) for L in lens]
    state = _fresh(cfg, ghs[:8])
    state = dr.save_games(
        state, _pad_games(ghs[8:], cfg), jnp.ones(2, bool),
        td_steps=cfg.td_steps, discount=cfg.discount,
        per_alpha=cfg.PER_alpha, use_per=cfg.PER,
    )
    # Games 0,1 evicted (slots 0,1 now hold games 8,9).
    assert int(state.num_played_games) == 10
    assert int(state.game_id[0]) == 8 and int(state.game_id[1]) == 9
    assert int(state.total_samples) == sum(lens[2:])
    assert int(state.game_len[0]) == 5 and int(state.game_len[1]) == 6


def test_update_priorities_stale_guard_and_clip():
    cfg = Cfg()
    rng = np.random.default_rng(3)
    ghs = [_rand_game(rng, L, cfg) for L in (6, 9)]
    state = _fresh(cfg, ghs)

    U1 = cfg.num_unroll_steps + 1
    new_pr = np.full((3, U1), 7.0, np.float32)
    index_batch = jnp.array(
        [
            [0, 4, 0],   # game 0 at pos 4: writes clipped to length 6
            [1, 0, 1],   # fresh write
            [99, 0, 1],  # stale id: must be ignored
        ],
        jnp.int32,
    )
    out = dr.update_priorities(state, jnp.asarray(new_pr), index_batch)
    got0 = np.asarray(out.priorities[0])
    np.testing.assert_allclose(got0[4:6], 7.0)
    # beyond game length unchanged (zero)
    assert got0[6:].max(initial=0.0) == 0.0
    got1 = np.asarray(out.priorities[1])
    # the stale row must NOT have overwritten slot 1 a second time; the
    # fresh row wrote pos 0..4
    np.testing.assert_allclose(got1[:U1], 7.0)
    np.testing.assert_allclose(
        got1[U1:], np.asarray(state.priorities[1])[U1:], rtol=1e-6
    )
    assert np.isclose(float(out.game_priority[0]), 7.0)


def test_sampling_respects_per_and_liveness():
    cfg = Cfg()
    rng = np.random.default_rng(4)
    ghs = [_rand_game(rng, 6, cfg) for _ in range(3)]
    state = _fresh(cfg, ghs)
    # Make game 1 dominate.
    gp = np.asarray(state.game_priority)
    gp = np.array([0.01, 100.0, 0.01] + [0.0] * 5, np.float32)
    state = state._replace(game_priority=jnp.asarray(gp))
    slots, pos, gprob, pprob = jax.jit(
        lambda s, r: dr.sample_indices(s, r, 256, use_per=True)
    )(state, jax.random.PRNGKey(0))
    slots = np.asarray(slots)
    assert (slots == 1).mean() > 0.95
    assert set(np.unique(slots)).issubset({0, 1, 2})  # empty slots never
    assert (np.asarray(pos) < 6).all()


def test_reanalyse_value_update_guard():
    cfg = Cfg()
    rng = np.random.default_rng(5)
    ghs = [_rand_game(rng, 5, cfg) for _ in range(2)]
    state = _fresh(cfg, ghs)
    fresh_vals = jnp.arange(cfg.max_moves, dtype=jnp.float32)
    out = dr.update_reanalysed_values(state, 1, 1, fresh_vals)
    np.testing.assert_allclose(np.asarray(out.root_values[1]), fresh_vals)
    out2 = dr.update_reanalysed_values(state, 0, 42, fresh_vals)  # stale
    np.testing.assert_allclose(
        np.asarray(out2.root_values[0]), np.asarray(state.root_values[0])
    )
