"""Device-side replay buffer: HBM game ring + on-device PER + target assembly.

TPU-native endpoint of SURVEY.md §5.8: for small-observation games
(board games, classic control) the whole replay path — game storage,
two-level prioritized sampling, n-step target assembly, IS weights and
priority write-back — runs on device as pure jittable functions, removing
the host batch-assembly work and the per-loop host->device batch transfer
from the train loop.

Semantics parity with the host ReplayBuffer (replay.py), which itself is
the behavioral reference for reference replay_buffer.py:
- fixed-capacity game ring, FIFO eviction (replay_buffer.py:53-61);
- initial priorities |root_value - n_step_target|^PER_alpha, game priority
  = max position priority (replay_buffer.py:39-51);
- two-level PER (games by game_priority, positions by position priority)
  with IS weights 1/(total_samples*game_prob*pos_prob) normalized by the
  batch max (replay_buffer.py:140-195, :113-118);
- n-step value targets with per-player sign flips, absorbing/boundary
  handling (replay_buffer.py:230-303);
- stale-guarded priority write-back by game id (replay_buffer.py:198-228).

Differences (documented): games are stored PADDED to a static max length
(config.max_moves); sampling uses jax.random.categorical draws instead of
numpy's cumsum inversion (same distributions); random fill actions beyond
the game end come from the device PRNG stream.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceReplay(NamedTuple):
    """Game ring of capacity G, every game padded to Lmax positions."""

    observations: jnp.ndarray  # [G, Lmax, C, H, W] f32
    actions: jnp.ndarray  # [G, Lmax+1] i32 (index 0 = sentinel)
    rewards: jnp.ndarray  # [G, Lmax+1] f32
    to_play: jnp.ndarray  # [G, Lmax+1] i32
    child_visits: jnp.ndarray  # [G, Lmax, A] f32
    root_values: jnp.ndarray  # [G, Lmax] f32 (reanalyse overwrites in place)
    priorities: jnp.ndarray  # [G, Lmax] f32, 0 beyond game length
    game_priority: jnp.ndarray  # [G] f32, 0 = empty slot
    game_len: jnp.ndarray  # [G] i32, 0 = empty slot
    game_id: jnp.ndarray  # [G] i32 (monotonic; -1 = empty)
    num_played_games: jnp.ndarray  # scalar i32 (monotonic id source)
    total_samples: jnp.ndarray  # scalar i32 (sum of live game lengths)


def init_replay(capacity, max_len, obs_shape, num_actions):
    c, h, w = obs_shape
    G, L = capacity, max_len
    return DeviceReplay(
        observations=jnp.zeros((G, L, c, h, w), jnp.float32),
        actions=jnp.zeros((G, L + 1), jnp.int32),
        rewards=jnp.zeros((G, L + 1), jnp.float32),
        to_play=jnp.zeros((G, L + 1), jnp.int32),
        child_visits=jnp.zeros((G, L, num_actions), jnp.float32),
        root_values=jnp.zeros((G, L), jnp.float32),
        priorities=jnp.zeros((G, L), jnp.float32),
        game_priority=jnp.zeros((G,), jnp.float32),
        game_len=jnp.zeros((G,), jnp.int32),
        game_id=jnp.full((G,), -1, jnp.int32),
        num_played_games=jnp.int32(0),
        total_samples=jnp.int32(0),
    )


def compute_target_values(root_values, rewards, to_play, length, indices,
                          td_steps, discount):
    """n-step bootstrapped targets for `indices` [...]: jnp port of
    replay.compute_target_values (itself parity with reference
    replay_buffer.py:230-262). All args are one game's padded rows."""
    L = length
    boot = indices + td_steps
    valid_boot = boot < L
    Lm1 = jnp.maximum(L - 1, 0)
    boot_c = jnp.clip(boot, 0, Lm1)
    idx_c = jnp.clip(indices, 0, Lm1)
    same_player = to_play[boot_c] == to_play[idx_c]
    boot_vals = jnp.where(
        same_player, root_values[boot_c], -root_values[boot_c]
    )
    values = jnp.where(valid_boot, boot_vals * discount**td_steps, 0.0)

    ks = jnp.arange(td_steps)
    r_idx = indices[..., None] + 1 + ks  # [..., T]
    in_range = r_idx <= L
    r_idx_c = jnp.minimum(r_idx, L)
    p_idx_c = jnp.minimum(indices[..., None] + ks, L)
    sign = jnp.where(
        to_play[p_idx_c] == to_play[idx_c][..., None], 1.0, -1.0
    )
    disc = discount ** ks
    values = values + jnp.sum(
        jnp.where(in_range, sign * rewards[r_idx_c] * disc, 0.0), axis=-1
    )
    return values.astype(jnp.float32)


def _initial_priorities(root_values, rewards, to_play, length, max_len,
                        td_steps, discount, per_alpha):
    """|root_value - n_step_target|^alpha over one game's positions
    (replay_buffer.py:39-51), zero beyond the game length."""
    idx = jnp.arange(max_len)
    targets = compute_target_values(
        root_values, rewards, to_play, length, idx, td_steps, discount
    )
    pr = jnp.abs(root_values - targets) ** per_alpha
    return jnp.where(idx < length, pr, 0.0).astype(jnp.float32)


def save_games(state: DeviceReplay, games, valid, *, td_steps, discount,
               per_alpha, use_per=True):
    """Insert up to K padded games at the ring cursor (pure, jittable).

    games: dict with keys observation [K, Lmax, C, H, W], action [K, Lmax+1],
    reward [K, Lmax+1], to_play [K, Lmax+1], child_visits [K, Lmax, A],
    root_values [K, Lmax], length [K] i32. valid: [K] bool — lanes beyond
    the number of actually-completed games are skipped (static K keeps the
    call shape stable across loops). FIFO eviction falls out of the ring:
    the overwritten slot IS the oldest game once the ring is full
    (slot = id % capacity, parity with replay_buffer.py:53-61).
    """
    G = state.game_len.shape[0]
    Lmax = state.root_values.shape[1]
    K = games["length"].shape[0]

    if use_per:
        prior = jax.vmap(
            lambda rv, rw, tp, ln: _initial_priorities(
                rv, rw, tp, ln, Lmax, td_steps, discount, per_alpha
            )
        )(games["root_values"], games["reward"], games["to_play"],
          games["length"])
    else:
        # Uniform sampling still tracks lengths; priorities mark validity.
        idx = jnp.arange(Lmax)
        prior = (idx[None, :] < games["length"][:, None]).astype(jnp.float32)
    gpri = jnp.max(prior, axis=1)

    def body(carry, k):
        st = carry
        ln = games["length"][k]
        ok = valid[k] & (ln > 0)

        slot = st.num_played_games % G
        evicted = jnp.where(st.game_len[slot] > 0, st.game_len[slot], 0)

        def wr(buf, row):
            return jax.lax.cond(
                ok,
                lambda: jax.lax.dynamic_update_slice(
                    buf, row[None].astype(buf.dtype),
                    (slot,) + (0,) * row.ndim,
                ),
                lambda: buf,
            )

        st = st._replace(
            observations=wr(st.observations, games["observation"][k]),
            actions=wr(st.actions, games["action"][k]),
            rewards=wr(st.rewards, games["reward"][k]),
            to_play=wr(st.to_play, games["to_play"][k]),
            child_visits=wr(st.child_visits, games["child_visits"][k]),
            root_values=wr(st.root_values, games["root_values"][k]),
            priorities=wr(st.priorities, prior[k]),
            game_priority=jnp.where(
                ok, st.game_priority.at[slot].set(gpri[k]), st.game_priority
            ),
            game_len=jnp.where(
                ok, st.game_len.at[slot].set(ln), st.game_len
            ),
            game_id=jnp.where(
                ok,
                st.game_id.at[slot].set(st.num_played_games),
                st.game_id,
            ),
            num_played_games=st.num_played_games + ok.astype(jnp.int32),
            total_samples=st.total_samples
            + jnp.where(ok, ln - evicted, 0),
        )
        return st, None

    state, _ = jax.lax.scan(body, state, jnp.arange(K))
    return state


def sample_indices(state: DeviceReplay, rng, batch_size, use_per=True):
    """Two-level PER draw: (slots [B], positions [B], game_probs [B],
    pos_probs [B]). Distributions match replay.sample_n_games /
    sample_position (reference replay_buffer.py:140-195)."""
    kg, kp = jax.random.split(rng)
    live = state.game_len > 0
    if use_per:
        gp = jnp.where(live, state.game_priority, 0.0)
    else:
        gp = live.astype(jnp.float32)
    gsum = jnp.maximum(jnp.sum(gp), 1e-30)
    logits = jnp.where(live, jnp.log(jnp.maximum(gp, 1e-30)), -jnp.inf)
    slots = jax.random.categorical(kg, logits, shape=(batch_size,))
    game_probs = gp[slots] / gsum

    pr = state.priorities[slots]  # [B, Lmax]
    Lmax = pr.shape[1]
    lens = state.game_len[slots]
    in_game = jnp.arange(Lmax)[None, :] < lens[:, None]
    if use_per:
        rowsum = jnp.sum(pr, axis=1, keepdims=True)
        # All-zero priority rows fall back to uniform over the game
        # (numpy's cumsum inversion picks position 0 there; uniform is the
        # sane device equivalent and only reachable when every position
        # priority is exactly 0).
        p = jnp.where(rowsum > 0, pr, in_game.astype(jnp.float32))
    else:
        p = in_game.astype(jnp.float32)
    plogits = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)), -jnp.inf)
    pos = jax.random.categorical(kp, plogits, axis=-1)
    pos_probs = jnp.take_along_axis(
        p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30),
        pos[:, None], axis=1,
    )[:, 0]
    return slots, pos, game_probs, pos_probs


def _stack_observations(obs, actions, pos, num_stacked, num_actions):
    """Stacked observation for one game at `pos`: jnp port of
    ops.stacking.stack_observations_np (reference self_play.py:513-550)."""
    L, c, h, w = obs.shape
    parts = [obs[pos]]
    for back in range(1, num_stacked + 1):
        past = pos - back
        okp = past >= 0
        past_c = jnp.maximum(past, 0)
        parts.append(jnp.where(okp, obs[past_c], 0.0))
        plane = jnp.where(
            okp, actions[past_c + 1].astype(jnp.float32) / num_actions, 0.0
        )
        parts.append(jnp.broadcast_to(plane, (1, h, w)))
    return jnp.concatenate(parts, axis=0)


def assemble_batch(state: DeviceReplay, rng, slots, pos, game_probs,
                   pos_probs, *, num_unroll_steps, td_steps, discount,
                   num_actions, num_stacked, use_per=True):
    """Training batch for the sampled (slot, pos) pairs — jnp port of
    replay.make_target + get_batch (reference replay_buffer.py:70-138,
    :264-303). Returns (index_batch [B, 3] = (game_id, pos, slot), batch)."""
    U = num_unroll_steps
    B = slots.shape[0]
    steps = jnp.arange(U + 1)

    def one(slot, p, krand):
        ln = state.game_len[slot]
        idx = p + steps
        in_game = idx < ln
        boundary = idx == ln
        values = jnp.where(
            in_game,
            compute_target_values(
                state.root_values[slot], state.rewards[slot],
                state.to_play[slot], ln, idx, td_steps, discount,
            ),
            0.0,
        )
        idx_r = jnp.clip(idx, 0, ln)
        rewards = jnp.where(
            in_game | boundary, state.rewards[slot][idx_r], 0.0
        )
        idx_p = jnp.clip(idx, 0, jnp.maximum(ln - 1, 0))
        uniform = jnp.full((num_actions,), 1.0 / num_actions, jnp.float32)
        policies = jnp.where(
            in_game[:, None], state.child_visits[slot][idx_p], uniform
        )
        actions = jnp.where(
            in_game | boundary,
            state.actions[slot][idx_r],
            jax.random.randint(krand, (U + 1,), 0, num_actions),
        ).astype(jnp.int32)
        obs = _stack_observations(
            state.observations[slot], state.actions[slot], p, num_stacked,
            num_actions,
        )
        # len(action_history) - pos = ln + 1 - pos (replay_buffer.py:103-111)
        grad_scale = jnp.full(
            (U + 1,), jnp.minimum(U, ln + 1 - p).astype(jnp.float32)
        )
        return obs, actions, values, rewards, policies, grad_scale

    ks = jax.random.split(rng, B)
    obs, actions, values, rewards, policies, grad_scale = jax.vmap(one)(
        slots, pos, ks
    )
    if use_per:
        w = 1.0 / (
            jnp.maximum(state.total_samples, 1).astype(jnp.float32)
            * jnp.maximum(game_probs, 1e-30)
            * jnp.maximum(pos_probs, 1e-30)
        )
        weights = (w / jnp.max(w)).astype(jnp.float32)
    else:
        weights = jnp.ones((B,), jnp.float32)

    index_batch = jnp.stack(
        [state.game_id[slots], pos, slots], axis=1
    )  # (game_id, pos, slot)
    batch = {
        "observation": obs,
        "action": actions,
        "target_value": values,
        "target_reward": rewards,
        "target_policy": policies,
        "weight": weights,
        "gradient_scale": grad_scale,
    }
    return index_batch, batch


def get_batch(state: DeviceReplay, rng, batch_size, *, num_unroll_steps,
              td_steps, discount, num_actions, num_stacked, use_per=True):
    """sample_indices + assemble_batch in one jittable call."""
    ks, ka = jax.random.split(rng)
    slots, pos, gprob, pprob = sample_indices(
        state, ks, batch_size, use_per=use_per
    )
    return assemble_batch(
        state, ka, slots, pos, gprob, pprob,
        num_unroll_steps=num_unroll_steps, td_steps=td_steps,
        discount=discount, num_actions=num_actions,
        num_stacked=num_stacked, use_per=use_per,
    )


def update_priorities(state: DeviceReplay, priorities, index_batch):
    """Stale-guarded priority write-back (replay_buffer.py:205-228).

    priorities [B, U+1]; index_batch [B, 3] = (game_id, pos, slot). Updates
    only land where the slot still holds the sampled game (FIFO ring parity
    with the reference's `game_id >= oldest` guard) and inside the game
    length. Duplicate (slot, pos) rows resolve to one of the writes
    (XLA scatter; the reference applies them in batch order — last wins —
    which for equal sampled positions of the same game is the same set of
    possible outcomes)."""
    B, U1 = priorities.shape
    Lmax = state.priorities.shape[1]
    gid, pos, slot = index_batch[:, 0], index_batch[:, 1], index_batch[:, 2]
    fresh = state.game_id[slot] == gid  # [B]
    cols = pos[:, None] + jnp.arange(U1)[None, :]  # [B, U+1]
    ln = state.game_len[slot]
    ok = fresh[:, None] & (cols < ln[:, None]) & (cols < Lmax)
    cols_c = jnp.minimum(cols, Lmax - 1)
    # Masked-out updates are ROUTED OUT OF BOUNDS and dropped — scattering
    # a "keep current" value instead would collide with a fresh row's
    # update at the same (slot, pos) and could clobber it (caught by
    # test_update_priorities_stale_guard_and_clip).
    G = state.priorities.shape[0]
    rows = jnp.where(ok, jnp.broadcast_to(slot[:, None], cols.shape), G)
    pr = state.priorities.at[rows, cols_c].set(priorities, mode="drop")
    # game_priority = max over positions for touched slots (cheap to
    # recompute for all slots: one [G, Lmax] row reduce).
    gpri = jnp.max(pr, axis=1)
    return state._replace(priorities=pr, game_priority=gpri)


def pad_games_np(games, max_len, obs_shape, num_actions, k_pad):
    """Pad a list of host GameHistory objects into fixed-shape [k_pad, ...]
    chunks for the jitted save_games (static K keeps one executable across
    loops). Returns a list of (games_dict, valid) chunks."""
    import numpy as np

    c, h, w = obs_shape
    chunks = []
    for at in range(0, len(games), k_pad):
        part = games[at: at + k_pad]
        out = {
            "observation": np.zeros((k_pad, max_len, c, h, w), np.float32),
            "action": np.zeros((k_pad, max_len + 1), np.int32),
            "reward": np.zeros((k_pad, max_len + 1), np.float32),
            "to_play": np.zeros((k_pad, max_len + 1), np.int32),
            "child_visits": np.zeros((k_pad, max_len, num_actions),
                                     np.float32),
            "root_values": np.zeros((k_pad, max_len), np.float32),
            "length": np.zeros((k_pad,), np.int32),
        }
        valid = np.zeros((k_pad,), bool)
        for k, gh in enumerate(part):
            L = min(len(gh), max_len)
            out["observation"][k, :L] = gh.observations[:L]
            out["action"][k, : L + 1] = gh.actions[: L + 1]
            out["reward"][k, : L + 1] = gh.rewards[: L + 1]
            out["to_play"][k, : L + 1] = gh.to_play[: L + 1]
            out["child_visits"][k, :L] = gh.child_visits[:L]
            rv = (
                gh.root_values
                if gh.reanalysed_predicted_root_values is None
                else gh.reanalysed_predicted_root_values
            )
            out["root_values"][k, :L] = rv[:L]
            out["length"][k] = L
            valid[k] = True
        chunks.append((out, valid))
    return chunks


def make_device_train(runner, config, fused_train_raw, M):
    """ONE dispatch for the whole train inner phase: sample M PER batches
    from the HBM ring, run M train steps, write the new priorities back —
    zero host involvement (the TPU-native counterpart of the reference's
    replay-actor -> trainer-actor round trip, trainer.py:124-137 +
    replay_buffer.py:205-228).

    fused_train_raw: make_fused_train_steps(runner, config, jit=False).
    Returns a jitted fn(dev_replay, train_state, rng) ->
    (dev_replay, train_state, metrics)."""
    cfg = config
    B = cfg.batch_size
    use_per = bool(cfg.PER)

    def step(dev: DeviceReplay, state, rng):
        ks = jax.random.split(rng, M)
        ibs, batches = jax.vmap(
            lambda k: get_batch(
                dev, k, B,
                num_unroll_steps=cfg.num_unroll_steps,
                td_steps=cfg.td_steps, discount=cfg.discount,
                num_actions=len(cfg.action_space),
                num_stacked=cfg.stacked_observations, use_per=use_per,
            )
        )(ks)
        state, metrics, priorities = fused_train_raw(state, batches)
        if use_per:
            for m in range(M):
                dev = update_priorities(dev, priorities[m], ibs[m])
        return dev, state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def update_reanalysed_values(state: DeviceReplay, slot, game_id, values):
    """Overwrite a game's root values with fresh ones (reanalyse;
    reference replay_buffer.py:365-369 + stale guard :197-203)."""
    fresh = state.game_id[slot] == game_id
    rv = jax.lax.cond(
        fresh,
        lambda: jax.lax.dynamic_update_slice(
            state.root_values, values[None].astype(jnp.float32), (slot, 0)
        ),
        lambda: state.root_values,
    )
    return state._replace(root_values=rv)
