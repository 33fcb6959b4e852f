"""Batched on-device self-play driver.

Re-design of the reference's per-actor sequential play loop
(reference self_play.py:110-183 play_game, :31-108 continuous_self_play):
G games advance in lockstep inside one jitted function — observation
stacking, batched MCTS, temperature action sampling, env step, and auto-reset
all under jit, scanned over `selfplay_chunk_moves` moves per host dispatch.
The host only accumulates the emitted per-move records and cuts them into
complete `GameHistory` episodes at done boundaries.

The `num_workers` Ray actors of the reference become the batch dimension G
(SURVEY.md §2.8 → §7); per-worker seeding (reference muzero.py:185) becomes
per-lane PRNG key folding.

Multi-chip: given a `jax.sharding.Mesh`, the G lanes are sharded over the
mesh's `dp` axis with `jax.shard_map` — each device runs the whole search
(including the Pallas kernels) on its G/dp local lanes, no collectives
needed. This is the TPU counterpart of the reference scaling acting with N
Ray actors over a cluster (reference muzero.py:177-196).

Evaluation is folded in as greedy lanes: lanes [0, greedy_lanes) play at
temperature 0 inside the same batch (the reference's dedicated test-mode
worker, self_play.py:54-90) and their episodes are returned separately in
stats["eval_games"] so the orchestrator never pays a second dispatch.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from muzero_general_tpu.ops import gumbel as gumbel_ops
from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops import mcts_fused
from muzero_general_tpu.ops.stacking import (
    push_history,
    reset_history,
    stack_observations,
)
from muzero_general_tpu.replay import GameHistory


class SelfPlayCarry(NamedTuple):
    env_state: object  # vmapped env state pytree [G, ...]
    obs_hist: jnp.ndarray  # [G, n+1, C, H, W]
    act_hist: jnp.ndarray  # [G, n+1]
    move_count: jnp.ndarray  # [G] int32 moves played in current episode
    rng: jnp.ndarray  # [n_shards, 2] one PRNG key per dp shard


class MoveRecord(NamedTuple):
    """Per-move emission, leading dims [K, G]."""

    observation: jnp.ndarray  # [K, G, C, H, W] obs the move was taken from
    action: jnp.ndarray  # [K, G]
    reward: jnp.ndarray  # [K, G]
    done: jnp.ndarray  # [K, G] bool — episode ended on this move
    to_play: jnp.ndarray  # [K, G] player at the observation
    to_play_next: jnp.ndarray  # [K, G] player at the post-move state
    child_visits: jnp.ndarray  # [K, G, A]
    root_value: jnp.ndarray  # [K, G]
    pred_value: jnp.ndarray  # [K, G] network value at root
    max_tree_depth: jnp.ndarray  # [K, G]


class SelfPlayDriver:
    def __init__(self, env, runner, config, num_games: Optional[int] = None,
                 seed: Optional[int] = None, mesh=None, greedy_lanes: int = 0):
        self.env = env
        self.runner = runner
        self.config = config
        self.G = num_games or config.parallel_games
        self.greedy_lanes = greedy_lanes
        # dp sharding of the lane axis: each device runs G/dp lanes.
        self.mesh = mesh
        self.dp = 1
        if mesh is not None and mesh.shape.get("dp", 1) > 1:
            dp = mesh.shape["dp"]
            if self.G % dp == 0:
                self.dp = dp
            else:
                print(
                    f"[selfplay] parallel_games={self.G} not divisible by "
                    f"mesh dp={dp}; running self-play unsharded."
                )
                self.mesh = None
        Gl = self.G // self.dp  # lanes per shard; batch size seen by MCTS
        self._Gl = Gl
        self.use_gumbel = bool(getattr(config, "use_gumbel_mcts", False))
        if self.use_gumbel:
            self.gumbel_spec = gumbel_ops.GumbelSpec.from_config(config)
        self.spec = mcts_ops.SearchSpec.from_config(config, batch_size=Gl)
        # Fully-fused single-kernel search (ops/mcts_fused.py): FC networks
        # whose tree+weights fit VMEM blocks; falls back to the staged paths.
        # "auto" (the default) engages it on real TPU backends only — CPU
        # runs would go through the slow Pallas interpreter.
        self.use_fused = (
            mcts_ops.resolve_fast_path_flag(
                getattr(config, "use_fused_search", False), config
            )
            and not self.use_gumbel
            and config.network == "fullyconnected"
            and mcts_fused.choose_block(
                Gl,
                config.num_simulations + 1,
                len(config.action_space),
                config.encoding_size,
                weight_bytes=mcts_fused.fc_weight_bytes(config),
            )
            is not None
        )
        if self.use_fused:
            self.fused_spec = mcts_fused.FusedSpec.from_config(
                config,
                interpret=bool(getattr(config, "pallas_interpret", False)),
            )
        # BN folding for the search path (ResNet only): the batch norms are
        # folded into conv weights ONCE per play chunk, so each of the
        # num_simulations recurrent inferences per move runs conv+relu with
        # no separate normalization pass (~half the per-sim ResNet ops were
        # latency-bound BN/relu fusions — r3 profile, CLAUDE.md backlog).
        self.fold_bn = (
            bool(getattr(config, "fold_bn_inference", True))
            and runner.folded_module is not None
        )
        self.A = env.num_actions
        n = config.stacked_observations
        c, h, w = env.observation_shape
        self._obs_shape = (c, h, w)
        self._n = n
        self._rng = jax.random.PRNGKey(config.seed if seed is None else seed)
        self._carry = None
        # Per-lane lists of record slabs ([T, ...] arrays) awaiting a done cut
        self._pending = [[] for _ in range(self.G)]
        # Running reward of the greedy eval lane's in-progress episode, so
        # the operator console isn't stale for long-episode games (an eval
        # episode only *completes* every max_moves/chunk_moves loops).
        self._eval_partial = 0.0
        self._chunk_cache = {}
        self._build()

    def _build(self):
        env, runner, config = self.env, self.runner, self.config
        A, n = self.A, self._n
        Gl = self._Gl  # local (per-shard) lane count
        spec = self.spec
        temperature_threshold = config.temperature_threshold

        v_reset = jax.vmap(env.reset)
        v_obs = jax.vmap(env.observation)
        v_step = jax.vmap(env.step)
        v_legal = jax.vmap(env.legal_actions_mask)
        v_to_play = jax.vmap(env.to_play)

        if self.fold_bn:
            infer_initial = runner.initial_inference_folded
            infer_recurrent = runner.recurrent_inference_folded
        else:
            infer_initial = runner.initial_inference
            infer_recurrent = runner.recurrent_inference

        def init_carry(rng_shards):
            k0, k1 = jax.random.split(rng_shards[0])
            states = v_reset(jax.random.split(k0, Gl))
            obs0 = v_obs(states)
            obs_hist = jnp.zeros((Gl, n + 1) + self._obs_shape).at[:, 0].set(obs0)
            act_hist = jnp.zeros((Gl, n + 1), jnp.int32)
            return SelfPlayCarry(states, obs_hist, act_hist,
                                 jnp.zeros((Gl,), jnp.int32), k1[None])

        def one_move(variables, carry, temperature, add_noise):
            rng, k_mcts, k_sel, k_step, k_reset = jax.random.split(
                carry.rng[0], 5
            )
            stacked = stack_observations(carry.obs_hist, carry.act_hist, A)
            legal = v_legal(carry.env_state)
            to_play = v_to_play(carry.env_state)

            if self.use_gumbel:
                # Gumbel MuZero: exploration comes from the root Gumbel draw,
                # so "hot" = the search's chosen action and "cold" (eval /
                # past temperature_threshold) = argmax improved policy.
                out = gumbel_ops.run_gumbel_mcts(
                    lambda o: infer_initial(variables, o),
                    lambda h, a: infer_recurrent(variables, h, a),
                    stacked, legal, to_play, k_mcts, self.gumbel_spec,
                    add_gumbel=add_noise,
                )
                a_hot, a_cold = out.action, out.greedy_action
                policy_target = out.improved_policy
                cold = (
                    (carry.move_count >= temperature_threshold)
                    if temperature_threshold
                    else jnp.zeros_like(carry.move_count, bool)
                ) | (temperature <= 0)
                action = jnp.where(cold, a_cold, a_hot)
            else:
                if self.use_fused:
                    out = mcts_fused.run_mcts_fused(
                        lambda o: infer_initial(variables, o),
                        variables, stacked, legal, to_play, k_mcts,
                        self.fused_spec, add_exploration_noise=add_noise,
                    )
                else:
                    out = mcts_ops.run_mcts(
                        lambda o: infer_initial(variables, o),
                        lambda h, a: infer_recurrent(variables, h, a),
                        stacked, legal, to_play, k_mcts, spec,
                        add_exploration_noise=add_noise,
                    )
                policy_target = mcts_ops.visit_policy(out.root_visit_counts)

                # Per-lane temperature (a [Gl] vector: greedy eval lanes run
                # at 0 inside the same batch); drops to 0 after
                # temperature_threshold moves (reference self_play.py:151-157).
                a_hot = mcts_ops.select_action(
                    k_sel, out.root_visit_counts, legal, temperature
                )
                if temperature_threshold:
                    a_cold = mcts_ops.select_action(
                        k_sel, out.root_visit_counts, legal, jnp.float32(0.0)
                    )
                    action = jnp.where(
                        carry.move_count < temperature_threshold, a_hot, a_cold
                    )
                else:
                    action = a_hot

            states2, reward, done = v_step(
                carry.env_state, action, jax.random.split(k_step, Gl)
            )
            # Enforce max_moves on device so host episode cuts and env resets
            # stay in lockstep (reference stops the play loop at max_moves,
            # self_play.py:129-131).
            done = done | (carry.move_count + 1 >= config.max_moves)
            record = MoveRecord(
                observation=carry.obs_hist[:, 0],
                action=action,
                reward=reward,
                done=done,
                to_play=to_play,
                to_play_next=v_to_play(states2),
                child_visits=policy_target,
                root_value=out.root_value,
                pred_value=out.root_predicted_value,
                max_tree_depth=out.max_tree_depth,
            )

            # Push history, then auto-reset finished lanes.
            new_obs = v_obs(states2)
            obs_hist, act_hist = push_history(
                carry.obs_hist, carry.act_hist, new_obs, action
            )
            fresh = v_reset(jax.random.split(k_reset, Gl))
            states3 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    done.reshape((Gl,) + (1,) * (a.ndim - 1)), a, b
                ),
                fresh, states2,
            )
            obs0 = v_obs(states3)
            obs_hist, act_hist = reset_history(obs_hist, act_hist, obs0, done)
            move_count = jnp.where(done, 0, carry.move_count + 1)
            return (
                SelfPlayCarry(states3, obs_hist, act_hist, move_count,
                              rng[None]),
                record,
            )

        def play_chunk(variables, carry, temperature, num_moves, add_noise):
            if self.fold_bn:
                # Fold once per chunk (tiny, params-sized) so every
                # simulation of every move runs the BN-free variant.
                variables = runner.fold_variables(variables)

            def body(carry, _):
                return one_move(variables, carry, temperature, add_noise)

            return jax.lax.scan(body, carry, None, length=num_moves)

        self._one_move = one_move
        self._raw_play_chunk = play_chunk
        if self.dp > 1:
            # Lanes over dp: every leaf of the carry (and the [G] temperature
            # vector) is sharded on its leading axis; records come back
            # [K, G]-sharded on axis 1; params are replicated. The body needs
            # no collectives — each device searches its own lanes.
            # check_vma=False: the per-shard body mixes replicated loop
            # counters with varying lane state inside while_loops; there are
            # no collectives to typecheck (lanes are embarrassingly parallel).
            self._init_carry = jax.jit(
                jax.shard_map(
                    init_carry, mesh=self.mesh,
                    in_specs=P("dp"), out_specs=P("dp"),
                    check_vma=False,
                )
            )
        else:
            self._init_carry = jax.jit(init_carry)

    def _get_play_chunk(self, num_moves: int, add_noise: bool):
        key = (num_moves, add_noise)
        fn = self._chunk_cache.get(key)
        if fn is None:
            def chunk(variables, carry, temperature):
                return self._raw_play_chunk(
                    variables, carry, temperature, num_moves, add_noise
                )

            if self.dp > 1:
                fn = jax.jit(
                    jax.shard_map(
                        chunk, mesh=self.mesh,
                        in_specs=(P(), P("dp"), P("dp")),
                        out_specs=(P("dp"), P(None, "dp")),
                        check_vma=False,
                    )
                )
            else:
                fn = jax.jit(chunk)
            self._chunk_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def play(self, variables, temperature: float, num_moves: Optional[int] = None,
             add_noise: bool = True):
        """Advance all G games `num_moves` moves; return completed episodes.

        Returns (list[GameHistory], stats dict). Episodes of the greedy eval
        lanes (lane < greedy_lanes, played at temperature 0) are NOT in the
        returned list — they arrive in stats["eval_games"] and must not enter
        the replay buffer (reference test-mode worker, self_play.py:54-90).
        """
        if self._carry is None:
            self._rng, k = jax.random.split(self._rng)
            self._carry = self._init_carry(jax.random.split(k, self.dp))
        K = num_moves or self.config.selfplay_chunk_moves
        temp_vec = np.full((self.G,), temperature, np.float32)
        temp_vec[: self.greedy_lanes] = 0.0
        chunk_fn = self._get_play_chunk(K, add_noise)
        self._carry, rec = chunk_fn(
            variables, self._carry, jnp.asarray(temp_vec)
        )
        # device_get starts copy_to_host_async on EVERY leaf before blocking:
        # one tunnel round-trip for the whole record pytree instead of one
        # per array (tree_map(np.asarray, ...) cost ~60 ms/move of wall time
        # through the axon tunnel at connect4 size — device time is 73 ms).
        rec = jax.device_get(rec)

        completed = []
        eval_games = []
        stats = {
            "env_steps": K * self.G,
            "max_tree_depth": int(rec.max_tree_depth.max()),
            "pred_values": rec.pred_value,
            "eval_games": eval_games,
        }
        if self.greedy_lanes:
            done0 = np.flatnonzero(rec.done[:, 0])
            if done0.size:
                self._eval_partial = float(rec.reward[done0[-1] + 1 :, 0].sum())
            else:
                self._eval_partial += float(rec.reward[:, 0].sum())
            stats["eval_partial_reward"] = self._eval_partial
        for g in range(self.G):
            sink = eval_games if g < self.greedy_lanes else completed
            done_ks = np.flatnonzero(rec.done[:, g])
            start = 0
            for k in done_ks:
                self._pending[g].append(self._slab(rec, g, start, k + 1))
                sink.append(self._finish(g, rec.to_play_next[k, g]))
                start = k + 1
            if start < K:
                self._pending[g].append(self._slab(rec, g, start, K))
        return completed, stats

    @staticmethod
    def _slab(rec, g, a, b):
        return (
            rec.observation[a:b, g],
            rec.action[a:b, g],
            rec.reward[a:b, g],
            rec.to_play[a:b, g],
            rec.child_visits[a:b, g],
            rec.root_value[a:b, g],
        )

    def _finish(self, g, final_to_play) -> GameHistory:
        obs, act, rew, tp, cv, rv = (
            np.concatenate(parts) for parts in zip(*self._pending[g])
        )
        gh = GameHistory(
            observations=obs.astype(np.float32),
            actions=np.concatenate([[0], act]).astype(np.int32),
            rewards=np.concatenate([[0.0], rew]).astype(np.float32),
            to_play=np.concatenate([tp, [final_to_play]]).astype(np.int32),
            child_visits=cv.astype(np.float32),
            root_values=rv.astype(np.float32),
        )
        self._pending[g] = []
        return gh
