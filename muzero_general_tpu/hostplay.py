"""Host-path self-play driver for non-jittable envs.

Same contract as selfplay.SelfPlayDriver (play() -> completed GameHistory
list + stats) but env transitions run on the host while the batched MCTS for
all N env instances runs on device each move. Covers the reference's gym /
Box2D / ALE / OpenSpiel games (SURVEY.md §7 host/device split).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.replay import GameHistory


class HostSelfPlayDriver:
    def __init__(self, env_factory, runner, config, num_games: Optional[int] = None,
                 seed: Optional[int] = None, mesh=None, greedy_lanes: int = 0):
        self.config = config
        self.runner = runner
        self.G = num_games or config.parallel_games
        self.greedy_lanes = greedy_lanes
        # Optional dp mesh: the device-side batched search shards over the
        # lane axis via input placement (the search is plain XLA here, so
        # GSPMD propagation is enough — no shard_map needed).
        self._sharding = None
        if mesh is not None and mesh.shape.get("dp", 1) > 1 and self.G % mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P("dp"))
        base_seed = config.seed if seed is None else seed
        self.envs = [env_factory(seed=base_seed + i) for i in range(self.G)]
        env0 = self.envs[0]
        self.A = env0.num_actions
        self.obs_shape = tuple(env0.observation_shape)
        self.n = config.stacked_observations
        # Pipelined halves dispatch G/2-lane searches; size the spec's
        # Pallas block gating to the batch the device actually sees.
        search_batch = (
            self.G // 2
            if (
                bool(getattr(config, "host_pipeline", False))
                and self.G >= 2
                and self.G % 2 == 0
            )
            else self.G
        )
        self.spec = mcts_ops.SearchSpec.from_config(
            config, batch_size=search_batch
        )
        self._rng = jax.random.PRNGKey(base_seed)

        runner_ref = runner
        # BN folding for the per-move search (see selfplay.SelfPlayDriver):
        # host games with ResNet nets (e.g. atari) fold once per move batch.
        fold_bn = (
            bool(getattr(config, "fold_bn_inference", True))
            and runner.folded_module is not None
        )

        @jax.jit
        def search_and_select(variables, stacked, legal, to_play, temperature, rng):
            if fold_bn:
                variables = runner_ref.fold_variables(variables)
                infer_initial = runner_ref.initial_inference_folded
                infer_recurrent = runner_ref.recurrent_inference_folded
            else:
                infer_initial = runner_ref.initial_inference
                infer_recurrent = runner_ref.recurrent_inference
            out = mcts_ops.run_mcts(
                lambda o: infer_initial(variables, o),
                lambda h, a: infer_recurrent(variables, h, a),
                stacked, legal, to_play, rng, self.spec,
                add_exploration_noise=True,
            )
            # One search per move: both the temperature-sampled action and
            # the greedy action (used past temperature_threshold, reference
            # self_play.py:151-157) come from the SAME search's visit counts,
            # with independent selection keys.
            k_hot, k_cold = jax.random.split(jax.random.fold_in(rng, 7))
            action = mcts_ops.select_action(
                k_hot, out.root_visit_counts, legal, temperature
            )
            greedy = mcts_ops.select_action(
                k_cold, out.root_visit_counts, legal, jnp.float32(0.0)
            )
            return (
                action,
                greedy,
                mcts_ops.visit_policy(out.root_visit_counts),
                out.root_value,
                out.root_predicted_value,
                out.max_tree_depth,
            )

        self._search = search_and_select

        # Rings: slot 0 = newest
        self._obs_hist = np.zeros((self.G, self.n + 1) + self.obs_shape, np.float32)
        self._act_hist = np.zeros((self.G, self.n + 1), np.int32)
        self._move_count = np.zeros(self.G, np.int32)
        self._records = [self._empty() for _ in range(self.G)]
        for g, env in enumerate(self.envs):
            self._obs_hist[g, 0] = env.reset()

    def _empty(self):
        return {"obs": [], "act": [], "rew": [], "tp": [], "cv": [], "rv": []}

    def _stacked(self):
        """Stack rings -> [G, C*(n+1)+n, H, W] (same layout as ops.stacking)."""
        parts = [self._obs_hist[:, 0]]
        c, h, w = self.obs_shape
        for k in range(1, self.n + 1):
            plane = np.broadcast_to(
                (self._act_hist[:, k - 1, None, None, None] / self.A).astype(
                    np.float32
                ),
                (self.G, 1, h, w),
            )
            parts.append(self._obs_hist[:, k])
            parts.append(plane)
        return np.concatenate(parts, axis=1)

    def _put(self, x):
        return (
            jax.device_put(x, self._sharding)
            if self._sharding is not None
            else jnp.asarray(x)
        )

    def _dispatch(self, variables, lo, hi, temperature):
        """Build the [lo:hi) lane slice's inputs and dispatch its search
        (async — jit returns device futures)."""
        stacked = self._stacked()[lo:hi]
        legal = np.stack([e.legal_actions_mask() for e in self.envs[lo:hi]])
        to_play = np.array(
            [e.to_play() for e in self.envs[lo:hi]], np.int32
        )
        self._rng, k = jax.random.split(self._rng)
        out = self._search(
            variables,
            self._put(stacked),
            self._put(legal),
            self._put(to_play),
            jnp.float32(temperature),
            k,
        )
        return out, to_play

    def _host_phase(self, lo, hi, out, to_play, completed, eval_games):
        """Consume one half's finished search: select actions, step its envs,
        record, cut episodes. Returns (pv slice, max depth seen)."""
        # ONE batched pull for all six outputs: per-array np.asarray pays a
        # tunnel round-trip each (CLAUDE.md r3 fact; ~ms-class per move).
        action, greedy, cv, rv, pv, depth = jax.device_get(out)
        tt = self.config.temperature_threshold
        if tt:
            # temperature 0 after the threshold (reference self_play.py:151-157)
            action = np.where(self._move_count[lo:hi] >= tt, greedy, action)
        if self.greedy_lanes:
            lanes = np.arange(lo, hi)
            action = np.where(lanes < self.greedy_lanes, greedy, action)
        cv, rv = np.asarray(cv), np.asarray(rv)

        for j, g in enumerate(range(lo, hi)):
            env = self.envs[g]
            obs_now = self._obs_hist[g, 0]
            obs2, reward, done = env.step(int(action[j]))
            p = self._records[g]
            p["obs"].append(obs_now)
            p["act"].append(int(action[j]))
            p["rew"].append(float(reward))
            p["tp"].append(int(to_play[j]))
            p["cv"].append(cv[j])
            p["rv"].append(float(rv[j]))
            self._move_count[g] += 1
            done = done or self._move_count[g] >= self.config.max_moves
            if done:
                sink = eval_games if g < self.greedy_lanes else completed
                sink.append(self._finish(g, env.to_play()))
                obs2 = env.reset()
                self._obs_hist[g] = 0
                self._act_hist[g] = 0
                self._move_count[g] = 0
            else:
                self._obs_hist[g, 1:] = self._obs_hist[g, :-1]
                self._act_hist[g, 1:] = self._act_hist[g, :-1]
                self._act_hist[g, 0] = action[j]
            self._obs_hist[g, 0] = obs2
        return pv, int(np.asarray(depth).max())

    def play(self, variables, temperature: float, num_moves: Optional[int] = None,
             add_noise: bool = True):
        """Same contract as SelfPlayDriver.play: greedy-lane episodes arrive
        in stats["eval_games"], never in the returned replay list.

        Double-buffered schedule (config.host_pipeline, opt-in): the env
        fleet is split in two halves, and while the device searches one
        half's batch the host steps the OTHER half's envs and assembles its
        next inputs — env transition time hides behind device search time
        instead of strictly alternating with it (the reference's loop, and
        this driver's pre-r5 loop, serialize the two). Each lane still
        receives exactly one search per move with the same per-lane
        semantics; only the dispatch schedule changes.
        """
        K = num_moves or self.config.selfplay_chunk_moves
        completed = []
        eval_games = []
        max_depth_seen = 0

        pipelined = (
            bool(getattr(self.config, "host_pipeline", False))
            and self.G >= 2
            and self.G % 2 == 0
        )
        halves = (
            [(0, self.G // 2), (self.G // 2, self.G)]
            if pipelined
            else [(0, self.G)]
        )

        # Prologue: one in-flight search per half.
        inflight = [
            self._dispatch(variables, lo, hi, temperature) for lo, hi in halves
        ]
        pv_parts = [None] * len(halves)
        for m in range(K):
            for h, (lo, hi) in enumerate(halves):
                out, to_play = inflight[h]
                pv, d = self._host_phase(
                    lo, hi, out, to_play, completed, eval_games
                )
                pv_parts[h] = pv
                max_depth_seen = max(max_depth_seen, d)
                if m + 1 < K:
                    # Re-dispatch this half; the device overlaps it with the
                    # other half's host phase.
                    inflight[h] = self._dispatch(variables, lo, hi, temperature)

        stats = {"env_steps": K * self.G, "max_tree_depth": max_depth_seen,
                 "pred_values": np.concatenate(
                     [np.asarray(p) for p in pv_parts]
                 ),
                 "eval_games": eval_games}
        if self.greedy_lanes:
            # Running reward of lane 0's in-progress eval episode (records
            # are cleared by _finish, so this is exactly the open episode).
            stats["eval_partial_reward"] = float(
                np.sum(self._records[0]["rew"])
            )
        return completed, stats

    def _finish(self, g, final_to_play) -> GameHistory:
        p = self._records[g]
        gh = GameHistory(
            observations=np.stack(p["obs"]).astype(np.float32),
            actions=np.concatenate([[0], p["act"]]).astype(np.int32),
            rewards=np.concatenate([[0.0], p["rew"]]).astype(np.float32),
            to_play=np.concatenate([p["tp"], [final_to_play]]).astype(np.int32),
            child_visits=np.stack(p["cv"]).astype(np.float32),
            root_values=np.asarray(p["rv"], np.float32),
        )
        self._records[g] = self._empty()
        return gh
