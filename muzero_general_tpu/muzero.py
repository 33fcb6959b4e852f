"""Orchestrator: the user-facing `MuZero` class, training loop, and CLI.

Parity target: reference muzero.py (MuZero class :24-479,
hyperparameter_search :495-581, CLI menu :622-712).

The reference's Ray actor fleet (SelfPlay×N ∥ Trainer ∥ ReplayBuffer ∥
Reanalyse ∥ SharedStorage, muzero.py:156-208) becomes a single-process
synchronous schedule sharing jitted params in HBM: the train:act `ratio` that
the reference approximates by bilateral sleeping (self_play.py:92-106,
trainer.py:109-122) is enforced exactly — after each self-play chunk the
learner catches up to ratio * num_played_steps. SharedStorage collapses to
the 17-key checkpoint dict held in-process (SURVEY.md §2.2, §5.8).
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu import checkpoint as ckpt_lib
from muzero_general_tpu import config as config_lib
from muzero_general_tpu.logger import MetricsLogger
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.ops.support import support_to_scalar
from muzero_general_tpu.hostplay import HostSelfPlayDriver
from muzero_general_tpu.replay import GameHistory, ReplayBuffer
from muzero_general_tpu.selfplay import SelfPlayDriver
from muzero_general_tpu.trainer import (
    TrainState,
    make_fused_train_steps,
    make_optimizer,
    make_train_step,
)


def two_player_reward_split(gh: GameHistory, muzero_player: int):
    """MuZero-vs-opponent reward split (reference self_play.py:74-90)."""
    mz = sum(
        float(r)
        for i, r in enumerate(gh.rewards)
        if i > 0 and gh.to_play[i - 1] == muzero_player
    )
    opp = sum(
        float(r)
        for i, r in enumerate(gh.rewards)
        if i > 0 and gh.to_play[i - 1] != muzero_player
    )
    return mz, opp


class MuZero:
    """Main class to manage MuZero (reference muzero.py:24-63 docstring API).

    Args:
        game_name: name of a module in muzero_general_tpu/games.
        config: optional dict of overrides or a full MuZeroConfig instance.
        split_resources_in: claim only 1/N of the visible devices, so N
            MuZero instances can run concurrently — the TPU counterpart of
            the reference's fractional-GPU budget (reference muzero.py:71-96,
            142-153; used by hyperparameter_search, muzero.py:525). Which
            1/N slice is taken is `slice_index` (default 0): unlike the
            reference, where Ray schedules each fractional budget onto free
            GPUs, there is no scheduler here — concurrent instances must
            claim distinct slice_index values (or pass explicit `devices=`,
            as search.py does) to get disjoint placement.
        slice_index: which 1/N contiguous slice split_resources_in claims.
        devices: explicit device group for this instance (overrides
            split_resources_in); all jitted programs and the mesh are pinned
            to it. Used by search.py to place concurrent experiments on
            disjoint device slices.
        distributed: multi-host scale-out — True (TPU-pod auto-detect) or a
            dict of jax.distributed.initialize kwargs (coordinator_address,
            num_processes, process_id). Every participating host constructs
            the same MuZero and calls train(): training shards over the
            GLOBAL mesh (gradient psum across hosts), self-play runs
            per-host on addressable devices, played-step counters are
            globally summed for the exact ratio, and only process 0 writes
            checkpoints/logs. The TPU counterpart of the reference's Ray
            cluster span (reference muzero.py:96, README.md:23); see
            parallel/distributed.py.
    """

    def __init__(self, game_name, config=None, split_resources_in=1,
                 devices=None, slice_index=0, distributed=None):
        if distributed:
            from muzero_general_tpu.parallel import distributed as dist_lib

            dist_lib.initialize_from_spec(distributed)
        self.game_name = game_name
        self._devices = list(devices) if devices else None
        if self._devices is None and split_resources_in > 1:
            fleet = jax.devices()
            per = max(1, len(fleet) // split_resources_in)
            lo = min(slice_index * per, len(fleet) - per)
            self._devices = fleet[lo : lo + per]
        game_module = config_lib.load_game_module(game_name)
        self.make_env = game_module.make_env
        self.config = game_module.MuZeroConfig()

        if config:
            if isinstance(config, dict):
                config_lib.apply_overrides(self.config, config)
            else:
                self.config = config

        if self.config.results_path is None:
            self.config.results_path = self.config.default_results_path(game_name)
        # JSON/CLI overrides deliver results_path as a str.
        self.config.results_path = pathlib.Path(self.config.results_path)

        np.random.seed(self.config.seed)

        self.runner = MuZeroNetwork(self.config)
        self.checkpoint = ckpt_lib.initial_checkpoint()
        self.replay_buffer_state = None
        self.summary = str(self.runner.module)

        # Materialize initial weights so the checkpoint is complete pre-train
        # (counterpart of reference CPUActor.get_initial_weights, muzero.py:120-122).
        variables = self.runner.init(jax.random.PRNGKey(self.config.seed))
        self.checkpoint["weights"] = ckpt_lib.to_host(variables)

    # ------------------------------------------------------------------
    def _variables(self, state: TrainState):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def _restore_state(self) -> TrainState:
        weights = self.checkpoint["weights"]
        params = jax.tree_util.tree_map(jnp.asarray, weights["params"])
        batch_stats = jax.tree_util.tree_map(
            jnp.asarray, weights.get("batch_stats", {})
        )
        tx = make_optimizer(self.config)
        if self.checkpoint["optimizer_state"] is not None:
            opt_state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                self.checkpoint["optimizer_state"],
            )
        else:
            opt_state = tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.int32(self.checkpoint["training_step"]),
        )

    def _sync_checkpoint(self, state: TrainState, replay: ReplayBuffer):
        self.checkpoint["weights"] = ckpt_lib.to_host(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        self.checkpoint["optimizer_state"] = ckpt_lib.to_host(state.opt_state)
        self.checkpoint["num_played_games"] = replay.num_played_games
        self.checkpoint["num_played_steps"] = replay.num_played_steps

    def _make_driver(self, runner, num_games=None, seed=None, mesh=None,
                     greedy_lanes=0):
        """Device driver for jittable envs, host driver otherwise."""
        env = self.make_env()
        if getattr(env, "host_env", False):
            return HostSelfPlayDriver(
                self.make_env, runner, self.config, num_games=num_games,
                seed=seed, mesh=mesh, greedy_lanes=greedy_lanes,
            )
        return SelfPlayDriver(
            env, runner, self.config, num_games=num_games, seed=seed,
            mesh=mesh, greedy_lanes=greedy_lanes,
        )

    # ------------------------------------------------------------------
    def _reanalyse_sweep(self, replay, reanalyse_fn, variables, place_obs=None,
                         on_update=None):
        """Batched value refresh (reference Reanalyse actor,
        replay_buffer.py:328-373, re-designed as scheduled device sweeps).

        Refreshes up to config.reanalyse_games_per_interval games round-robin
        in fixed-size padded chunks (one compile), so the whole buffer is
        refreshed at ~buffer rate instead of one game per interval.
        Returns the number of games refreshed.
        """
        cfg = self.config
        picked = replay.reanalyse_pick(cfg.reanalyse_games_per_interval)
        if not picked:
            return 0
        CHUNK = int(cfg.reanalyse_chunk_positions)
        obs_parts = [replay.reanalyse_observations(gh) for _, gh in picked]
        lengths = [o.shape[0] for o in obs_parts]
        all_obs = np.concatenate(obs_parts)
        P_total = all_obs.shape[0]
        out = np.empty((P_total,), np.float32)
        for start in range(0, P_total, CHUNK):
            block = all_obs[start : start + CHUNK]
            L = block.shape[0]
            if L < CHUNK:
                block = np.concatenate(
                    [block, np.zeros((CHUNK - L,) + block.shape[1:], np.float32)]
                )
            placed = (
                place_obs(block) if place_obs is not None else jnp.asarray(block)
            )
            vals = reanalyse_fn(variables, placed)
            out[start : start + L] = np.asarray(vals)[:L]
        off = 0
        for (gid, _), L in zip(picked, lengths):
            replay.update_reanalysed_values(gid, out[off : off + L])
            if on_update is not None:
                on_update(gid, out[off : off + L])
            off += L
        return len(picked)

    # ------------------------------------------------------------------
    def train(self, log_in_tensorboard=True):
        if self._devices:
            # Pin every jitted program of this instance (including unsharded
            # fallbacks) to the instance's device group so concurrent
            # experiments don't pile onto device 0.
            with jax.default_device(self._devices[0]):
                return self._train(log_in_tensorboard)
        return self._train(log_in_tensorboard)

    def _train(self, log_in_tensorboard=True):
        """Synchronous actor-learner training (reference muzero.py:132-208).

        Multi-chip is the product path: when more than one device is visible
        (or config.mesh_dp/mesh_mp ask for it), a dp×mp
        `jax.sharding.Mesh` is built once and BOTH programs ride it — the
        training step (batch over dp, large kernels over mp; the reference's
        DataParallel counterpart, models.py:98-124) and the self-play driver
        (the G lanes sharded over dp; the reference's SelfPlay×N actor fleet,
        muzero.py:177-196)."""
        cfg = self.config
        cfg.results_path.mkdir(parents=True, exist_ok=True)

        runner = self.runner
        state = self._restore_state()

        from muzero_general_tpu.parallel import (
            distributed as dist_lib,
            make_sharded_fused_train_steps,
            make_sharded_train_step,
            mesh_from_config,
            shard_batch,
            shard_stacked_batches,
            shard_train_state,
        )

        # Multi-host (jax.distributed initialized): the mesh spans every
        # process's devices; this host feeds its local dp shard of each
        # batch, self-play runs on addressable devices only, and process 0
        # owns all file output. See parallel/distributed.py for the design.
        n_proc = jax.process_count()
        is_main = jax.process_index() == 0
        if n_proc > 1:
            if int(getattr(cfg, "mesh_mp", 1) or 1) > 1:
                raise NotImplementedError(
                    "multi-host training requires mesh_mp=1 (params must be "
                    "fully replicated so hosts can read them locally)"
                )
            if cfg.batch_size % n_proc:
                raise ValueError(
                    f"batch_size={cfg.batch_size} not divisible by "
                    f"{n_proc} processes"
                )

        mesh = mesh_from_config(cfg, devices=self._devices)
        train_mesh = (
            mesh
            if mesh is not None and cfg.batch_size % mesh.shape["dp"] == 0
            else None
        )
        if mesh is not None and train_mesh is None:
            print(
                f"[train] batch_size={cfg.batch_size} not divisible by mesh "
                f"dp={mesh.shape['dp']}; training runs unsharded."
            )
        if train_mesh is not None:
            state = shard_train_state(state, train_mesh)
            train_step = make_sharded_train_step(runner, cfg, train_mesh)
            fused_train = (
                make_sharded_fused_train_steps(runner, cfg, train_mesh)
                if cfg.fused_train_steps and cfg.fused_train_steps > 1
                else None
            )
        else:
            train_step = make_train_step(runner, cfg)
            fused_train = (
                make_fused_train_steps(runner, cfg)
                if cfg.fused_train_steps and cfg.fused_train_steps > 1
                else None
            )

        def place_batch(batch):
            if n_proc > 1 and train_mesh is not None:
                return dist_lib.process_local_batch(batch, train_mesh)
            if train_mesh is not None:
                return shard_batch(batch, train_mesh)
            return {k: jnp.asarray(v) for k, v in batch.items()}

        def place_batches(batches):
            if n_proc > 1 and train_mesh is not None:
                return dist_lib.process_local_batch(
                    batches, train_mesh, batch_axis=1
                )
            if train_mesh is not None:
                return shard_stacked_batches(batches, train_mesh)
            return {k: jnp.asarray(v) for k, v in batches.items()}

        # Evaluation rides lane 0 of the main self-play program at
        # temperature 0 (the reference's dedicated test-mode worker,
        # self_play.py:54-90) — continuous greedy eval with zero extra
        # dispatches. 2-player games with a scripted opponent keep a separate
        # periodic evaluation game instead.
        needs_self_test_lane = not (
            len(cfg.players) > 1 and cfg.opponent not in (None, "self")
        )
        # Multi-host: self-play stays on this host's addressable devices
        # (the reference's per-node SelfPlay actors, muzero.py:177-196);
        # lanes are seeded per process so hosts explore independently.
        sp_mesh = mesh
        sp_seed = cfg.seed
        if n_proc > 1:
            from muzero_general_tpu.parallel import create_mesh

            local = jax.local_devices()
            sp_mesh = (
                create_mesh(num_dp=len(local), num_mp=1, devices=local)
                if len(local) > 1
                else None
            )
            sp_seed = cfg.seed + 100003 * jax.process_index()
        driver = self._make_driver(
            runner, seed=sp_seed, mesh=sp_mesh,
            greedy_lanes=1 if needs_self_test_lane else 0,
        )

        # Multi-host: each host's replay holds its own games and contributes
        # a 1/n_proc shard of every global batch.
        replay_cfg = cfg
        if n_proc > 1:
            import copy

            replay_cfg = copy.copy(cfg)
            replay_cfg.batch_size = cfg.batch_size // n_proc
        if self.replay_buffer_state is not None:
            replay = ReplayBuffer(
                replay_cfg,
                self.replay_buffer_state["buffer"],
                self.replay_buffer_state["num_played_games"],
                self.replay_buffer_state["num_played_steps"],
            )
        else:
            replay = ReplayBuffer(replay_cfg)

        logger = (
            MetricsLogger(cfg.results_path, cfg, self.summary)
            if log_in_tensorboard and is_main
            else None
        )

        prefetcher = None
        if cfg.batch_prefetch:
            from muzero_general_tpu.prefetch import BatchPrefetcher

            prefetcher = BatchPrefetcher(
                replay, depth=max(2, int(cfg.fused_train_steps))
            )

        def next_batches(n):
            if prefetcher is not None:
                return prefetcher.take(n)
            return [replay.get_batch() for _ in range(n)]

        # ---- device-side replay (opt-in, ops/device_replay.py) -----------
        # The train inner phase becomes ONE device dispatch: sample M PER
        # batches from the HBM game ring, M train steps, priorities written
        # back in-place. Host keeps its buffer for counters, reanalyse and
        # persistence; completed games are pushed to the ring once per loop.
        dev_replay_state = None
        dev_train = None
        dev_save = None
        _DEV_K_PAD = 8
        if (
            bool(getattr(cfg, "device_replay", False))
            and n_proc == 1
            and train_mesh is None
            and cfg.fused_train_steps
            and cfg.fused_train_steps > 1
        ):
            from muzero_general_tpu.ops import device_replay as dr_lib

            c_, h_, w_ = cfg.observation_shape
            dev_replay_state = dr_lib.init_replay(
                int(cfg.replay_buffer_size), int(cfg.max_moves),
                (c_, h_, w_), len(cfg.action_space),
            )
            dev_train = dr_lib.make_device_train(
                runner, cfg,
                make_fused_train_steps(runner, cfg, jit=False),
                max(1, int(cfg.fused_train_steps)),
            )
            dev_save = jax.jit(
                lambda st, games, valid: dr_lib.save_games(
                    st, games, valid, td_steps=cfg.td_steps,
                    discount=cfg.discount, per_alpha=cfg.PER_alpha,
                    use_per=bool(cfg.PER),
                ),
                donate_argnums=(0,),
            )
            self._dev_rng = jax.random.PRNGKey(cfg.seed + 987654)

            def push_games_to_device(st, games):
                for chunk, valid in dr_lib.pad_games_np(
                    games, int(cfg.max_moves), (c_, h_, w_),
                    len(cfg.action_space), _DEV_K_PAD,
                ):
                    st = dev_save(
                        st,
                        {k: jnp.asarray(v) for k, v in chunk.items()},
                        jnp.asarray(valid),
                    )
                return st

            _dev_reana = jax.jit(
                dr_lib.update_reanalysed_values, donate_argnums=(0,)
            )

            def dev_on_reanalysed(gid, values):
                # Mirror fresh root values into the HBM ring (stale-guarded
                # by game id inside).
                nonlocal dev_replay_state
                padded = np.zeros((int(cfg.max_moves),), np.float32)
                padded[: len(values)] = values
                dev_replay_state = _dev_reana(
                    dev_replay_state,
                    jnp.int32(gid % int(cfg.replay_buffer_size)),
                    jnp.int32(gid),
                    jnp.asarray(padded),
                )

        S = cfg.support_size
        reanalyse_fn = jax.jit(
            lambda variables, obs: support_to_scalar(
                runner.initial_inference(variables, obs)[0], S
            )
        )
        # The sweep's [CHUNK, ...] obs shard over dp like every other batch
        # (otherwise a multi-chip refresh would serialize onto device 0).
        # Multi-host the sweep is host-local (local games, localized
        # weights), so no mesh placement there.
        place_reanalyse = None
        if n_proc == 1 and train_mesh is not None and (
            int(cfg.reanalyse_chunk_positions) % train_mesh.shape["dp"] == 0
        ):
            from muzero_general_tpu.parallel import batch_sharding

            reanalyse_sharding = batch_sharding(train_mesh)
            place_reanalyse = lambda block: jax.device_put(
                block, reanalyse_sharding
            )

        training_step = self.checkpoint["training_step"]
        print(
            f"\nTraining {self.game_name} on {jax.devices()[0].platform} "
            f"({len(jax.devices())} device(s))...\n"
        )
        # Cooperative shutdown: the reference polls a `terminate` flag in
        # SharedStorage (muzero.py:352-353); here `touch <results_path>/STOP`
        # requests a graceful exit with a final checkpoint.
        stop_file = cfg.results_path / "STOP"
        t_start = time.time()
        # Per-phase wall-clock accounting (SURVEY.md §5.1: first-class step
        # timing the reference lacks) — written to metrics.jsonl.
        phase_time = {"selfplay": 0.0, "test": 0.0, "train": 0.0,
                      "reanalyse": 0.0, "batch": 0.0, "checkpoint": 0.0}
        loop_counter = 0
        # Checkpointing is honored at OUTER-loop granularity: sync whenever
        # >= checkpoint_interval steps accumulated since the last sync
        # (reference trainer.py:87-97 pushes every interval steps, but each
        # sync here is a device->host pull of all weights+optimizer state
        # through the TPU tunnel — doing it per inner iteration dominated
        # wall-clock: 92% of a 7500-step run was untracked sync time).
        last_ckpt_step = training_step
        last_metrics = None
        try:
            while training_step < cfg.training_steps:
                stop = bool(self.checkpoint["terminate"] or stop_file.exists())
                if n_proc > 1:
                    # A STOP on ANY host stops all of them together (hosts
                    # must leave the loop in lockstep or a straggler would
                    # hang in the next gradient psum).
                    stop = dist_lib.global_sum(stop) > 0
                if stop:
                    break
                loop_counter += 1
                if cfg.profile_dir and loop_counter == 20:
                    jax.profiler.start_trace(str(cfg.profile_dir))
                if cfg.profile_dir and loop_counter == 25:
                    jax.profiler.stop_trace()
                variables = self._variables(state)
                if n_proc > 1:
                    # Read the replicated weights out of local shards so
                    # host-local programs (self-play, reanalyse, eval) don't
                    # mix global and local shardings. Local device->host
                    # pull; no cross-host traffic.
                    variables = jax.device_get(variables)  # batched async pull
                temperature = cfg.visit_softmax_temperature_fn(training_step)

                # ---- self-play chunk (all G lanes advance K moves) -------
                # Lane 0 is the greedy eval lane (temperature 0, excluded
                # from replay) when needs_self_test_lane.
                t0 = time.time()
                games, stats = driver.play(variables, temperature)
                phase_time["selfplay"] += time.time() - t0
                for gh in games:
                    replay.save_game(gh)
                if dev_replay_state is not None and games:
                    dev_replay_state = push_games_to_device(
                        dev_replay_state, games
                    )

                # ---- evaluation (reference test_mode worker) --------------
                # self/1-player: eval games stream out of the greedy lane.
                # 2-player with a scripted opponent: a full game vs
                # config.opponent every few loops (reference self_play.py:54-60
                # plays vs config.opponent in test mode).
                t0 = time.time()
                use_opponent = (
                    len(cfg.players) > 1
                    and cfg.opponent not in (None, "self")
                    and cfg.opponent != "human"
                )
                test_games = stats.get("eval_games", [])
                eval_every = max(1, int(getattr(cfg, "eval_interval_loops", 4)))
                if use_opponent and loop_counter % eval_every == 1 % eval_every:
                    from muzero_general_tpu.evaluate import (
                        play_against_opponent,
                    )

                    test_games = [
                        play_against_opponent(
                            self.make_env(), runner, cfg, variables,
                            cfg.opponent, cfg.muzero_player,
                            seed=cfg.seed + cfg.num_workers + loop_counter,
                        )
                    ]
                phase_time["test"] += time.time() - t0
                for gh in test_games:
                    self.checkpoint["total_reward"] = float(gh.rewards.sum())
                    self.checkpoint["episode_length"] = len(gh)
                    vals = [v for v in gh.root_values if v]
                    self.checkpoint["mean_value"] = float(np.mean(vals)) if vals else 0
                    if len(cfg.players) > 1:
                        mz, opp = two_player_reward_split(gh, cfg.muzero_player)
                        self.checkpoint["muzero_reward"] = mz
                        self.checkpoint["opponent_reward"] = opp

                # ---- learner catches up to the exact ratio ----------------
                # config.ratio may be a callable schedule of the number of
                # self-played games (the reference's best-known lunarlander
                # setting anneals 0.8 -> 0.4 over 250 games by hand,
                # reference games/lunarlander.py:109); the exact scheduler
                # honors it directly.
                # Multi-host: the target derives from GLOBAL counters so
                # every learner shard runs the identical number of inner
                # iterations (they meet in the gradient psum).
                played_games = replay.num_played_games
                played_steps = replay.num_played_steps
                buffer_ready = bool(replay.buffer)
                if n_proc > 1:
                    played_games = dist_lib.global_sum(played_games)
                    played_steps = dist_lib.global_sum(played_steps)
                    buffer_ready = (
                        dist_lib.global_sum(buffer_ready) == n_proc
                    )
                ratio = (
                    cfg.ratio(played_games)
                    if callable(cfg.ratio)
                    else (cfg.ratio if cfg.ratio else 1.0)
                )
                target = min(cfg.training_steps, int(ratio * played_steps))
                pending_priorities = []
                M = max(1, int(cfg.fused_train_steps))
                while training_step < target and buffer_ready:
                    t0 = time.time()
                    prev_step = training_step
                    if (
                        dev_train is not None
                        and target - training_step >= M > 1
                    ):
                        # Device-replay path: sampling + M train steps +
                        # PER write-back in ONE dispatch, no host batches.
                        self._dev_rng, k_dev = jax.random.split(
                            self._dev_rng
                        )
                        phase_time["batch"] += time.time() - t0
                        t0 = time.time()
                        dev_replay_state, state, metrics = dev_train(
                            dev_replay_state, state, k_dev
                        )
                        training_step += M
                    elif fused_train is not None and target - training_step >= M > 1:
                        # Fused path: M batches, ONE device dispatch.
                        parts = next_batches(M)
                        index_batches = [ib for ib, _ in parts]
                        batches = place_batches({
                            k: np.stack([b[k] for _, b in parts])
                            for k in parts[0][1]
                        })
                        phase_time["batch"] += time.time() - t0
                        t0 = time.time()
                        state, metrics, priorities_m = fused_train(state, batches)
                        training_step += M
                        if cfg.PER:
                            pending_priorities.append(
                                (priorities_m, index_batches)
                            )
                    else:
                        index_batch, batch = next_batches(1)[0]
                        batch = place_batch(batch)
                        phase_time["batch"] += time.time() - t0
                        t0 = time.time()
                        state, metrics, priorities = train_step(state, batch)
                        training_step += 1
                        if cfg.PER:
                            pending_priorities.append(
                                (priorities[None], [index_batch])
                            )
                    if cfg.PER and len(pending_priorities) >= 4:
                        for pr, ibs in pending_priorities:
                            pr = np.asarray(pr)
                            for m, ib in enumerate(ibs):
                                replay.update_priorities(pr[m], ib)
                        pending_priorities.clear()
                    phase_time["train"] += time.time() - t0
                    t0 = time.time()
                    if (
                        cfg.use_last_model_value
                        and (training_step // cfg.reanalyse_interval)
                        > (prev_step // cfg.reanalyse_interval)
                        and replay.buffer
                    ):
                        # Fresh weights for the refresh; multi-host reads
                        # them out of the local replicated shards (the
                        # sweep is a host-local program over local games).
                        re_vars = self._variables(state)
                        if n_proc > 1:
                            re_vars = jax.tree_util.tree_map(
                                np.asarray, re_vars
                            )
                        n = self._reanalyse_sweep(
                            replay, reanalyse_fn, re_vars,
                            place_obs=place_reanalyse,
                            on_update=(
                                dev_on_reanalysed
                                if dev_replay_state is not None
                                else None
                            ),
                        )
                        self.checkpoint["num_reanalysed_games"] += n
                    phase_time["reanalyse"] += time.time() - t0
                    last_metrics = metrics
                if cfg.PER:
                    for pr, ibs in pending_priorities:
                        pr = np.asarray(pr)
                        for m, ib in enumerate(ibs):
                            replay.update_priorities(pr[m], ib)

                # ---- checkpoint sync (once per loop at most) --------------
                t0 = time.time()
                if last_metrics is not None and (
                    training_step // cfg.checkpoint_interval
                ) > (last_ckpt_step // cfg.checkpoint_interval):
                    for k in ("total_loss", "value_loss", "reward_loss",
                              "policy_loss"):
                        self.checkpoint[k] = float(last_metrics[k])
                    self.checkpoint["lr"] = float(last_metrics["lr"])
                    self.checkpoint["training_step"] = training_step
                    self._sync_checkpoint(state, replay)
                    if cfg.save_model and is_main:
                        ckpt_lib.save_checkpoint(
                            self.checkpoint,
                            cfg.results_path / "model.checkpoint",
                        )
                        si = getattr(cfg, "snapshot_interval", None)
                        if si and (training_step // si) > (
                            last_ckpt_step // si
                        ):
                            # Numbered snapshot for offline strength retests
                            # (per-interval regression diagnosis).
                            step_tag = (training_step // si) * si
                            ckpt_lib.save_checkpoint(
                                self.checkpoint,
                                cfg.results_path
                                / f"model_{step_tag:06d}.checkpoint",
                            )
                    last_ckpt_step = training_step
                phase_time["checkpoint"] += time.time() - t0

                self.checkpoint["training_step"] = training_step
                self.checkpoint["num_played_games"] = int(played_games)
                self.checkpoint["num_played_steps"] = int(played_steps)
                if logger:
                    logger.log(self.checkpoint)
                    if loop_counter % 20 == 0:
                        logger._jsonl.write(
                            json.dumps({"phase_time_s": phase_time}) + "\n"
                        )
                dt = max(1e-9, time.time() - t_start)
                # "Last test reward" is the last COMPLETED eval episode; for
                # long-episode games that can lag many loops, so the open
                # eval episode's running reward is shown alongside.
                partial = stats.get("eval_partial_reward")
                partial_s = (
                    f" (open eval: {partial:.2f})." if partial is not None else ""
                )
                if is_main:
                    print(
                        f'Last test reward: {self.checkpoint["total_reward"]:.2f}.'
                        f"{partial_s} "
                        f"Training step: {training_step}/{cfg.training_steps}. "
                        f"Played games: {int(played_games)}. "
                        f'Loss: {self.checkpoint["total_loss"]:.2f}. '
                        f"Train steps/s: {training_step / dt:.1f}. "
                        f"Env steps/s: {played_steps / dt:.0f}",
                        end="\r",
                    )
        except KeyboardInterrupt:
            pass
        finally:
            if prefetcher is not None:
                prefetcher.stop()

        # Final persist (reference muzero.py:334-346, 348-367)
        self.checkpoint["training_step"] = training_step
        self._sync_checkpoint(state, replay)
        if cfg.save_model and is_main:
            ckpt_lib.save_checkpoint(
                self.checkpoint, cfg.results_path / "model.checkpoint"
            )
            ckpt_lib.save_replay_buffer(
                replay, self.checkpoint, cfg.results_path / "replay_buffer.pkl"
            )
        if logger:
            logger.close()
        print()
        return self.checkpoint

    # ------------------------------------------------------------------
    def test(self, render=False, opponent=None, muzero_player=None, num_tests=1,
             num_gpus=0):
        if self._devices:
            with jax.default_device(self._devices[0]):
                return self._test(
                    render, opponent, muzero_player, num_tests, num_gpus
                )
        return self._test(render, opponent, muzero_player, num_tests, num_gpus)

    def _test(self, render=False, opponent=None, muzero_player=None,
              num_tests=1, num_gpus=0):
        """Greedy evaluation (reference muzero.py:369-424).

        opponent ∈ {"self", "random", "expert"}; "human" is handled by the
        interactive CLI path. num_gpus kept for API parity.
        """
        cfg = self.config
        opponent = opponent or cfg.opponent or "self"
        muzero_player = (
            muzero_player if muzero_player is not None else cfg.muzero_player
        )
        env = self.make_env()
        state = self._restore_state()
        variables = self._variables(state)

        if opponent != "self":
            from muzero_general_tpu.evaluate import play_against_opponent

            results = [
                play_against_opponent(
                    env, self.runner, cfg, variables, opponent, muzero_player,
                    seed=cfg.seed + i, render=render,
                )
                for i in range(num_tests)
            ]
        else:
            driver = self._make_driver(self.runner, num_games=1, seed=cfg.seed)
            results = []
            while len(results) < num_tests:
                games, _ = driver.play(variables, 0.0)
                results.extend(games)
            results = results[:num_tests]

        if len(cfg.players) == 1:
            result = float(np.mean([gh.rewards.sum() for gh in results]))
        else:
            result = float(
                np.mean(
                    [two_player_reward_split(gh, muzero_player)[0] for gh in results]
                )
            )
        print(f"\nTest results: {result:.2f} (mean over {num_tests} games)")
        return result

    # ------------------------------------------------------------------
    def terminate_workers(self):
        """API parity with reference muzero.py:348-367. The synchronous TPU
        build has no detached workers; training stops cooperatively via the
        `terminate` flag or the STOP file in results_path."""
        self.checkpoint["terminate"] = True

    # ------------------------------------------------------------------
    def load_model(self, checkpoint_path=None, replay_buffer_path=None):
        """Restore checkpoint and optionally the replay buffer
        (reference muzero.py:426-464)."""
        if checkpoint_path:
            checkpoint_path = pathlib.Path(checkpoint_path)
            self.checkpoint = ckpt_lib.load_checkpoint(checkpoint_path)
            print(f"\nUsing checkpoint from {checkpoint_path}")
        if replay_buffer_path:
            replay_buffer_path = pathlib.Path(replay_buffer_path)
            self.replay_buffer_state = ckpt_lib.load_replay_buffer(
                replay_buffer_path
            )
            print(f"Initializing replay buffer with {replay_buffer_path}")
        else:
            # Counters start fresh without a buffer (reference muzero.py:449-461)
            self.checkpoint["training_step"] = 0
            self.checkpoint["num_played_steps"] = 0
            self.checkpoint["num_played_games"] = 0
            self.checkpoint["num_reanalysed_games"] = 0

    # ------------------------------------------------------------------
    def diagnose_model(self, horizon=3):
        """Virtual-vs-real trajectory diagnosis (reference muzero.py:466-479)."""
        from muzero_general_tpu.diagnose import DiagnoseModel

        state = self._restore_state()
        dm = DiagnoseModel(self.runner, self.config)
        dm.compare_virtual_with_real_trajectories(
            self._variables(state), self.make_env(), horizon
        )


def hyperparameter_search(game_name, parametrization, budget, parallel_experiments,
                          num_tests):
    """(1+1)-ES hyperparameter search (reference muzero.py:495-581 used
    nevergrad OnePlusOne; nevergrad is unavailable here so an equivalent
    one-plus-one evolutionary loop is built in — see search.py)."""
    from muzero_general_tpu.search import one_plus_one_search

    return one_plus_one_search(
        game_name, parametrization, budget, parallel_experiments, num_tests
    )


def load_model_menu(muzero, game_name):
    """Interactive checkpoint picker (reference muzero.py:584-619)."""
    results_dir = pathlib.Path(__file__).resolve().parents[1] / "results" / game_name
    options = ["Specify paths manually"] + sorted(
        str(p) for p in results_dir.glob("*/") if p.is_dir()
    )
    for i, option in enumerate(options):
        print(f"{i}. {option}")
    choice = input("Enter a number to choose a model to load: ")
    choice = int(choice) if choice.isdigit() and int(choice) < len(options) else 0
    if choice == 0:
        checkpoint_path = input("Enter a path to the model.checkpoint: ")
        replay_buffer_path = input("Enter a path to the replay_buffer.pkl: ")
    else:
        checkpoint_path = pathlib.Path(options[choice]) / "model.checkpoint"
        replay_buffer_path = pathlib.Path(options[choice]) / "replay_buffer.pkl"
        if not pathlib.Path(replay_buffer_path).exists():
            replay_buffer_path = None
    muzero.load_model(
        checkpoint_path=checkpoint_path, replay_buffer_path=replay_buffer_path
    )


def main(argv=None):
    """CLI: `python -m muzero_general_tpu [game] ['{json overrides}']`
    (reference muzero.py:622-712)."""
    argv = argv if argv is not None else sys.argv[1:]
    from muzero_general_tpu.games import AVAILABLE_GAMES

    if argv:
        game_name = argv[0]
        overrides = json.loads(argv[1]) if len(argv) > 1 else None
        muzero = MuZero(game_name, overrides)
        muzero.train()
        return

    print("\nWelcome to MuZero (TPU edition)! Here's a list of games:")
    for i, name in enumerate(AVAILABLE_GAMES):
        print(f"{i}. {name}")
    choice = input("Enter a number to choose the game: ")
    game_name = AVAILABLE_GAMES[int(choice)] if choice.isdigit() else "cartpole"
    muzero = MuZero(game_name)

    while True:
        options = [
            "Train",
            "Load pretrained model",
            "Diagnose model",
            "Render some self play games",
            "Play against MuZero",
            "Test the game manually",
            "Hyperparameter search",
            "Exit",
        ]
        print()
        for i, option in enumerate(options):
            print(f"{i}. {option}")
        choice = input("Enter a number to choose an action: ")
        choice = int(choice) if choice.isdigit() else 7
        if choice == 0:
            muzero.train()
        elif choice == 1:
            load_model_menu(muzero, game_name)
        elif choice == 2:
            muzero.diagnose_model(horizon=30)
        elif choice == 3:
            muzero.test(render=True, opponent="self", muzero_player=None)
        elif choice == 4:
            muzero.test(render=True, opponent="human", muzero_player=0)
        elif choice == 5:
            from muzero_general_tpu.evaluate import manual_game

            manual_game(muzero.make_env())
        elif choice == 6:
            hyperparameter_search(game_name, None, budget=20,
                                  parallel_experiments=1, num_tests=10)
        else:
            break


if __name__ == "__main__":
    main()
