"""MuZero configuration.

Mirrors the per-game `MuZeroConfig` attribute schema of the reference
(canonical example: reference games/cartpole.py:11-128 — ~40 attributes in 7
groups) so JSON/dict overrides are drop-in compatible, and adds TPU-native
knobs (parallel self-play games on device, mesh axes, dtypes).

Per-game configs live in `muzero_general_tpu.games.<name>` as subclasses, the
same plugin layout the reference loads with importlib (reference muzero.py:45-47).
"""

import datetime
import importlib
import pathlib


class MuZeroConfig:
    """Base config; per-game modules subclass and override values."""

    def __init__(self):
        self.seed = 0
        self.max_num_gpus = None  # kept for override parity; unused on TPU

        ### Game
        self.observation_shape = (1, 1, 4)  # (channels, height, width)
        self.action_space = list(range(2))
        self.players = list(range(1))
        self.stacked_observations = 0

        # Evaluate
        self.muzero_player = 0
        self.opponent = None  # None | "random" | "expert" | "human" | "self"

        ### Self-Play
        self.num_workers = 1  # reference parity; TPU path uses parallel_games
        self.selfplay_on_gpu = False  # reference parity; unused (TPU always)
        self.max_moves = 500
        self.num_simulations = 50
        self.discount = 0.997
        self.temperature_threshold = None

        # Root prior exploration noise
        self.root_dirichlet_alpha = 0.25
        self.root_exploration_fraction = 0.25

        # UCB formula
        self.pb_c_base = 19652
        self.pb_c_init = 1.25

        ### Network
        self.network = "fullyconnected"  # "resnet" / "fullyconnected"
        self.support_size = 10

        # Residual network
        self.downsample = False  # False / "CNN" / "resnet"
        self.blocks = 1
        self.channels = 2
        self.reduced_channels_reward = 2
        self.reduced_channels_value = 2
        self.reduced_channels_policy = 2
        self.resnet_fc_reward_layers = []
        self.resnet_fc_value_layers = []
        self.resnet_fc_policy_layers = []

        # Fully connected network
        self.encoding_size = 8
        self.fc_representation_layers = []
        self.fc_dynamics_layers = [16]
        self.fc_reward_layers = [16]
        self.fc_value_layers = [16]
        self.fc_policy_layers = [16]

        ### Training
        self.results_path = None  # set by game modules / MuZero.__init__
        self.save_model = True
        self.training_steps = 10000
        self.batch_size = 128
        self.checkpoint_interval = 10
        self.value_loss_weight = 1
        self.train_on_gpu = False  # reference parity; unused (TPU always)

        self.optimizer = "Adam"  # "Adam" or "SGD"
        self.weight_decay = 1e-4
        self.momentum = 0.9

        # Exponential learning rate schedule (reference trainer.py:275-283)
        self.lr_init = 0.02
        self.lr_decay_rate = 0.8
        self.lr_decay_steps = 1000

        ### Replay buffer
        self.replay_buffer_size = 500
        self.num_unroll_steps = 10
        self.td_steps = 50
        self.PER = True
        self.PER_alpha = 0.5

        # Reanalyze
        self.use_last_model_value = True
        self.reanalyse_on_gpu = False  # reference parity; unused

        ### Self-play / training ratio
        # self_play_delay/training_delay are carried for override parity with
        # the reference's sleep-based throttle (self_play.py:92-106,
        # trainer.py:109-122) but are intentionally UNUSED: the synchronous
        # schedule in MuZero.train() enforces `ratio` exactly (the learner
        # catches up to ratio * num_played_steps after every self-play chunk),
        # so there is nothing to de-rate by sleeping.
        self.self_play_delay = 0
        self.training_delay = 0
        self.ratio = 1.5  # target training_steps / self_played_steps

        ### TPU-native knobs (no reference counterpart)
        # Number of games advanced in lockstep by the batched self-play driver
        # (replaces the reference's num_workers Ray actors, SURVEY.md §2.8).
        self.parallel_games = 16
        # Moves executed per jitted self-play call (host dispatch amortization)
        self.selfplay_chunk_moves = 8
        # Scripted-opponent evaluation cadence for 2-player games: play one
        # game vs config.opponent every N outer loops (the reference's
        # free-running test worker, self_play.py:54-90, re-timed for the
        # synchronous schedule). Lower = denser muzero_reward curves.
        self.eval_interval_loops = 4
        # Device mesh axis sizes; None = use all devices on the dp axis.
        self.mesh_dp = None
        self.mesh_mp = 1
        # Compute dtype for network matmuls ("bfloat16" or "float32")
        self.compute_dtype = "float32"
        # Reanalyse cadence: every N training steps, refresh the root values
        # of `reanalyse_games_per_interval` buffered games round-robin, in
        # device sweeps of `reanalyse_chunk_positions` stacked positions (the
        # reference runs reanalyse as a free-running actor over single games,
        # replay_buffer.py:328-373; the batched schedule refreshes the whole
        # buffer at ~buffer rate).
        self.reanalyse_interval = 20
        self.reanalyse_games_per_interval = 32
        self.reanalyse_chunk_positions = 1024
        # Optional jax.profiler trace: directory to write a device trace of
        # training-loop iterations 20-25 (None = off).
        self.profile_dir = None
        # Train steps fused into one device dispatch (scan) — amortizes
        # dispatch latency to a remote/tunneled chip. 1 disables fusion.
        self.fused_train_steps = 8
        # Background-thread batch assembly (prefetch.BatchPrefetcher): hides
        # host batch time behind device time (the reference trainer's
        # one-deep pipeline, trainer.py:66-72). False = assemble inline.
        self.batch_prefetch = True
        # Fused Pallas MCTS kernels (ops/mcts_pallas.py). Only engages when
        # the tree fits VMEM. "auto" = on for real accelerator backends,
        # off on CPU (the interpreter is slow); True/False force it.
        self.use_pallas_mcts = "auto"
        # Fully-fused single-kernel search (ops/mcts_fused.py): the whole
        # simulation loop — descend, FC recurrent inference, expand,
        # backprop — in ONE Pallas launch per move, tree and weights
        # resident in VMEM. FC networks only; falls back when the tree
        # doesn't fit VMEM blocks or the network is a ResNet. "auto" as above
        # — `MuZero(game).train()` on a TPU takes the fast path by default.
        self.use_fused_search = "auto"
        # MXU precision of the fused kernel's NETWORK matmuls (the FC
        # triplet executed inside the search kernel). The 0/1 selection
        # matmuls always run at HIGHEST (exactness is required for oracle
        # parity — ops/mcts_fused.py EXACT); the network tier is a
        # speed/accuracy knob mapping to jax.lax.Precision:
        # "highest" = 6-pass bf16x6 (matches the XLA f32 oracle to ELU-ULP),
        # "default" = single bf16 pass (fastest, ~8 mantissa bits — search
        # quality is typically unaffected but visit counts diverge from the
        # f32 oracle). Mosaic has no middle tier. Measured per tier in
        # RESULTS.md round 3.
        self.fused_net_precision = "highest"
        # HBM-streaming descend kernel (ops/mcts_stream.py) for boards whose
        # trees exceed the VMEM kernels (gomoku: N*A ~ 49k edges/lane): the
        # whole descent runs as ONE kernel launch streaming per-lane node
        # rows from a packed HBM slab. "auto" = on for real accelerator
        # backends when the planar kernels are VMEM-rejected; True/False
        # force. Same tie-jitter semantics caveat as use_pallas_mcts.
        self.use_stream_mcts = "auto"
        # Multi-leaf expansion (sub-tree batching with virtual-visit marks,
        # ops/mcts.py _run_rounds_multileaf): select K leaves per round and
        # evaluate them with ONE recurrent inference — K-fold fewer
        # sequential network dispatches per move, at the cost of the classic
        # virtual-loss selection approximation. 1 = reference-exact search
        # (shipped default); must divide num_simulations. Useful for
        # deep-search board games (connect4 200 sims, gomoku 400).
        self.search_batch_leaves = 1
        # Fold batch norms into conv weights for the self-play search path
        # (ResNet games; models/network.py fold_bn_variables). Exact up to
        # float reassociation (ULP-tested); folding runs once per play
        # chunk, the per-simulation recurrent inference loses every BN pass.
        self.fold_bn_inference = True
        # Run the folded search pipeline's activations + hidden store in
        # bfloat16 (halves the bytes of the bandwidth-bound conv-epilogue
        # passes and the node-major hidden store). Search-quality impact is
        # ~bf16 rounding of values/priors; opt-in, measured in RESULTS.md.
        self.search_bf16_activations = False
        # Gumbel MuZero root action selection (ops/gumbel.py, Danihelka et
        # al. ICLR 2022): sequential-halving root search + improved-policy
        # targets — the same policy improvement with far fewer simulations
        # per move than pUCT. Opt-in; no reference counterpart.
        self.use_gumbel_mcts = False
        self.gumbel_max_considered_actions = 16
        self.gumbel_c_visit = 50.0
        self.gumbel_c_scale = 1.0
        # Host-path double buffering (hostplay.HostSelfPlayDriver): split the
        # env fleet in two halves and overlap host env stepping of one half
        # with the device search of the other (the reference's host games
        # serialize env.step after every search). Per-lane semantics are
        # unchanged (each lane still gets exactly one search per move);
        # only the dispatch schedule differs. OFF by default: the search is
        # LATENCY-bound in its sequential simulations, so a half-batch
        # search costs the same device time as a full one — pipelining pays
        # only when the fleet is >= 2x the latency-optimal batch (then each
        # half is a full-size search and host stepping rides free). Measured
        # r5 (RESULTS): lunarlander 64 envs serial 449 steps/s, 64 pipelined
        # 216 (2x sequential search), 128 pipelined ~2x serial.
        self.host_pipeline = False
        # Device-side replay (ops/device_replay.py): keep the game ring, the
        # two-level PER sampling, target assembly and priority write-back in
        # HBM as one jitted program fused with the train steps — the train
        # inner loop runs with ZERO host data movement. Opt-in, for
        # small-observation games (the ring stores replay_buffer_size games
        # padded to max_moves positions — board/classic-control scale, NOT
        # atari frame stacks). Single-process, unsharded training only; the
        # host buffer remains the source of truth for persistence/reanalyse.
        self.device_replay = False
        # Keep a numbered checkpoint copy (model_<step>.checkpoint) every N
        # training steps (None = off). The rolling model.checkpoint is
        # unaffected; numbered snapshots make offline per-interval strength
        # retests possible (the r4 connect4 late-run regression diagnosis).
        self.snapshot_interval = None
        # Rematerialize the train unroll scan body (jax.checkpoint): the
        # backward pass recomputes each unroll step's forward instead of
        # storing U steps of residuals, so atari-class shapes fit HBM at the
        # reference's shipped batch sizes (reference games/atari.py:52 trains
        # at batch 1024). Numerics unchanged; ~33% extra forward FLOPs on
        # the unrolled dynamics/prediction, traded for U× less live
        # activation memory.
        self.remat_unroll = True

    def visit_softmax_temperature_fn(self, trained_steps):
        """Temperature schedule (reference games/cartpole.py:115-128)."""
        if trained_steps < 0.5 * self.training_steps:
            return 1.0
        elif trained_steps < 0.75 * self.training_steps:
            return 0.5
        else:
            return 0.25

    # Convenience derived quantities -------------------------------------
    @property
    def action_space_size(self) -> int:
        return len(self.action_space)

    @property
    def num_players(self) -> int:
        return len(self.players)

    @property
    def full_support_size(self) -> int:
        return 2 * self.support_size + 1

    def default_results_path(self, game_name: str) -> pathlib.Path:
        return (
            pathlib.Path(__file__).resolve().parents[1]
            / "results"
            / game_name
            / datetime.datetime.now().strftime("%Y-%m-%d--%H-%M-%S")
        )


def load_game_module(game_name: str):
    """Import `muzero_general_tpu.games.<game_name>`.

    Same plugin-by-name mechanism as reference muzero.py:45-47.
    """
    return importlib.import_module("muzero_general_tpu.games." + game_name)


def apply_overrides(config: MuZeroConfig, overrides: dict) -> MuZeroConfig:
    """Apply a dict of attribute overrides with validation.

    Parity with reference muzero.py:55-63: unknown keys raise AttributeError.
    """
    for key, value in overrides.items():
        if not hasattr(config, key):
            raise AttributeError(
                f'Config has no attribute "{key}". Check the config file for the complete list.'
            )
        setattr(config, key, value)
    return config
