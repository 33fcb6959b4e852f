"""Per-component timing of the board-game (ResNet) self-play path.

VERDICT r2: connect4 self-play measured 632 env-steps/s at 0.04% MFU — the
search is overhead-bound, but WHICH overhead? This tool decomposes one
self-play move (200-sim search) on the real chip:

  net_scan     — 200 sequential recurrent_inference calls alone (lower bound
                 set by the dynamics+prediction network's dispatch latency)
  search_stub  — full MCTS with the network replaced by constants (tree
                 machinery alone: descend/expand/backprop/fixups)
  hidden_rw    — 200 sequential gather+scatter on the [B, N, h, w, C] hidden
                 store alone (HBM traffic / copy behavior of the tree carry)
  mcts_pallas  — full search, staged Pallas descend/backprop kernels
  mcts_xla     — full search, pure-XLA descend/backprop
  chunk        — the production driver chunk (4 moves) for the headline rate

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/resnet_profile.py \
      [--games 256] [--sims 200] [--dtype bfloat16] [--skip chunk,...]
"""

import argparse
import faulthandler
import json
import sys
import time

# Periodic stack dumps: through the tunnel a remote compile shows ~0 CPU for
# many minutes, indistinguishable from a hang — the dump says which.
faulthandler.dump_traceback_later(600, repeat=True)


def timeit(fn, *args, reps=3, warmup=1):
    """Times with a HOST PULL per rep: block_until_ready through the axon
    tunnel misreports readiness (async timing once 'measured' 2421 TFLOP/s
    on a 197-peak chip — see bench.py:_time_train_dispatches)."""
    import numpy as np

    def pull(out):
        leaf = out
        while isinstance(leaf, (tuple, list)):
            leaf = leaf[0]
        np.asarray(leaf)

    for _ in range(warmup):
        pull(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        pull(fn(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp

    from muzero_general_tpu.games.connect4 import MuZeroConfig, make_env
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.ops import mcts as mcts_ops
    from muzero_general_tpu.selfplay import SelfPlayDriver

    cfg = MuZeroConfig()
    cfg.parallel_games = args.games
    cfg.num_simulations = args.sims
    cfg.selfplay_chunk_moves = 4
    cfg.compute_dtype = args.dtype

    B = args.games
    A = len(cfg.action_space)
    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((B,) + runner.stacked_observation_shape(), jnp.float32)
    legal = jnp.ones((B, A), bool)
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(1)

    _, _, _, hidden0 = jax.jit(runner.initial_inference)(variables, obs)
    results = {"B": B, "sims": args.sims, "dtype": args.dtype,
               "hidden_dtype": str(hidden0.dtype)}
    print(f"# hidden {hidden0.shape} {hidden0.dtype}", file=sys.stderr)

    # ---- 1. network-only sequential scan --------------------------------
    if "net_scan" not in skip:
        @jax.jit
        def net_scan(variables, h0):
            def body(h, i):
                v, r, p, h2 = runner.recurrent_inference(
                    variables, h, jnp.full((B,), i % A, jnp.int32)
                )
                return h2, v[:, 0]
            h, vs = jax.lax.scan(body, h0, jnp.arange(args.sims))
            return vs.sum()

        dt = timeit(net_scan, variables, hidden0)
        results["net_scan_ms"] = round(dt * 1e3, 2)
        results["net_call_us"] = round(dt / args.sims * 1e6, 1)
        print(f"# net_scan: {dt*1e3:.1f} ms "
              f"({dt/args.sims*1e6:.0f} us/call)", file=sys.stderr)

    # ---- 2. hidden-store gather+scatter only, both layouts --------------
    # [B, N, ...] (lane-major, dim-1 strided update) vs [N, B, ...]
    # (node-major, contiguous leading-axis update — the Tree layout).
    if "hidden_rw" not in skip:
        N = args.sims + 1

        @jax.jit
        def hidden_rw_lane_major(h0):
            store = jnp.zeros((B, N) + h0.shape[1:], h0.dtype)
            store = store.at[:, 0].set(h0)
            b_idx = jnp.arange(B)

            def body(store, i):
                parent = jnp.zeros((B,), jnp.int32)
                h = store[b_idx, parent]
                store = store.at[:, i + 1].set(h * 1.000001)
                return store, h[:, 0, 0, 0]
            store, out = jax.lax.scan(body, store, jnp.arange(args.sims))
            return out.sum()

        @jax.jit
        def hidden_rw_node_major(h0):
            store = jnp.zeros((N, B) + h0.shape[1:], h0.dtype)
            store = store.at[0].set(h0)
            b_idx = jnp.arange(B)

            def body(store, i):
                parent = jnp.zeros((B,), jnp.int32)
                h = store[parent, b_idx]
                store = store.at[i + 1].set(h * 1.000001)
                return store, h[:, 0, 0, 0]
            store, out = jax.lax.scan(body, store, jnp.arange(args.sims))
            return out.sum()

        for tag, fn in (("hidden_rw_lane_major", hidden_rw_lane_major),
                        ("hidden_rw_node_major", hidden_rw_node_major)):
            dt = timeit(fn, hidden0)
            results[f"{tag}_ms"] = round(dt * 1e3, 2)
            print(f"# {tag}: {dt*1e3:.1f} ms", file=sys.stderr)

    # ---- 3. search with a constant-network stub -------------------------
    if "search_stub" not in skip:
        S2 = 2 * cfg.support_size + 1
        k0 = jax.random.PRNGKey(7)
        stub_v = jax.random.normal(k0, (B, S2))
        stub_p = jax.random.normal(jax.random.fold_in(k0, 1), (B, A))

        def stub_recurrent(h, a):
            # Depends on (h, a) weakly so XLA can't hoist it out of the loop.
            bump = h.reshape(B, -1)[:, :1] * 1e-6 + a[:, None] * 1e-6
            return (stub_v + bump, stub_v - bump, stub_p + bump,
                    h * 0.999)

        spec = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)
        for use_pallas, tag in ((spec.use_pallas, "search_stub"),):
            sp = spec._replace(use_pallas=use_pallas)

            @jax.jit
            def run_stub(variables, obs, rng):
                out = mcts_ops.run_mcts(
                    lambda o: runner.initial_inference(variables, o),
                    stub_recurrent, obs, legal, to_play, rng, sp,
                )
                return out.root_visit_counts

            dt = timeit(run_stub, variables, obs, rng)
            results[f"{tag}_ms"] = round(dt * 1e3, 2)
            print(f"# {tag} (pallas={use_pallas}): {dt*1e3:.1f} ms",
                  file=sys.stderr)

    # ---- 4. full search, pallas vs xla ----------------------------------
    for tag, use_pallas in (("mcts_pallas", True), ("mcts_xla", False)):
        if tag in skip:
            continue
        sp = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)._replace(
            use_pallas=use_pallas
        )

        @jax.jit
        def run_full(variables, obs, rng, sp=sp):
            out = mcts_ops.run_mcts(
                lambda o: runner.initial_inference(variables, o),
                lambda h, a: runner.recurrent_inference(variables, h, a),
                obs, legal, to_play, rng, sp,
            )
            return out.root_visit_counts

        dt = timeit(run_full, variables, obs, rng)
        results[f"{tag}_ms"] = round(dt * 1e3, 2)
        results[f"{tag}_env_steps_per_s"] = round(B / dt, 1)
        print(f"# {tag}: {dt*1e3:.1f} ms/move -> {B/dt:.0f} env-steps/s",
              file=sys.stderr)

    # ---- 4b. standalone kernel timings on a realistic (end-state) tree --
    if "kernels" not in skip:
        from muzero_general_tpu.ops import mcts_pallas

        sp = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)._replace(
            use_pallas=False
        )

        @jax.jit
        def build_tree(variables, obs, rng):
            out = mcts_ops.run_mcts(
                lambda o: runner.initial_inference(variables, o),
                lambda h, a: runner.recurrent_inference(variables, h, a),
                obs, legal, to_play, rng, sp,
            )
            return out.tree

        tree = build_tree(variables, obs, rng)
        jax.block_until_ready(tree)

        def desc(seed):
            return mcts_pallas.descend(
                seed, 64, tree.children_index, tree.children_prior,
                tree.children_visit, tree.children_vsum, tree.children_reward,
                tree.root_legal, tree.min_value, tree.max_value,
                num_players=2, pb_c_base=cfg.pb_c_base,
                pb_c_init=cfg.pb_c_init, discount=float(cfg.discount),
                A=A, max_depth=args.sims, tie_jitter=mcts_pallas.TIE_JITTER,
            )[0]

        dt = timeit(desc, 7, reps=10)
        results["descend_kernel_us"] = round(dt * 1e6, 1)
        print(f"# descend kernel (end-state tree): {dt*1e3:.2f} ms",
              file=sys.stderr)

    # ---- 5. production driver chunk -------------------------------------
    if "chunk" not in skip:
        driver = SelfPlayDriver(env, runner, cfg, seed=0)
        driver.play(variables, temperature=1.0)  # compile
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            _, stats = driver.play(variables, temperature=1.0)
        dt = (time.time() - t0) / reps
        results["chunk_env_steps_per_s"] = round(stats["env_steps"] / dt, 1)
        results["chunk_pallas"] = bool(driver.spec.use_pallas)
        print(f"# chunk: {stats['env_steps']/dt:.0f} env-steps/s "
              f"(pallas={driver.spec.use_pallas})", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
