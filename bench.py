"""Benchmark: batched self-play throughput vs the reference's architecture.

Prints ONE JSON line:
  {"metric": "selfplay_env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Headline metric (BASELINE.md north star): self-play env-steps/s on the
CartPole config (full 50-simulation MCTS per move, FC net). The baseline
denominator is the reference's per-move cost measured on this host with the
same network sizes in torch, batch-1, 1 initial_inference + 50 sequential
recurrent_inference calls per move — exactly the reference's search pattern
(reference self_play.py:319-355: one batch-1 network call per simulation),
times its num_workers=1 (reference games/cartpole.py:34). The reference
cannot run here directly (ray is not installed), so its per-move network
cost is reproduced faithfully; this *over*-estimates reference throughput
(Python tree bookkeeping, Ray RPC, and env stepping are free in our
denominator).

Usage: python bench.py [--games N] [--moves N] [--verbose]
"""

import argparse
import json
import sys
import time


def measure_ours(num_games=4096, num_moves=8, num_simulations=50):
    import jax
    import jax.numpy as jnp

    from muzero_general_tpu.games.cartpole import MuZeroConfig, make_env
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.selfplay import SelfPlayDriver

    cfg = MuZeroConfig()
    cfg.num_simulations = num_simulations
    cfg.parallel_games = num_games
    cfg.selfplay_chunk_moves = num_moves
    cfg.use_pallas_mcts = True  # staged pallas kernels: ~3x search throughput
    # Whole-search single-kernel fusion (ops/mcts_fused.py) supersedes the
    # staged path when shapes allow; staged/XLA remain the fallbacks.
    cfg.use_fused_search = True

    env = make_env()
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    driver = SelfPlayDriver(env, runner, cfg, seed=0)

    # Warm-up (compile)
    driver.play(variables, temperature=1.0)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        _, stats = driver.play(variables, temperature=1.0)
    dt = (time.time() - t0) / reps
    steps_per_s = stats["env_steps"] / dt
    return steps_per_s, dt


def measure_reference_pattern(num_moves=30, num_simulations=50):
    """Reference per-move network cost: torch batch-1 sequential calls.

    Network sizes from reference games/cartpole.py:66-72 + models.py:80-126
    (encoding 8, one hidden layer of 16 per head, support 21).
    """
    import torch

    torch.set_num_threads(2)

    def mlp(inp, hid, out):
        layers = []
        prev = inp
        for h in hid:
            layers += [torch.nn.Linear(prev, h), torch.nn.ELU()]
            prev = h
        layers += [torch.nn.Linear(prev, out)]
        return torch.nn.Sequential(*layers)

    repr_net = mlp(4, [], 8)
    dyn_net = mlp(10, [16], 8)
    rew_net = mlp(8, [16], 21)
    pol_net = mlp(8, [16], 2)
    val_net = mlp(8, [16], 21)

    best = 0.0
    with torch.no_grad():
        obs = torch.randn(1, 4)
        for _ in range(3):  # best-of-3 favors the baseline (host-load noise)
            t0 = time.time()
            for _ in range(num_moves):
                h = repr_net(obs)
                pol_net(h), val_net(h)
                for _ in range(num_simulations):
                    x = torch.cat([h, torch.zeros(1, 2)], dim=1)
                    h2 = dyn_net(x)
                    rew_net(h2), pol_net(h2), val_net(h2)
                    h = h2
            best = max(best, num_moves / (time.time() - t0))
    return best  # env-steps/s for one worker (num_workers=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=4096)
    ap.add_argument("--moves", type=int, default=8)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    ours, chunk_dt = measure_ours(args.games, args.moves)
    baseline = measure_reference_pattern()

    if args.verbose:
        print(
            f"# ours: {ours:.0f} env-steps/s ({args.games} lanes, "
            f"{args.moves} moves in {chunk_dt * 1e3:.0f} ms); "
            f"node expansions/s: {ours * 50:.2e}; "
            f"reference-pattern baseline: {baseline:.1f} env-steps/s",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "selfplay_env_steps_per_s",
                "value": round(ours, 1),
                "unit": "steps/s",
                "vs_baseline": round(ours / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
