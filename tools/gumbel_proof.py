"""Gumbel-vs-pUCT learning proof (VERDICT r1 item 8).

Runs CartPole (and optionally tictactoe) end-to-end at matched training
budgets: the shipped 50-simulation pUCT config vs Gumbel root selection at
{16, 8} simulations per move. Records final 10-game greedy test reward and
wall-clock. Gumbel's claim (Danihelka et al., ICLR 2022): the same policy
improvement with far fewer simulations — i.e. the 8/16-sim rows should
match the 50-sim row's reward at a fraction of the search cost.

Usage:
  python tools/gumbel_proof.py [--steps 7500] [--game cartpole] [--tests 10]
Prints a markdown table for RESULTS.md.
"""

import argparse
import time


def run(game, overrides, num_tests, label):
    from muzero_general_tpu.muzero import MuZero

    t0 = time.time()
    mz = MuZero(game, dict(overrides))
    mz.train(log_in_tensorboard=False)
    wall = time.time() - t0
    score = mz.test(num_tests=num_tests)
    return {
        "label": label,
        "score": score,
        "wall_s": wall,
        "sims": mz.config.num_simulations,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=7500)
    ap.add_argument("--game", default="cartpole")
    ap.add_argument("--tests", type=int, default=10)
    ap.add_argument("--out", default=None, help="results path prefix")
    args = ap.parse_args()

    base = {
        "training_steps": args.steps,
        "save_model": False,
    }
    rows = []
    rows.append(
        run(args.game, {**base}, args.tests, "pUCT 50 sims (shipped config)")
    )
    for sims in (16, 8):
        rows.append(
            run(
                args.game,
                {
                    **base,
                    "use_gumbel_mcts": True,
                    "num_simulations": sims,
                    "gumbel_max_considered_actions": min(sims, 16),
                },
                args.tests,
                f"Gumbel {sims} sims",
            )
        )

    print("\n| Search | sims/move | mean test reward "
          f"({args.tests} games) | train wall-clock |")
    print("|---|---:|---:|---:|")
    for r in rows:
        print(
            f"| {r['label']} | {r['sims']} | {r['score']:.1f} "
            f"| {r['wall_s']:.0f} s |"
        )


if __name__ == "__main__":
    main()
