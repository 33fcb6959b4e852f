"""Connect4 learning gate (BASELINE.md north star; VERDICT r2 item 5).

Trains the shipped connect4 config (3x64 ResNet, 200 sims, expert-opponent
evaluation wired into the train loop, muzero.py eval path) for a bounded
budget and reports the muzero-vs-expert reward trend from metrics.jsonl.
The reference's own bar is modest: "MuZero is learning slightly"
(/root/reference/README.md:55-64 shows connect4 learning curves trending up
over ~500k steps on a GPU fleet); the gate here is the same direction —
`muzero_reward` vs the expert trending up over the run.

Usage (real chip; takes O(1-2 h)):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/connect4_gate.py \
      [--steps 4000] [--ratio 0.35] [--games 256] [--out /tmp/c4_gate]
Stop early with: touch <out>/STOP   (graceful, final checkpoint kept)
"""

import argparse
import json
import pathlib
import shutil
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--ratio", type=float, default=0.35)
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--out", default="/tmp/c4_gate")
    ap.add_argument("--batch-leaves", type=int, default=1,
                    help="search_batch_leaves for the K>1 learning check")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--snapshot", type=int, default=None,
                    help="keep model_<step>.checkpoint every N steps "
                    "(per-decile regression diagnosis)")
    ap.add_argument("--override", default=None,
                    help="extra config overrides as a JSON dict "
                    "(intervention runs, e.g. '{\"PER\": false}')")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    from muzero_general_tpu.muzero import MuZero

    out = pathlib.Path(args.out)
    if args.fresh:
        shutil.rmtree(out, ignore_errors=True)

    mz = MuZero(
        "connect4",
        {
            "training_steps": args.steps,
            "parallel_games": args.games,
            # The shipped config's ratio is None (= train 1:1 with played
            # steps); on one chip that starves self-play, so the gate uses a
            # fixed train:act ratio like the reference's tuned 1-GPU runs.
            "ratio": args.ratio,
            "results_path": str(out),
            "compute_dtype": "bfloat16",
            # One eval game vs the expert per outer loop: dense
            # muzero_reward curve (the default every-4-loops cadence gives
            # too few points on a fast chip-bound run).
            "eval_interval_loops": 1,
            "search_batch_leaves": args.batch_leaves,
            "seed": args.seed,
            "snapshot_interval": args.snapshot,
            **(json.loads(args.override) if args.override else {}),
        },
    )
    t0 = time.time()
    ck = mz.train(log_in_tensorboard=True)
    wall = time.time() - t0

    rows = []
    for line in open(out / "metrics.jsonl"):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "muzero_reward" in r and "training_step" in r:
            rows.append(r)

    # Mean muzero-vs-expert reward per training-step quartile (each eval
    # game's reward is +1 win / -1 loss / 0 draw vs the expert).
    steps = ck["training_step"]
    print(f"\nConnect4 gate: {steps} steps, {wall/60:.1f} min wall, "
          f"{ck['num_played_games']} games played")
    print("\n| step quartile | mean muzero_reward vs expert | evals |")
    print("|---|---:|---:|")
    q = max(1, steps // 4)
    for i in range(4):
        lo, hi = i * q, (i + 1) * q
        vals = [r["muzero_reward"] for r in rows if lo <= r["training_step"] < hi]
        if vals:
            print(f"| {lo}-{hi} | {sum(vals)/len(vals):+.3f} | {len(vals)} |")
    print(f"\ncheckpoint: {out}/model.checkpoint")


if __name__ == "__main__":
    main()
