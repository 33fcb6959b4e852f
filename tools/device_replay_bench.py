"""Measure the device-replay train-loop delta (VERDICT r4 item 4).

Runs the connect4 shipped config twice for a bounded step budget — host
replay (baseline) vs config.device_replay — and reports the per-phase
wall-clock split (muzero.py phase_time records in metrics.jsonl) plus
total wall. The device path fuses PER sampling + M train steps + priority
write-back into one dispatch, so the 'batch' phase and the per-loop
priority pulls should vanish from the train critical path.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/device_replay_bench.py \
      [--steps 3000] [--games 256] [--ratio 0.35]
"""

import argparse
import json
import pathlib
import shutil
import time


def run_one(device_replay, steps, games, ratio, out):
    from muzero_general_tpu.muzero import MuZero

    shutil.rmtree(out, ignore_errors=True)
    mz = MuZero(
        "connect4",
        {
            "training_steps": steps,
            "parallel_games": games,
            "ratio": ratio,
            "results_path": str(out),
            "compute_dtype": "bfloat16",
            "device_replay": device_replay,
            # device path samples on device; keep the host prefetcher off in
            # BOTH runs so the comparison is the synchronous loop.
            "batch_prefetch": False,
        },
    )
    t0 = time.time()
    ck = mz.train(log_in_tensorboard=True)
    wall = time.time() - t0

    phases = None
    for line in open(pathlib.Path(out) / "metrics.jsonl"):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "phase_time_s" in r:
            phases = r["phase_time_s"]  # cumulative; keep the last record
    return {
        "device_replay": device_replay,
        "steps": ck["training_step"],
        "games": ck["num_played_games"],
        "wall_s": round(wall, 1),
        "phases": {k: round(v, 1) for k, v in (phases or {}).items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--ratio", type=float, default=0.35)
    ap.add_argument("--out", default="/tmp/devrep_bench")
    args = ap.parse_args()

    rows = [
        run_one(False, args.steps, args.games, args.ratio,
                args.out + "_host"),
        run_one(True, args.steps, args.games, args.ratio,
                args.out + "_dev"),
    ]
    print("\n| path | steps | games | wall s | train s | batch s | "
          "selfplay s |")
    print("|---|---:|---:|---:|---:|---:|---:|")
    for r in rows:
        p = r["phases"]
        print(
            f"| {'device' if r['device_replay'] else 'host'} | {r['steps']} "
            f"| {r['games']} | {r['wall_s']} | {p.get('train', 0)} "
            f"| {p.get('batch', 0)} | {p.get('selfplay', 0)} |"
        )


if __name__ == "__main__":
    main()
