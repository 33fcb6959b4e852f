"""Device trace of the fused train step (atari or connect4 lane) — top ops
by total duration, for the MFU-gap analysis (VERDICT r4 item 6).

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_train.py \
      [--game atari] [--batch 256] [--fused 2] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict


def parse_trace(tmp, top):
    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace file found under", tmp, file=sys.stderr)
        return 1
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "Chip" in name
    }
    by_name = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3
        by_name[e.get("name", "?")][0] += dur
        by_name[e.get("name", "?")][1] += 1
        total += dur
    print(f"# trace: {path}")
    print(f"# total device op time: {total:.1f} ms")
    for name, (dur, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{dur:10.2f} ms  x{cnt:6d}  {dur/max(cnt,1)*1e3:8.1f} us/op  {name[:110]}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", default="atari")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--fused", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from muzero_general_tpu.config import load_game_module
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.trainer import init_train_state, make_fused_train_steps

    cfg = load_game_module(args.game).MuZeroConfig()
    cfg.compute_dtype = "bfloat16"
    cfg.batch_size = args.batch
    cfg.fused_train_steps = args.fused
    M, B, U = args.fused, cfg.batch_size, cfg.num_unroll_steps
    A = len(cfg.action_space)
    c, h, w = cfg.observation_shape
    n = cfg.stacked_observations
    C = c * (n + 1) + n
    rng = np.random.default_rng(0)
    batches = {
        "observation": rng.normal(size=(M, B, C, h, w)).astype(np.float32),
        "action": rng.integers(0, A, (M, B, U + 1)).astype(np.int32),
        "target_value": rng.normal(size=(M, B, U + 1)).astype(np.float32),
        "target_reward": rng.normal(size=(M, B, U + 1)).astype(np.float32),
        "target_policy": rng.dirichlet(np.ones(A), (M, B, U + 1)).astype(np.float32),
        "weight": np.ones((M, B), np.float32),
        "gradient_scale": np.full((M, B, U + 1), U, np.float32),
    }
    batches = {k: jax.numpy.asarray(v) for k, v in batches.items()}
    runner = MuZeroNetwork(cfg)
    state = init_train_state(runner, cfg, jax.random.PRNGKey(0))
    fused = make_fused_train_steps(runner, cfg)
    state, metrics, _ = fused(state, batches)  # compile + warm
    float(metrics["total_loss"])

    tmp = args.keep or tempfile.mkdtemp(prefix="trace_train_")
    with jax.profiler.trace(tmp):
        state, metrics, _ = fused(state, batches)
        float(metrics["total_loss"])
    return parse_trace(tmp, args.top)


if __name__ == "__main__":
    sys.exit(main())
