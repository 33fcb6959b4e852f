"""Capture a jax.profiler device trace of one board-game search move and
print the top device ops by total duration (parsed from the raw
.trace.json.gz — no TensorBoard needed).

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_search.py \
      [--games 256] [--sims 200] [--pallas 1] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", default="connect4",
                    help="game module for config (connect4, gomoku, ...)")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--fold", type=int, default=0,
                    help="use the BN-folded inference variant (selfplay path)")
    ap.add_argument("--batch-leaves", type=int, default=1,
                    help="multi-leaf rounds (search_batch_leaves)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", default=None, help="keep trace dir here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from muzero_general_tpu.config import load_game_module
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.ops import mcts as mcts_ops

    cfg = load_game_module(args.game).MuZeroConfig()
    cfg.num_simulations = args.sims
    B = args.games
    A = len(cfg.action_space)
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((B,) + runner.stacked_observation_shape(), jnp.float32)
    legal = jnp.ones((B, A), bool)
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(1)

    cfg.search_batch_leaves = args.batch_leaves
    spec = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)._replace(
        use_pallas=bool(args.pallas)
    )

    @jax.jit
    def run_full(variables, obs, rng):
        if args.fold:
            variables = runner.fold_variables(variables)
            init_fn = runner.initial_inference_folded
            rec_fn = runner.recurrent_inference_folded
        else:
            init_fn = runner.initial_inference
            rec_fn = runner.recurrent_inference
        out = mcts_ops.run_mcts(
            lambda o: init_fn(variables, o),
            lambda h, a: rec_fn(variables, h, a),
            obs, legal, to_play, rng, spec,
        )
        return out.root_visit_counts

    np.asarray(run_full(variables, obs, rng))  # compile + warm

    tmp = args.keep or tempfile.mkdtemp(prefix="trace_search_")
    with jax.profiler.trace(tmp):
        np.asarray(run_full(variables, obs, rng))

    # Parse the trace protobuf-exported json events.
    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", tmp, file=sys.stderr)
        return 1
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # Device-side complete events carry pid/tid of device lanes; host python
    # threads have names like "python"; filter to TensorCore pids.
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
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_name[name][0] += dur
        by_name[name][1] += 1
        total += dur
    print(f"# trace: {path}")
    print(f"# pids: { {pid: pid_names.get(pid, '') for pid in dev_pids} }")
    print(f"# total device op time: {total:.1f} ms (pallas={bool(args.pallas)})")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur:10.2f} ms  x{cnt:6d}  {dur/max(cnt,1)*1e3:8.1f} us/op  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
