"""Sweep the Pallas lane-block size (via MUZERO_PALLAS_VMEM_BUDGET) for the
staged board-game search and print ms/move per block choice.

Usage (real chip): PYTHONPATH=/root/repo:/root/.axon_site python tools/block_sweep.py
"""

import json
import os
import subprocess
import sys

INNER = r"""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from muzero_general_tpu.games.connect4 import MuZeroConfig
from muzero_general_tpu.models import MuZeroNetwork
from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops import mcts_pallas

cfg = MuZeroConfig()
B = 256
A = len(cfg.action_space)
runner = MuZeroNetwork(cfg)
variables = runner.init(jax.random.PRNGKey(0))
obs = jnp.zeros((B,) + runner.stacked_observation_shape(), jnp.float32)
legal = jnp.ones((B, A), bool)
to_play = jnp.zeros((B,), jnp.int32)
rng = jax.random.PRNGKey(1)
spec = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)._replace(use_pallas=True)

@jax.jit
def run_full(variables, obs, rng):
    out = mcts_ops.run_mcts(
        lambda o: runner.initial_inference(variables, o),
        lambda h, a: runner.recurrent_inference(variables, h, a),
        obs, legal, to_play, rng, spec,
    )
    return out.root_visit_counts

np.asarray(run_full(variables, obs, rng))
t0 = time.time()
reps = 5
for _ in range(reps):
    np.asarray(run_full(variables, obs, rng))
dt = (time.time() - t0) / reps
block = mcts_pallas.choose_block(B, cfg.num_simulations + 1, A)
print(json.dumps({"block": block, "ms_per_move": round(dt * 1e3, 1),
                  "env_steps_per_s": round(B / dt, 1)}))
"""


def main():
    for budget_mb in (8, 16, 32, 64):
        env = dict(os.environ)
        env["MUZERO_PALLAS_VMEM_BUDGET"] = str(budget_mb * 1024 * 1024)
        env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        r = subprocess.run(
            [sys.executable, "-c", INNER], env=env, capture_output=True,
            text=True, timeout=1500,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            d = json.loads(line[-1])
            print(f"budget {budget_mb}MB -> block {d['block']}: "
                  f"{d['ms_per_move']} ms/move ({d['env_steps_per_s']} steps/s)")
        else:
            err = r.stderr.strip().splitlines()
            print(f"budget {budget_mb}MB FAILED: {err[-1] if err else '?'}")


if __name__ == "__main__":
    main()
