"""Dump the optimized HLO of one board-game search move and grep the big
copies (run on the real chip so the TPU-backend passes run).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py [regex]
"""

import re
import sys


def main():
    import jax
    import jax.numpy as jnp

    from muzero_general_tpu.games.connect4 import MuZeroConfig
    from muzero_general_tpu.models import MuZeroNetwork
    from muzero_general_tpu.ops import mcts as mcts_ops

    cfg = MuZeroConfig()
    B = 256
    A = len(cfg.action_space)
    runner = MuZeroNetwork(cfg)
    variables = runner.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((B,) + runner.stacked_observation_shape(), jnp.float32)
    legal = jnp.ones((B, A), bool)
    to_play = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(1)
    spec = mcts_ops.SearchSpec.from_config(cfg, batch_size=B)._replace(
        use_pallas=True
    )

    def run_full(variables, obs, rng):
        out = mcts_ops.run_mcts(
            lambda o: runner.initial_inference(variables, o),
            lambda h, a: runner.recurrent_inference(variables, h, a),
            obs, legal, to_play, rng, spec,
        )
        return out.root_visit_counts

    txt = jax.jit(run_full).lower(variables, obs, rng).compile().as_text()
    pat = sys.argv[1] if len(sys.argv) > 1 else r"copy\."
    out_lines = []
    for line in txt.splitlines():
        if re.search(pat, line):
            out_lines.append(line.strip()[:400])
    # Only copies of big buffers are interesting: sort by a rough size cue.
    for line in out_lines:
        print(line)
    print(f"# {len(out_lines)} matching lines", file=sys.stderr)


if __name__ == "__main__":
    main()
