"""Offline strength retest of numbered training snapshots.

For every model_<step>.checkpoint under --dir, plays --games greedy
evaluation games vs --opponent (default the connect4 expert) and prints a
per-snapshot table: the offline counterpart of the in-run muzero_reward
curve, decoupled from self-play/eval noise. Built for the r4 connect4
late-decile regression diagnosis (VERDICT r4 item 3).

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/retest_snapshots.py \
      --dir /tmp/c4_gate [--games 20] [--game connect4] [--opponent expert]
"""

import argparse
import pathlib
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--game", default="connect4")
    ap.add_argument("--games", type=int, default=20)
    ap.add_argument("--opponent", default="expert")
    ap.add_argument("--also-final", action="store_true",
                    help="include the rolling model.checkpoint as a row")
    args = ap.parse_args()

    import numpy as np

    from muzero_general_tpu.evaluate import play_against_opponent
    from muzero_general_tpu.muzero import MuZero, two_player_reward_split

    d = pathlib.Path(args.dir)
    snaps = sorted(
        d.glob("model_*.checkpoint"),
        key=lambda p: int(re.search(r"model_(\d+)", p.name).group(1)),
    )
    if args.also_final and (d / "model.checkpoint").exists():
        snaps.append(d / "model.checkpoint")
    if not snaps:
        raise SystemExit(f"no model_*.checkpoint under {d}")

    mz = MuZero(args.game, {"results_path": str(d / "retest")})
    cfg = mz.config
    env = mz.make_env()
    print(f"\n| snapshot | mean reward | wins/games | losses | draws |")
    print("|---|---:|---:|---:|---:|")
    for snap in snaps:
        mz.load_model(checkpoint_path=snap)
        state = mz._restore_state()
        variables = mz._variables(state)
        rewards = []
        for i in range(args.games):
            gh = play_against_opponent(
                env, mz.runner, cfg, variables, args.opponent,
                cfg.muzero_player, seed=cfg.seed + 1000 + i,
            )
            if len(cfg.players) == 1:
                rewards.append(float(gh.rewards.sum()))
            else:
                rewards.append(two_player_reward_split(gh, cfg.muzero_player)[0])
        r = np.asarray(rewards)
        print(
            f"| {snap.name} | {r.mean():+.2f} | "
            f"{int((r > 0).sum())}/{len(r)} | {int((r < 0).sum())} | "
            f"{int((r == 0).sum())} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
