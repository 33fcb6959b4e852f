"""Environment layer.

Two protocols (SURVEY.md §7 design stance):
- `JaxEnv` (envs/core.py): pure-function, jittable, vmapped by the self-play
  driver — used for all from-scratch games of the reference (cartpole physics,
  boards, grids) so self-play runs fully on device.
- Host-path games (gymnasium/Box2D/ALE) wrap the same interface behind a
  host-side vector loop (envs/host.py).

Counterpart of reference games/abstract_game.py (AbstractGame).
"""

from muzero_general_tpu.envs.core import JaxEnv

__all__ = ["JaxEnv"]
