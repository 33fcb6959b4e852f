"""Per-game plugin modules: each exposes `MuZeroConfig` and `make_env()`.

Counterpart of the reference games/ directory (11 game modules, SURVEY.md
§2.6) loaded by name via importlib (reference muzero.py:45-47).
"""

AVAILABLE_GAMES = [
    "cartpole",
    "simple_grid",
    "tictactoe",
    "connect4",
    "gomoku",
    "twentyone",
    "gridworld",
    "lunarlander",
    "breakout",
    "atari",
    "spiel",
]
