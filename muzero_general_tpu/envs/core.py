"""Pure-function environment protocol for on-device self-play.

Counterpart of the reference's `AbstractGame` interface
(reference games/abstract_game.py:4-105) re-designed for jit/vmap:
state is a pytree of arrays, transitions are pure functions, randomness is
threaded through explicit PRNG keys (required for stochastic envs like
twentyone's dealer — SURVEY.md §7 'hard parts').

All methods operate on a SINGLE instance; the self-play driver vmaps them
over the game batch.
"""

from typing import Any, Tuple

import jax.numpy as jnp

EnvState = Any  # pytree of arrays


class JaxEnv:
    """Interface; subclasses implement pure functions of (state, key)."""

    # Static properties (mirror MuZeroConfig game group, §2.7)
    observation_shape: Tuple[int, int, int]  # (C, H, W)
    num_actions: int
    num_players: int = 1

    def reset(self, key) -> EnvState:
        """Fresh episode state. `key` is a PRNG key."""
        raise NotImplementedError

    def observation(self, state) -> jnp.ndarray:
        """[C, H, W] float32 observation of `state`."""
        raise NotImplementedError

    def step(self, state, action, key) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Apply `action`; returns (next_state, reward, done).

        Must be safe to call on a done state (the driver auto-resets, but a
        vmapped lane may step a terminal state once with a masked result).
        """
        raise NotImplementedError

    def legal_actions_mask(self, state) -> jnp.ndarray:
        """[num_actions] bool mask of legal actions."""
        return jnp.ones((self.num_actions,), bool)

    def to_play(self, state) -> jnp.ndarray:
        """Current player id (0-based). Default single-player 0
        (reference abstract_game.py to_play default)."""
        return jnp.int32(0)

    # ---- Optional human-facing helpers (reference abstract_game.py) -----
    def render(self, state):
        print(self.observation(state))

    def action_to_string(self, action) -> str:
        return str(action)

    def human_to_action(self, state) -> int:
        while True:
            try:
                a = int(input(f"Enter action (0-{self.num_actions - 1}): "))
                if 0 <= a < self.num_actions:
                    return a
            except ValueError:
                pass

    def expert_action(self, state, key):
        """Heuristic opponent (reference expert_agent); default: random legal."""
        import jax

        mask = self.legal_actions_mask(state)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)
