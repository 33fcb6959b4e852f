"""Seeding helpers.

The reference seeds numpy+torch at init and each worker with
seed + worker_index (reference muzero.py:68-69, :185). Here a single base
seed derives a JAX PRNG key; per-lane streams come from fold_in.
"""

import jax
import numpy as np


def seed_everything(seed: int):
    """Seed host-side numpy and return the base JAX key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
