"""Model layer: MuZero network triplets (representation/dynamics/prediction).

Factory dispatch parity with reference models.py:7-41 (`MuZeroNetwork.__new__`
on config.network), re-designed as flax modules with pure apply functions so
they jit/vmap/shard; weights live in pytrees, not torch state dicts.
"""

from muzero_general_tpu.models.network import MuZeroNetwork, NetworkRunner

__all__ = ["MuZeroNetwork", "NetworkRunner"]
