"""muzero_general_tpu — a TPU-native MuZero framework.

A from-scratch re-design of the capabilities of werner-duvaud/muzero-general
(reference at /root/reference) for TPU hardware: JAX/XLA for all compute,
batched array-based MCTS (thousands of trees in lockstep under jit), jittable
vectorized environments, a prioritized replay buffer with device-side batch
assembly, and a synchronous actor-learner driver that makes the reference's
sleep-based train:act ratio (reference muzero.py / trainer.py / self_play.py)
an exact schedule.

Public API mirrors the reference's `MuZero` class (reference muzero.py:24):

    from muzero_general_tpu import MuZero
    mz = MuZero("cartpole")
    mz.train()
    mz.test(num_tests=10)
"""

from muzero_general_tpu.muzero import MuZero, hyperparameter_search

__version__ = "0.1.0"

__all__ = ["MuZero", "hyperparameter_search", "__version__"]
