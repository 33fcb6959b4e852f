"""Hyperparameter search.

The reference drives nevergrad's OnePlusOne optimizer over full training runs
(reference muzero.py:495-581, :694-707). nevergrad is not available in this
environment, so the same (1+1)-evolution-strategy loop is implemented
directly: mutate the incumbent, train a full MuZero instance, score it with
test(), keep the better. Parametrization:

    {"lr_init": ("log", 1e-4, 0.1), "discount": ("linear", 0.95, 0.9999)}
"""

import math

import numpy as np

from muzero_general_tpu import checkpoint as ckpt_lib


DEFAULT_PARAMETRIZATION = {
    "lr_init": ("log", 1e-4, 0.1),
    "discount": ("log", 0.95, 0.9999),
}


def _sample_initial(parametrization, rng):
    values = {}
    for name, (scale, lo, hi) in parametrization.items():
        if scale == "log":
            values[name] = float(
                math.exp(rng.uniform(math.log(lo), math.log(hi)))
            )
        else:
            values[name] = float(rng.uniform(lo, hi))
    return values

def _mutate(values, parametrization, rng, sigma=0.5):
    out = {}
    for name, (scale, lo, hi) in parametrization.items():
        v = values[name]
        if scale == "log":
            v = math.exp(
                np.clip(
                    math.log(v) + rng.normal(0, sigma),
                    math.log(lo),
                    math.log(hi),
                )
            )
        else:
            v = float(np.clip(v + rng.normal(0, sigma * (hi - lo)), lo, hi))
        out[name] = float(v)
    return out


def one_plus_one_search(game_name, parametrization=None, budget=20,
                        parallel_experiments=1, num_tests=10):
    """(1+1)-ES over full train+test runs; returns the best override dict.

    `parallel_experiments` is kept for signature parity with the reference
    (muzero.py:495); the synchronous TPU build runs candidates serially on
    the one device program.
    """
    from muzero_general_tpu.muzero import MuZero

    parametrization = parametrization or DEFAULT_PARAMETRIZATION
    rng = np.random.default_rng(0)

    best_values, best_score, best_checkpoint = None, -np.inf, None
    incumbent = _sample_initial(parametrization, rng)
    for trial in range(budget):
        candidate = (
            incumbent if trial == 0 else _mutate(incumbent, parametrization, rng)
        )
        print(f"\n[search {trial + 1}/{budget}] {candidate}")
        mz = MuZero(game_name, dict(candidate))
        mz.train(log_in_tensorboard=False)
        score = mz.test(num_tests=num_tests)
        print(f"[search {trial + 1}/{budget}] score {score:.2f}")
        if score > best_score:
            best_values, best_score = dict(candidate), score
            best_checkpoint = mz.checkpoint
            incumbent = dict(candidate)

    if best_checkpoint is not None:
        results_path = MuZero(game_name).config.results_path
        results_path.mkdir(parents=True, exist_ok=True)
        ckpt_lib.save_checkpoint(best_checkpoint, results_path / "model.checkpoint")
        (results_path / "best_parameters.txt").write_text(str(best_values))
    print(f"\nBest parameters: {best_values} (score {best_score:.2f})")
    return best_values
