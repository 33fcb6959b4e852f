"""Hyperparameter search: concurrent experiments on disjoint device slices.

Parity target: reference muzero.py:495-581 — nevergrad asks
`parallel_experiments` candidates at a time and runs that many full MuZero
instances concurrently, each on a 1/N GPU budget (split_resources_in,
muzero.py:92,525). Here: a (1+λ)-ES generation of λ concurrent experiments,
each pinned to a disjoint slice of the 8-device virtual mesh.
"""

import jax
import numpy as np

from muzero_general_tpu.search import _device_slices, one_plus_one_search


TINY = {
    "training_steps": 6,
    "parallel_games": 8,
    "selfplay_chunk_moves": 4,
    "batch_size": 8,
    "max_moves": 12,
    "num_simulations": 4,
    "fused_train_steps": 1,
    "batch_prefetch": False,
    "use_last_model_value": False,
    "save_model": False,
    "checkpoint_interval": 2,
    "td_steps": 5,
    "num_unroll_steps": 3,
}


def test_device_slices_disjoint():
    slices = _device_slices(2)
    assert len(slices) == 2
    assert len(slices[0]) == len(slices[1]) == len(jax.devices()) // 2
    assert not (set(slices[0]) & set(slices[1]))


def test_device_slices_oversubscribed():
    n = len(jax.devices())
    slices = _device_slices(n + 3)
    assert len(slices) == n + 3
    assert all(len(s) == 1 for s in slices)


def test_parallel_search_runs_two_candidates_concurrently(tmp_path):
    best = one_plus_one_search(
        "cartpole",
        parametrization={"lr_init": ("log", 1e-3, 1e-1)},
        budget=2,
        parallel_experiments=2,
        num_tests=1,
        base_overrides=TINY,
        results_root=tmp_path / "search",
    )
    assert set(best) == {"lr_init"}
    assert 1e-3 <= best["lr_init"] <= 1e-1


def test_colliding_slices_serialize(tmp_path, monkeypatch):
    """λ=2 candidates on a 1-device fleet must run sequentially, not as
    interleaved accelerator programs (one-TPU-process rule; reference at
    1 GPU likewise runs one experiment at a time, muzero.py:530-548)."""
    import muzero_general_tpu.search as search_mod

    one_dev = [jax.devices()[0]]
    monkeypatch.setattr(
        search_mod, "_device_slices", lambda n: [one_dev for _ in range(n)]
    )
    active = {"now": 0, "max": 0}
    real_run = search_mod._run_candidate

    def tracking_run(*args, **kwargs):
        active["now"] += 1
        active["max"] = max(active["max"], active["now"])
        try:
            return real_run(*args, **kwargs)
        finally:
            active["now"] -= 1

    monkeypatch.setattr(search_mod, "_run_candidate", tracking_run)
    search_mod.one_plus_one_search(
        "cartpole",
        parametrization={"lr_init": ("log", 1e-3, 1e-1)},
        budget=2,
        parallel_experiments=2,
        num_tests=1,
        base_overrides=TINY,
        results_root=tmp_path / "search",
    )
    assert active["max"] == 1


def test_muzero_device_group_pins_programs(tmp_path):
    """A MuZero instance given an explicit device group trains on it."""
    from muzero_general_tpu.muzero import MuZero

    group = jax.devices()[4:8]
    overrides = dict(TINY)
    overrides["results_path"] = str(tmp_path / "pinned")
    mz = MuZero("cartpole", overrides, devices=group)
    ckpt = mz.train(log_in_tensorboard=False)
    assert ckpt["training_step"] >= 1
    assert np.isfinite(ckpt["total_loss"])


def test_split_resources_in_claims_fraction():
    from muzero_general_tpu.muzero import MuZero

    mz = MuZero("cartpole", dict(TINY), split_resources_in=4)
    assert len(mz._devices) == len(jax.devices()) // 4
