"""Test configuration: force an 8-device virtual CPU backend.

Must set XLA flags before jax initializes — this emulates a multi-chip TPU
mesh on CPU (the fake-backend story the reference lacks, SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be pre-imported by the environment (sitecustomize), in which
# case the env vars above are too late for platform selection — but the config
# API still works as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow end-to-end training tests",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow end-to-end tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
