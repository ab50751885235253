"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize registers a remote TPU backend and
calls ``jax.config.update("jax_platforms", ...)`` at interpreter startup,
which overrides the JAX_PLATFORMS env var — so we must override back via
jax.config after importing jax, before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_small():
    from tpulmi.data import synthetic_dataset

    return synthetic_dataset(
        n=20_000, n_queries=200, d_nav=32, d_search=96, n_clusters=24, seed=7
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process runtime, etc.)")
