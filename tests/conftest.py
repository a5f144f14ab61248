"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware.  This must be configured before the first
JAX backend initialization (the axon sitecustomize imports jax but does not
initialize a backend).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not marked ``slow`` is the core tier.

    ``pytest -m core`` = fast semantics/parity tier (~3-5 min (warm XLA cache,
    longer cold);
    ``pytest -m slow`` = compile-heavy lowering/inverse/differential
    sweeps (nightly); plain ``pytest`` still runs everything.
    """
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.core)


@pytest.fixture
def rng():
    return np.random.RandomState(42)
