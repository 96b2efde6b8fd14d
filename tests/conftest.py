"""Test harness setup: force CPU with 8 virtual devices so sharding tests run
fast and without TPU hardware.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
var, so we must use jax.config.update(). XLA_FLAGS is still honoured as long
as it is set before the first backend initialisation, which this file
guarantees by being imported before any test module.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is `quick`, so both
    `-m quick` and `-m slow` select meaningful subsets (the full suite
    exceeds a 10-minute window on a 1-CPU box; see README 'Running the
    tests')."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
