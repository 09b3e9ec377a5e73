"""Test bootstrap: force an 8-device virtual CPU mesh before jax imports.

Multi-host/multi-chip logic is validated on CPU (SURVEY.md §4 implication 5);
the real-chip path is exercised by bench.py and the driver's entry checks.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
