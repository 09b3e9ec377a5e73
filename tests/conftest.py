"""Test bootstrap: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU plugin
before any test code runs, so env vars are too late — use jax.config updates,
which take effect because backends initialize lazily.  Multi-host/multi-chip
logic is validated on CPU (SURVEY.md §4 implication 5); the real-chip path is
exercised by bench.py and the driver's entry checks.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the tiny-model programs recompile across
# many tests/subprocesses; caching them cuts the suite wall time.  The dir
# is host-fingerprinted — XLA:CPU executables are ISA-specific but the
# cache key is not (see utils/compile_cache.py) — so a host move starts
# a clean cache instead of SIGILL-ing in CLI subprocesses.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from occformer_tpu.utils.compile_cache import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(os.path.join(os.path.dirname(__file__), "..")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
