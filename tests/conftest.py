"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so mesh/sharding logic is
exercised without TPU hardware (the standard JAX trick for testing
pjit/shard_map). Numerics run in float32 for oracle comparisons.

Must run before any jax import.
"""

import os
import tempfile

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TERRAN_TPU_COMPUTE_DTYPE", "float32")
# Isolate the checkpoint store from the user's home.
os.environ.setdefault("TERRAN_TPU_HOME", tempfile.mkdtemp(prefix="terran-tpu-test-"))

import jax

# Force CPU: a sitecustomize hook may have imported jax already with the TPU
# platform pinned via JAX_PLATFORMS, where convs default to bf16 and oracle
# comparisons would drift — so setting the env var here is too late, and we
# must go through the config instead.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the CPU test suite: the pipeline/
# mesh/stream tests compile multi-minute programs that are identical run
# to run, and runtime.enable_compilation_cache() keeps itself OFF whenever
# PALLAS_AXON_REMOTE_COMPILE=1 (the axon relay deadlocks serialising large
# TPU executables) — a guard that doesn't apply to these CPU-forced tests.
# First run pays the compiles and populates the cache; repeat runs load
# executables in ~1 s each. Disable with TERRAN_TPU_COMPILATION_CACHE=0.
if os.environ.get("TERRAN_TPU_COMPILATION_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "TERRAN_TPU_TEST_CACHE_DIR",
        os.path.expanduser("~/.cache/terran-tpu/xla-cpu-tests"),
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
