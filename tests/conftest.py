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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
