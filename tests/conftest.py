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

# ---------------------------------------------------------------------------
# Fast/slow split (the <5-minute contract set).
#
# `pytest -m "not slow"` is the pre-commit contract set: every behavioral
# area keeps at least its cheap tests, and the compile-heavy modules below
# are marked slow WHOLESALE except for the named host-side/validation tests
# that cost nothing. `pytest tests/ -q` (everything) is the pre-snapshot
# run. Measured on this 1-core box with a warm XLA compilation cache
# (2026-08-21): fast set ~4 min, full suite ~65-70 min — the heavy cost is
# jit compiles of pipeline/stream/spatial programs, one per (shape,
# program) per PIPELINE INSTANCE, which is why the heavy modules also
# share module-scoped pipelines (see test_pipeline.py).
# ---------------------------------------------------------------------------
SLOW_FILES = {
    # file -> names that STAY fast (cheap host-side contract tests).
    "test_pipeline.py": {
        "test_resize_bilinear_matches_cv2",
        "test_resize_bilinear_identity",
        "test_umeyama_jax_matches_numpy",
        "test_alignment_matrices_jax_matches_host",
        "test_pad_batch_to_multiple",
        "test_shard_batch_places_across_devices",
        "test_embed_bucket_selection",
        "test_peak_bucket_selection",
        "test_mesh_defaults_to_adaptive_embed",
        "test_transfer_plan_host_requires_adaptive",
    },
    "test_streams.py": {
        "test_multiplexer_round_robin_and_flush",
        "test_multiplexer_interleaves_streams",
    },
    "test_spatial.py": {
        "test_slab_layout",
        "test_every_anchor_owned_once",
    },
    "test_multihost.py": {
        "test_initialize_multi_host_strict_with_explicit_args",
        "test_initialize_multi_host_default_is_best_effort",
        "test_initialize_multi_host_strict_with_partial_args",
        "test_local_results_rejects_non_leading_sharding",
    },
    "test_fused_peaks.py": {
        "test_band_rows_alignment_required",
        "test_enabled_resolution",
        "test_auto_plane_block_fits_probed_vmem_limits",
    },
    "test_reference_crosscheck.py": set(),
    "test_pose_full_parity.py": set(),
    "test_examples.py": set(),
    "test_graft_entry.py": set(),
    "test_recognition_api.py": set(),
    "test_arcface_int8.py": set(),
    "test_openpose_int8.py": set(),
    "test_reader_stress.py": set(),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        fast_names = SLOW_FILES.get(fname)
        if fast_names is None:
            continue
        # Parametrised ids keep the base name before '['.
        base = item.name.split("[", 1)[0]
        if base not in fast_names:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
