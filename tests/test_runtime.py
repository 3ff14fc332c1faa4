"""Runtime substrate: policy, bucketing, profiling utilities."""

import time

import jax.numpy as jnp

from terran_tpu.runtime import (
    Policy, bucket_shape, default_device, default_policy, round_up,
)
from terran_tpu.utils.profiling import StageTimer, get_logger, trace


def test_default_device_exists():
    assert default_device() is not None


def test_policy_defaults_and_env():
    policy = Policy()
    assert policy.param_dtype == jnp.float32
    assert policy.compute_dtype == jnp.bfloat16
    # Tests run with TERRAN_TPU_COMPUTE_DTYPE=float32 (conftest).
    assert default_policy().compute_dtype == jnp.float32


def test_round_up_and_buckets():
    assert round_up(1, 64) == 64
    assert round_up(64, 64) == 64
    assert round_up(65, 64) == 128
    assert bucket_shape(100, 200) == (100, 200)


def test_stage_timer_accumulates():
    timer = StageTimer()
    with timer.stage("s", items=4):
        time.sleep(0.01)
    with timer.stage("s", items=4):
        pass
    summary = timer.summary()["s"]
    assert summary["calls"] == 2
    assert summary["total_s"] >= 0.01
    assert summary["items_per_s"] > 0
    timer.reset()
    assert timer.summary() == {}


def test_trace_records_to_global_timer():
    from terran_tpu.utils.profiling import global_timer

    before = global_timer().counts.get("unit-test-trace", 0)
    with trace("unit-test-trace"):
        pass
    assert global_timer().counts["unit-test-trace"] == before + 1


def test_logger_singleton_handlers():
    a = get_logger("terran_tpu.test")
    b = get_logger("terran_tpu.test")
    assert a is b and len(a.handlers) == 1
