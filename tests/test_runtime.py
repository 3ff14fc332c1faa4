"""Runtime substrate: policy, bucketing, profiling utilities."""

import time

import jax.numpy as jnp
import numpy as np

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


def test_cast_params_for_compute_keeps_exceptions_f32():
    import jax.numpy as jnp

    from terran_tpu.runtime import PARAMS_KEEP_F32, cast_params_for_compute

    params = {
        "stage0_unit0": {"conv": {"kernel": np.ones((3, 3, 4, 4), np.float32)}},
        "embed": {"kernel": np.ones((16, 8), np.float32),
                  "bias": np.zeros((8,), np.float32)},
    }
    out = cast_params_for_compute(
        params, jnp.bfloat16, keep_f32=PARAMS_KEEP_F32["arcface"]
    )
    assert out["stage0_unit0"]["conv"]["kernel"].dtype == jnp.bfloat16
    # The f32-accumulated final Dense must stay f32.
    assert out["embed"]["kernel"].dtype == jnp.float32
    assert out["embed"]["bias"].dtype == jnp.float32
    # float32 compute: storage untouched.
    same = cast_params_for_compute(params, jnp.float32)
    assert same["stage0_unit0"]["conv"]["kernel"].dtype == jnp.float32


def test_cast_params_bit_identical_under_bf16_compute():
    """Pre-cast bf16 weights produce bitwise the same model output as
    f32-stored weights under bf16 compute (the layers' per-execution
    cast becomes a no-op — runtime.cast_params_for_compute)."""
    import jax
    import jax.numpy as jnp

    from terran_tpu.models.arcface import FaceResNet100
    from terran_tpu.runtime import PARAMS_KEEP_F32, cast_params_for_compute

    model = FaceResNet100(compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 112, 112, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    cast = cast_params_for_compute(
        params, jnp.bfloat16, keep_f32=PARAMS_KEEP_F32["arcface"]
    )
    a = model.apply({"params": params}, x)
    b = model.apply({"params": cast}, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
