"""Device/runtime substrate for the TPU-native framework.

Replaces the reference's single global ``default_device`` (see
``/root/reference/terran/defaults.py:1-5``) with JAX device discovery, a
device-mesh abstraction for scaling batches across chips, and a central
numerics policy (param/compute dtypes) used by every model.

Design notes (TPU-first):
- Everything model-side is jitted with static shapes; this module owns the
  shape-bucketing policy used to keep the number of compiled programs bounded.
- Multi-chip scaling is data-parallel over the frame/batch axis on a 1-D
  ``data`` mesh (see ``terran_tpu/parallel/mesh.py``); the models here are
  tiny (<=65M params), so DP over ICI is the honest strategy.
"""

import os
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp


def enable_compilation_cache():
    """Persistent XLA compilation cache (first compile of the big fused
    programs costs 1-5 minutes through a remote-compile relay; cached
    reloads take ~1 s). Respects JAX_COMPILATION_CACHE_DIR; disable with
    TERRAN_TPU_COMPILATION_CACHE=0."""
    if os.environ.get("TERRAN_TPU_COMPILATION_CACHE", "1") == "0":
        return
    # The axon remote-compile relay deadlocks when the persistent cache
    # tries to serialise its larger executables (observed: the fused
    # perception program compiles in ~220s with the cache off but hangs
    # indefinitely with it on). Opt in explicitly with
    # TERRAN_TPU_COMPILATION_CACHE=1 if the relay gains support.
    if (
        os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
        and "TERRAN_TPU_COMPILATION_CACHE" not in os.environ
    ):
        return
    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            str(Path("~/.cache/terran-tpu/xla").expanduser()),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


enable_compilation_cache()


def available_devices():
    """Return the list of JAX devices for the preferred platform."""
    return jax.devices()


def default_device():
    """Return the default accelerator device (analogue of the reference's
    ``default_device``, /root/reference/terran/defaults.py:3-5)."""
    return jax.devices()[0]


def platform():
    """The platform string of the default device ('tpu', 'cpu', 'gpu')."""
    return jax.devices()[0].platform


def is_tpu():
    return platform() in ("tpu", "axon")


@dataclass(frozen=True)
class Policy:
    """Numerics policy for model execution.

    ``param_dtype`` is the dtype weights are stored in; ``compute_dtype`` is
    the dtype convolutions run in (bfloat16 uses the MXU at full rate).
    Accuracy-critical reductions (softmax, embedding head) always accumulate
    in float32.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def from_env():
        compute = os.environ.get("TERRAN_TPU_COMPUTE_DTYPE", "bfloat16")
        return Policy(compute_dtype=jnp.dtype(compute))


_default_policy = None


def default_policy():
    global _default_policy
    if _default_policy is None:
        _default_policy = Policy.from_env()
    return _default_policy


def set_default_policy(policy):
    global _default_policy
    _default_policy = policy


def cast_params_for_compute(params, compute_dtype, keep_f32=()):
    """Store float32 params in the compute dtype, once, at load time.

    The flax layers run with ``dtype=compute_dtype`` and cast their
    params — so float32-stored weights were being converted on EVERY
    program execution: a full HBM read of the f32 copy plus VPU convert
    (65 MB for ArcFace alone — round-2 review item #1a). Converting at
    load time produces bitwise the SAME compute (the layer's cast
    becomes a no-op) without the per-execution traffic.

    ``keep_f32``: module names whose subtree must STAY float32 because
    the layer deliberately computes in f32 (ArcFace's 'embed' Dense
    accumulates the 25088->512 projection in f32 with dtype=None — a
    bf16-stored kernel would silently truncate it). float32 compute
    keeps f32 storage; non-float leaves pass through.
    """
    import jax

    compute_dtype = jnp.dtype(compute_dtype)
    if compute_dtype == jnp.float32:
        return params
    keep = set(keep_f32)

    def cast(path, x):
        if any(getattr(p, "key", None) in keep for p in path):
            return x
        if getattr(x, "dtype", None) == jnp.float32:
            return jnp.asarray(x).astype(compute_dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)


# Module names that must keep f32 storage per model family (see
# cast_params_for_compute): ArcFace's final Dense is f32-accumulated.
PARAMS_KEEP_F32 = {"arcface": ("embed",), "retinaface": (), "openpose": ()}


# ---------------------------------------------------------------------------
# Shape bucketing
# ---------------------------------------------------------------------------

def round_up(x, multiple):
    return -(-x // multiple) * multiple


def bucket_shape(h, w, mode="exact", multiple=64):
    """Return the (H, W) shape the jitted model will actually run at.

    - ``exact``: run at the exact resized shape. JIT caches one program per
      distinct shape; for video (fixed frame size) this means a single
      compilation and bitwise parity with the reference pipeline.
    - ``pad``: round H and W up to ``multiple`` so mixed-size image
      directories share a small set of programs. Outputs falling into the
      padded margin are masked out downstream.
    """
    if mode == "exact":
        return h, w
    elif mode == "pad":
        return round_up(h, multiple), round_up(w, multiple)
    raise ValueError(f"unknown bucketing mode: {mode}")
