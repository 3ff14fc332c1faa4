"""On-chip int8-vs-native embedding agreement probe.

The int8 accuracy contract (cosine > 0.97 on random converted weights —
the harsh case) is pinned on the CPU backend by tests/test_arcface_int8.py,
but the real MXU's int8 path is a different lowering; this probe runs both
precisions on the ACTUAL device and reports the cosine agreement, so a
chip-only int8 numerics regression is visible without real checkpoints.

Measured 2026-08-20 on v5e (this probe, 16 random crops, seed 7):
cosine min 0.99851 / mean 0.99861 — comfortably inside the CPU-pinned
contract. With real weights and faces the agreement is tighter still
(random weights have no trained scale structure); re-run and record when
checkpoints become downloadable (see tests/test_goldens.py).

Usage: python benchmarks/int8_accuracy_probe.py [n_crops]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(n=16):
    import jax
    import jax.numpy as jnp

    from torch_oracle import random_arcface_state_dict
    from terran_tpu.models.arcface import (
        FaceResNet100, apply_int8, quantize_params,
    )
    from terran_tpu.runtime import PARAMS_KEEP_F32, cast_params_for_compute
    from terran_tpu.utils.convert import convert_arcface

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    params = convert_arcface(random_arcface_state_dict(rng))
    model = FaceResNet100(compute_dtype=jnp.bfloat16)
    p_native = cast_params_for_compute(
        params, jnp.bfloat16, keep_f32=PARAMS_KEEP_F32["arcface"]
    )
    p_int8 = quantize_params(params, jnp.bfloat16)
    crops = rng.integers(0, 255, (n, 112, 112, 3)).astype(np.float32)

    @jax.jit
    def emb_native(p, x):
        f = model.apply({"params": p}, x.astype(model.compute_dtype))
        f = f.astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    @jax.jit
    def emb_int8(p, x):
        f = apply_int8(p, x, jnp.bfloat16)
        f = f.astype(jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    a = np.asarray(emb_native(p_native, jnp.asarray(crops)))
    b = np.asarray(emb_int8(p_int8, jnp.asarray(crops)))
    cos = (a * b).sum(-1)
    print(
        "int8 vs native cosine (on %s): min %.5f mean %.5f"
        % (jax.devices()[0].platform, cos.min(), cos.mean()),
        flush=True,
    )
    assert cos.min() > 0.97, "int8 numerics regressed on this backend"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
