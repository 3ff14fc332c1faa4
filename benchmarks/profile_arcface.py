"""Per-stage decomposition of the ArcFace forward (round-3 perf attack).

Slope-times (benchmarks/device_time.py::scan_time) truncated prefixes of
FaceResNet100 on a full-occupancy crop batch: the marginal between
consecutive prefixes is that stage's device cost. Also reports each
stage's FLOPs so the per-stage MFU shows which stages are MXU-bound and
which are memory-bound (the 112px stage-0 units have 3.7 GFLOP each at
64 crops but touch 6.4 MB activations; the 7px stage-3 units are
weight-traffic-bound).

Prints one JSON line per measurement. Run on the TPU.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from device_time import scan_time


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from terran_tpu.models.arcface import (
        CHANNELS, PREPROC_MEAN, PREPROC_STD, UNITS_PER_STAGE, FaceResNet100,
        Unit,
    )
    from terran_tpu.models.layers import ConvAffine
    from terran_tpu.runtime import PARAMS_KEEP_F32, cast_params_for_compute

    n = 64
    if "--crops" in sys.argv:
        n = int(sys.argv[sys.argv.index("--crops") + 1])

    class Prefix(nn.Module):
        """First ``upto`` residual units of FaceResNet100 (same module
        names, so the full model's params slot in directly)."""

        upto: int  # number of units to run, 0 = stem only
        compute_dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            dt = self.compute_dtype
            x = ((x.astype(jnp.float32) - PREPROC_MEAN)
                 * PREPROC_STD).astype(dt)
            x = ConvAffine(CHANNELS[0], (3, 3), 1, 1, act="none",
                           compute_dtype=dt, name="initial")(x)
            alpha = self.param(
                "initial_prelu", nn.initializers.constant(0.25),
                (CHANNELS[0],), jnp.float32,
            )
            x = jnp.where(x >= 0, x, x * alpha.astype(x.dtype))
            done = 0
            for stage_idx, num_units in enumerate(UNITS_PER_STAGE):
                for unit_idx in range(num_units):
                    if done >= self.upto:
                        return x
                    x = Unit(
                        CHANNELS[stage_idx + 1],
                        stride=2 if unit_idx == 0 else 1,
                        has_shortcut=unit_idx == 0,
                        compute_dtype=dt,
                        name=f"stage{stage_idx}_unit{unit_idx}",
                    )(x)
                    done += 1
            return x

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "crops": n}), flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (n, 112, 112, 3)).astype(np.float32))

    full = FaceResNet100(compute_dtype=jnp.bfloat16)
    params = full.init(jax.random.PRNGKey(0), x[:1])["params"]
    params = cast_params_for_compute(
        params, jnp.bfloat16, keep_f32=PARAMS_KEEP_F32["arcface"]
    )
    params = jax.device_put(params)

    # Stage boundaries (cumulative unit counts) + a stem-only point.
    cuts = [0]
    total = 0
    for u in UNITS_PER_STAGE:
        total += u
        cuts.append(total)

    prev_ms = 0.0
    for upto in cuts:
        m = Prefix(upto=upto)
        fn = jax.jit(lambda p, a, _m=m: jnp.sum(
            _m.apply({"params": p}, a).astype(jnp.float32)))
        ms, _ = scan_time(fn, (params, x), perturb_index=1, iters=16)
        print(json.dumps({
            "prefix_units": upto, "ms": round(ms, 3),
            "marginal_ms": round(ms - prev_ms, 3),
        }), flush=True)
        prev_ms = ms

    # The full model (head included) for the total.
    fn = jax.jit(lambda p, a: jnp.sum(full.apply({"params": p}, a)))
    ms, _ = scan_time(fn, (params, x), perturb_index=1, iters=16)
    print(json.dumps({"full_model_ms": round(ms, 3),
                      "head_marginal_ms": round(ms - prev_ms, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
