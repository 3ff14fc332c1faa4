"""Measure this chip's sustained matmul peak (the MFU denominator).

Slope-timed (benchmarks/device_time.py::scan_time): one compiled
program with a runtime trip count, timed at two counts — the relay's
30-45 ms dispatch+fetch constant cancels exactly. The body ends in a
``jnp.max`` of the product so XLA cannot algebraically narrow the
matmul (a sliced or summed output gets rewritten to a fraction of the
FLOPs — measured here: a ``C[0, :8]`` slice turned an 8192^3 matmul
into one row and reported an impossible 125,000 TFLOP/s).

Earlier rounds recorded "369 TFLOP/s measured bf16 peak" — that number
tracks the v5e's INT8 peak (394 TOPS) and is irreproducible for bf16
with sound timing; the bf16 spec is 197 TFLOP/s and this script
measures ~191 sustained. bench.py's MFU denominator uses the value
printed here.

Prints one JSON line per (dtype, size); run on the TPU.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from device_time import scan_time


def main():
    import jax
    import jax.numpy as jnp

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    rng = np.random.default_rng(0)
    best = {}
    for dtype, acc in (("bfloat16", jnp.float32), ("int8", jnp.int32)):
        for n in (4096, 8192, 16384):
            if dtype == "int8":
                a = jnp.asarray(
                    rng.integers(-127, 127, (n, n), dtype=np.int8)
                )
                b = jnp.asarray(
                    rng.integers(-127, 127, (n, n), dtype=np.int8)
                )
            else:
                a = jnp.asarray(
                    rng.normal(size=(n, n)).astype(np.float32)
                ).astype(jnp.bfloat16)
                b = jnp.asarray(
                    rng.normal(size=(n, n)).astype(np.float32)
                ).astype(jnp.bfloat16)

            def mm(x, y):
                c = jax.lax.dot_general(
                    x, y, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                return jnp.max(c)

            try:
                ms, _ = scan_time(mm, (a, b), perturb_index=0, iters=16)
            except Exception as exc:  # e.g. int8 dot unsupported
                print(json.dumps({"dtype": dtype, "n": n,
                                  "error": str(exc)[:120]}), flush=True)
                continue
            tflops = 2 * n**3 / (ms / 1e3) / 1e12
            best[dtype] = max(best.get(dtype, 0.0), tflops)
            print(json.dumps({
                "dtype": dtype, "n": n, "ms": round(ms, 3),
                "tflops": round(tflops, 1),
            }), flush=True)

    print(json.dumps({"peak_tflops": {k: round(v, 1)
                                      for k, v in best.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
