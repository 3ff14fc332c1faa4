"""Slope-time the limb-scoring backends head to head on the TPU.

Measures the full bucketed limb program (x8 PAF upsample + pair scoring,
exactly what ``pipeline._limb_fn`` runs) at batch 8 @1080p pose scale for
both samplers:

- gather: ``limb_scores`` — one 2-element gather descriptor per segment
  sample (r3 measured 8.76 ms at kb=16 with endpoint dedup).
- matmul: ``limb_scores_matmul`` — one-hot MXU contraction, zero
  descriptors (bit-identical; tests/test_pose_decode.py).

Also asserts the two programs agree bitwise ON DEVICE at every measured
bucket (the CPU equality test can't see TPU matmul precision behaviour —
the one-hot exactness argument needs HIGHEST/bf16x3 to hold in hardware).

Prints one JSON line with ms/batch per backend per bucket.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    import jax.numpy as jnp

    from device_time import scan_time, synthetic_peak_plan
    from terran_tpu.ops.pose_decode import (
        NUM_PARTS, limb_scores, limb_scores_matmul,
    )
    from terran_tpu.ops.upsample import upsample_bicubic

    batch, iters = 8, 16
    # 1080p pose scale: short side 184 -> field (23, 41, 38), x8 upsample.
    fh, fw = 23, 41
    rng = np.random.default_rng(0)
    paf = jnp.asarray(
        rng.normal(scale=0.3, size=(batch, fh, fw, 38)).astype(np.float32)
    )

    def make_fn(score):
        def limbs_fn(paf, cv_packed):
            coords = cv_packed[..., :2].astype(jnp.int32)
            valid = cv_packed[..., 2] > 0.5
            paf8 = upsample_bicubic(paf, 8)
            reg, accept = jax.vmap(
                lambda p, c, v: score(p, c, v, 0.05)
            )(paf8, coords, valid)
            return jnp.stack([reg, accept.astype(jnp.float32)], axis=-1)

        return jax.jit(limbs_fn)

    out = {"metric": "limb program ms/batch (scan-timed, batch 8 @1080p)"}
    for kb in (4, 8, 16):
        cv = jnp.asarray(synthetic_peak_plan(
            batch, NUM_PARTS, kb, fh * 8, fw * 8
        ))
        res = {}
        for name, score in (
            ("gather", limb_scores),
            ("matmul", limb_scores_matmul),
        ):
            fn = make_fn(score)
            res[name] = jax.block_until_ready(fn(paf, cv))
            ms, _ = scan_time(fn, (paf, cv), perturb_index=0, iters=iters)
            out[f"{name}_kb{kb}_ms"] = round(ms, 2)
        a, b = map(np.asarray, (res["gather"], res["matmul"]))
        exact = bool((a == b).all())
        out[f"bitwise_equal_kb{kb}"] = exact
        if not exact:
            d = np.abs(a - b)
            out[f"max_diff_kb{kb}"] = float(d.max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
