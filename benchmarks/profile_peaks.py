"""Slope-timed fused-peaks kernel vs the XLA materialise path, across
plane-block sizes. Production shape: batch 8 x 19 part planes at the
(23, 41) OpenPose field of a 1080p frame.

Usage: python benchmarks/profile_peaks.py [--blocks 1,4,8,16] [--xla]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from device_time import scan_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=str, default="1,8,16")
    ap.add_argument("--xla", action="store_true",
                    help="also time the XLA materialise-and-top_k path")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--shape", type=str, default="8,23,41,19")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from terran_tpu.ops.fused_peaks import find_peaks_fused
    from terran_tpu.ops.pose_decode import find_peaks
    from terran_tpu.ops.upsample import upsample_bicubic

    b, h, w, p = (int(x) for x in args.shape.split(","))
    heat = jnp.asarray(
        np.random.default_rng(0).normal(scale=0.2, size=(b, h, w, p))
        .astype(np.float32)
    )
    jax.block_until_ready(heat)
    out = {"shape": [b, h, w, p]}

    for tok in args.blocks.split(","):
        pb = int(tok)
        ms, _ = scan_time(
            lambda x: find_peaks_fused(x, 0.1, 16, plane_block=pb),
            (heat,), iters=args.iters,
        )
        out[f"fused_pb{pb}_ms"] = round(ms, 2)
        print(f"# fused pb={pb}: {ms:.2f} ms", file=sys.stderr, flush=True)

    if args.xla:
        def xla_path(x):
            ups = upsample_bicubic(x, 8)
            return find_peaks(ups, 0.1, 16)

        ms, _ = scan_time(lambda x: xla_path(x), (heat,), iters=args.iters)
        out["xla_ms"] = round(ms, 2)
        print(f"# xla: {ms:.2f} ms", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
