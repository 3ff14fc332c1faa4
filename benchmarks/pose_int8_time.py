"""Slope-timed pose forward under TERRAN_TPU_POSE_PRECISION, pose only.

The limb program contains no convolutions, so int8 quantisation
(models/quant.py) only changes the CPM forward+peaks program; this
script measures exactly that program so a relay session doesn't have to
recompile the detect and embed programs to get the one pending number
(CLAUDE.md: "Pose int8 not yet measured").

Usage: TERRAN_TPU_POSE_PRECISION=int8 python benchmarks/pose_int8_time.py
Prints one JSON line with the pose forward ms/batch at batch 8 @1080p.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    import jax

    from device_time import scan_time
    from __graft_entry__ import _random_params
    from terran_tpu.pipeline import PerceptionPipeline

    batch, height, width = 8, 1080, 1920
    iters = 16

    pipeline = PerceptionPipeline(
        det_params=_random_params("retinaface"),
        rec_params=_random_params("arcface"),
        pose_params=_random_params("openpose"),
        max_faces=8, top_k=64, max_peaks=16,
    )
    frames = np.random.default_rng(0).integers(
        0, 255, (batch, height, width, 3), dtype=np.uint8
    )
    # _pose_detect_fn is the production pose program only under adaptive
    # limb dispatch (the fused path runs _pose_fn instead); a non-default
    # dispatch must not silently mislabel the measurement (r3 advisor).
    assert pipeline.limb_dispatch == "adaptive", (
        f"limb_dispatch={pipeline.limb_dispatch!r}: this script measures "
        "the adaptive forward+peaks program"
    )
    fd = jax.block_until_ready(pipeline.put_frames(frames))
    pd = pipeline._pose_detect_fn(height, width)
    fwd_ms, _ = scan_time(
        lambda p, f: pd(p, f), (pipeline.pose_params, fd),
        perturb_index=1, iters=iters,
    )
    print(json.dumps({
        "metric": "pose forward+peaks ms/batch (scan-timed, batch 8 @1080p)",
        "pose_precision": pipeline.pose_precision,
        "limb_dispatch": pipeline.limb_dispatch,
        "pose_fwd_ms": round(fwd_ms, 2),
        "iters": iters,
    }))


if __name__ == "__main__":
    main()
