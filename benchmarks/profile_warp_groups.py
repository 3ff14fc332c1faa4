"""Slope-timed comparison of the grouped-slab warp's group sizes.

Times the full warp+embed windowed program (the pipeline's production
program) at group in {None, 4, 8} on the SAME full-occupancy synthetic
plan, with a rotation range small enough that every face is genuinely
G=8-eligible (|m10|*(G-1) <= SLAB_H-2), so the measured program is the
one production would dispatch. Prints one JSON line.

Usage: python benchmarks/profile_warp_groups.py [--rot 0.2] [--face-px 64]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from device_time import scan_time  # noqa: E402  (sibling module)

sys.path.insert(0, str(Path(__file__).resolve().parent))


def synthetic_plan(batch, k_slots, height, width, face_px, rot, window,
                   seed=0):
    from terran_tpu.ops.warp import ARCFACE_TEMPLATE, alignment_matrix

    rng = np.random.default_rng(seed)
    corners = np.array([[0.5, 0.5], [111.5, 0.5], [0.5, 111.5],
                        [111.5, 111.5]])
    packed = np.zeros((batch, k_slots, 9), np.float32)
    for i in range(batch):
        for j in range(k_slots):
            scale = face_px / 112.0
            theta = rng.uniform(-rot, rot)
            r = np.array(
                [[np.cos(theta), -np.sin(theta)],
                 [np.sin(theta), np.cos(theta)]], np.float32
            ) * scale
            t = np.array([
                rng.uniform(0, max(1.0, width - face_px)),
                rng.uniform(0, max(1.0, height - face_px)),
            ])
            lmk = (ARCFACE_TEMPLATE - 56.0) @ r.T + t + face_px / 2
            m = alignment_matrix(lmk)
            packed[i, j, :6] = m.reshape(-1)
            packed[i, j, 6] = 1.0
            src = corners @ m[:, :2].T + m[:, 2]
            lo = np.floor(src.min(axis=0)) - 3
            packed[i, j, 7] = lo[1]
            packed[i, j, 8] = lo[0]
    packed[..., 7] = np.clip(packed[..., 7], 0, height - window)
    packed[..., 8] = np.clip(packed[..., 8], 0, width - window)
    return packed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rot", type=float, default=0.2,
                    help="max |rotation| in radians for synthetic faces")
    ap.add_argument("--face-px", type=int, default=64)
    ap.add_argument("--groups", type=str, default="none,4,8",
                    help="comma list of 'group' or 'group:slabh.slabw' "
                         "(none = per-pixel)")
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _random_params
    from terran_tpu.ops.warp import grouped_warp_eligible
    from terran_tpu.pipeline import PerceptionPipeline

    batch, height, width = 8, 1080, 1920
    pipeline = PerceptionPipeline(
        det_params=_random_params("retinaface"),
        rec_params=_random_params("arcface"),
        pose_params=_random_params("openpose"),
        max_faces=8, top_k=64, max_peaks=16,
    )
    ws = pipeline.embed_windows[0]
    frames = np.random.default_rng(0).integers(
        0, 255, (batch, height, width, 3), dtype=np.uint8
    )
    fd = jax.block_until_ready(pipeline.put_frames(frames))
    packed = jnp.asarray(synthetic_plan(
        batch, pipeline.max_faces, height, width, args.face_px, args.rot,
        ws,
    ))
    mats = np.asarray(packed[..., :6]).reshape(-1, 2, 3)

    out = {"rot": args.rot, "face_px": args.face_px, "window": ws}
    for tok in args.groups.split(","):
        tok = tok.strip().lower()
        slab = None
        if tok == "none":
            group = None
        elif ":" in tok:
            gs, ss = tok.split(":")
            group = int(gs)
            slab = tuple(int(x) for x in ss.split("."))
        else:
            group = int(tok)
        eligible = (
            True if group is None
            else bool(grouped_warp_eligible(
                mats, group=group,
                slab_h=slab[0] if slab else None,
                slab_w=slab[1] if slab else None,
            ).all())
        )
        fn = pipeline._warp_embed_window_fn(
            pipeline.max_faces, ws, fd.shape, group=group, slab=slab
        )
        ms, _ = scan_time(
            lambda p, f, pk: fn(p, f, pk),
            (pipeline.rec_params, fd, packed), perturb_index=1,
            iters=args.iters,
        )
        key = ("per_pixel" if group is None
               else f"g{group}" + (f"_s{slab[0]}{slab[1]}" if slab else ""))
        out[f"{key}_ms"] = round(ms, 2)
        out[f"{key}_eligible"] = eligible
        print(f"# {key}: {ms:.2f} ms (all-eligible={eligible})",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
