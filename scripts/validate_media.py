#!/usr/bin/env python
"""Real-media validation kit: run on the first host that has ffmpeg.

This repo's entire video stack (``Video``, ``VideoWriter``,
``ParallelVideo``) is tested against fake subprocess commands because the
dev sandbox has no ffmpeg binary (CLAUDE.md). This script is the
one-command validation to run wherever a real ffmpeg exists
(round-2 review item "Missing #2"):

1. Generates a deterministic test asset with ffmpeg (testsrc2 pattern).
2. Decodes it through ``Video`` and asserts frame count/shape/rate.
3. Decodes it through ``ParallelVideo`` at several worker counts and
   asserts frame-exact agreement with the sequential reader, modulo the
   documented ±1-frame tolerance at each segment boundary (container
   ``-ss`` seek points; see io/video/parallel.py docstring).
4. Round-trips ``VideoWriter``: writes the decoded frames back out,
   re-probes the result, re-decodes it, and checks duration/count and
   coarse pixel agreement (encode is lossy; mean abs diff bound).
5. Probes ``/dev/video*`` capture devices if present (open + one batch).

Usage:
    python scripts/validate_media.py [--keep] [--seconds 4] [--size 320x240]

Exit code 0 = all validations passed.
"""

import argparse
import glob
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def require_ffmpeg():
    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        print("SKIP: no ffmpeg/ffprobe binary on PATH — run this on a "
              "host with real ffmpeg (see CLAUDE.md known gaps).")
        sys.exit(0)


def make_asset(path, seconds, size, framerate=25):
    subprocess.run(
        ["ffmpeg", "-y", "-f", "lavfi",
         "-i", f"testsrc2=duration={seconds}:size={size}:rate={framerate}",
         "-pix_fmt", "yuv420p", str(path)],
        check=True, capture_output=True,
    )
    return framerate * seconds


def decode_all(video):
    frames = []
    for batch in video:
        frames.append(np.asarray(batch))
    return np.concatenate(frames, axis=0) if frames else np.empty((0,))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=int, default=4)
    parser.add_argument("--size", default="320x240")
    parser.add_argument("--keep", action="store_true",
                        help="keep the temp directory")
    args = parser.parse_args()

    require_ffmpeg()

    from terran_tpu.io.video.parallel import ParallelVideo
    from terran_tpu.io.video.reader import open_video
    from terran_tpu.io.video.writer import write_video

    tmp = Path(tempfile.mkdtemp(prefix="terran-media-"))
    failures = []
    try:
        asset = tmp / "asset.mp4"
        expected_frames = make_asset(asset, args.seconds, args.size)
        w, h = map(int, args.size.split("x"))
        print(f"asset: {asset} ({expected_frames} frames expected)")

        # --- sequential reader ------------------------------------------
        video = open_video(str(asset), batch_size=8)
        frames = decode_all(video)
        print(f"Video: decoded {frames.shape[0]} frames, "
              f"shape {frames.shape[1:]}, framerate {video.framerate}")
        if frames.shape[1:] != (h, w, 3):
            failures.append(f"frame shape {frames.shape[1:]} != {(h, w, 3)}")
        if abs(frames.shape[0] - expected_frames) > 1:
            failures.append(
                f"frame count {frames.shape[0]} vs expected "
                f"{expected_frames}"
            )

        # --- parallel reader vs sequential ------------------------------
        for workers in (2, 4):
            pv = ParallelVideo(str(asset), workers=workers, batch_size=8)
            pframes = decode_all(pv)
            n_segments = getattr(pv, "num_segments", None) or max(
                1, args.seconds
            )
            tolerance = n_segments  # ±1 frame per boundary, documented
            if abs(pframes.shape[0] - frames.shape[0]) > tolerance:
                failures.append(
                    f"ParallelVideo({workers}) count {pframes.shape[0]} "
                    f"vs sequential {frames.shape[0]} (tol {tolerance})"
                )
            # Frame-exact agreement on the overlap: match by content
            # because boundary frames may shift indices by ±1.
            n = min(len(frames), len(pframes))
            diffs = np.abs(
                frames[:n].astype(np.int16) - pframes[:n].astype(np.int16)
            ).reshape(n, -1).mean(axis=1)
            aligned = (diffs < 1.0).mean()
            print(f"ParallelVideo(workers={workers}): {pframes.shape[0]} "
                  f"frames, {aligned:.1%} positionally identical")
            if aligned < 0.9:
                failures.append(
                    f"ParallelVideo({workers}) only {aligned:.1%} of "
                    "frames match the sequential reader positionally"
                )

        # --- writer round trip ------------------------------------------
        out_path = tmp / "roundtrip.mp4"
        writer = write_video(out_path, framerate=video.framerate)
        for frame in frames:
            writer.write_frame(frame)
        writer.close()
        rt = open_video(str(out_path), batch_size=8)
        rt_frames = decode_all(rt)
        print(f"writer round trip: {rt_frames.shape[0]} frames back")
        if abs(rt_frames.shape[0] - frames.shape[0]) > 1:
            failures.append(
                f"round trip count {rt_frames.shape[0]} vs "
                f"{frames.shape[0]}"
            )
        n = min(len(frames), len(rt_frames))
        mad = float(np.abs(
            frames[:n].astype(np.int16) - rt_frames[:n].astype(np.int16)
        ).mean())
        print(f"writer round trip: mean abs pixel diff {mad:.2f}")
        if mad > 8.0:  # yuv420p re-encode is lossy but must stay close
            failures.append(f"round-trip mean abs diff {mad} > 8")

        # --- webcam probe (optional) ------------------------------------
        devices = sorted(glob.glob("/dev/video*"))
        if devices:
            dev = devices[0]
            try:
                cam = open_video(dev, batch_size=2, read_for=1)
                batch = cam.read_frames()
                print(f"webcam {dev}: captured batch {batch.shape}")
                cam.close()
            except Exception as exc:  # capture device may be busy/odd
                print(f"webcam {dev}: probe failed ({exc}) — check device")
        else:
            print("no /dev/video* devices; webcam probe skipped")

    finally:
        if args.keep:
            print(f"kept: {tmp}")
        else:
            shutil.rmtree(tmp, ignore_errors=True)

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(f" - {f}")
        sys.exit(1)
    print("\nall media validations passed")


if __name__ == "__main__":
    main()
