"""Benchmark harness for the five BASELINE.json configs.

Prints one JSON object per config. Uses real converted checkpoints when
present in the store, random reference-architecture weights otherwise
(identical FLOPs/memory traffic).

  1. single-image face_detection (short_side=208) — batch-1 p50 latency ms
  2. pose_estimation on a multi-person-sized image — p50 latency ms
  3. match.py shape: detect + embed over an image directory — imgs/sec
  4. video face detection with background-prefetch reader — frames/sec
  5. full pipeline detect+embed+pose, concurrent streams — frames/sec/chip

Run: python benchmarks/run_all.py [--configs 1,2,5] [--quick]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def _params():
    from bench import _load_params

    return _load_params()


def _p50(samples):
    return float(np.percentile(np.asarray(samples) * 1000.0, 50))


def bench_roundtrip_floor(params, iters):
    """Config 0: the latency floor of this host<->device link.

    Two numbers bound every batch-1 latency in this harness:
    - ``scalar``: a jitted +1 on 8 floats, fetched — pure round trip.
    - ``input``: identity on the config-1 resized input (1x208x277x3
      uint8), fetched — round trip plus the irreducible input upload.
    Config 1 can't beat ``input``; its overhead above it is the honest
    optimisation target (VERDICT r1 #7).
    """
    import jax

    from device_time import scalar_roundtrip_ms

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (1, 208, 277, 3), dtype=np.uint8)
    ident = jax.jit(lambda x: x[:, :1, :1, 0])

    scalar_ms = scalar_roundtrip_ms(iters=max(iters * 2, 10))
    np.asarray(ident(image))  # compile
    inp = []
    for _ in range(max(iters * 2, 10)):
        t0 = time.perf_counter()
        np.asarray(ident(image))
        inp.append(time.perf_counter() - t0)
    return {"metric": "link round-trip floor (scalar / config-1 input)",
            "value": round(scalar_ms, 2), "unit": "ms",
            "input_floor_ms": round(_p50(inp), 2)}


def bench_detection_latency(params, iters):
    from terran_tpu.face.detection import Detection, RetinaFaceDetector

    det = Detection.__new__(Detection)
    det.device = None
    det.model = RetinaFaceDetector(params=params["retinaface"])
    from terran_tpu.utils.batching import merge_factory, resize_factory

    det.resize_in, det.resize_out = resize_factory(short_side=208)
    det.merge_in, det.merge_out = merge_factory()

    image = np.random.default_rng(0).integers(
        0, 255, (1799, 2400, 3), dtype=np.uint8
    )
    det(image)  # compile
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        det(image)
        samples.append(time.perf_counter() - t0)
    return {"metric": "face_detection batch-1 p50 (208 short side)",
            "value": round(_p50(samples), 2), "unit": "ms"}


def bench_pose_latency(params, iters):
    from terran_tpu.pose.openpose import OpenPoseEstimator

    est = OpenPoseEstimator(params=params["openpose"], max_peaks=16)
    image = np.random.default_rng(0).integers(
        0, 255, (1, 1077, 1920, 3), dtype=np.uint8
    )
    est.call(image)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        est.call(image)
        samples.append(time.perf_counter() - t0)
    return {"metric": "pose_estimation batch-1 p50 (184 short side)",
            "value": round(_p50(samples), 2), "unit": "ms"}


def bench_match_throughput(params, iters, plan=None):
    """Detect + embed over same-size images (match.py per-image shape)."""
    from terran_tpu.pipeline import PerceptionPipeline

    pipe = PerceptionPipeline(
        det_params=params["retinaface"], rec_params=params["arcface"],
        pose_params=None, with_pose=False, max_faces=8, top_k=64,
        transfer_plan=plan,
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (8, 720, 1280, 3), dtype=np.uint8)
    pipe.process_batch(images)
    count, t0 = 0, time.perf_counter()
    for _ in range(iters):
        pipe.process_batch(images)
        count += len(images)
    dt = time.perf_counter() - t0
    return {"metric": "match.py detect+embed throughput (720p)",
            "value": round(count / dt, 2), "unit": "imgs/sec"}


def bench_video_detection(params, iters):
    """Config 4: detection over a prefetched 1080p video stream."""
    from terran_tpu.face.detection import RetinaFaceDetector
    from terran_tpu.io import SyntheticVideo, device_prefetch
    from terran_tpu.utils.batching import resize_factory

    det = RetinaFaceDetector(params=params["retinaface"], top_k=64)
    resize_in, _ = resize_factory(short_side=416)
    num_frames = 8 * max(iters, 2)
    video = SyntheticVideo(width=1920, height=1080, num_frames=num_frames,
                           batch_size=8)

    # Warm the program.
    warm, _ = resize_in(video.read_frames())
    det.call(warm)

    count, t0 = 0, time.perf_counter()
    for batch in video:
        resized, _ = resize_in(np.asarray(batch))
        det.call(resized)
        count += len(batch)
    dt = time.perf_counter() - t0
    return {"metric": "video face detection (1080p, prefetch reader)",
            "value": round(count / dt, 2), "unit": "frames/sec"}


def bench_full_pipeline(params, iters, plan=None):
    """Config 5: concurrent streams through the fused pipeline."""
    from terran_tpu.io.streams import MultiStreamPerception
    from terran_tpu.io.video.synthetic import SyntheticVideo
    from terran_tpu.pipeline import PerceptionPipeline

    pipe = PerceptionPipeline(
        det_params=params["retinaface"], rec_params=params["arcface"],
        pose_params=params["openpose"], max_faces=8, top_k=64, max_peaks=16,
        transfer_plan=plan,
    )
    frames_per_stream = 4 * max(iters, 2)
    streams = [
        SyntheticVideo(width=1920, height=1080,
                       num_frames=frames_per_stream, batch_size=4, seed=i)
        for i in range(4)
    ]
    msp = MultiStreamPerception(pipe, streams, batch_size=8, track=True,
                                min_hits=0)
    # Compile on a throwaway batch.
    pipe.process_batch(np.zeros((8, 1080, 1920, 3), np.uint8))

    count, t0 = 0, time.perf_counter()
    for results in msp:
        count += len(results)
    dt = time.perf_counter() - t0
    return {"metric": "full pipeline, 4 concurrent 1080p streams "
                      "(detect+embed+pose+track)",
            "value": round(count / dt, 2), "unit": "frames/sec/chip"}


BENCHES = {
    "0": bench_roundtrip_floor,
    "1": bench_detection_latency,
    "2": bench_pose_latency,
    "3": bench_match_throughput,
    "4": bench_video_detection,
    "5": bench_full_pipeline,
}


def main():
    np.seterr(all="ignore")
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default="0,1,2,3,4,5")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--plan", default=None, choices=("device", "host"),
        help="transfer plan for the pipeline configs (3 and 5); "
             "default = config.transfer_plan",
    )
    args = parser.parse_args()

    iters = 3 if args.quick else 10
    params = _params()
    for key in args.configs.split(","):
        fn = BENCHES[key.strip()]
        kwargs = (
            {"plan": args.plan}
            if key.strip() in ("3", "5") and args.plan else {}
        )
        result = fn(params, iters, **kwargs)
        result["config"] = int(key)
        if kwargs:
            result["transfer_plan"] = args.plan
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
