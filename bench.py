"""Headline benchmark: 1080p video frames/sec/chip for detect+embed+pose.

Runs the fused perception pipeline (RetinaFace detect + on-device align +
ArcFace embed + OpenPose decode, BASELINE config 5) over synthetic 1080p
batches with a depth-2 software pipeline (threaded host->HBM uploads
overlapping compute and result downloads), and prints ONE JSON line with:

- ``value``/``vs_baseline``: median end-to-end frames/sec over 5 sweeps,
  for the better of the two transfer plans ('device': raw frames upload
  once; 'host': only the detect/pose resizes and per-face embed windows
  cross the link — the winner on link-bound hosts like this relay). Every
  sweep of both plans is reported (``sweeps``, ``host_plan_sweeps``) and
  the winner is named (``transfer_plan_used``).
- ``device_only_fps`` / ``achieved_tflops`` / ``mfu``: steady-state
  throughput of the three jitted programs with frames already resident in
  HBM — the transfer-independent number. ``mfu`` is achieved FLOP/s over
  the measured 190.7 TFLOP/s bf16 matmul peak of this chip (spec 197;
  benchmarks/peak.py, slope-timed — override via BENCH_PEAK_TFLOPS).
- ``h2d_gbps`` / ``roundtrip_ms``: link microbenchmarks that bound the
  end-to-end number in this environment (the host<->TPU path here is a
  tunneled relay whose bandwidth swings by orders of magnitude; see
  BASELINE.md).
- ``stages``: per-stage wall time from the pipeline's StageTimer.

Weights: real converted checkpoints from the store when present, otherwise
random weights in the reference's exact architecture (identical FLOPs and
memory traffic, so throughput is representative).

``vs_baseline``: the reference publishes no benchmark numbers
(BASELINE.md), and its CUDA stack cannot run here; the denominator is the
measured throughput of the reference's computation graph executed by torch
on this host's CPU (see BASELINE.md "measured" table), recorded as
REFERENCE_CPU_FPS below. Override via env BENCH_BASELINE_FPS.

Env knobs: BENCH_BATCH (default 8), BENCH_BATCHES (default 8),
BENCH_WIDTH/HEIGHT (1920/1080), BENCH_POSE=0 to skip pose,
BENCH_DEPTH (pipeline depth, default 2), BENCH_DEVICE_ITERS (default 10),
BENCH_MEASURE_BASELINE=1 to re-measure the torch-CPU denominator.
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent / "tests"))

# Measured on this host (see BASELINE.md): reference graphs on torch CPU,
# detect(416 short side) + embed(8 faces) + pose(184 short side) per frame.
# Measured 2026-08-16 on this host (BASELINE.md): reference graphs on torch
# CPU at the same settings = 0.243 frames/sec.
REFERENCE_CPU_FPS = 0.243

# Measured bf16 matmul peak of the chip (benchmarks/peak.py, slope-timed:
# 190.7 sustained at 16384^3, v5e spec 197). Rounds 1-2 recorded "369"
# here, which tracks the chip's INT8 peak (measured 380, spec 394) — an
# artifact of the old amortised timer; MFU was under-reported ~2x.
DEFAULT_PEAK_TFLOPS = 190.7


def _progress(msg):
    """Stage progress on stderr: the JSON contract owns stdout, but a
    30-60 min run (remote compiles dominate) is undebuggable without a
    heartbeat — each stage logs when it starts/ends so a stalled run can
    be attributed to compile vs sweep vs link probe."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _load_params():
    """Real checkpoints when converted into the store; random otherwise."""
    from terran_tpu.checkpoint import read_checkpoint_db
    from terran_tpu.utils.convert import load_params

    db = {c["model_key"]: c for c in read_checkpoint_db()["checkpoints"]}
    out = {}
    for key in ("retinaface", "arcface", "openpose"):
        entry = db[key]
        if entry["status"] == "DOWNLOADED":
            out[key] = load_params(entry["local_path"])
        else:
            from __graft_entry__ import _random_params

            out[key] = _random_params(key)
    return out


def measure_reference_cpu_fps(batch, max_faces, with_pose):
    """Reference computation graph on torch CPU (the available denominator).

    Executes the same per-frame work the reference pipeline performs:
    RetinaFace forward at the 416 short side, ArcFace on ``max_faces``
    aligned crops, OpenPose forward + x8 bicubic upsample at the 184 short
    side. Decode/NMS/assembly are excluded (favouring the baseline).
    """
    import torch
    import torch.nn.functional as F

    import torch_oracle as oracle

    rng = np.random.default_rng(0)
    det_sd = oracle.random_retinaface_state_dict(rng)
    rec_sd = oracle.random_arcface_state_dict(rng)
    pose_sd = oracle.random_openpose_state_dict(rng)

    n = batch.shape[0]
    det = np.stack([
        np.asarray(
            __import__("cv2").resize(f, (739, 416))
        ) for f in batch
    ]).astype(np.float32).transpose(0, 3, 1, 2)
    pose = np.stack([
        np.asarray(
            __import__("cv2").resize(f, (327, 184))
        ) for f in batch
    ]).astype(np.float32).transpose(0, 3, 1, 2) / 255.0 - 0.5
    crops = rng.integers(0, 255, (n * max_faces, 3, 112, 112)).astype(
        np.float32
    )

    with torch.no_grad():
        t0 = time.time()
        oracle.retinaface_forward(det_sd, det)
        oracle.arcface_forward(rec_sd, crops)
        if with_pose:
            paf, heat = oracle.openpose_forward(pose_sd, pose)
            F.interpolate(paf, scale_factor=8, mode="bicubic",
                          align_corners=False)
            F.interpolate(heat, scale_factor=8, mode="bicubic",
                          align_corners=False)
        dt = time.time() - t0
    return n / dt


def measure_link(frames):
    """Host->device bandwidth and small-result round-trip latency."""
    import jax

    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
    from device_time import scalar_roundtrip_ms

    roundtrip_ms = scalar_roundtrip_ms()

    uploads = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(frames))
        uploads.append(time.perf_counter() - t0)
    h2d_gbps = frames.nbytes / min(uploads) / 1e9
    return h2d_gbps, roundtrip_ms


def measure_device_only(pipeline, frames, iters):
    """Device time of the three programs with frames HBM-resident, plus
    achieved FLOP/s from XLA's own cost model.

    Timing runs ``iters`` iterations INSIDE one jitted ``lax.scan`` per
    program (benchmarks/device_time.py): through the tunneled runtime here,
    per-dispatch loops measure the RPC path, and ``block_until_ready``
    returns before execution finishes — only a value fetch (or an in-program
    loop) reflects device wall time. Returns (fps, achieved_tflops,
    per-program ms dict, typical_fps).

    Adaptive dispatch (the single-device default) is measured twice: at
    FULL occupancy (every face and peak slot busy — the number comparable
    across rounds and the honest worst case) and at the smallest
    configured buckets (``typical_fps``: <=2 faces/frame, <=4 peaks/part —
    what an ordinary scene actually runs).
    """
    import jax

    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
    from device_time import scan_time

    full_h, full_w = frames.shape[1:3]
    step = pipeline._perception_fn(full_h, full_w)
    frames_dev = jax.block_until_ready(pipeline.put_frames(frames))

    stage_ms = {}
    typical_ms = {}
    stage_ms["detect"], _ = scan_time(
        lambda dp, rp, f: step(dp, rp, f),
        (pipeline.det_params, pipeline.rec_params, frames_dev),
        perturb_index=2, iters=iters,
    )
    if pipeline.with_embeddings:
        if pipeline.embed_dispatch == "adaptive":
            # Worst case: full-capacity bucket (every face slot occupied);
            # the adaptive path's whole point is that real scenes usually
            # run a much smaller program.
            import jax.numpy as jnp
            from device_time import synthetic_embed_packed

            ws = next((w for w in pipeline.embed_windows
                       if w <= min(full_h, full_w)), None)
            if ws is not None:
                packed = jnp.asarray(synthetic_embed_packed(
                    frames.shape[0], pipeline.max_faces, full_h, full_w,
                    window=ws,
                ))
                # Measure the program the dispatcher would pick for these
                # matrices: the best WARP_CONFIGS ladder entry (the
                # synthetic faces are small-ish and mostly upright, like
                # typical content).
                from terran_tpu.ops.warp import best_warp_config

                mats = np.asarray(packed[..., :6]).reshape(-1, 2, 3)
                cfg = best_warp_config(mats)
                group, slab = cfg if cfg is not None else (None, None)
                we = pipeline._warp_embed_window_fn(
                    pipeline.max_faces, ws, frames_dev.shape,
                    group=group, slab=slab,
                )
            else:
                packed = jnp.asarray(synthetic_embed_packed(
                    frames.shape[0], pipeline.max_faces, full_h, full_w
                )[..., :7])
                we = pipeline._warp_embed_fn(
                    pipeline.max_faces, frames_dev.shape
                )
            stage_ms["embed"], _ = scan_time(
                lambda rp, f, pk: we(rp, f, pk),
                (pipeline.rec_params, frames_dev, packed),
                perturb_index=1, iters=iters,
            )
            k_typ = pipeline._select_embed_bucket(1, pipeline.max_faces)
            packed_t = packed[:, :k_typ]
            if ws is not None:
                we_t = pipeline._warp_embed_window_fn(
                    k_typ, ws, frames_dev.shape, group=group, slab=slab
                )
            else:
                we_t = pipeline._warp_embed_fn(k_typ, frames_dev.shape)
            typical_ms["embed"], _ = scan_time(
                lambda rp, f, pk: we_t(rp, f, pk),
                (pipeline.rec_params, frames_dev, packed_t),
                perturb_index=1, iters=iters,
            )
        else:
            out = step(pipeline.det_params, pipeline.rec_params, frames_dev)
            embed = pipeline._embed_fn()
            stage_ms["embed"], _ = scan_time(
                lambda rp, c, m: embed(rp, c, m),
                (pipeline.rec_params, out["crops"], out["emb_mask_dev"]),
                perturb_index=1, iters=iters,
            )
    if pipeline.with_pose:
        if pipeline.limb_dispatch == "adaptive":
            import jax.numpy as jnp
            from device_time import synthetic_peak_plan

            from terran_tpu.ops.pose_decode import NUM_PARTS

            pd = pipeline._pose_detect_fn(full_h, full_w)
            p1_ms, _ = scan_time(
                lambda pp, f: pd(pp, f),
                (pipeline.pose_params, frames_dev), perturb_index=1,
                iters=iters,
            )
            _, paf = pd(pipeline.pose_params, frames_dev)
            fh, fw = paf.shape[1:3]
            cv = jnp.asarray(synthetic_peak_plan(
                frames.shape[0], NUM_PARTS, pipeline.max_peaks,
                fh * 8, fw * 8,
            ))
            limb = pipeline._limb_fn(pipeline.max_peaks, paf.shape)
            limb_ms, _ = scan_time(
                lambda pf, c: limb(pf, c), (paf, cv), perturb_index=0,
                iters=iters,
            )
            stage_ms["pose"] = p1_ms + limb_ms
            kb_typ = pipeline._select_peak_bucket(1)
            limb_t = pipeline._limb_fn(kb_typ, paf.shape)
            cv_t = cv[:, :, :kb_typ]
            limb_t_ms, _ = scan_time(
                lambda pf, c: limb_t(pf, c), (paf, cv_t),
                perturb_index=0, iters=iters,
            )
            typical_ms["pose"] = p1_ms + limb_t_ms
        else:
            posefn = pipeline._pose_fn(full_h, full_w)
            stage_ms["pose"], _ = scan_time(
                lambda pp, f: posefn(pp, f),
                (pipeline.pose_params, frames_dev), perturb_index=1,
                iters=iters,
            )

    total_s = sum(stage_ms.values()) / 1000.0
    fps = frames.shape[0] / total_s

    typical_fps = None
    if typical_ms:
        typical_s = sum(
            typical_ms.get(k, v) for k, v in stage_ms.items()
        ) / 1000.0
        typical_fps = frames.shape[0] / typical_s

    flops = measure_flops_subprocess(frames.shape)
    achieved_tflops = flops / total_s / 1e12 if flops else None
    return fps, achieved_tflops, {k: round(v, 2) for k, v in
                                  stage_ms.items()}, typical_fps


def measure_flops_subprocess(frames_shape):
    """Per-batch FLOPs of the three programs from XLA's HLO cost model.

    The tunneled TPU backend here returns None from
    ``Lowered.cost_analysis()``, so the analysis runs in a fresh CPU
    subprocess (tracing only — nothing is compiled or executed)."""
    import subprocess

    args = [sys.executable, Path(__file__).resolve().as_posix(), "--flops",
            *(str(d) for d in frames_shape[:3])]
    try:
        out = subprocess.run(
            args, capture_output=True, text=True, timeout=300,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        return float(json.loads(out.stdout.strip().splitlines()[-1])["flops"])
    except Exception:
        return 0.0


def flops_main(batch, height, width):
    """--flops mode: print the summed HLO-cost-model FLOPs of the three
    pipeline programs at the given batch shape (run on CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from terran_tpu.pipeline import PerceptionPipeline

    params = _load_params()
    pipeline = PerceptionPipeline(
        det_params=params["retinaface"],
        rec_params=params["arcface"],
        pose_params=params["openpose"],
        max_faces=int(os.environ.get("BENCH_MAX_FACES", 8)),
        top_k=64,
        max_peaks=16,
        with_pose=os.environ.get("BENCH_POSE", "1") != "0",
    )
    frames = np.zeros((batch, height, width, 3), np.uint8)

    def analyzed(lowered):
        analysis = lowered.cost_analysis()
        return float((analysis or {}).get("flops", 0.0))

    step = pipeline._perception_fn(height, width)
    flops = analyzed(step.lower(
        pipeline.det_params, pipeline.rec_params, frames
    ))
    if pipeline.with_embeddings:
        if pipeline.embed_dispatch == "adaptive":
            packed = np.zeros((batch, pipeline.max_faces, 7), np.float32)
            flops += analyzed(
                pipeline._warp_embed_fn(
                    pipeline.max_faces, frames.shape
                ).lower(pipeline.rec_params, frames, packed)
            )
        else:
            crops = np.zeros(
                (batch, pipeline.max_faces, 112, 112, 3), np.float32
            )
            mask = np.zeros((batch, pipeline.max_faces), bool)
            flops += analyzed(pipeline._embed_fn().lower(
                pipeline.rec_params, crops, mask
            ))
    if pipeline.with_pose:
        if pipeline.limb_dispatch == "adaptive":
            from terran_tpu.ops.pose_decode import NUM_PARTS

            pd = pipeline._pose_detect_fn(height, width)
            flops += analyzed(pd.lower(pipeline.pose_params, frames))
            _, paf_shape = jax.eval_shape(
                pd, pipeline.pose_params, frames
            )
            cv = np.zeros(
                (batch, NUM_PARTS, pipeline.max_peaks, 3), np.float32
            )
            paf = np.zeros(paf_shape.shape, np.float32)
            flops += analyzed(
                pipeline._limb_fn(
                    pipeline.max_peaks, paf_shape.shape
                ).lower(paf, cv)
            )
        else:
            flops += analyzed(pipeline._pose_fn(height, width).lower(
                pipeline.pose_params, frames
            ))
    print(json.dumps({"flops": flops}))


def main():
    np.seterr(all="ignore")

    from terran_tpu.pipeline import PerceptionPipeline
    from terran_tpu.utils.profiling import StageTimer

    batch_size = int(os.environ.get("BENCH_BATCH", 8))
    num_batches = int(os.environ.get("BENCH_BATCHES", 8))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    with_pose = os.environ.get("BENCH_POSE", "1") != "0"
    max_faces = int(os.environ.get("BENCH_MAX_FACES", 8))
    depth = int(os.environ.get("BENCH_DEPTH", 2))
    device_iters = int(os.environ.get("BENCH_DEVICE_ITERS", 10))
    peak_tflops = float(
        os.environ.get("BENCH_PEAK_TFLOPS", DEFAULT_PEAK_TFLOPS)
    )

    params = _load_params()
    timer = StageTimer()
    # Escalation (re-dispatch at doubled capacity on overflow) defaults
    # OFF for the bench: with random weights, synthetic noise scores half
    # the anchors above threshold — a pathology real checkpoints don't
    # have — and every batch would escalate to maximum capacity, making
    # rounds incomparable. BENCH_ESCALATIONS=N turns it on; the JSON
    # always reports how often it fired.
    max_escalations = int(os.environ.get("BENCH_ESCALATIONS", 0))
    # BENCH_EMBED_PRECISION=int8 measures the opt-in quantised ArcFace
    # trunk (models/arcface.py apply_int8); BENCH_POSE_PRECISION=int8
    # likewise for the OpenPose CPM trunk; defaults follow config.
    embed_precision = os.environ.get("BENCH_EMBED_PRECISION")
    pose_precision = os.environ.get("BENCH_POSE_PRECISION")
    pipeline = PerceptionPipeline(
        det_params=params["retinaface"],
        rec_params=params["arcface"],
        pose_params=params["openpose"],
        max_faces=max_faces,
        top_k=64,
        max_peaks=16,
        with_pose=with_pose,
        timer=timer,
        max_escalations=max_escalations,
        embed_precision=embed_precision,
        pose_precision=pose_precision,
    )

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, (batch_size, height, width, 3), dtype=np.uint8)
        for _ in range(num_batches)
    ]

    # Warmup: compile all three programs, then ramp the pipelined path
    # (threaded uploader, queues) so the first timed sweep isn't cold.
    _progress("device-plan warmup (compiles)...")
    pipeline.process_batch(batches[0])
    for _ in pipeline.process_stream(batches[:2], depth=depth):
        pass
    _progress("device-plan warmup done")
    # Link sample BEFORE the timed sweeps as well as after: the relay's
    # bandwidth decays over a session (heavy executions slow it), so a
    # single post-sweep measurement understates the link the sweeps
    # actually saw — r4's trial had the host plan "beating" a ceiling
    # computed from the later, slower sample. Ceilings use the mean.
    h2d_gbps_pre, _ = measure_link(batches[0])
    _progress(f"link pre-sweep: {h2d_gbps_pre:.4f} GB/s")

    # End-to-end sweeps: threaded uploads + depth-deep dispatch overlap
    # h2d of batch i+2 with batch i+1's compute and batch i's downloads.
    # Five sweeps: the relay's sustained bandwidth swings ~2x within a
    # session, and the median over five is materially stabler than over
    # three (sweeps are reported individually either way).
    timer.reset()
    sweeps = []
    timeline_rows = timeline_gaps = None
    dev_bytes0 = pipeline.upload_bytes
    for s in range(5):
        if s == 4 and os.environ.get("BENCH_TIMELINE", "1") != "0":
            # Instrument the last sweep with the per-batch timeline:
            # every upload/dispatch/fetch span with its batch id, start,
            # duration, and bytes — the record of where the wall time
            # actually went (r3: ~1.7 s/batch was unaccounted; the
            # timeline is the accounting).
            from terran_tpu.utils.profiling import Timeline

            pipeline.timeline = Timeline()
        t0 = time.time()
        for _out in pipeline.process_stream(batches, depth=depth):
            pass
        sweeps.append(
            round(batch_size * num_batches / (time.time() - t0), 2)
        )
        _progress(f"device-plan sweep {s + 1}/5: {sweeps[-1]} fps")
        if pipeline.timeline is not None:
            timeline_rows = pipeline.timeline.rows()
            timeline_gaps = sorted(
                pipeline.timeline.gaps(), key=lambda r: -r[3]
            )[:12]
            pipeline.timeline = None
    fps = statistics.median(sweeps)
    device_bytes_per_frame = (pipeline.upload_bytes - dev_bytes0) / (
        5 * num_batches * batch_size
    )

    # The 'host' transfer plan uploads the detect/pose resizes and the
    # per-face embed windows instead of the raw frames (~2.5x fewer
    # bytes at full slot occupancy, more at typical occupancy) — the
    # winning configuration when the link, not the device, bounds
    # end-to-end throughput (this relay; PCIe-starved or
    # network-attached hosts). Measured as its own sweep set; the
    # headline is the better plan, named in the JSON.
    host_sweeps = []
    host_plan_error = None
    host_timeline_rows = None
    host_bytes_per_frame = None
    if os.environ.get("BENCH_HOST_PLAN", "1") != "0":
        # Guarded: a host-plan failure must not abort the benchmark
        # after the device-plan sweeps already spent their relay time —
        # record the error in the JSON and keep the device-plan number.
        try:
            pipeline_host = PerceptionPipeline(
                det_params=params["retinaface"],
                rec_params=params["arcface"],
                pose_params=params["openpose"],
                max_faces=max_faces,
                top_k=64,
                max_peaks=16,
                with_pose=with_pose,
                max_escalations=max_escalations,
                transfer_plan="host",
                embed_precision=embed_precision,
                pose_precision=pose_precision,
            )
            _progress("host-plan warmup (compiles)...")
            pipeline_host.process_batch(batches[0])
            for _ in pipeline_host.process_stream(batches[:2], depth=depth):
                pass
            _progress("host-plan warmup done")
            host_bytes0 = pipeline_host.upload_bytes
            for s in range(5):
                if s == 4 and os.environ.get("BENCH_TIMELINE", "1") != "0":
                    from terran_tpu.utils.profiling import Timeline

                    pipeline_host.timeline = Timeline()
                t0 = time.time()
                for _out in pipeline_host.process_stream(
                    batches, depth=depth
                ):
                    pass
                host_sweeps.append(
                    round(batch_size * num_batches / (time.time() - t0), 2)
                )
                _progress(f"host-plan sweep {s + 1}/5: {host_sweeps[-1]} fps")
                if pipeline_host.timeline is not None:
                    host_timeline_rows = pipeline_host.timeline.rows()
                    pipeline_host.timeline = None
            host_bytes_per_frame = (
                pipeline_host.upload_bytes - host_bytes0
            ) / (5 * num_batches * batch_size)
        except Exception as exc:  # noqa: BLE001
            host_sweeps = []
            host_plan_error = f"{type(exc).__name__}: {exc}"
    host_fps = statistics.median(host_sweeps) if host_sweeps else None
    plan_used = "device"
    if host_fps is not None and host_fps > fps:
        fps = host_fps
        plan_used = "host"

    _progress("device-only measurement (slope-timed)...")
    (device_only_fps, achieved_tflops, device_stage_ms,
     device_typical_fps) = measure_device_only(
        pipeline, batches[0], device_iters
    )
    _progress("link microbenchmark...")
    h2d_gbps, roundtrip_ms = measure_link(batches[0])
    h2d_mean = (h2d_gbps + h2d_gbps_pre) / 2

    baseline = os.environ.get("BENCH_BASELINE_FPS")
    if baseline is not None:
        baseline = float(baseline)
    elif os.environ.get("BENCH_MEASURE_BASELINE") == "1":
        baseline = measure_reference_cpu_fps(batches[0], max_faces, with_pose)
    else:
        baseline = REFERENCE_CPU_FPS

    result = {
        "metric": "1080p video frames/sec/chip (detect+embed+pose)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": (
            round(fps / baseline, 2) if baseline else None
        ),
        "sweeps": sweeps,
        "host_plan_sweeps": host_sweeps or None,
        "host_plan_error": host_plan_error,
        "transfer_plan_used": plan_used,
        # The precisions the pipeline actually RESOLVED (BENCH_* env,
        # else config's TERRAN_TPU_* env, else 'native') — reporting the
        # raw BENCH_* vars mislabelled runs configured via the
        # TERRAN_TPU_* knobs (r3 advisor item).
        "embed_precision": pipeline.embed_precision,
        "pose_precision": pipeline.pose_precision,
        "device_only_fps": round(device_only_fps, 2),
        "device_only_fps_typical": (
            round(device_typical_fps, 2) if device_typical_fps else None
        ),
        "achieved_tflops": (
            round(achieved_tflops, 2) if achieved_tflops else None
        ),
        "mfu": (
            round(achieved_tflops / peak_tflops, 4)
            if achieved_tflops else None
        ),
        # Two link samples bracket the sweeps (the relay decays over a
        # session); ceilings use their mean.
        "h2d_gbps": round(h2d_gbps, 4),
        "h2d_gbps_pre": round(h2d_gbps_pre, 4),
        "roundtrip_ms": round(roundtrip_ms, 2),
        # What the measured link alone permits at this frame size under
        # the raw-frame 'device' plan: the end-to-end value is bounded by
        # min(link_ceiling, device rate) — records which regime this run
        # was in.
        "link_ceiling_fps": round(
            h2d_mean * 1e9 / (height * width * 3), 2
        ),
        # The 'host' plan's binding ceiling is its own MEASURED byte
        # floor (resizes + crops actually uploaded during the timed
        # sweeps), not the raw frame size — host_plan_sweeps' median
        # over host_plan_ceiling_fps is the plan's link-capture
        # fraction (r4: ~94%, but only derivable; now stated).
        "host_plan_bytes_per_frame": (
            round(host_bytes_per_frame) if host_bytes_per_frame else None
        ),
        "host_plan_ceiling_fps": (
            round(h2d_mean * 1e9 / host_bytes_per_frame, 2)
            if host_bytes_per_frame else None
        ),
        "device_plan_bytes_per_frame": round(device_bytes_per_frame),
        "device_stage_ms": device_stage_ms,
        # How often overflow escalation (re-dispatch at doubled capacity)
        # fired across the timed sweeps; nonzero means the capacities
        # above were exceeded by the synthetic content and the batch was
        # retried larger rather than dropping results.
        "escalations": dict(pipeline.escalations),
        "stages": {
            name: info["mean_ms"]
            for name, info in timer.summary().items()
        },
        # The per-batch timelines (hundreds of rows) live in a sidecar
        # file — r4's inline rows pushed the JSON line past the driver's
        # stdout capture and the round's official artifact lost its
        # headline (`parsed: null`). The final line must stay compact.
        "timeline_file": None,  # filled below when a timeline ran
        # The wall-clock stage table measures where the HOST waited, not
        # where the device worked: dispatch stages return immediately
        # (async), and the whole batch's device time + relay latency
        # lands on the first blocking fetch (pose_fetch/limb_fetch under
        # adaptive dispatch). Per-program device cost is device_stage_ms.
        "stages_note": "fetch stages absorb device sync; see device_stage_ms",
    }
    if timeline_rows or host_timeline_rows:
        # Sidecar: [batch, event, start_ms, dur_ms, bytes] spans
        # ('h2d_thread' spans live on the uploader thread; everything
        # else is the main loop) plus the largest main-thread idle gaps.
        side_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "sessions",
        )
        os.makedirs(side_dir, exist_ok=True)
        side_path = os.path.join(
            side_dir,
            time.strftime("timeline-%Y-%m-%d-%H%M%S.json"),
        )
        try:
            with open(side_path, "w") as f:
                json.dump({
                    "headline": {k: v for k, v in result.items()
                                 if k != "timeline_file"},
                    "timeline": timeline_rows,
                    "timeline_gaps": timeline_gaps,
                    "timeline_host_plan": host_timeline_rows,
                }, f)
            result["timeline_file"] = os.path.relpath(
                side_path, os.path.dirname(os.path.abspath(__file__))
            )
        except OSError:
            pass  # read-only checkout: keep the headline line intact
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--flops":
        flops_main(*map(int, sys.argv[2:5]))
    else:
        main()
