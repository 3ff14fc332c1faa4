"""Central configuration: every threshold, capacity, and default in one place.

The reference scatters its knobs across constructor kwargs and module
constants (SURVEY §5 'config/flag system'): detection short_side 416
(face/detection/__init__.py:188), pose short_side 184 (pose/__init__.py:134),
NMS IoU 0.4 (retinaface/wrapper.py:94), score threshold 0.5 (wrapper.py:133),
pose thresholds 0.1/0.05/0.4 (openpose/wrapper.py:177-180), reader prefetch 1
batch / writer buffer 64 frames (io/video/__init__.py:6-9), recognition crop
112 (arcface/wrapper.py:104), TERRAN_HOME env override (checkpoint.py:118).

Here they live in one frozen dataclass with environment overrides
(``TERRAN_TPU_<FIELD>``), while the task-class kwargs keep working exactly
like the reference's for per-instance tuning.
"""

import os
from dataclasses import dataclass, fields


@dataclass(frozen=True)
class Config:
    # Task defaults (reference-compatible).
    detection_short_side: int = 416
    pose_short_side: int = 184
    recognition_crop_side: int = 112

    # Detection decode.
    detection_threshold: float = 0.5
    nms_iou_threshold: float = 0.4
    detection_top_k: int = 256

    # Pose decode.
    keypoint_threshold: float = 0.1
    paf_midpoint_threshold: float = 0.05
    human_score_threshold: float = 0.4
    max_peaks_per_part: int = 32

    # Fused pipeline capacities.
    pipeline_top_k: int = 128
    pipeline_max_faces: int = 16
    # Batches dispatched ahead of the oldest unfinished batch in
    # process_stream: depth 2 keeps batch i+2's h2d crossing the link while
    # batch i+1 computes and batch i's results download.
    pipeline_depth: int = 2
    # Embed dispatch: 'adaptive' sizes the warp+embed program to the number
    # of faces actually detected (buckets below), 'fused' warps a fixed
    # (batch, max_faces) grid inside the detection program with no host
    # round trip. 'auto' = adaptive everywhere; under a mesh the bucket is
    # chosen once per global batch, so every shard runs the same program.
    embed_dispatch: str = "auto"
    # Comma-separated PER-FRAME face-slot sizes for the adaptive
    # warp+embed program (chosen per batch to cover its busiest frame);
    # the full max_faces capacity is always available as the fallback
    # bucket, so crowded batches lose nothing.
    pipeline_embed_buckets: str = "2,4,8"
    # Pose limb scoring: 'adaptive' splits the pose program and sizes the
    # (K, K) limb-pair tables to the peaks actually found (buckets below);
    # 'fused' keeps one program at max_peaks capacity; 'auto' = adaptive
    # (mesh included, same uniform-bucket rule as embed_dispatch).
    limb_dispatch: str = "auto"
    # Comma-separated per-part peak-slot sizes for the adaptive limb
    # program; max_peaks_per_part is always the fallback bucket.
    pose_peak_buckets: str = "4,8"
    # Limb PAF sampler: 'gather' issues one 2-element gather descriptor
    # per segment sample; 'matmul' samples via one-hot MXU contractions
    # (ops/pose_decode.py::limb_scores_matmul) — measured 2.2x faster at
    # kb=16 on v5e (3.91 vs 8.71 ms/batch, benchmarks/
    # limb_backend_time.py) where gathers are descriptor-bound. 'auto':
    # matmul on TPU, gather elsewhere. Values agree bitwise on CPU; on
    # TPU within 1 f32 ulp (XLA reassociates the 10-sample mean
    # differently between the two programs), accept flags identical.
    limb_backend: str = "auto"
    # Comma-separated window sides for the adaptive warp's per-face source
    # windows (the patch gather pays an operand-proportional cost, so
    # gathering from face-sized windows beats the full frame). The batch's
    # largest face picks the bucket; faces exceeding the largest window
    # (or frames smaller than the smallest) fall back to full-frame warps.
    pipeline_embed_windows: str = "256,512"
    # Pipeline transfer plan: 'device' uploads the raw frames once and
    # resizes/crops on device (best on healthy host->device links);
    # 'host' uploads only the derived inputs — detection-bucket resize,
    # pose resize, per-face embed windows — cutting upload bytes ~4-5x
    # per 1080p frame for link-bound hosts (PCIe-starved or
    # network-attached accelerators). Requires adaptive dispatches.
    transfer_plan: str = "device"
    # Host-resize backend for the 'host' transfer plan. 'auto': cv2's
    # SIMD fixed-point bilinear when importable (~55x the torch twin on
    # a 1-core host, and EXACTLY the reference's own host-side resize
    # arithmetic — face/detection/__init__.py:203), else the exact
    # chain. 'exact': this repo's own bilinear (jitted CPU backend ->
    # torch twin -> numpy twin), bit-identical to the device plan's
    # on-device resize. 'cv2': require cv2. The device resize matches
    # cv2 within +-1 count, so 'auto' changes at most the same +-1 the
    # torch twin already documents.
    host_resize: str = "auto"

    # Overflow escalation: when a fixed capacity saturates (detection
    # top_k, pose max_peaks, embed face slots), re-dispatch that batch at
    # doubled capacity instead of warning-and-dropping — the reference's
    # dynamic shapes cannot drop results (retinaface/wrapper.py:207-236),
    # so neither may the fixed-shape programs. Each value is the maximum
    # number of doublings per batch (escalated programs compile once and
    # cache, so a steady crowd pays compile only at its first appearance);
    # 0 restores warn-only behaviour.
    max_escalations: int = 2

    # I/O buffering.
    reader_buffer_batches: int = 1
    writer_buffer_frames: int = 64
    # How long close() lets the encoder drain its stdin and finalise the
    # container before escalating to terminate (which truncates the
    # file; a warning is logged). 10 s covered every observed ffmpeg
    # finalise; raise it for slow disks / 4K encodes — a loaded machine
    # once took >10 s just to *start* the encoder (writer.py).
    writer_drain_timeout_s: float = 30.0
    device_prefetch_depth: int = 2

    # Numerics.
    compute_dtype: str = "bfloat16"
    # Embedding (ArcFace) precision: 'native' follows compute_dtype;
    # 'int8' quantises the residual-trunk convs to int8 (per-channel
    # weight scales, dynamic per-tensor activation scales) for the MXU's
    # 2x int8 throughput. Opt-in: the reference has no quantised path,
    # so parity runs never take it (models/arcface.py apply_int8).
    embed_precision: str = "native"
    # Pose (OpenPose) precision: same opt-in int8 recipe for the CPM
    # trunk whose 7x7 stage convs dominate its FLOPs
    # (models/openpose.py apply_int8).
    pose_precision: str = "native"

    # Pose peak finding: 'auto' uses the fused Pallas upsample+peak-scan
    # kernel on TPU and the XLA path elsewhere; 'on'/'off' force it.
    fused_peaks: str = "auto"

    # Shape policy: 'exact' (one program per shape) or 'pad' (64px buckets).
    bucketing: str = "exact"


def _coerce(value, target_type):
    if target_type is bool:
        return value.lower() in ("1", "true", "yes")
    return target_type(value)


def load_config(env=None):
    """Build a Config, applying ``TERRAN_TPU_<FIELD>`` env overrides."""
    env = os.environ if env is None else env
    overrides = {}
    for field in fields(Config):
        key = f"TERRAN_TPU_{field.name.upper()}"
        if key in env:
            overrides[field.name] = _coerce(env[key], type(field.default))
    return Config(**overrides)


_config = None


def get_config():
    global _config
    if _config is None:
        _config = load_config()
    return _config


def set_config(config):
    global _config
    _config = config
