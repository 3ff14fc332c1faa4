"""Fused full-perception pipeline: detect + align + embed + pose, on device.

This is the framework's high-throughput video path (BASELINE config 5:
detect+embed+pose over concurrent 1080p streams). Where the reference runs
five host<->device round trips per batch (detection forward, NMS output
download, per-face host alignment, embedding upload/download, pose decode
loop — see SURVEY §3), here THREE jitted programs run per batch with no
intermediate host round trips:

1. ``perception_step``: on-device resize, RetinaFace forward + anchor
   decode + masked NMS, landmark rescale + rounding.
2. ``warp_embed`` (default, ``embed_dispatch='adaptive'``; works both
   single-device and under a mesh — the bucket is chosen once per global
   batch so every shard runs the same program): once the detection
   results reach the host, a warp+embed program sized to the number of
   faces actually found (bucketed static shapes) aligns and embeds them
   straight from the resident frames — warp-gather and ArcFace cost
   scale with real occupancy, not the (batch, max_faces) capacity. With
   ``embed_dispatch='fused'`` the on-device Umeyama alignment + warps
   stay inside program 1 at full capacity and a fixed-shape ``embed``
   program consumes the crops with no host round trip in between.
3. ``pose decode`` (``terran_tpu.ops.pose_decode``): CPM forward + bicubic
   upsample + peak finding + PAF integrals.

``process_stream`` software-pipelines batches: the next batch's programs
are dispatched before this batch's host stages run.

Only fixed-shape result arrays return to the host (boxes, landmarks,
scores, masks, embeddings, pose peak/limb tables), where the tiny
sequential stages (pose human assembly, SORT tracking) finish.

With a mesh (``terran_tpu.parallel.mesh``), both programs shard the frame
axis across chips; parameters are replicated.
"""

import contextlib
import functools
import threading

import numpy as np
import jax
import jax.numpy as jnp

from terran_tpu.models.arcface import (
    FaceResNet100, apply_int8, normalize_embeddings, quantize_params,
)
from terran_tpu.models.openpose import (
    BodyPoseModel, Int8BodyPoseModel,
    quantize_params as quantize_pose_params,
)
from terran_tpu.models.retinaface import (
    RetinaFace, anchors_for_shape, decode_outputs,
)
from terran_tpu.ops.nms import nms_fixed
from terran_tpu.ops.resize import (
    resize_bilinear, resize_bilinear_u8_cv2, resize_bilinear_u8_numpy,
    resize_bilinear_u8_torch, resized_shape,
)
from terran_tpu.ops.fused_peaks import fused_peaks_enabled
from terran_tpu.ops.pose_decode import (
    NUM_LIMBS, NUM_PARTS, forward_and_find_peaks, limb_scores, pack_peaks,
)
from terran_tpu.ops.upsample import upsample_bicubic
from terran_tpu.ops.warp import (
    SLAB_MARGIN, WARP_CONFIGS, alignment_matrices, alignment_matrices_jax,
    best_warp_config, warp_affine_batch, warp_affine_u8_batch_numpy,
    warp_affine_windowed, warp_affine_windowed_grouped,
)
from terran_tpu.parallel.mesh import (
    batch_sharding, pad_batch_to_multiple, replicated_sharding,
)
from terran_tpu.pose.assembly import assemble_humans, get_keypoints
from terran_tpu.runtime import (
    PARAMS_KEEP_F32, cast_params_for_compute, default_policy,
)


def _resolve_dispatch(name, mode, mesh):
    """'auto' -> 'adaptive' everywhere. The adaptive path picks ONE bucket
    per batch (sized to the busiest frame), and a uniform bucket is exactly
    as shardable as the fused full-capacity program — the bucketed programs
    jit with the same in_shardings, so a mesh no longer silently downgrades
    every batch to worst-case capacity (round-2 review item #3)."""
    if mode == "auto":
        return "adaptive"
    if mode not in ("adaptive", "fused"):
        raise ValueError(f"unknown {name} {mode!r}")
    return mode


class PerceptionPipeline:
    """End-to-end detect+embed+pose over frame batches.

    Parameters default to the checkpoint store; pass explicit params for
    testing. ``mesh`` turns on data-parallel execution over the frame axis.
    """

    def __init__(self, det_params=None, rec_params=None, pose_params=None,
                 det_short_side=None, pose_short_side=None, threshold=None,
                 nms_threshold=None, top_k=None, max_faces=None,
                 max_peaks=None, compute_dtype=None, mesh=None,
                 with_pose=True, with_embeddings=True, timer=None,
                 embed_dispatch=None, limb_dispatch=None,
                 max_escalations=None, transfer_plan=None,
                 embed_precision=None, pose_precision=None,
                 host_resize=None):
        from terran_tpu.checkpoint import load_checkpoint_params
        from terran_tpu.config import get_config

        cfg = get_config()
        det_short_side = (
            cfg.detection_short_side if det_short_side is None
            else det_short_side
        )
        pose_short_side = (
            cfg.pose_short_side if pose_short_side is None else pose_short_side
        )
        threshold = cfg.detection_threshold if threshold is None else threshold
        nms_threshold = (
            cfg.nms_iou_threshold if nms_threshold is None else nms_threshold
        )
        top_k = cfg.pipeline_top_k if top_k is None else top_k
        max_faces = cfg.pipeline_max_faces if max_faces is None else max_faces
        max_peaks = cfg.max_peaks_per_part if max_peaks is None else max_peaks

        if det_params is None:
            det_params = load_checkpoint_params(
                "terran_tpu.face.detection.RetinaFaceDetector"
            )
        if rec_params is None and with_embeddings:
            rec_params = load_checkpoint_params(
                "terran_tpu.face.recognition.ArcFaceRecognizer"
            )
        if pose_params is None and with_pose:
            pose_params = load_checkpoint_params(
                "terran_tpu.pose.openpose.OpenPoseEstimator"
            )

        self.mesh = mesh
        self.det_short_side = det_short_side
        self.pose_short_side = pose_short_side
        self.threshold = threshold
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self.max_faces = max_faces
        self.max_peaks = max_peaks
        self.with_pose = with_pose
        self.with_embeddings = with_embeddings
        # Overflow escalation (config.max_escalations): saturated batches
        # re-dispatch at doubled capacity instead of warning-and-dropping.
        # Counters are cumulative over the pipeline's lifetime; bench.py
        # reports them.
        self.max_escalations = (
            cfg.max_escalations if max_escalations is None
            else max_escalations
        )
        self.escalations = {"detect": 0, "pose": 0, "embed": 0}
        # Cumulative host->device upload bytes (every put_frames /
        # _put_batch call). bench.py reads it around a sweep to compute
        # the transfer plan's MEASURED byte floor — the binding ceiling
        # for link-bound hosts, which the raw-frame link_ceiling_fps
        # cannot express under the 'host' plan. Uploads happen from the
        # stream uploader thread, the embed worker, AND the main loop
        # concurrently; += is not atomic, so the counter takes a lock.
        self.upload_bytes = 0
        self._upload_bytes_lock = threading.Lock()

        dtype = compute_dtype or default_policy().compute_dtype
        self.det_model = RetinaFace(compute_dtype=dtype)
        self.rec_model = FaceResNet100(compute_dtype=dtype)
        self.pose_model = BodyPoseModel(compute_dtype=dtype)

        if mesh is not None:
            put = lambda p: jax.device_put(p, replicated_sharding(mesh))
        else:
            put = jax.device_put
        # Pre-cast f32 weights to the compute dtype once (bit-identical to
        # the per-execution cast the layers do; saves the per-execution
        # HBM read of the f32 copy — runtime.cast_params_for_compute).
        cast = cast_params_for_compute
        self.det_params = put(
            cast(det_params, dtype, keep_f32=PARAMS_KEEP_F32["retinaface"])
        )
        # Embedding precision: 'native' runs FaceResNet100 in the compute
        # dtype; 'int8' derives a quantised param tree (from the f32
        # masters, before any bf16 cast) and routes every embed program
        # through models.arcface.apply_int8 — the MXU's int8 rate is 2x
        # bf16. Opt-in; see config.embed_precision.
        self.embed_precision = (
            cfg.embed_precision if embed_precision is None
            else embed_precision
        )
        if self.embed_precision not in ("native", "int8"):
            raise ValueError(
                f"embed_precision must be 'native' or 'int8', got "
                f"{self.embed_precision!r}"
            )
        if rec_params is None:
            self.rec_params = None
        elif self.embed_precision == "int8":
            self.rec_params = put(quantize_params(rec_params, dtype))
        else:
            self.rec_params = put(
                cast(rec_params, dtype, keep_f32=PARAMS_KEEP_F32["arcface"])
            )
        # Same opt-in int8 recipe for the pose CPM trunk (its 7x7 stage
        # convs dominate the pose program's FLOPs); the duck-typed
        # Int8BodyPoseModel slots into forward_and_find_peaks unchanged.
        self.pose_precision = (
            cfg.pose_precision if pose_precision is None
            else pose_precision
        )
        if self.pose_precision not in ("native", "int8"):
            raise ValueError(
                f"pose_precision must be 'native' or 'int8', got "
                f"{self.pose_precision!r}"
            )
        if pose_params is None:
            self.pose_params = None
        elif self.pose_precision == "int8":
            self.pose_model = Int8BodyPoseModel(compute_dtype=dtype)
            self.pose_params = put(quantize_pose_params(pose_params, dtype))
        else:
            self.pose_params = put(
                cast(pose_params, dtype,
                     keep_f32=PARAMS_KEEP_F32["openpose"])
            )

        # Dispatch modes: 'adaptive' sizes the warp+embed program to the
        # detected face count (the reference embeds exactly the detected
        # faces by flattening them across images, arcface/wrapper.py:
        # 137-147 — this is its TPU analogue with bucketed static shapes)
        # and the limb-pair tables to the peaks actually found (valid
        # peaks occupy prefix slots). 'fused' keeps full-capacity single
        # programs with no host round trips. Both work under a mesh: the
        # adaptive bucket is chosen once per GLOBAL batch (covering the
        # busiest frame anywhere on the mesh), so every shard runs the
        # same program.
        self.embed_dispatch = _resolve_dispatch(
            "embed_dispatch",
            cfg.embed_dispatch if embed_dispatch is None else embed_dispatch,
            mesh,
        )
        self.embed_buckets = sorted(
            int(x) for x in str(cfg.pipeline_embed_buckets).split(",")
            if str(x).strip()
        )
        self.embed_windows = sorted(
            int(x) for x in str(cfg.pipeline_embed_windows).split(",")
            if str(x).strip()
        )
        self.limb_dispatch = _resolve_dispatch(
            "limb_dispatch",
            cfg.limb_dispatch if limb_dispatch is None else limb_dispatch,
            mesh,
        )
        self.peak_buckets = sorted(
            int(x) for x in str(cfg.pose_peak_buckets).split(",")
            if str(x).strip()
        )
        # PAF sampler backend, resolved ONCE here like every other knob
        # (a lazy per-compile read let a mid-run set_config mix backends
        # across buckets); also part of the _limb_fns cache key.
        self.limb_backend = cfg.limb_backend
        if self.limb_backend == "auto":
            self.limb_backend = (
                "matmul" if jax.devices()[0].platform == "tpu"
                else "gather"
            )
        if self.limb_backend not in ("matmul", "gather"):
            raise ValueError(
                f"limb_backend must be 'auto', 'matmul', or 'gather', "
                f"got {self.limb_backend!r}"
            )

        # Transfer plan: what crosses the host->device link per batch.
        # 'device' (default): the raw uint8 frames, once; every resize
        # and crop happens on device. 'host': only the DERIVED inputs —
        # the detection-bucket resize, the pose resize, and (after the
        # detection results return) the per-face embed windows sliced
        # from the host-resident originals — cutting per-frame upload
        # bytes ~4-5x at typical occupancy (6.2 MB -> ~1.3 MB at 1080p).
        # For hosts whose link is the bottleneck (PCIe-starved or
        # network-attached accelerators; this sandbox's relay); the
        # device plan remains better on healthy links (one transfer, no
        # host resize work). Host resizes run this repo's own bilinear
        # on the CPU backend, so the task contract is unchanged (the
        # reference itself resizes with cv2 on host, which the device
        # resize matches to +-1 count).
        self.transfer_plan = (
            cfg.transfer_plan if transfer_plan is None else transfer_plan
        )
        if self.transfer_plan not in ("device", "host"):
            raise ValueError(
                f"transfer_plan must be 'device' or 'host', got "
                f"{self.transfer_plan!r}"
            )
        # Host-resize backend (config.host_resize): 'auto' prefers cv2 —
        # the reference's own host arithmetic and ~55x the torch twin on
        # 1-core hosts — falling back to the exact (bit-identical to the
        # device resize) chain; 'exact' forces that chain; 'cv2'
        # requires cv2.
        self.host_resize = (
            cfg.host_resize if host_resize is None else host_resize
        )
        if self.host_resize not in ("auto", "exact", "cv2"):
            raise ValueError(
                f"host_resize must be 'auto', 'exact', or 'cv2', got "
                f"{self.host_resize!r}"
            )
        if self.host_resize == "cv2":
            # Surface a missing OpenCV at construction, not at the first
            # batch's future.result() deep inside the embed worker thread.
            import cv2  # noqa: F401
        if self.transfer_plan == "host":
            if self.with_embeddings and self.embed_dispatch != "adaptive":
                raise ValueError(
                    "transfer_plan='host' requires embed_dispatch="
                    "'adaptive' (the fused program warps crops from the "
                    "full frames, which never reach the device)"
                )
            if self.with_pose and self.limb_dispatch != "adaptive":
                raise ValueError(
                    "transfer_plan='host' requires limb_dispatch="
                    "'adaptive'"
                )

        self._step_fns = {}
        self._pose_fns = {}
        self._warp_embed_fns = {}
        self._pose_detect_fns = {}
        self._limb_fns = {}
        self._host_resize_fns = {}

        # Optional observability hooks: a StageTimer (aggregate per-stage
        # wall time) and/or a Timeline (per-batch spans with bytes, for
        # serialization analysis — utils/profiling.py). dispatch_batch
        # assigns each batch a monotonically increasing id that every
        # stage span carries.
        self.timer = timer
        self.timeline = None
        self._batch_seq = 0

        # Pose thresholds (reference openpose/wrapper.py:177-180).
        self.keypoint_threshold = cfg.keypoint_threshold
        self.thresh_midpoint = cfg.paf_midpoint_threshold
        self.human_threshold = cfg.human_score_threshold
        self.use_fused_peaks = fused_peaks_enabled(cfg.fused_peaks)

    # ------------------------------------------------------------------
    # Jitted programs
    # ------------------------------------------------------------------

    def _sharding_kwargs(self, num_batch_args, num_param_args):
        if self.mesh is None:
            return {}
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        return {
            "in_shardings": (rep,) * num_param_args + (data,) * num_batch_args,
            "out_shardings": data,
        }

    def _perception_fn(self, full_h, full_w, top_k=None,
                       pre_resized=False):
        # The traced program depends on the embed mode (the fused path
        # warps crops inside it) and the NMS capacity (overflow
        # escalation re-dispatches at doubled top_k), so neither may
        # reuse the cache across values. With ``pre_resized`` (the
        # 'host' transfer plan) the input is the already det-bucket-
        # resized uint8 batch; (full_h, full_w) still fix the
        # coordinate scale-back.
        top_k = self.top_k if top_k is None else top_k
        key = (full_h, full_w, self.embed_dispatch, top_k, pre_resized)
        if key in self._step_fns:
            return self._step_fns[key]

        det_h, det_w, det_scale = resized_shape(
            full_h, full_w, self.det_short_side
        )
        anchors = anchors_for_shape(det_h, det_w)
        max_faces = self.max_faces
        inv_scale = 1.0 / det_scale
        with_embeddings = (
            self.with_embeddings and self.rec_params is not None
            and self.embed_dispatch == "fused" and not pre_resized
        )

        def step(det_params, rec_params, frames_full):
            # Resize on device; only the raw uint8 frames crossed the link.
            # Round to match the reference's uint8 cv2 resize output.
            if pre_resized:
                frames_det = frames_full.astype(jnp.float32)
            else:
                frames_det = jnp.round(
                    resize_bilinear(frames_full, det_h, det_w)
                )
            outputs = self.det_model.apply(
                {"params": det_params},
                frames_det.astype(self.det_model.compute_dtype),
            )
            scores, boxes, landmarks = decode_outputs(outputs, anchors)

            def per_image_nms(s, b, l):
                kb, ks, keep, order, overflow = nms_fixed(
                    b, s, self.nms_threshold,
                    score_threshold=self.threshold, top_k=top_k,
                )
                return kb, l[order], ks, keep, overflow

            boxes, landmarks, scores, mask, det_overflow = jax.vmap(
                per_image_nms
            )(scores, boxes, landmarks)

            # Coordinates back to full resolution with the task API's
            # rounding semantics (resize_out: around().astype(int32),
            # face/detection/__init__.py:73-78).
            boxes_full = jnp.round(boxes * inv_scale).astype(jnp.int32)
            lmk_full = jnp.round(landmarks * inv_scale).astype(jnp.int32)

            # One packed array -> one d2h transfer for all detection
            # results (each round trip costs ~25 ms through a tunneled
            # runtime). Layout: 4 box + 10 landmark + score + mask +
            # per-image NMS overflow flag (broadcast along K).
            result = {
                "det_packed": jnp.concatenate(
                    [
                        boxes_full.astype(jnp.float32),
                        lmk_full.reshape(
                            lmk_full.shape[0], lmk_full.shape[1], 10
                        ).astype(jnp.float32),
                        scores[..., None],
                        mask[..., None].astype(jnp.float32),
                        jnp.broadcast_to(
                            det_overflow[:, None, None],
                            scores.shape + (1,),
                        ).astype(jnp.float32),
                    ],
                    axis=-1,
                )
            }

            if with_embeddings:
                # Aligned crops stay on device and feed the separate
                # embedding program (splitting ArcFace's 100-layer graph
                # out of this program cuts its compile time several-fold
                # with no host round trip in between).
                lmk_top = lmk_full[:, :max_faces].astype(jnp.float32)
                mats = jax.vmap(alignment_matrices_jax)(lmk_top)
                crops = jax.vmap(
                    lambda img, m: warp_affine_batch(img, m)
                )(frames_full, mats)  # (B, F, 112, 112, 3)
                result["crops"] = jnp.round(crops)  # reference warps to uint8
                result["emb_mask_dev"] = mask[:, :max_faces]

            return result

        step = jax.jit(step, **self._sharding_kwargs(
            num_batch_args=1, num_param_args=2,
        ))
        self._step_fns[key] = step
        return step

    def _apply_embed(self, rec_params, crops):
        """Unnormalised (N, 512) f32 features for flat uint8-valued
        crops, via the configured embedding precision."""
        if self.embed_precision == "int8":
            return apply_int8(
                rec_params, crops,
                compute_dtype=self.rec_model.compute_dtype,
            )
        return self.rec_model.apply(
            {"params": rec_params},
            crops.astype(self.rec_model.compute_dtype),
        )

    def _embed_fn(self):
        if hasattr(self, "_embed_jit"):
            return self._embed_jit

        def embed(rec_params, crops, emb_mask):
            b, f = crops.shape[:2]
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = self._apply_embed(rec_params, flat)
            feats = normalize_embeddings(feats.astype(jnp.float32))
            feats = feats.reshape(b, f, -1)
            feats = jnp.where(emb_mask[..., None], feats, 0.0)
            # Pack embeddings + mask: one transfer.
            return jnp.concatenate(
                [feats, emb_mask[..., None].astype(jnp.float32)], axis=-1
            )

        self._embed_jit = jax.jit(embed, **self._sharding_kwargs(
            num_batch_args=2, num_param_args=1,
        ))
        return self._embed_jit

    def _warp_embed_fn(self, k_slots, frames_shape):
        """Warp+embed program for ``k_slots`` face slots PER FRAME of a
        resident batch (adaptive embed path; one compile per (k, shape)).

        The slot grid keeps the warp in its fastest lowering — the same
        operand-batched patch gather as the fused path (one gather vmapped
        over frames; a flat face list with per-descriptor frame indices
        measured ~2.5x slower per descriptor, and frame duplication via
        ``frames[fidx]`` slower still — see docs/architecture.md). The plan
        crosses the link as ONE packed (B, k, 7) f32 array: 6 alignment
        matrix entries (host float64 Umeyama, like the standalone
        Recognition API) + validity.
        """
        key = (k_slots,) + tuple(frames_shape)
        if key in self._warp_embed_fns:
            return self._warp_embed_fns[key]

        def warp_embed(rec_params, frames, packed):
            b = frames.shape[0]
            mats = packed[..., :6].reshape(b, k_slots, 2, 3)
            valid = packed[..., 6] > 0.5
            crops = jax.vmap(
                lambda img, m: warp_affine_batch(img, m)
            )(frames, mats)
            crops = jnp.round(crops)  # reference warps to uint8
            flat = crops.reshape((-1,) + crops.shape[2:])
            feats = self._apply_embed(rec_params, flat)
            feats = normalize_embeddings(feats.astype(jnp.float32))
            feats = feats.reshape(b, k_slots, -1)
            feats = jnp.where(valid[..., None], feats, 0.0)
            return jnp.concatenate(
                [feats, valid[..., None].astype(jnp.float32)], axis=-1
            )

        fn = jax.jit(warp_embed, **self._sharding_kwargs(
            num_batch_args=2, num_param_args=1,
        ))
        self._warp_embed_fns[key] = fn
        return fn

    def _warp_embed_window_fn(self, k_slots, ws, frames_shape,
                              group=None, slab=None):
        """Windowed variant of :meth:`_warp_embed_fn`: each face's crop is
        gathered from a ``(ws, ws)`` window dynamic-sliced around its
        source quad instead of the full frame (the patch gather pays an
        operand-proportional cost — see ops/warp.py). The plan is one
        (B, k, 9) upload: 6 matrix entries + validity + window (y, x).

        With ``group`` (8/4), the warp fetches one slab (``slab``; the
        group's ``ops.warp.GROUP_SLABS`` geometry when None) per
        ``group`` output pixels instead of one (2, 2, C) patch per pixel
        — ``group``x fewer gather descriptors, bit-identical for
        matrices passing ``ops.warp.grouped_warp_eligible`` at that
        (group, slab) (the dispatcher walks the ``ops.warp.WARP_CONFIGS``
        ladder via ``best_warp_config``).
        """
        key = ((k_slots, ws, group) + (() if slab is None else (slab,))
               + tuple(frames_shape))
        if key in self._warp_embed_fns:
            return self._warp_embed_fns[key]

        if group is None:
            warp_fn = warp_affine_windowed
        else:
            warp_fn = functools.partial(
                warp_affine_windowed_grouped, group=group, slab=slab
            )

        frame_h, frame_w = frames_shape[1], frames_shape[2]

        def warp_embed(rec_params, frames, packed):
            b = packed.shape[0]
            mats = packed[..., :6].reshape(b * k_slots, 2, 3)
            valid = (packed[..., 6] > 0.5).reshape(-1)
            oyx = packed[..., 7:9].astype(jnp.int32)  # (B, k, 2)

            def slice_one(img, o):
                return jax.lax.dynamic_slice(
                    img, (o[0], o[1], 0), (ws, ws, img.shape[2])
                )

            wins = jax.vmap(
                jax.vmap(slice_one, in_axes=(None, 0))
            )(frames, oyx)  # (B, k, ws, ws, C)
            wflat = wins.reshape((b * k_slots,) + wins.shape[2:])
            crops = jax.vmap(
                lambda wdw, m, o: warp_fn(
                    wdw, m, o, frame_h, frame_w
                )
            )(wflat, mats, oyx.reshape(-1, 2))
            crops = jnp.round(crops)  # reference warps to uint8
            feats = self._apply_embed(rec_params, crops)
            feats = normalize_embeddings(feats.astype(jnp.float32))
            feats = jnp.where(valid[:, None], feats, 0.0)
            packed_out = jnp.concatenate(
                [feats, valid[:, None].astype(jnp.float32)], axis=-1
            )
            return packed_out.reshape(b, k_slots, -1)

        fn = jax.jit(warp_embed, **self._sharding_kwargs(
            num_batch_args=2, num_param_args=1,
        ))
        self._warp_embed_fns[key] = fn
        return fn

    def _select_embed_bucket(self, count, capacity):
        """Smallest configured per-frame slot bucket >= count, else the
        full ``max_faces`` capacity."""
        for b in self.embed_buckets:
            if count <= b < capacity:
                return b
        return capacity

    def _pose_fn(self, full_h, full_w, max_peaks=None):
        max_peaks = self.max_peaks if max_peaks is None else max_peaks
        key = (full_h, full_w, max_peaks)
        if key in self._pose_fns:
            return self._pose_fns[key]

        pose_h, pose_w, _ = resized_shape(
            full_h, full_w, self.pose_short_side
        )

        # Under a mesh the Pallas kernel runs per shard via shard_map
        # (see forward_and_find_peaks) — no more silent downgrade to the
        # XLA materialise-and-top_k path (round-2 review item #3b).
        use_fused = self.use_fused_peaks

        def decode(pose_params, frames_full):
            paf, peaks, coords, valid = self._pose_front(
                pose_params, frames_full, pose_h, pose_w, use_fused,
                max_peaks,
            )
            # The PAF field is materialised at x8: the dense phase-FIR
            # upsample vectorises on the VPU and measures ~3x faster
            # end-to-end than sampling the Keys filter at the segment
            # points (ops/pose_decode.py::limb_scores_sampled), whose 16
            # gathers/point dominate on TPU (measured on v5e, batch 8
            # @1080p: 82.6 -> 25.3 device-only fps).
            paf8 = upsample_bicubic(paf, 8)
            reg, accept = jax.vmap(
                lambda paf_i, c, v: limb_scores(
                    paf_i, c, v, self.thresh_midpoint
                )
            )(paf8, coords, valid)
            # Limbs pack: (B, L, K, K, 2) = reg, accept — with the peaks
            # pack, two transfers total.
            limbs = jnp.stack([reg, accept.astype(jnp.float32)], axis=-1)
            return peaks, limbs

        decode = jax.jit(decode, **self._sharding_kwargs(
            num_batch_args=1, num_param_args=1,
        ))
        self._pose_fns[key] = decode
        return decode

    def _pose_front(self, pose_params, frames_full, pose_h, pose_w,
                    use_fused, max_peaks=None, pre_resized=False):
        """Traced front half shared by the fused pose program and the
        adaptive split: on-device resize + CPM forward + fixed-K peak
        finding. Returns (paf x1 float32, peaks_packed, coords, valid);
        the peaks pack is (B, P, K, 5) = y, x, score, valid, part
        overflow (broadcast along K) — the layout
        ``ops.pose_decode.unpack_pose_outputs`` consumes. With
        ``pre_resized`` the input batch is already at (pose_h, pose_w).
        """
        if pre_resized:
            frames_pose = frames_full.astype(jnp.float32)
        else:
            frames_pose = jnp.round(
                resize_bilinear(frames_full, pose_h, pose_w)
            )
        # Shared with the standalone decode (ops/pose_decode.py). With
        # ``use_fused`` the heatmaps never materialise at x8: the Pallas
        # kernel (ops/fused_peaks.py) scans the phase images in VMEM and
        # emits only the peak tables — besides the HBM traffic, this
        # removes the XLA path's top_k over ~4M elements x 18 parts per
        # image, whose padding can expand to several GB of HBM.
        paf, coords, scores, valid, overflow = forward_and_find_peaks(
            self.pose_model, pose_params, frames_pose,
            self.keypoint_threshold,
            self.max_peaks if max_peaks is None else max_peaks,
            use_fused, mesh=self.mesh,
        )
        return paf, pack_peaks(coords, scores, valid, overflow), coords, \
            valid

    def _pose_detect_fn(self, full_h, full_w, max_peaks=None,
                        pre_resized=False):
        """First half of the adaptive pose path: forward + peak finding.

        Returns (peaks_packed, paf) with the PAF left at x1 resolution ON
        DEVICE (a few MB) — the x8 upsample and the (K, K) limb-pair
        scoring move to the bucketed :meth:`_limb_fn` program, sized to
        the peaks this batch actually produced. With ``pre_resized``
        (the 'host' transfer plan) the input is the already pose-resized
        uint8 batch.
        """
        max_peaks = self.max_peaks if max_peaks is None else max_peaks
        key = (full_h, full_w, max_peaks, pre_resized)
        if key in self._pose_detect_fns:
            return self._pose_detect_fns[key]

        pose_h, pose_w, _ = resized_shape(
            full_h, full_w, self.pose_short_side
        )
        use_fused = self.use_fused_peaks

        def detect_pose(pose_params, frames_full):
            paf, peaks, _, _ = self._pose_front(
                pose_params, frames_full, pose_h, pose_w, use_fused,
                max_peaks, pre_resized=pre_resized,
            )
            return peaks, paf

        fn = jax.jit(detect_pose, **self._sharding_kwargs(
            num_batch_args=1, num_param_args=1,
        ))
        self._pose_detect_fns[key] = fn
        return fn

    def _limb_fn(self, kb, paf_shape):
        """Bucketed limb-pair scoring: PAF x8 upsample + line integrals
        over (kb, kb) candidate pairs per limb (one compile per bucket).

        Takes the peak plan as one (B, P, kb, 3) upload: y, x, valid.
        The PAF sampler follows ``self.limb_backend`` (resolved from
        config at construction, like every other knob, and part of the
        cache key): one-hot MXU contractions on TPU (2.2x the gather
        form at kb=16 — gathers are per-descriptor-bound there),
        gathers elsewhere.
        """
        backend = self.limb_backend
        key = (kb, backend) + tuple(paf_shape)
        if key in self._limb_fns:
            return self._limb_fns[key]

        from terran_tpu.ops.pose_decode import limb_scores_matmul

        score = limb_scores_matmul if backend == "matmul" else limb_scores

        def limbs_fn(paf, cv_packed):
            coords = cv_packed[..., :2].astype(jnp.int32)
            valid = cv_packed[..., 2] > 0.5
            paf8 = upsample_bicubic(paf, 8)
            reg, accept = jax.vmap(
                lambda p, c, v: score(
                    p, c, v, self.thresh_midpoint
                )
            )(paf8, coords, valid)
            return jnp.stack([reg, accept.astype(jnp.float32)], axis=-1)

        fn = jax.jit(limbs_fn, **self._sharding_kwargs(
            num_batch_args=2, num_param_args=0,
        ))
        self._limb_fns[key] = fn
        return fn

    def _select_peak_bucket(self, count, cap=None):
        cap = self.max_peaks if cap is None else cap
        for b in self.peak_buckets:
            if count <= b < cap:
                return b
        return cap

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def warmup(self, batch, height, width):
        """Compile every program this pipeline can dispatch for the given
        batch shape, ahead of time.

        The adaptive paths trade one program for a small family of
        bucketed ones, compiled lazily on first use — which in a serving
        deployment means compile hiccups mid-stream the first time a
        crowd (bigger face bucket) or a new peak count appears. Warmup
        runs the full family once on dummy inputs (executing, not just
        AOT-lowering — jit's dispatch cache only counts executions):
        detection, every embed bucket at its applicable window sizes plus
        full capacity, and (with pose) the forward+peaks program and
        every limb bucket. Fused mode warms its two/three fixed programs.
        Returns the number of programs warmed.
        """
        import jax

        if self.mesh is not None and batch % self.mesh.size:
            # dispatch_batch pads partial batches up to the mesh size, so
            # warm the shapes it actually runs.
            batch += self.mesh.size - batch % self.mesh.size
        frames_shape = (batch, height, width, 3)
        hostprep = self.transfer_plan == "host"
        count = 0

        def run(jitted, *args):
            nonlocal count
            out = jax.block_until_ready(jitted(*args))
            count += 1
            return out

        if hostprep:
            det_h, det_w, _ = resized_shape(
                height, width, self.det_short_side
            )
            # Compile the host-side CPU resizes too (first streamed
            # batch otherwise pays them).
            zeros = np.zeros(frames_shape, np.uint8)
            self._host_resize(zeros, det_h, det_w)
            if self.with_pose and self.pose_params is not None:
                ph, pw, _ = resized_shape(
                    height, width, self.pose_short_side
                )
                self._host_resize(zeros, ph, pw)
            frames = self.put_frames(
                np.zeros((batch, det_h, det_w, 3), np.uint8)
            )
            run(self._perception_fn(height, width, pre_resized=True),
                self.det_params, self.rec_params, frames)
        else:
            frames = self.put_frames(np.zeros(frames_shape, np.uint8))
            run(self._perception_fn(height, width),
                self.det_params, self.rec_params, frames)

        if (self.with_embeddings and self.rec_params is not None
                and self.embed_dispatch == "fused"):
            crops = jnp.zeros(
                (batch, self.max_faces, 112, 112, 3), jnp.float32
            )
            emb_mask = jnp.zeros((batch, self.max_faces), bool)
            if self.mesh is not None:
                crops = jax.device_put(crops, batch_sharding(self.mesh))
                emb_mask = jax.device_put(
                    emb_mask, batch_sharding(self.mesh)
                )
            run(self._embed_fn(), self.rec_params, crops, emb_mask)

        if (self.with_embeddings and self.rec_params is not None
                and self.embed_dispatch == "adaptive"):
            for k in sorted(set(self.embed_buckets) | {self.max_faces}):
                if k > self.max_faces:
                    continue
                if hostprep:
                    # 'host' plan: faces warp on the host; the device
                    # program is the crops+mask embed at each bucket.
                    run(
                        self._embed_fn(), self.rec_params,
                        self._put_batch(
                            np.zeros((batch, k, 112, 112, 3), np.uint8)
                        ),
                        self._put_batch(np.zeros((batch, k), bool)),
                    )
                    continue
                for ws in [w for w in self.embed_windows
                           if w <= min(height, width)]:
                    # Warm the per-pixel fallback plus every dispatchable
                    # ladder config (ops.warp.WARP_CONFIGS: G=8 for
                    # small/rotated faces, G=4 up to ~1.33x source
                    # scale).
                    for group, slab in WARP_CONFIGS + ((None, None),):
                        run(
                            self._warp_embed_window_fn(
                                k, ws, frames_shape, group=group,
                                slab=slab,
                            ),
                            self.rec_params, frames,
                            self._put_batch(
                                np.zeros((batch, k, 9), np.float32)
                            ),
                        )
                run(
                    self._warp_embed_fn(k, frames_shape),
                    self.rec_params, frames,
                    self._put_batch(np.zeros((batch, k, 7), np.float32)),
                )

        if self.with_pose and self.pose_params is not None:
            if hostprep:
                pose_h, pose_w, _ = resized_shape(
                    height, width, self.pose_short_side
                )
                pose_in = self.put_frames(
                    np.zeros((batch, pose_h, pose_w, 3), np.uint8)
                )
            else:
                pose_in = frames
            if self.limb_dispatch == "adaptive":
                pd = self._pose_detect_fn(
                    height, width, pre_resized=hostprep
                )
                _, paf = run(pd, self.pose_params, pose_in)
                for kb in sorted(set(self.peak_buckets) | {self.max_peaks}):
                    if kb > self.max_peaks:
                        continue
                    run(
                        self._limb_fn(kb, paf.shape),
                        paf,
                        self._put_batch(
                            np.zeros((batch, NUM_PARTS, kb, 3), np.float32)
                        ),
                    )
            else:
                run(self._pose_fn(height, width),
                    self.pose_params, frames)
        return count

    def put_frames(self, frames):
        """Single host->HBM upload of a frame batch (sharded under a
        mesh). Accepts arrays already on device unchanged."""
        if not isinstance(frames, np.ndarray):
            return frames  # already a device array
        with self._upload_bytes_lock:
            self.upload_bytes += frames.nbytes
        if self.mesh is not None:
            return jax.device_put(frames, batch_sharding(self.mesh))
        return jax.device_put(frames)

    def _put_batch(self, array):
        """Upload a host-built plan array, batch-sharded under a mesh."""
        array = np.asarray(array)
        with self._upload_bytes_lock:
            self.upload_bytes += array.nbytes
        if self.mesh is not None:
            return jax.device_put(array, batch_sharding(self.mesh))
        return jnp.asarray(array)

    def _host_resize(self, frames, out_h, out_w):
        """Resize a uint8 batch on the host ('host' transfer plan).

        Returns a uint8 numpy array (the resized values are exact
        integers after the round, so uint8 upload halves the bytes).
        Backend per ``self.host_resize``: 'auto' (default) prefers cv2's
        SIMD fixed-point bilinear — EXACTLY the reference's own host
        resize (ops/resize.py::resize_bilinear_u8_cv2), within +-1 count
        of the device resize, and fast enough (68 ms/8x1080p batch on
        one core) that the host plan's byte savings are not eaten by
        the resize itself (r3: the 3.7-s torch resize was why the plan
        lost on the host it was built for). The 'exact' chain is this
        repo's own ``resize_bilinear`` arithmetic, bit-identical to the
        device plan: the jitted CPU backend when one exists, else the
        torch twin (same geometry/f32 weights, +-1 count on ~0.4% of
        pixels from fused-tap association), else the numpy twin.
        """
        key = (out_h, out_w)
        fn = self._host_resize_fns.get(key)
        if fn is None and self.host_resize in ("auto", "cv2"):
            try:
                import cv2  # noqa: F401

                fn = functools.partial(
                    resize_bilinear_u8_cv2, out_h=out_h, out_w=out_w
                )
            except ImportError:
                if self.host_resize == "cv2":
                    raise
            if fn is not None:
                self._host_resize_fns[key] = fn
        if fn is None:
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                # JAX_PLATFORMS pinned to the accelerator only (the axon
                # relay does this): no XLA CPU backend exists. Fall back
                # to numpy BLAS with the SAME interpolation matrices
                # (np.rint and jnp.round are both half-to-even).
                cpu = None
            if cpu is None:
                # torch's SIMD bilinear is ~23x the numpy twin on 1-core
                # hosts (ops/resize.py) — without it the host plan's
                # resize outweighs the link bytes it saves.
                try:
                    import torch  # noqa: F401

                    fn = functools.partial(
                        resize_bilinear_u8_torch, out_h=out_h, out_w=out_w
                    )
                except ImportError:
                    fn = functools.partial(
                        resize_bilinear_u8_numpy, out_h=out_h, out_w=out_w
                    )
            else:
                def resize_cpu(x):
                    return jnp.round(
                        resize_bilinear(x, out_h, out_w)
                    ).astype(jnp.uint8)

                jitted = jax.jit(resize_cpu)
                fn = lambda x: np.asarray(jitted(jax.device_put(x, cpu)))
            self._host_resize_fns[key] = fn
        return fn(np.asarray(frames))

    @contextlib.contextmanager
    def _stage(self, name, items=0, nbytes=0, batch=None):
        """Timing context for one pipeline stage: records into the
        aggregate StageTimer and, when a Timeline is attached and the
        span carries a batch id, into the per-batch timeline (with the
        bytes that crossed the link, where the caller knows them)."""
        with contextlib.ExitStack() as st:
            if self.timer is not None:
                st.enter_context(self.timer.stage(name, items))
            if self.timeline is not None and batch is not None:
                st.enter_context(self.timeline.span(batch, name, nbytes))
            yield

    def _host_prep_resize(self, frames):
        """CPU half of the 'host' transfer plan's prep for one batch:
        mesh padding plus the detect/pose resizes. Pure host work, no
        device calls — ``process_stream`` runs it on its own thread so
        batch i+1's resizes overlap batch i's uploads (the uploads are
        mostly link wait, so this wins even on a 1-core host)."""
        frames = np.asarray(frames)
        n = frames.shape[0]
        if self.mesh is not None:
            frames, n = pad_batch_to_multiple(frames, self.mesh.size)
        full_h, full_w = frames.shape[1:3]
        det_h, det_w, _ = resized_shape(
            full_h, full_w, self.det_short_side
        )
        det_host = self._host_resize(frames, det_h, det_w)
        pose_host = None
        if self.with_pose and self.pose_params is not None:
            pose_h, pose_w, _ = resized_shape(
                full_h, full_w, self.pose_short_side
            )
            pose_host = self._host_resize(frames, pose_h, pose_w)
        return {"frames": frames, "n": n, "det_host": det_host,
                "pose_host": pose_host}

    def _host_prep_upload(self, prep):
        """Upload half of the 'host' plan's prep: moves the resized
        inputs to HBM (the raw frames stay host-resident for the
        per-face embed windows). Runs on the uploader thread under
        ``process_stream`` so ``jax.device_put`` blocking (tunneled
        runtimes) never stalls the dispatch loop."""
        pose_host = prep.pop("pose_host")
        prep["det_dev"] = self.put_frames(prep.pop("det_host"))
        prep["pose_dev"] = (
            self.put_frames(pose_host) if pose_host is not None else None
        )
        return prep

    def _host_prep(self, frames):
        """Full host-plan prep (resizes + uploads) for one batch;
        ``process_stream`` runs the two halves on separate threads."""
        return self._host_prep_upload(self._host_prep_resize(frames))

    def _dispatch_perception(self, frames_dev, top_k=None, pre_shape=None):
        """Enqueue the detection program (and, in fused embed mode, the
        embedding program) on resident frames and start the result
        transfers. Returns the dict of in-flight device arrays.

        ``pre_shape`` = (full_h, full_w) marks ``frames_dev`` as the
        already det-bucket-resized upload of the 'host' transfer plan.
        """
        if pre_shape is not None:
            full_h, full_w = pre_shape
        else:
            full_h, full_w = frames_dev.shape[1:3]
        step = self._perception_fn(
            full_h, full_w, top_k, pre_resized=pre_shape is not None
        )
        out = dict(step(self.det_params, self.rec_params, frames_dev))
        if "crops" in out:
            out["emb_packed"] = self._embed_fn()(
                self.rec_params, out.pop("crops"), out.pop("emb_mask_dev"),
            )
        # Start result transfers while later programs run ("_"-keys are
        # device-resident inputs kept for later dispatches, not results).
        for key, v in out.items():
            if not key.startswith("_") and hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        return out

    def process_batch(self, frames):
        """Run the full pipeline on an (N, H, W, 3) uint8 RGB batch.

        Returns a dict of device arrays (faces/embeddings) and, when pose is
        enabled, the per-image assembled pose dicts.
        """
        return self.finalize_batch(*self.dispatch_batch(frames))

    def dispatch_batch(self, frames, stage=None):
        """Enqueue all device work for one batch without synchronising.

        Returns (out dict of in-flight device arrays, pose tuple or None,
        n, pose_scale).

        Contract under ``transfer_plan='host'``: the caller's ``frames``
        array stays host-resident and is read AGAIN — possibly from the
        embed worker thread, after this call returns — when
        finalize_batch slices the per-face crops. Frames must therefore
        remain valid (not reused/overwritten by the source) until the
        batch's results are collected; every reader in ``terran_tpu.io``
        yields freshly-allocated batches, but a custom source that
        recycles frame buffers must copy before dispatching.
        """
        bid = self._batch_seq
        self._batch_seq += 1
        if stage is None:
            stage = functools.partial(self._stage, batch=bid)

        hostprep = self.transfer_plan == "host"
        prep = None
        if isinstance(frames, dict) and "det_dev" in frames:
            # Already staged by _host_prep (process_stream moves it to
            # the uploader thread so resize + upload overlap dispatch).
            prep = frames
        elif hostprep:
            with stage("host_prep"):
                prep = self._host_prep(frames)

        if prep is not None:
            frames = prep["frames"]
            n = prep["n"]
        else:
            if not hasattr(frames, "shape"):
                frames = np.asarray(frames)
            n = frames.shape[0]
            if self.mesh is not None:
                # Mesh padding needs host-side concatenation.
                frames, n = pad_batch_to_multiple(
                    np.asarray(frames), self.mesh.size
                )

        full_h, full_w = frames.shape[1:3]
        if hostprep:
            # 'host' plan: the detection-bucket resize crossed the link
            # instead of the full frames; the originals stay
            # host-resident for the per-face embed windows sliced in
            # finalize_batch.
            frames_dev = prep["det_dev"]
            with stage("perception_step", items=n):
                out = self._dispatch_perception(
                    frames_dev, pre_shape=(full_h, full_w)
                )
            out["_frames_host"] = frames
            out["_full_shape"] = (full_h, full_w)
            if self.max_escalations > 0:
                out["_redetect"] = lambda tk: self._dispatch_perception(
                    frames_dev, top_k=tk, pre_shape=(full_h, full_w)
                )
        else:
            with stage("h2d", items=n, nbytes=getattr(frames, "nbytes", 0)):
                frames_dev = self.put_frames(frames)

            with stage("perception_step", items=n):
                out = self._dispatch_perception(frames_dev)
            if (self.max_escalations > 0
                    or (self.embed_dispatch == "adaptive"
                        and self.with_embeddings
                        and self.rec_params is not None)):
                # The adaptive embed program is dispatched in
                # finalize_batch, once the detection results (face
                # count, landmarks) are on the host, and overflow
                # escalation re-dispatches saturated batches; the frames
                # must stay resident until then.
                out["_frames_dev"] = frames_dev
            if self.max_escalations > 0:
                out["_redetect"] = lambda tk: self._dispatch_perception(
                    frames_dev, top_k=tk
                )

        pose_out = None
        pose_scale = None
        if self.with_pose and self.pose_params is not None:
            pose_h, pose_w, pose_scale = resized_shape(
                full_h, full_w, self.pose_short_side
            )
            if hostprep:
                pose_in = prep["pose_dev"]
                pd_kwargs = {"pre_resized": True}
            else:
                pose_in = frames_dev
                pd_kwargs = {}
            if self.limb_dispatch == "adaptive":
                pd = self._pose_detect_fn(full_h, full_w, **pd_kwargs)
                with stage("pose_dispatch", items=n):
                    peaks_dev, paf_dev = pd(self.pose_params, pose_in)
                    if hasattr(peaks_dev, "copy_to_host_async"):
                        peaks_dev.copy_to_host_async()
                repose = lambda mp: self._pose_detect_fn(
                    full_h, full_w, mp, **pd_kwargs
                )(self.pose_params, pose_in)
                pose_out = ("adaptive", peaks_dev, paf_dev, repose)
            else:
                decode = self._pose_fn(full_h, full_w)
                with stage("pose_dispatch", items=n):
                    pose_out = decode(self.pose_params, pose_in)
                    for v in pose_out:
                        if hasattr(v, "copy_to_host_async"):
                            v.copy_to_host_async()

        out["_batch_id"] = bid
        return out, pose_out, n, pose_scale

    def finalize_batch(self, out, pose_out, n, pose_scale, stage=None):
        """Fetch results and run the host stages for a dispatched batch."""
        return self.collect_batch(
            self.advance_batch(out, pose_out, n, pose_scale, stage=stage)
        )

    def advance_batch(self, out, pose_out, n, pose_scale, stage=None):
        """Finalization phase A: fetch the small DECISION results (packed
        detections, peak coordinates), run overflow escalations, and
        dispatch the occupancy-adaptive second-stage programs (bucketed
        warp+embed, limb scoring) with their result transfers started.
        Returns the state dict ``collect_batch`` consumes.

        The split exists for ``process_stream``: the adaptive dispatch
        chain detections -> embed and peaks -> limbs needs host round
        trips by design, and running them back-to-back with the final
        fetches serialized every round trip against the next batch's
        upload on a shared link (r3: ~1.7 s/batch of the relay session
        was exactly this). Phase A runs as soon as a batch's forward has
        had a slot to compute; the heavy blocking fetches (phase B,
        ``collect_batch``) run one further slot later, so the limb/embed
        programs compute while the NEXT batch uploads and advances."""
        bid = out.pop("_batch_id", None)
        if stage is None:
            stage = functools.partial(self._stage, batch=bid)

        frames_dev = out.pop("_frames_dev", None)
        frames_host = out.pop("_frames_host", None)
        full_shape = out.pop("_full_shape", None)
        redetect = out.pop("_redetect", None)

        # Detection results first: the adaptive embed dispatch below needs
        # the host-side face count and landmarks (their transfer was
        # already started by copy_to_host_async at dispatch time).
        from terran_tpu.models.retinaface import unpack_detections

        det_dev = out.pop("det_packed")
        with stage("det_fetch", items=n,
                   nbytes=getattr(det_dev, "nbytes", 0)):
            det = np.asarray(det_dev)[:n]
        boxes, landmarks, scores, mask, overflow = unpack_detections(det)
        # Overflow escalation: a saturated NMS pre-selection may have
        # dropped real faces; re-dispatch the perception program at
        # doubled top_k on the still-resident frames (the reference's
        # dynamic shapes cannot drop detections).
        top_k_used = self.top_k
        attempts = 0
        while (bool(overflow.any()) and redetect is not None
               and attempts < self.max_escalations):
            attempts += 1
            top_k_used *= 2
            self.escalations["detect"] += 1
            with stage("detect_escalation", items=n):
                out_esc = redetect(top_k_used)
                if "emb_packed" in out_esc:
                    out["emb_packed"] = out_esc["emb_packed"]
                det = np.asarray(out_esc.pop("det_packed"))[:n]
                boxes, landmarks, scores, mask, overflow = (
                    unpack_detections(det)
                )
        out["boxes"] = boxes.astype(np.int32)
        out["landmarks"] = landmarks.astype(np.int32)
        out["scores"] = scores.astype(np.float32)
        out["mask"] = mask
        out["det_overflow"] = overflow

        adaptive_embed = (
            self.embed_dispatch == "adaptive" and self.with_embeddings
            and self.rec_params is not None
        )
        emb_plan = None
        if adaptive_embed and frames_host is not None:
            # 'host' plan: align the faces on the host and upload only
            # the 112x112 crops — on the embed worker thread, so the
            # CPU warp and the crop upload overlap the main loop's pose
            # fetches and the NEXT batch's resize/upload threads instead
            # of serializing against them (collect_batch resolves the
            # future). out is read-only to the worker (mask/landmarks,
            # set above) — the main loop only ADDS keys after this.
            emb_plan = self._embed_pool().submit(
                self._dispatch_adaptive_embed_host,
                out, frames_host, full_shape, n, stage,
            )
        elif adaptive_embed and frames_dev is not None:
            # Dispatch the bucketed warp+embed now; it computes while the
            # pose fetch and host assembly below run.
            with stage("embed_dispatch", items=n):
                emb_plan = self._dispatch_adaptive_embed(out, frames_dev)

        pose_state = None
        if pose_out is not None:
            if isinstance(pose_out, tuple) and pose_out[0] == "adaptive":
                peaks_dev = pose_out[1]
                with stage("pose_fetch", items=n,
                           nbytes=getattr(peaks_dev, "nbytes", 0)):
                    # Keep the FULL (padded) batch for the limb dispatch:
                    # under a mesh the bucketed program runs over every
                    # shard, padding rows included.
                    peaks_np = np.asarray(peaks_dev)
                paf_dev = pose_out[2]
                repose = pose_out[3]
                # Escalation: a saturated part heatmap dropped its weakest
                # peaks; re-run forward+peaks at doubled max_peaks.
                mp_used = self.max_peaks
                attempts = 0
                while ((peaks_np[:n, :, 0, 4] > 0.5).any()
                       and attempts < self.max_escalations):
                    attempts += 1
                    mp_used *= 2
                    self.escalations["pose"] += 1
                    with stage("pose_escalation", items=n):
                        peaks_dev, paf_dev = repose(mp_used)
                        peaks_np = np.asarray(peaks_dev)
                coords = peaks_np[..., :2].astype(np.int32)
                scores = peaks_np[..., 2].astype(np.float32)
                valid = peaks_np[..., 3] > 0.5
                out["pose_overflow"] = (
                    peaks_np[:n, :, 0, 4] > 0.5
                ).any(axis=-1)
                with stage("limb_dispatch", items=n):
                    kb, limbs_dev = self._dispatch_adaptive_limbs(
                        paf_dev, coords, valid, cap=mp_used
                    )
                pose_state = (
                    "adaptive", coords[:n, :, :kb], scores[:n, :, :kb],
                    valid[:n, :, :kb], kb, limbs_dev,
                )
            else:
                # Fused limb path: one packed result, fetched in phase B
                # (nothing is dispatched downstream of it, so there is no
                # round trip to hoist; its overflow escalation also lives
                # there since it needs the fetched flag).
                pose_state = ("fused", pose_out, frames_dev)

        return {
            "out": out, "n": n, "pose_scale": pose_scale, "bid": bid,
            "stage": stage, "emb_plan": emb_plan,
            "adaptive_embed": adaptive_embed, "pose": pose_state,
        }

    def collect_batch(self, state):
        """Finalization phase B: the heavy blocking fetches (limb tables,
        embeddings, or the fused pose grid) and the host-side human
        assembly. Runs one pipeline slot after ``advance_batch`` under
        ``process_stream`` so the programs it waits on computed while the
        next batch was advancing."""
        out = state["out"]
        n = state["n"]
        pose_scale = state["pose_scale"]
        stage = state["stage"]

        if state["pose"] is not None and state["pose"][0] == "adaptive":
            _, coords, scores, valid, kb, limbs_dev = state["pose"]
            with stage("limb_fetch", items=n,
                       nbytes=getattr(limbs_dev, "nbytes", 0)):
                if limbs_dev is None:  # no peaks anywhere
                    reg = np.zeros(
                        (n, NUM_LIMBS, kb, kb), np.float32
                    )
                    accept = np.zeros((n, NUM_LIMBS, kb, kb), bool)
                else:
                    limbs = np.asarray(limbs_dev)[:n]
                    reg = limbs[..., 0]
                    accept = limbs[..., 1] > 0.5
        elif state["pose"] is not None:
            _, pose_out, frames_dev = state["pose"]
            with stage("pose_fetch", items=n,
                       nbytes=sum(getattr(v, "nbytes", 0)
                                  for v in pose_out)):
                from terran_tpu.ops.pose_decode import (
                    unpack_pose_outputs,
                )

                (coords, scores, valid, reg, accept,
                 pose_overflow) = unpack_pose_outputs(
                    *map(np.asarray, pose_out)
                )
            mp_used = self.max_peaks
            attempts = 0
            while (pose_overflow[:n].any() and frames_dev is not None
                   and attempts < self.max_escalations):
                attempts += 1
                mp_used *= 2
                self.escalations["pose"] += 1
                with stage("pose_escalation", items=n):
                    decode = self._pose_fn(
                        frames_dev.shape[1], frames_dev.shape[2],
                        mp_used,
                    )
                    pose_out = decode(self.pose_params, frames_dev)
                    (coords, scores, valid, reg, accept,
                     pose_overflow) = unpack_pose_outputs(
                        *map(np.asarray, pose_out)
                    )
            out["pose_overflow"] = pose_overflow[:n].any(axis=-1)

        if state["pose"] is not None:
            with stage("pose_assembly", items=n):
                poses = []
                for i in range(n):
                    peaks_by_id, humans = assemble_humans(
                        coords[i], scores[i], valid[i], reg[i], accept[i],
                        human_threshold=self.human_threshold,
                    )
                    poses.append(
                        get_keypoints(peaks_by_id, humans, pose_scale)
                    )
                out["poses"] = poses

        if "emb_packed" in out:
            # Fused path: unpack the single-transfer embedding grid.
            emb_dev = out.pop("emb_packed")
            with stage("embed_fetch", items=n,
                       nbytes=getattr(emb_dev, "nbytes", 0)):
                emb = np.asarray(emb_dev)[:n]
            out["embeddings"] = emb[..., :-1]
            out["embeddings_mask"] = emb[..., -1] > 0.5
        elif state["adaptive_embed"]:
            with stage("embed_fetch", items=n):
                out["embeddings"], out["embeddings_mask"] = (
                    self._collect_adaptive_embed(state["emb_plan"], n)
                )
        if "poses" in out:
            out["poses"] = out["poses"][:n]
        return out

    def _dispatch_adaptive_limbs(self, paf_dev, coords, valid, cap=None):
        """Enqueue the bucketed limb-pair program.

        ``kb`` covers the busiest (image, part)'s valid-peak count (valid
        peaks occupy prefix slots); ``cap`` is the peak capacity of the
        program that produced ``coords`` (> max_peaks after escalation).
        Returns (kb, in-flight result), or (1, None) when the whole batch
        produced no peaks — nothing to score, and 1-slot all-invalid
        tables feed assembly the same way the full program would.
        """
        counts = valid.sum(axis=-1)
        busiest = int(counts.max()) if counts.size else 0
        if busiest == 0:
            return 1, None
        kb = self._select_peak_bucket(busiest, cap)
        cv = np.concatenate(
            [
                coords[:, :, :kb].astype(np.float32),
                (valid[:, :, :kb])[..., None].astype(np.float32),
            ],
            axis=-1,
        )
        fn = self._limb_fn(kb, paf_dev.shape)
        limbs = fn(paf_dev, self._put_batch(cv))
        if hasattr(limbs, "copy_to_host_async"):
            limbs.copy_to_host_async()
        return kb, limbs

    def _plan_adaptive_embed(self, out, b, fh, fw, windows=True):
        """Shared planning for the bucketed warp+embed program: bucket
        selection, host Umeyama, the packed (b, k, 9) plan, and the
        window/config choice. Returns None when no faces were found,
        else (packed, k, ws, cfg) where ws is None for the full-frame
        fallback and cfg is the WARP_CONFIGS ladder entry
        ``(group, (slab_h, slab_w))`` — or None for the per-pixel
        windowed program.

        ``windows=False`` (the 'host' transfer plan, which warps on the
        host and never runs a windowed device gather) stops after the
        packed matrices: the source-extent, ``best_warp_config``, and
        window-bucket searches are device-plan work the host path would
        discard — per-batch host CPU the 1-core hosts that plan targets
        cannot spare. Columns 7:9 stay zero and ws/group return None.
        """
        # Slots are positional (NMS suppression leaves holes in the mask),
        # so the bucket must cover the highest OCCUPIED slot, not the count.
        mask_full = out["mask"]
        slot_no = np.arange(1, mask_full.shape[1] + 1)
        busiest = int((mask_full * slot_no).max()) if mask_full.size else 0
        if busiest == 0:
            return None
        # Capacity escalation: when a crowd occupies slots beyond
        # max_faces, double the face capacity (up to max_escalations
        # times, bounded by top_k) so those faces get embedded instead of
        # silently skipped — parity with the reference, which flattens
        # and embeds every detected face (arcface/wrapper.py:137-147).
        capacity = self.max_faces
        attempts = 0
        while busiest > capacity and attempts < self.max_escalations:
            attempts += 1
            capacity = min(capacity * 2, mask_full.shape[1])
            self.escalations["embed"] += 1
        mask = mask_full[:, :capacity]
        lmks = out["landmarks"][:, :capacity]
        k = self._select_embed_bucket(min(busiest, capacity), capacity)
        packed = np.zeros((b, k, 9), np.float32)
        # Output corner pixel centres; their source images bound every
        # sample point (the map is affine), giving each face's window.
        side = 112.0
        corners = np.array([[0.5, 0.5], [side - 0.5, 0.5],
                            [0.5, side - 0.5], [side - 0.5, side - 0.5]])
        idx = np.argwhere(mask[:, :k])
        mats = alignment_matrices(
            lmks[idx[:, 0], idx[:, 1]].astype(np.float32)
        )  # one batched solve: a per-face loop costs ~1 ms/face on host
        packed[idx[:, 0], idx[:, 1], :6] = mats.reshape(len(idx), 6)
        packed[idx[:, 0], idx[:, 1], 6] = 1.0
        if not windows:
            return packed, k, None, None
        src = (
            np.einsum("pk,mjk->mpj", corners, mats[:, :, :2])
            + mats[:, None, :, 2]
        )  # (M, 4, 2) x, y
        lo = np.floor(src.min(axis=1)) - 3
        packed[idx[:, 0], idx[:, 1], 7] = lo[:, 1]  # window y
        packed[idx[:, 0], idx[:, 1], 8] = lo[:, 0]  # window x
        max_extent = float(
            (src.max(axis=1) - src.min(axis=1)).max()
        ) + 6
        # Grouped-slab warp (group-x fewer gather descriptors; the best
        # WARP_CONFIGS ladder entry — group and slab — admitting every
        # face's span bound) when a window with the slab's extra margin
        # exists; bit-identical (ops/warp.py).
        cfg = best_warp_config(mats)
        ws_grouped = next(
            (w for w in self.embed_windows
             if w >= max_extent + SLAB_MARGIN and w <= min(fh, fw)),
            None,
        ) if cfg is not None else None
        ws = ws_grouped if ws_grouped is not None else next(
            (w for w in self.embed_windows
             if w >= max_extent and w <= min(fh, fw)),
            None,
        )
        if ws is not None:
            packed[..., 7] = np.clip(packed[..., 7], 0, fh - ws)
            packed[..., 8] = np.clip(packed[..., 8], 0, fw - ws)
        return packed, k, ws, (cfg if ws_grouped is not None else None)

    def _dispatch_adaptive_embed(self, out, frames_dev):
        """Plan and enqueue the bucketed warp+embed program.

        The per-frame slot count ``k`` is the smallest bucket covering the
        busiest frame of this batch (the NMS outputs are score-sorted, so
        slots ``[:k]`` are exactly the faces the fused path would embed).
        Host Umeyama (float64, like the standalone Recognition API) fills
        one packed upload: 6 matrix entries + validity (+ window origin
        when the windowed program runs). When every face's source quad
        fits a configured window bucket, crops are gathered from per-face
        ``(ws, ws)`` windows instead of the full frames (the patch gather
        pays an operand-proportional cost — ops/warp.py); oversized faces
        or tiny frames fall back to the full-frame program, exactly.
        Returns the in-flight device result, or None when no faces were
        found (no program runs at all — the reference's empty-input
        (0, 512) case, arcface/wrapper.py:159-164).
        """
        b, fh, fw = frames_dev.shape[:3]
        plan = self._plan_adaptive_embed(out, b, fh, fw)
        if plan is None:
            return None
        packed, k, ws, cfg = plan
        if ws is None:
            fn = self._warp_embed_fn(k, frames_dev.shape)
            emb = fn(self.rec_params, frames_dev,
                     self._put_batch(packed[..., :7]))
        else:
            group, slab = cfg if cfg is not None else (None, None)
            fn = self._warp_embed_window_fn(
                k, ws, frames_dev.shape, group=group, slab=slab,
            )
            emb = fn(self.rec_params, frames_dev, self._put_batch(packed))
        if hasattr(emb, "copy_to_host_async"):
            emb.copy_to_host_async()
        return emb

    def _host_warp_fn(self):
        """Host face-warp backend, governed by the same fidelity knob as
        the host resize (``self.host_resize``): 'auto'/'cv2' prefer
        OpenCV's fixed-point bilinear (the reference-family host
        arithmetic, within one uint8 count — ops/warp.py
        ``warp_affine_u8_batch_cv2``), 'exact' forces the numpy twin of
        the device warp."""
        fn = getattr(self, "_host_warp", None)
        if fn is None:
            fn = warp_affine_u8_batch_numpy
            if self.host_resize in ("auto", "cv2"):
                try:
                    import cv2  # noqa: F401

                    from terran_tpu.ops.warp import warp_affine_u8_batch_cv2

                    fn = warp_affine_u8_batch_cv2
                except ImportError:
                    if self.host_resize == "cv2":
                        raise
            self._host_warp = fn
        return fn

    def _embed_pool(self):
        """Single-thread executor for the 'host' plan's embed jobs: one
        worker keeps the relay's dispatch order deterministic while the
        host warp + crop upload overlap the main loop (JAX dispatch is
        thread-safe; the frame uploader threads already coexist).
        Reclaimed by :meth:`close` (or, failing that, when the pipeline
        is garbage-collected — the ``weakref.finalize`` below — so a
        dropped pipeline doesn't pin a non-daemon thread for the
        process lifetime)."""
        pool = getattr(self, "_embed_pool_obj", None)
        if pool is None:
            import weakref
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="terran-tpu-embed"
            )
            self._embed_pool_obj = pool
            self._embed_pool_finalizer = weakref.finalize(
                self, pool.shutdown, wait=False
            )
        return pool

    def close(self):
        """Release host-side resources (currently the 'host' plan's
        embed worker thread). Idempotent; the pipeline remains usable
        afterwards — a later batch just starts a fresh worker. Also runs
        automatically on garbage collection and via the context-manager
        protocol."""
        pool = getattr(self, "_embed_pool_obj", None)
        if pool is not None:
            self._embed_pool_obj = None
            fin = getattr(self, "_embed_pool_finalizer", None)
            if fin is not None:
                fin.detach()
            pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _dispatch_adaptive_embed_host(self, out, frames, full_shape, n,
                                      stage=None):
        """'host' transfer plan variant of :meth:`_dispatch_adaptive_embed`:
        faces are aligned ON THE HOST (:meth:`_host_warp_fn`: cv2's
        fixed-point bilinear under 'auto', or the device warp's numpy
        twin under 'exact' — both within one rounded count) and
        only the (k, 112, 112) uint8 crops cross the link: ~37 KB per face
        slot against the device plan's 6 MB full frames — r3's window
        upload ((b, k, ws, ws) pixel windows) cost 12-50 MB per batch at
        ws 256-512 and LOST to the raw frames it was meant to undercut.
        From the crops onward the device arithmetic is the fused path's
        own crops+mask program (:meth:`_embed_fn`).

        ``process_stream`` runs this on the embed worker thread (the warp
        is host CPU work and the upload is link wait — both overlap the
        main loop); ``stage`` carries the caller's per-batch timing
        context. Returns the in-flight device result (or None when no
        faces were found — the reference's empty-input (0, 512) case,
        arcface/wrapper.py:159-164).
        """
        if stage is None:
            stage = self._stage
        frames = np.asarray(frames)
        b = frames.shape[0]
        fh, fw = full_shape
        plan = self._plan_adaptive_embed(out, b, fh, fw, windows=False)
        if plan is None:
            return None
        packed, k, _, _ = plan
        mask = packed[..., 6] > 0.5
        warp = self._host_warp_fn()
        with stage("embed_host_warp", items=int(mask.sum())):
            crops = np.zeros((b, k, 112, 112, frames.shape[3]), np.uint8)
            for i in range(b):
                js = np.flatnonzero(mask[i])
                if js.size:
                    crops[i, js] = warp(
                        frames[i], packed[i, js, :6].reshape(-1, 2, 3)
                    )
        with stage("embed_dispatch", items=n,
                   nbytes=crops.nbytes + mask.nbytes):
            emb = self._embed_fn()(
                self.rec_params, self._put_batch(crops),
                self._put_batch(mask),
            )
            if hasattr(emb, "copy_to_host_async"):
                emb.copy_to_host_async()
        return emb

    def _collect_adaptive_embed(self, plan, n):
        """Fetch the adaptive embed result and place it in the
        (n, >=max_faces, dim) grid the fused path produces (wider than
        max_faces only when capacity escalation fired for this batch)."""
        from terran_tpu.face.recognition import EMBEDDING_DIM

        if hasattr(plan, "result"):  # 'host' plan: embed worker future
            plan = plan.result()
        if plan is None:
            return (
                np.zeros((n, self.max_faces, EMBEDDING_DIM), np.float32),
                np.zeros((n, self.max_faces), bool),
            )
        emb = np.asarray(plan)[:n]
        k = emb.shape[1]
        dim = emb.shape[-1] - 1  # packed as features + validity flag
        rows = max(self.max_faces, k)
        grid = np.zeros((n, rows, dim), np.float32)
        grid_mask = np.zeros((n, rows), bool)
        grid[:, :k] = emb[..., :dim]
        grid_mask[:, :k] = emb[..., dim] > 0.5
        return grid, grid_mask

    def process_stream(self, batches, depth=None, prefetch=True):
        """Software-pipelined batch processing.

        ``depth`` batches are kept dispatched ahead of the oldest
        unfinished batch (default: config ``pipeline_depth``), so while
        batch *i*'s results download and its host stages run, batch *i+1*
        is computing and batch *i+2* is crossing the host->device link.

        With ``prefetch`` (single-device only), uploads additionally move
        to a background thread (``io.video.prefetch.threaded_device_put``),
        which keeps the link busy even when ``jax.device_put`` blocks the
        calling thread — the case on tunneled runtimes.

        Yields one result dict per input batch, in order.
        """
        from collections import deque

        if depth is None:
            from terran_tpu.config import get_config

            depth = get_config().pipeline_depth
        depth = max(1, depth)

        if prefetch and self.mesh is None:
            from terran_tpu.io.video.prefetch import threaded_device_put

            def timed(fn, event):
                """Record the worker thread's spans against the batch id
                the dispatch loop will assign: every stage consumes the
                source in order, so the k-th batch through a worker is
                dispatch id _batch_seq + k. That inference assumes this
                stream is the ONLY dispatcher while instrumented — an
                interleaved process_batch()/second stream advances
                _batch_seq outside this count and shifts every later
                worker span's attribution. The Timeline is a bench
                instrument attached to one exclusive sweep (bench.py);
                it is not meant to survive concurrent dispatchers."""
                if self.timeline is None:
                    return fn
                import itertools

                counter = itertools.count(self._batch_seq)

                def wrapped(x, _fn=fn, _c=counter):
                    if isinstance(x, dict):
                        nbytes = sum(
                            getattr(v, "nbytes", 0) for k, v in x.items()
                            if k.endswith("_host")
                        )
                    else:
                        nbytes = getattr(x, "nbytes", 0)
                    with self.timeline.span(next(_c), event, nbytes):
                        return _fn(x)

                return wrapped

            if self.transfer_plan == "host":
                # Two worker stages: batch i+1's resizes (CPU) overlap
                # batch i's uploads (link wait) — the full frames never
                # upload at all.
                batches = threaded_device_put(
                    batches, depth=depth,
                    put=timed(self._host_prep_resize, "host_resize_thread"),
                )
                batches = threaded_device_put(
                    batches, depth=depth,
                    put=timed(self._host_prep_upload, "h2d_thread"),
                )
            else:
                batches = threaded_device_put(
                    batches, depth=depth,
                    put=timed(self.put_frames, "h2d_thread"),
                )

        # Two-phase finalization: once a batch leaves the dispatch window,
        # phase A (advance_batch: decision fetches + adaptive dispatches)
        # runs immediately, but phase B (collect_batch: the heavy blocking
        # fetches + assembly) waits one further slot — so the limb/embed
        # programs dispatched in phase A compute while the NEXT batch
        # uploads and advances, instead of being waited on back-to-back
        # over the same link the upload is using.
        pending = deque()
        advanced = deque()
        for frames in batches:
            pending.append(self.dispatch_batch(frames))
            if len(pending) > depth:
                advanced.append(self.advance_batch(*pending.popleft()))
            if len(advanced) > 1:
                yield self.collect_batch(advanced.popleft())
        while pending:
            advanced.append(self.advance_batch(*pending.popleft()))
            if len(advanced) > 1:
                yield self.collect_batch(advanced.popleft())
        while advanced:
            yield self.collect_batch(advanced.popleft())

    def faces_from(self, out):
        """Convert step outputs to the task-API list-of-dicts contract."""
        faces = []
        mask = out["mask"]
        for i in range(mask.shape[0]):
            keep = mask[i]
            faces.append([
                {"bbox": b, "landmarks": l, "score": s}
                for b, l, s in zip(
                    out["boxes"][i][keep], out["landmarks"][i][keep],
                    out["scores"][i][keep],
                )
            ])
        return faces
