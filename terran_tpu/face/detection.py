"""Face-detection task API and the TPU RetinaFace wrapper.

Mirrors the reference task layer (/root/reference/terran/face/detection/
__init__.py) — same constructor signature, same call pipeline
(resize_in -> merge_in -> model.call -> merge_out -> resize_out), same
return contract of ``{'bbox', 'landmarks', 'score'}`` dicts — while the
model wrapper replaces the reference's torch wrapper
(/root/reference/terran/face/detection/retinaface/wrapper.py:92-238) with a
fully fused jitted program per input shape: forward + anchor decode + masked
NMS run on-device in one compilation, and only the final fixed-shape arrays
cross back to the host.
"""

import numpy as np

from terran_tpu.checkpoint import get_class_for_checkpoint, load_checkpoint_params
from terran_tpu.config import get_config
from terran_tpu.models.retinaface import RetinaFace as RetinaFaceModel
from terran_tpu.models.retinaface import make_detect_fn, unpack_detections
from terran_tpu.runtime import (
    PARAMS_KEEP_F32, bucket_shape, cast_params_for_compute, default_policy,
)
from terran_tpu.utils.batching import merge_factory, resize_factory

TASK_NAME = "face-detection"


class RetinaFaceDetector:
    """Jitted RetinaFace detection wrapper.

    One compiled program is cached per distinct padded input shape; videos
    (constant frame size) compile exactly once.
    """

    CHECKPOINT_CLASS = "terran_tpu.face.detection.RetinaFaceDetector"

    def __init__(self, params=None, nms_threshold=None, top_k=None,
                 bucketing=None, compute_dtype=None, device=None,
                 threshold=None, max_escalations=None):
        cfg = get_config()
        nms_threshold = (
            cfg.nms_iou_threshold if nms_threshold is None else nms_threshold
        )
        # Overflow escalation: re-dispatch at doubled top_k when the fixed
        # pre-selection saturates, instead of dropping low-scoring faces —
        # the reference's dynamic shapes cannot drop detections
        # (retinaface/wrapper.py:207-236).
        self.max_escalations = (
            cfg.max_escalations if max_escalations is None
            else max_escalations
        )
        self.escalation_count = 0
        # Default score threshold for calls that don't pass one (the
        # reference hardcodes 0.5 at call time, wrapper.py:133).
        self.threshold = (
            cfg.detection_threshold if threshold is None else threshold
        )
        top_k = cfg.detection_top_k if top_k is None else top_k
        bucketing = cfg.bucketing if bucketing is None else bucketing
        if params is None:
            params = load_checkpoint_params(self.CHECKPOINT_CLASS)
        # Keep weights device-resident: converted params arrive as host numpy
        # arrays, and feeding them to a jitted call re-uploads them over the
        # host->HBM link every invocation (~2s/call for the larger models).
        # ``device`` (a jax.Device) selects the chip, like the reference's
        # torch device kwarg; default is the first accelerator.
        import jax
        dtype = compute_dtype or default_policy().compute_dtype
        # Pre-cast f32 weights to the compute dtype (bit-identical to the
        # cast the layers do per execution, minus the per-execution HBM
        # read of the f32 copy — runtime.cast_params_for_compute).
        params = cast_params_for_compute(
            params, dtype, keep_f32=PARAMS_KEEP_F32["retinaface"]
        )
        self.params = (
            jax.device_put(params, device) if device is not None
            else jax.device_put(params)
        )
        self.device = device
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self.bucketing = bucketing
        self.model = RetinaFaceModel(compute_dtype=dtype)
        self._detect_fns = {}
        # Per-thread pad buffers: reuse avoids a fresh ~n*bh*bw*3
        # allocation per call, and thread-locality keeps concurrent
        # same-shape calls (per-stream worker threads) from racing on one
        # mutable buffer.
        import threading

        self._pad_local = threading.local()

    def _detect_fn(self, height, width, top_k=None):
        top_k = self.top_k if top_k is None else top_k
        key = (height, width, top_k)
        if key not in self._detect_fns:
            self._detect_fns[key] = make_detect_fn(
                self.model, height, width,
                nms_threshold=self.nms_threshold, top_k=top_k,
            )
        return self._detect_fns[key]

    def call(self, images, threshold=None):
        """Run detection on an (N, H, W, 3) uint8 RGB array.

        Returns a list (per image) of lists of
        ``{'bbox': (4,), 'landmarks': (5, 2), 'score': float32}`` dicts,
        score-descending — the reference wrapper's exact contract
        (wrapper.py:233-236).
        """
        if threshold is None:
            threshold = self.threshold
        import jax

        # Device batches (e.g. tiles sliced in HBM by ops/tiling.py) feed
        # the jitted program directly — pulling them back to the host just
        # to re-upload would double the link traffic. Their shape must
        # already be bucketed (tile batches are, by construction).
        on_device = isinstance(images, jax.Array)
        if not on_device:
            images = np.asarray(images)
        n, h, w = images.shape[:3]
        bh, bw = bucket_shape(h, w, mode=self.bucketing)
        if on_device and (bh, bw) != (h, w):
            # Device arrays normally arrive pre-bucketed (tile batches are,
            # by construction) and feed the program directly; an off-bucket
            # one falls back to the host-padding path below — a d2h+h2d
            # round trip, so warn rather than silently doubling link
            # traffic (and rather than raising: plain jax-array callers
            # were accepted before the device fast path existed).
            from terran_tpu.utils.profiling import get_logger

            get_logger().warning(
                "device-array input at non-bucketed shape %s (bucket %s): "
                "padding on host — pass bucketed shapes to stay on device",
                (h, w), (bh, bw),
            )
            images = np.asarray(images)
            on_device = False
        if (bh, bw) != (h, w):
            # Reuse one pad buffer per padded shape instead of allocating
            # ~n*bh*bw*3 bytes per call (batch-1 latency, VERDICT r1 #7).
            buffers = getattr(self._pad_local, "buffers", None)
            if buffers is None:
                buffers = self._pad_local.buffers = {}
            padded = buffers.get((n, bh, bw))
            if padded is None or padded.dtype != images.dtype:
                # Bound the cache: a long-lived detector fed many distinct
                # (n, bucket) shapes must not accumulate one ~n*bh*bw*3
                # buffer per shape forever. 4 shapes covers steady-state
                # use (one video size + a trailing partial batch).
                if len(buffers) >= 4:
                    buffers.pop(next(iter(buffers)))
                padded = np.zeros((n, bh, bw, 3), dtype=images.dtype)
                buffers[(n, bh, bw)] = padded
            padded[:, :h, :w] = images
            padded[:, h:, :] = 0
            padded[:, :h, w:] = 0
            images = padded

        top_k = self.top_k
        for attempt in range(self.max_escalations + 1):
            detect = self._detect_fn(bh, bw, top_k)
            packed = np.asarray(detect(self.params, images, threshold, w, h))
            boxes, landmarks, scores, mask, overflow = unpack_detections(
                packed
            )
            if not overflow.any() or attempt == self.max_escalations:
                break
            # Saturated: the fixed pre-selection may have dropped real
            # faces. Re-dispatch at doubled capacity (one-time compile per
            # escalated top_k; a steady crowd is a cache hit).
            top_k *= 2
            self.escalation_count += 1
        scores = scores.astype(np.float32)
        if overflow.any():
            from terran_tpu.utils.profiling import get_logger

            get_logger().warning(
                "detection top_k=%d saturated on %d image(s) even after %d "
                "escalation(s); results may drop low-scoring faces — raise "
                "detection_top_k or max_escalations",
                top_k, int(overflow.sum()), self.max_escalations,
            )

        batch_objects = []
        for i in range(n):
            keep = mask[i]
            batch_objects.append([
                {"bbox": b, "landmarks": l, "score": s}
                for b, l, s in zip(boxes[i][keep], landmarks[i][keep],
                                   scores[i][keep])
            ])
        return batch_objects


class Detection:
    """Generic detection task (reference Detection,
    face/detection/__init__.py:185-287)."""

    def __init__(self, checkpoint=None, short_side=None, merge_method="padding",
                 device=None, lazy=False, **model_kwargs):
        if short_side is None:
            short_side = get_config().detection_short_side
        self.device = device
        self.checkpoint = checkpoint
        self.model_kwargs = model_kwargs
        self.detection_cls = get_class_for_checkpoint(TASK_NAME, checkpoint)

        self.model = (
            self.detection_cls(device=self.device, **model_kwargs)
            if not lazy else None
        )
        self.resize_in, self.resize_out = resize_factory(short_side=short_side)
        self.merge_in, self.merge_out = merge_factory(method=merge_method)

    def __repr__(self):
        return f"<Detection({self.detection_cls.__name__})>"

    def __call__(self, images):
        expanded = False
        if (
            not isinstance(images, (list, tuple))
            and len(images.shape) == 3
        ):
            expanded = True
            images = np.expand_dims(images, 0)

        images, resize_params = self.resize_in(images)
        images, merge_params = self.merge_in(images)

        if self.model is None:
            self.model = self.detection_cls(
                device=self.device, **self.model_kwargs
            )
        out = self.model.call(images)

        out = self.merge_out(out, merge_params)
        out = self.resize_out(out, resize_params)

        return out[0] if expanded else out


class _LazyDetection:
    """Import-time placeholder so `face_detection(image)` works like the
    reference's lazy singleton (face/detection/__init__.py:290) without
    touching the checkpoint store on import."""

    _instance = None

    def _resolve(self):
        if self._instance is None:
            self._instance = Detection(lazy=True)
        return self._instance

    def __call__(self, images):
        return self._resolve()(images)


    def __getattr__(self, name):
        # Forward attribute access so the lazy proxy is a drop-in for the
        # real instance (the reference exposes a real object at import) —
        # but never for dunder/underscore probes: pickling, copy, IPython
        # repr machinery and plain hasattr() all probe attributes, and
        # resolving here would read the checkpoint store (and build a
        # model) as a side effect of introspection.
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._resolve(), name)


face_detection = _LazyDetection()
"""Default entry point to face detection."""
