"""TPU OpenPose wrapper: jitted forward + decode, host assembly.

Replaces the reference wrapper (/root/reference/terran/pose/openpose/
wrapper.py:166-485). One jitted program per input shape runs the CPM
forward, x8 bicubic upsampling, peak finding, and all 19 limbs' PAF line
integrals for the whole batch; only fixed-shape score/validity arrays come
back to the host, where greedy matching and human assembly finish the job.
"""

import numpy as np

from terran_tpu.checkpoint import load_checkpoint_params
from terran_tpu.config import get_config
from terran_tpu.models.openpose import (
    BodyPoseModel, Int8BodyPoseModel, quantize_params,
)
from terran_tpu.ops.pose_decode import make_pose_decode
from terran_tpu.pose.assembly import assemble_humans, get_keypoints
from terran_tpu.runtime import (
    PARAMS_KEEP_F32, cast_params_for_compute, default_policy,
)
from terran_tpu.utils.batching import resize_factory


class OpenPoseEstimator:

    CHECKPOINT_CLASS = "terran_tpu.pose.openpose.OpenPoseEstimator"

    def __init__(self, params=None, short_side=None, compute_dtype=None,
                 device=None, max_peaks=None, max_escalations=None,
                 pose_precision=None):
        cfg = get_config()
        short_side = cfg.pose_short_side if short_side is None else short_side
        max_peaks = (
            cfg.max_peaks_per_part if max_peaks is None else max_peaks
        )
        # Overflow escalation: re-dispatch at doubled max_peaks when a part
        # heatmap saturates the fixed peak capacity (the reference's
        # dynamic peak lists cannot drop peaks, wrapper.py:235-262).
        self.max_escalations = (
            cfg.max_escalations if max_escalations is None
            else max_escalations
        )
        self.escalation_count = 0
        if params is None:
            params = load_checkpoint_params(self.CHECKPOINT_CLASS)
        # Keep weights device-resident: converted params arrive as host numpy
        # arrays, and feeding them to a jitted call re-uploads them over the
        # host->HBM link every invocation (~2s/call for the larger models).
        # ``device`` (a jax.Device) selects the chip, like the reference's
        # torch device kwarg; default is the first accelerator.
        import jax
        dtype = compute_dtype or default_policy().compute_dtype
        self.pose_precision = (
            cfg.pose_precision if pose_precision is None
            else pose_precision
        )
        if self.pose_precision == "int8":
            # Opt-in int8 CPM trunk (models.openpose.apply_int8):
            # quantise from the f32 masters; 2x MXU rate, off for
            # parity runs.
            params = quantize_params(params, dtype)
        else:
            # Pre-cast f32 weights to the compute dtype (bit-identical,
            # minus the per-execution HBM read of the f32 copy).
            params = cast_params_for_compute(
                params, dtype, keep_f32=PARAMS_KEEP_F32["openpose"]
            )
        self.params = (
            jax.device_put(params, device) if device is not None
            else jax.device_put(params)
        )
        self.device = device
        self.short_side = short_side
        self.max_peaks = max_peaks

        # Thresholds (reference wrapper.py:177-180), via the config.
        self.keypoint_threshold = cfg.keypoint_threshold
        self.thresh_2 = cfg.paf_midpoint_threshold
        self.human_threshold = cfg.human_score_threshold
        self.downsampling_ratio = 8

        self.model = (
            Int8BodyPoseModel(compute_dtype=dtype)
            if self.pose_precision == "int8"
            else BodyPoseModel(compute_dtype=dtype)
        )
        self._decode_fns = {}
        self._resize_in, _ = resize_factory(short_side=short_side)

    def _decode_fn(self, height, width, max_peaks=None):
        max_peaks = self.max_peaks if max_peaks is None else max_peaks
        key = (height, width, max_peaks)
        if key not in self._decode_fns:
            self._decode_fns[key] = make_pose_decode(
                self.model, height, width,
                keypoint_threshold=self.keypoint_threshold,
                thresh_midpoint=self.thresh_2,
                max_peaks=max_peaks,
                downsampling_ratio=self.downsampling_ratio,
            )
        return self._decode_fns[key]

    def call(self, images):
        """Run pose estimation on an (N, H, W, 3) uint8 RGB batch.

        Returns, per image, a list of ``{'keypoints': (18, 3) int32,
        'score': float}`` dicts — the reference contract (wrapper.py:37-90).
        """
        images = np.asarray(images)
        # The reference resizes inside the wrapper (wrapper.py:206), unlike
        # detection; scale is uniform across the batch.
        resized, scale = self._resize_in(images)
        n, h, w = resized.shape[:3]

        from terran_tpu.ops.pose_decode import unpack_pose_outputs

        max_peaks = self.max_peaks
        for attempt in range(self.max_escalations + 1):
            decode = self._decode_fn(h, w, max_peaks)
            peaks, limbs = decode(self.params, resized)
            (coords, scores, valid, reg, accept,
             overflow) = unpack_pose_outputs(
                np.asarray(peaks), np.asarray(limbs)
            )
            if not overflow.any() or attempt == self.max_escalations:
                break
            # Saturated: weakest peaks were dropped. Re-dispatch at doubled
            # capacity (one-time compile per escalated max_peaks).
            max_peaks *= 2
            self.escalation_count += 1
        if overflow.any():
            from terran_tpu.utils.profiling import get_logger

            get_logger().warning(
                "pose max_peaks=%d saturated on %d part heatmap(s) even "
                "after %d escalation(s); weakest peaks were dropped — raise "
                "max_peaks_per_part or max_escalations",
                max_peaks, int(overflow.sum()), self.max_escalations,
            )

        batch_objects = []
        for i in range(n):
            peaks_by_id, humans = assemble_humans(
                coords[i], scores[i], valid[i], reg[i], accept[i],
                human_threshold=self.human_threshold,
            )
            batch_objects.append(get_keypoints(peaks_by_id, humans, scale))
        return batch_objects
