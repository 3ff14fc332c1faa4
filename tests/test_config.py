"""Config dataclass + env override tests."""

from terran_tpu.config import Config, load_config


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.detection_short_side == 416
    assert cfg.pose_short_side == 184
    assert cfg.recognition_crop_side == 112
    assert cfg.detection_threshold == 0.5
    assert cfg.nms_iou_threshold == 0.4
    assert cfg.keypoint_threshold == 0.1
    assert cfg.paf_midpoint_threshold == 0.05
    assert cfg.human_score_threshold == 0.4
    assert cfg.reader_buffer_batches == 1
    assert cfg.writer_buffer_frames == 64


def test_env_overrides():
    cfg = load_config(env={
        "TERRAN_TPU_DETECTION_SHORT_SIDE": "208",
        "TERRAN_TPU_NMS_IOU_THRESHOLD": "0.3",
        "TERRAN_TPU_BUCKETING": "pad",
    })
    assert cfg.detection_short_side == 208
    assert cfg.nms_iou_threshold == 0.3
    assert cfg.bucketing == "pad"
    # Untouched fields keep defaults.
    assert cfg.pose_short_side == 184


def test_config_flows_into_runtime_defaults(monkeypatch):
    """TERRAN_TPU_* env overrides actually change runtime behaviour."""
    from terran_tpu import config as config_module
    from terran_tpu.config import load_config

    monkeypatch.setattr(
        config_module, "_config",
        load_config(env={
            "TERRAN_TPU_DETECTION_SHORT_SIDE": "208",
            "TERRAN_TPU_MAX_PEAKS_PER_PART": "12",
            "TERRAN_TPU_DETECTION_TOP_K": "96",
        }),
    )

    from terran_tpu.face.detection import RetinaFaceDetector
    from terran_tpu.pose.openpose import OpenPoseEstimator
    from terran_tpu.utils.convert import convert_openpose, convert_retinaface
    from torch_oracle import (
        random_openpose_state_dict, random_retinaface_state_dict,
    )

    import numpy as np

    rf = RetinaFaceDetector(
        params=convert_retinaface(
            random_retinaface_state_dict(np.random.default_rng(0))
        )
    )
    assert rf.top_k == 96

    op = OpenPoseEstimator(
        params=convert_openpose(
            random_openpose_state_dict(np.random.default_rng(0))
        )
    )
    assert op.max_peaks == 12
    assert op.short_side == 184  # untouched default
