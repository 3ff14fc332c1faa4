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
