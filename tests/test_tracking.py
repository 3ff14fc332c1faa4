"""SORT tracking tests: Kalman filter, IoU, association, lifecycle, and
the fixed factory bug."""

import numpy as np
import pytest

from terran_tpu.tracking.face import (
    KalmanTracker, Sort, associate_detections_to_trackers, center_to_corners,
    corners_to_center, face_tracking, iou,
)
from terran_tpu.tracking.kalman import KalmanFilter


def _face(x1, y1, x2, y2, score=0.9):
    return {
        "bbox": np.array([x1, y1, x2, y2], dtype=np.float64),
        "landmarks": np.zeros((5, 2), np.int32),
        "score": score,
    }


def test_iou_values():
    a = np.array([0, 0, 10, 10])
    assert iou(a, a) == 1.0
    assert iou(a, np.array([20, 20, 30, 30])) == 0.0
    # Half overlap: inter 50, union 150.
    np.testing.assert_allclose(iou(a, np.array([0, 5, 10, 15])), 50 / 150)


def test_corners_center_roundtrip():
    bbox = np.array([10.0, 20.0, 50.0, 100.0])
    center = corners_to_center(bbox)
    np.testing.assert_allclose(center.ravel(), [30, 60, 3200, 0.5])
    np.testing.assert_allclose(center_to_corners(center).ravel(), bbox)


def test_kalman_constant_velocity_convergence():
    kf = KalmanFilter(dim_x=2, dim_z=1)
    kf.F = np.array([[1.0, 1.0], [0.0, 1.0]])
    kf.H = np.array([[1.0, 0.0]])
    for t in range(30):
        kf.predict()
        kf.update([2.0 * (t + 1)])
    assert abs(kf.x[1, 0] - 2.0) < 0.2  # velocity estimated
    assert abs(kf.x[0, 0] - 60.0) < 1.0


def test_association_matches_and_threshold():
    faces = [_face(0, 0, 10, 10), _face(100, 100, 110, 110)]
    tracks = np.array([[1, 1, 11, 11], [500, 500, 510, 510]])
    matched, unmatched_faces, unmatched_tracks = (
        associate_detections_to_trackers(faces, tracks)
    )
    assert matched.tolist() == [[0, 0]]
    assert 1 in unmatched_faces
    assert 1 in unmatched_tracks


def test_sort_confirms_after_min_hits():
    sort = Sort(max_age=3, min_hits=2)
    # Frame 1: the brand-new track has no id yet -> filtered out
    # (reference face.py:386-396: new trackers only return when min_hits=0).
    out1 = sort.update([_face(0, 0, 10, 10)])
    assert out1 == []
    # Frame 2: matched within the frame_count <= min_hits grace period.
    out2 = sort.update([_face(1, 1, 11, 11)])
    assert len(out2) == 1 and out2[0]["track"] is not None
    # Frame 3: hits=2 >= min_hits, confirmed outright.
    out3 = sort.update([_face(2, 2, 12, 12)])
    assert len(out3) == 1 and out3[0]["track"] == out2[0]["track"]


def test_sort_evicts_after_max_age():
    sort = Sort(max_age=1, min_hits=0)
    out = sort.update([_face(0, 0, 10, 10)])
    track_id = out[0]["track"]
    assert track_id is not None
    sort.update([])  # age 1
    sort.update([])  # age 2 -> evicted
    out = sort.update([_face(0, 0, 10, 10)])
    assert out[0]["track"] != track_id  # a new identity


def test_sort_keeps_identity_through_motion():
    sort = Sort(max_age=2, min_hits=1)
    ids = []
    for t in range(8):
        out = sort.update([_face(5 * t, 0, 5 * t + 20, 20)])
        if out:
            ids.append(out[0]["track"])
    assert len(set(ids)) == 1


def test_face_tracking_factory_defaults_without_video():
    # The reference crashed here (tracking/face.py:548-552 reads
    # video.framerate even when video is None).
    tracking = face_tracking(detector=_FakeDetector())
    assert tracking.tracker.max_age == 30
    assert tracking.tracker.min_hits == 6


def test_face_tracking_factory_from_video():
    class FakeVideo:
        framerate = 25

    tracking = face_tracking(video=FakeVideo(), detector=_FakeDetector())
    assert tracking.tracker.max_age == 25
    assert tracking.tracker.min_hits == 5


def test_face_tracking_factory_rejects_bad_detector():
    with pytest.raises(ValueError):
        face_tracking(detector=object())


from terran_tpu.face.detection import Detection  # noqa: E402


class _FakeDetector(Detection):
    """Stands in for a Detection instance in factory tests; bypasses the
    checkpoint-store constructor entirely."""

    def __init__(self):
        pass

    def __call__(self, frames):
        return [[_face(0, 0, 10, 10)] for _ in range(len(frames))]


def test_face_tracking_end_to_end_on_frames():
    tracking = face_tracking(detector=_FakeDetector(), min_hits=0)
    frames = np.zeros((3, 32, 32, 3), np.uint8)
    out = tracking(frames)
    assert len(out) == 3
    assert out[0][0]["track"] is not None
    # Single frame -> flat list.
    single = tracking(np.zeros((32, 32, 3), np.uint8))
    assert isinstance(single, list) and single[0]["track"] is not None


def test_face_tracking_accepts_lazy_proxy():
    """Passing the exported face_detection proxy explicitly must work like
    the reference's real singleton (regression: isinstance rejected it)."""
    from terran_tpu.face.detection import face_detection as proxy

    tracking = face_tracking(detector=proxy, max_age=5, min_hits=1)
    assert tracking.detector is proxy
