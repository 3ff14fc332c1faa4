"""Pose task API and OpenPose wrapper contract tests (random weights)."""

import numpy as np
import pytest

from terran_tpu.pose import Estimation, Keypoint
from terran_tpu.pose.openpose import OpenPoseEstimator
from terran_tpu.utils.batching import merge_factory
from terran_tpu.utils.convert import convert_openpose
from torch_oracle import random_openpose_state_dict


@pytest.fixture(scope="module")
def estimator():
    sd = random_openpose_state_dict(np.random.default_rng(21))
    params = convert_openpose(sd)
    return OpenPoseEstimator(params=params, short_side=96, max_peaks=16)


def test_keypoint_enum_order():
    assert Keypoint.NOSE.value == 0
    assert Keypoint.L_EAR.value == 17
    assert len(Keypoint) == 18


def test_wrapper_contract(estimator, rng):
    images = rng.integers(0, 255, (2, 192, 256, 3), dtype=np.uint8)
    out = estimator.call(images)
    assert len(out) == 2
    for people in out:
        for person in people:
            assert set(person) == {"keypoints", "score"}
            assert person["keypoints"].shape == (18, 3)
            assert person["keypoints"].dtype == np.int32
            # Present keypoints are scaled back to original coordinates.
            present = person["keypoints"][person["keypoints"][:, 2] == 1]
            assert (present[:, 0] < 256).all() and (present[:, 1] < 192).all()


def test_estimation_task_merge_adjustment(estimator, rng):
    task = Estimation.__new__(Estimation)
    task.device = None
    task.model = estimator
    task.merge_in, task.merge_out = merge_factory(coord_keys=("keypoints",))

    image = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    out = task(image)
    assert isinstance(out, list)

    # List of unequal sizes goes through the pad-merge path.
    out2 = task([image, image[:120]])
    assert len(out2) == 2


def test_wrapper_escalates_on_peak_overflow(rng):
    """A saturated max_peaks re-dispatches at doubled capacity and matches
    a natively big-enough wrapper (round-2 review item #4)."""
    sd = random_openpose_state_dict(np.random.default_rng(21))
    params = convert_openpose(sd)
    images = rng.integers(0, 255, (1, 192, 256, 3), dtype=np.uint8)

    big = OpenPoseEstimator(params=params, short_side=96, max_peaks=16,
                            max_escalations=0)
    out_big = big.call(images)

    esc = OpenPoseEstimator(params=params, short_side=96, max_peaks=4,
                            max_escalations=2)
    out_esc = esc.call(images)
    assert esc.escalation_count >= 1
    assert len(out_esc[0]) == len(out_big[0])
    for he, hb in zip(out_esc[0], out_big[0]):
        np.testing.assert_array_equal(he["keypoints"], hb["keypoints"])
