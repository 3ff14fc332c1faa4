"""Opt-in int8 OpenPose trunk (models/openpose.py apply_int8).

Same recipe and parity stance as the ArcFace path
(tests/test_arcface_int8.py): off by default, validated here for
structure and closeness to the f32 forward on random converted weights.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from terran_tpu.models.openpose import (
    BodyPoseModel, Int8BodyPoseModel, apply_int8, quantize_params,
)
from terran_tpu.utils.convert import convert_openpose
from torch_oracle import random_openpose_state_dict

# block0 trunk (12) + stage-1 branches (2 x 5) + stages 2-6 (5 x 2 x 7).
NUM_CONVS = 12 + 10 + 70


@pytest.fixture(scope="module")
def pose_params():
    return convert_openpose(random_openpose_state_dict(
        np.random.default_rng(5)
    ))


def _preprocessed(rng, shape=(1, 48, 64, 3)):
    return (rng.integers(0, 255, shape) / 255.0 - 0.5).astype(np.float32)


def test_quantized_tree_structure(pose_params):
    q = quantize_params(pose_params, jnp.bfloat16)

    def walk(node, found):
        if isinstance(node, dict):
            if "kernel_q" in node:
                assert node["kernel_q"].dtype == jnp.int8
                assert (node["kernel_scale"].shape
                        == node["kernel_q"].shape[-1:])
                # ConvBias biases ride along, cast to the compute dtype.
                assert node["bias"].dtype == jnp.bfloat16
                found.append(node)
            for v in node.values():
                walk(v, found)
        return found

    assert len(walk(q, [])) == NUM_CONVS


def test_int8_outputs_track_f32(pose_params, rng):
    x = _preprocessed(rng)
    paf0, heat0 = map(
        np.asarray, BodyPoseModel().apply({"params": pose_params}, x)
    )
    q = quantize_params(pose_params)
    paf1, heat1 = map(np.asarray, apply_int8(q, x))
    assert paf1.shape == paf0.shape and heat1.shape == heat0.shape
    for a, b in [(paf0, paf1), (heat0, heat1)]:
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.999, corr


def test_duck_typed_model_adapter(pose_params, rng):
    x = _preprocessed(rng)
    q = quantize_params(pose_params)
    model = Int8BodyPoseModel()
    paf_a, heat_a = map(np.asarray, model.apply({"params": q}, x))
    paf_b, heat_b = map(np.asarray, apply_int8(q, x))
    np.testing.assert_array_equal(paf_a, paf_b)
    np.testing.assert_array_equal(heat_a, heat_b)


def test_estimator_int8_contract(pose_params, rng):
    """OpenPoseEstimator(pose_precision='int8') keeps the reference call
    contract; peak positions may shift by quantisation, so only the
    structure is pinned here (numeric closeness is the model-level
    test above; real-weight accuracy is the golden protocol)."""
    from terran_tpu.pose.openpose import OpenPoseEstimator

    est = OpenPoseEstimator(
        params=pose_params, short_side=48, max_peaks=8,
        max_escalations=0, pose_precision="int8",
    )
    out = est.call(rng.integers(0, 255, (1, 72, 96, 3), dtype=np.uint8))
    assert len(out) == 1
    for human in out[0]:
        assert set(human) == {"keypoints", "score"}
        assert human["keypoints"].shape == (18, 3)
