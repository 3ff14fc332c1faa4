"""Shape-bucketing policy: padded programs mask padding-region anchors."""

import numpy as np
import jax.numpy as jnp
import pytest

from terran_tpu.face.detection import RetinaFaceDetector
from terran_tpu.models.retinaface import (
    RetinaFace, make_detect_fn, unpack_detections,
)
from terran_tpu.runtime import bucket_shape
from terran_tpu.utils.convert import convert_retinaface
from torch_oracle import random_retinaface_state_dict


def test_bucket_shape_modes():
    assert bucket_shape(100, 200, "exact") == (100, 200)
    assert bucket_shape(100, 200, "pad") == (128, 256)
    assert bucket_shape(128, 256, "pad") == (128, 256)
    with pytest.raises(ValueError):
        bucket_shape(1, 1, "bogus")


@pytest.fixture(scope="module")
def params():
    return convert_retinaface(random_retinaface_state_dict(
        np.random.default_rng(9)
    ))


def test_padding_region_anchors_masked(params, rng):
    """With valid_w/valid_h smaller than the program shape, no kept
    detection may sit on an anchor centred in the padding."""
    model = RetinaFace()
    detect = make_detect_fn(model, 128, 128, top_k=64)
    image = np.zeros((1, 128, 128, 3), np.uint8)
    image[:, :96, :96] = rng.integers(0, 255, (1, 96, 96, 3))

    # Unmasked: random weights fire everywhere.
    _, _, scores_full, mask_full, _ = unpack_detections(
        np.asarray(detect(params, image, 0.5, 128, 128)))
    # Masked to the valid 96x96 region.
    boxes, lmks, scores, mask, _ = unpack_detections(
        np.asarray(detect(params, image, 0.5, 96, 96)))

    from terran_tpu.models.retinaface import anchors_for_shape
    anchors = anchors_for_shape(128, 128)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2.0

    # Masking is by feature-map cell: a 1x1 valid region still keeps the
    # first cell of each stride (2 anchors each — what the reference would
    # evaluate for a 1px image), and a 96x96 region keeps at most the
    # ceil(96/stride)^2 cells' anchors.
    _, _, scores_one, mask_one, _ = unpack_detections(
        np.asarray(detect(params, image, 0.0, 1, 1)))
    assert int((np.asarray(scores_one) > 0).sum()) <= 3 * 2
    assert np.asarray(mask).sum() <= np.asarray(mask_full).sum()


def test_detector_pad_bucketing_end_to_end(params, rng):
    # Escalation off: random weights saturate top_k=64, and the escalated
    # programs would add cache entries this shape-reuse test isn't about.
    det = RetinaFaceDetector(params=params, top_k=64, bucketing="pad",
                             max_escalations=0)
    images = rng.integers(0, 255, (1, 100, 150, 3), dtype=np.uint8)
    out = det.call(images)  # runs at (128, 192) internally
    assert isinstance(out[0], list)
    # Program cache keyed on the bucketed shape (+ NMS capacity).
    assert (128, 192, 64) in det._detect_fns

    # A second, slightly different size hits the same bucket -> no recompile.
    images2 = rng.integers(0, 255, (1, 90, 160, 3), dtype=np.uint8)
    det.call(images2)
    assert list(det._detect_fns) == [(128, 192, 64)]


def test_exact_mode_masks_nothing(params, rng):
    """Regression: the in-bounds mask must not drop any anchors when the
    program shape equals the valid size — even when width % stride != 0,
    where the last cell's anchor centres exceed the image width."""
    model = RetinaFace()
    # 100 mod 8/16/32 != 0 -> ceil-sized maps whose last cells have
    # out-of-image centres.
    detect = make_detect_fn(model, 100, 100, top_k=512)
    image = rng.integers(0, 255, (1, 100, 100, 3), dtype=np.uint8)

    # threshold=0 keeps everything above sigmoid floor; with no mask, the
    # kept count must match running with an effectively-infinite valid
    # region.
    _, _, s_exact, m_exact, _ = unpack_detections(
        np.asarray(detect(params, image, 0.0, 100, 100)))
    _, _, s_huge, m_huge, _ = unpack_detections(
        np.asarray(detect(params, image, 0.0, 10_000, 10_000)))
    assert np.asarray(m_exact).sum() == np.asarray(m_huge).sum()
    np.testing.assert_allclose(
        np.asarray(s_exact), np.asarray(s_huge), rtol=1e-6
    )


def test_pad_mode_masks_only_padding_cells(params, rng):
    """Anchors of cells covering the valid region stay; cells wholly in the
    pad margin go."""
    from terran_tpu.models.retinaface import FEATURE_STRIDES, NUM_ANCHORS

    model = RetinaFace()
    detect = make_detect_fn(model, 128, 128, top_k=512)
    image = np.zeros((1, 128, 128, 3), np.uint8)
    image[:, :100, :100] = rng.integers(0, 255, (1, 100, 100, 3))

    _, _, scores, mask, _ = unpack_detections(
        np.asarray(detect(params, image, 0.0, 100, 100)))
    # Expected surviving anchors: ceil(100/s)^2 * A per stride.
    expected = sum(
        (-(-100 // s)) ** 2 * NUM_ANCHORS for s in FEATURE_STRIDES
    )
    # All survivors at threshold 0 pass NMS preselection up to top_k; we
    # can't count them directly post-NMS, so check at the decode level via
    # a huge top_k and score filtering: every nonzero score must come from
    # a valid cell, i.e. the number of nonzero scores <= expected.
    nonzero = int((np.asarray(scores) > 0).sum())
    assert nonzero <= min(expected, 512)
