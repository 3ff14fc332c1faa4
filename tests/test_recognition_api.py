"""Recognition task API and ArcFace wrapper contract tests."""

import numpy as np
import pytest

from terran_tpu.face.recognition import (
    ArcFaceRecognizer, Recognition, preprocess_face_no_landmarks,
)
from terran_tpu.ops.warp import ARCFACE_TEMPLATE
from terran_tpu.utils.convert import convert_arcface
from torch_oracle import arcface_forward, random_arcface_state_dict


@pytest.fixture(scope="module")
def recognizer():
    sd = random_arcface_state_dict(np.random.default_rng(11))
    params = convert_arcface(sd)
    return sd, ArcFaceRecognizer(params=params)


def _face_at(cx, cy, size=60.0):
    """A synthetic detection whose landmarks are the template scaled/offset."""
    lmk = ARCFACE_TEMPLATE.copy()
    lmk = (lmk - lmk.mean(axis=0)) * (size / 112.0) + (cx, cy)
    return {
        "bbox": np.array([cx - size / 2, cy - size / 2,
                          cx + size / 2, cy + size / 2], np.int32),
        "landmarks": lmk.astype(np.int32),
        "score": 0.99,
    }


def test_call_with_faces_splits_per_image(recognizer, rng):
    _, rec = recognizer
    images = [
        rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
        rng.integers(0, 255, (150, 300, 3), dtype=np.uint8),
    ]
    faces = [[_face_at(100, 100), _face_at(60, 60)], [_face_at(150, 75)]]
    feats = rec.call(images, faces)
    assert len(feats) == 2
    assert feats[0].shape == (2, 512)
    assert feats[1].shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(feats[0], axis=1), 1.0, rtol=1e-5
    )


def test_int8_recognizer_tracks_native(recognizer, rng):
    """embed_precision='int8' on the task-API wrapper: same contract,
    embeddings close enough to preserve identity ranking."""
    sd, rec = recognizer
    rec8 = ArcFaceRecognizer(
        params=convert_arcface(sd), embed_precision="int8"
    )
    image = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    faces = [[_face_at(100, 100), _face_at(60, 60)]]
    a = rec.call([image], faces)[0]
    b = rec8.call([image], faces)[0]
    assert b.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1.0, rtol=1e-5)
    cos = (a * b).sum(-1)
    assert (cos > 0.97).all(), cos


def test_call_empty_faces(recognizer, rng):
    _, rec = recognizer
    images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)]
    feats = rec.call(images, [[]])
    assert len(feats) == 1 and feats[0].shape == (0, 512)


def test_call_without_landmarks(recognizer, rng):
    _, rec = recognizer
    images = [rng.integers(0, 255, (90, 60, 3), dtype=np.uint8)] * 3
    feats = rec.call(images, None)
    # No-landmark path packs all images as one batch (wrapper.py:149-157).
    assert feats.shape == (3, 512)


def test_embedding_matches_oracle_on_aligned_crop(recognizer, rng):
    """A crop already in template position embeds identically to the torch
    oracle fed the same crop (BGR/CHW for the oracle)."""
    sd, rec = recognizer
    crop = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    got = rec._embed(crop[None].astype(np.float32))
    exp = arcface_forward(
        sd, crop[None, ..., ::-1].transpose(0, 3, 1, 2).astype(np.float32).copy()
    ).numpy()
    exp = exp / np.linalg.norm(exp, axis=1, keepdims=True)
    cos = (got * exp).sum()
    assert cos > 1 - 1e-5


def test_batch_bucketing_consistency(recognizer, rng):
    """Padding the batch to a power of two must not change embeddings."""
    _, rec = recognizer
    crops = rng.integers(0, 255, (3, 112, 112, 3)).astype(np.float32)
    individual = np.concatenate([rec._embed(crops[i: i + 1]) for i in range(3)])
    batched = rec._embed(crops)
    np.testing.assert_allclose(batched, individual, atol=2e-5)


def test_preprocess_no_landmarks_shape(rng):
    image = rng.integers(0, 255, (200, 100, 3), dtype=np.uint8)
    out = preprocess_face_no_landmarks(image, 112)
    assert out.shape == (112, 112, 3)
    # Landscape padding: horizontal centring.
    assert out[:, :27].sum() == 0 and out[:, -27:].sum() == 0


def test_recognition_task_expansion(recognizer, rng):
    _, rec = recognizer
    task = Recognition.__new__(Recognition)
    task.device = None
    task.model = rec
    image = rng.integers(0, 255, (120, 120, 3), dtype=np.uint8)

    # Single image + single face dict.
    out = task(image, _face_at(60, 60))
    assert out.shape == (1, 512)

    # Single image + list of faces.
    out = task(image, [_face_at(60, 60), _face_at(40, 40)])
    assert out.shape == (2, 512)

    # Mismatched ranks raise.
    with pytest.raises(ValueError):
        task([image, image], [[_face_at(60, 60)]])


def test_single_image_without_faces_embeds_whole_image(recognizer, rng):
    """extract_features(image) with no faces arg embeds the whole image via
    the no-landmark path (regression: the expansion used to wrap None into
    [None] and silently return a (0, 512) array)."""
    _, rec = recognizer
    task = Recognition.__new__(Recognition)
    task.device = None
    task.model = rec
    image = rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)
    out = task(image)
    assert out.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-4)
