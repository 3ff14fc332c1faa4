"""Golden-parity tests against reference outputs on example images.

Fixtures are produced by ``make_goldens.py`` on a machine where the
reference library and its pretrained weights are available (see that
module's docstring); these tests skip when no fixtures exist.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDENS = sorted(GOLDEN_DIR.glob("*.npz")) if GOLDEN_DIR.exists() else []


def _converted_store_ready():
    from terran_tpu.checkpoint import read_checkpoint_db

    db = read_checkpoint_db()
    return all(c["status"] == "DOWNLOADED" for c in db["checkpoints"])


@pytest.mark.skipif(not GOLDENS, reason="no golden fixtures generated")
@pytest.mark.parametrize("golden_path", GOLDENS, ids=lambda p: p.stem)
def test_detection_and_embedding_parity(golden_path):
    if not _converted_store_ready():
        pytest.skip("converted pretrained checkpoints not in store")

    from terran_tpu import extract_features, face_detection, open_image

    golden = np.load(golden_path, allow_pickle=True)
    image = open_image(str(golden["image_path"]))

    faces = face_detection(image)
    assert len(faces) == len(golden["bboxes"])

    got_boxes = np.stack([f["bbox"] for f in faces])
    # Match detections by nearest golden box (order may differ on ties).
    for box in golden["bboxes"]:
        dists = np.abs(got_boxes - box).sum(axis=1)
        assert dists.min() <= 8  # box within a few pixels

    embeddings = extract_features(image, faces)
    cos = (embeddings @ np.asarray(golden["embeddings"]).T)
    # Each golden embedding must have a near-identical counterpart.
    assert (cos.max(axis=0) > 0.99).all()
