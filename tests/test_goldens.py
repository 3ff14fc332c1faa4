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


# ---------------------------------------------------------------------------
# The reference's PUBLISHED outputs, from its quickstart doc
# (/root/reference/docs/usage/quickstart.rst) — an executable spec with
# concrete golden values. Encoded here as pending assertions so the first
# session with network egress (weights downloadable) runs them with zero
# new code: `terran-tpu checkpoint download <id>` x3, then
# `pytest tests/test_goldens.py`.
# ---------------------------------------------------------------------------

# quickstart.rst "Detecting faces": three faces printed for
# many-faces-raw.jpg. NOTE the doc computed these on a (1280, 1920, 3)
# version of the image; the copy now shipped in the reference repo is
# (1799, 2400, 3), so these constants only apply if the image matches the
# doc's shape — the test guards on it.
QUICKSTART_FACES_SHAPE = (1280, 1920, 3)
QUICKSTART_FACES = [
    {"bbox": (1326, 1048, 1475, 1229),
     "landmarks": ((1360, 1115), (1427, 1116), (1390, 1156),
                   (1367, 1183), (1421, 1183)),
     "score": 1.00},
    {"bbox": (590, 539, 690, 667),
     "landmarks": ((604, 583), (647, 586), (615, 612),
                   (608, 633), (642, 635)),
     "score": 0.99},
    {"bbox": (1711, 408, 1812, 530),
     "landmarks": ((1731, 451), (1775, 451), (1747, 477),
                   (1735, 499), (1769, 499)),
     "score": 0.99},
]

# quickstart.rst "Recognizing faces": embedding dim and pairwise cosine
# distances between the rw1/rw2/th sample portraits (not shipped in the
# reference repo — place them under tests/assets/quickstart/{rw1,rw2,th}.jpg
# to activate that part).
QUICKSTART_EMBEDDING_DIM = 512
QUICKSTART_COSINE_RW1_RW2 = 0.5384056568145752
QUICKSTART_COSINE_RW1_TH = 1.0747144743800163
QUICKSTART_COSINE_RW2_TH = 1.06807991117239

# quickstart.rst "Estimating poses": many-poses-raw.jpg has 6 people;
# poses[0] rows the doc prints (keypoint index -> (x, y, visible)).
QUICKSTART_POSE_COUNT = 6
QUICKSTART_POSE0_KEYPOINTS = {
    0: (0, 0, 0),
    1: (714, 351, 1),
    15: (0, 0, 0),
    16: (725, 286, 1),
    17: (678, 292, 1),
}

REFERENCE_EXAMPLES = Path("/root/reference/examples/readme")
ASSETS = Path(__file__).parent / "assets" / "quickstart"


def _skip_unless_store_ready():
    if not _converted_store_ready():
        pytest.skip("converted pretrained checkpoints not in store — run "
                    "`terran-tpu checkpoint download` for all three ids")


def test_quickstart_detection_golden_values():
    """Published bbox/landmark/score triplets must each match a detection
    within tolerance (<1% divergence north star, BASELINE.json)."""
    _skip_unless_store_ready()
    from terran_tpu import face_detection, open_image

    image = open_image(str(REFERENCE_EXAMPLES / "many-faces-raw.jpg"))
    if image.shape != QUICKSTART_FACES_SHAPE:
        pytest.skip(
            f"image is {image.shape}, quickstart values were computed on "
            f"{QUICKSTART_FACES_SHAPE} (doc predates the current asset)"
        )

    faces = face_detection(image)
    boxes = np.stack([f["bbox"] for f in faces])
    for golden in QUICKSTART_FACES:
        dists = np.abs(boxes - np.asarray(golden["bbox"])).max(axis=1)
        match = int(dists.argmin())
        assert dists[match] <= 8, f"no detection near {golden['bbox']}"
        np.testing.assert_allclose(
            faces[match]["landmarks"], golden["landmarks"], atol=8
        )
        assert abs(float(faces[match]["score"]) - golden["score"]) < 0.02


def test_quickstart_recognition_golden_values():
    """Embedding shape + published cosine distances on the rw1/rw2/th
    portraits (assets must be supplied; they are not in the repo)."""
    _skip_unless_store_ready()
    portraits = [ASSETS / f"{name}.jpg" for name in ("rw1", "rw2", "th")]
    if not all(p.exists() for p in portraits):
        pytest.skip("quickstart portrait assets not present under "
                    f"{ASSETS} (rw1.jpg, rw2.jpg, th.jpg)")

    from scipy.spatial.distance import cosine

    from terran_tpu import extract_features, face_detection, open_image

    feats = []
    for path in portraits:
        image = open_image(str(path))
        feat = extract_features(
            image, faces_per_image=face_detection(image)
        )[0]
        assert feat.shape == (QUICKSTART_EMBEDDING_DIM,)
        feats.append(feat)

    rw1, rw2, th = feats
    assert abs(cosine(rw1, rw2) - QUICKSTART_COSINE_RW1_RW2) < 0.01
    assert abs(cosine(rw1, th) - QUICKSTART_COSINE_RW1_TH) < 0.01
    assert abs(cosine(rw2, th) - QUICKSTART_COSINE_RW2_TH) < 0.01


def test_quickstart_pose_golden_values():
    """Six people in many-poses-raw.jpg; the published keypoint rows of
    poses[0] must match within a few pixels."""
    _skip_unless_store_ready()
    from terran_tpu import open_image, pose_estimation

    image = open_image(str(REFERENCE_EXAMPLES / "many-poses-raw.jpg"))
    poses = pose_estimation(image)
    assert len(poses) == QUICKSTART_POSE_COUNT

    kps = np.asarray(poses[0]["keypoints"])
    assert kps.shape == (18, 3) and kps.dtype == np.int32
    for index, (x, y, visible) in QUICKSTART_POSE0_KEYPOINTS.items():
        assert kps[index, 2] == visible
        if visible:
            assert abs(int(kps[index, 0]) - x) <= 4
            assert abs(int(kps[index, 1]) - y) <= 4
