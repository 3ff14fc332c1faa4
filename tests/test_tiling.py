"""Tiled large-frame detection: layout math, extraction, and single-tile
equivalence with direct detection."""

import numpy as np
import pytest

from terran_tpu.face.detection import RetinaFaceDetector
from terran_tpu.ops.tiling import (
    TiledDetector, extract_tiles, extract_tiles_device, tile_layout,
)
from terran_tpu.utils.convert import convert_retinaface
from torch_oracle import random_retinaface_state_dict


def test_tile_layout_covers_image():
    for h, w, tile, overlap in [(2160, 3840, 1024, 256), (500, 700, 256, 64),
                                (100, 100, 256, 64)]:
        origins = tile_layout(h, w, tile, overlap)
        covered = np.zeros((h, w), bool)
        for y, x in origins:
            covered[y: y + tile, x: x + tile] = True
            assert y + tile >= min(h, tile) and x + tile >= min(w, tile)
            if h > tile:
                assert y + tile <= h  # clamped inside
            if w > tile:
                assert x + tile <= w
        assert covered.all()


def test_tile_layout_overlap_guarantee():
    origins = tile_layout(2000, 2000, tile=1024, overlap=256)
    ys = sorted({y for y, _ in origins})
    for a, b in zip(ys, ys[1:]):
        assert b - a <= 1024 - 256  # at least `overlap` shared rows


def test_tile_layout_rejects_bad_overlap():
    with pytest.raises(ValueError):
        tile_layout(100, 100, tile=64, overlap=64)


def test_extract_tiles_contents(rng):
    image = rng.integers(0, 255, (300, 500, 3), dtype=np.uint8)
    origins = tile_layout(300, 500, tile=256, overlap=64)
    tiles = extract_tiles(image, origins, tile=256)
    assert tiles.shape == (len(origins), 256, 256, 3)
    for (y, x), t in zip(origins, tiles):
        np.testing.assert_array_equal(t, image[y: y + 256, x: x + 256])


def test_extract_tiles_device_matches_host(rng):
    # Regular case and the small-image zero-padded case.
    for shape in [(300, 500, 3), (100, 90, 3)]:
        image = rng.integers(0, 255, shape, dtype=np.uint8)
        origins = tile_layout(shape[0], shape[1], tile=256, overlap=64)
        host = extract_tiles(image, origins, tile=256)
        dev = np.asarray(extract_tiles_device(image, origins, tile=256))
        np.testing.assert_array_equal(host, dev)


@pytest.fixture(scope="module")
def detector():
    params = convert_retinaface(
        random_retinaface_state_dict(np.random.default_rng(13))
    )
    return RetinaFaceDetector(params=params, top_k=64)


def test_single_tile_equals_direct(detector, rng):
    """An image fitting in one tile must give exactly the direct result."""
    image = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    tiled = TiledDetector(detector, tile=128, overlap=32)

    direct = detector.call(image[None])[0]
    got = tiled(image)

    assert len(got) == len(direct)
    for g, d in zip(got, direct):
        np.testing.assert_allclose(g["bbox"], d["bbox"], atol=1e-3)
        np.testing.assert_allclose(g["score"], d["score"], rtol=1e-6)


def test_device_and_host_tiles_agree(detector, rng):
    image = rng.integers(0, 255, (256, 384, 3), dtype=np.uint8)
    dev = TiledDetector(detector, tile=128, overlap=32, top_k=128)
    host = TiledDetector(detector, tile=128, overlap=32, top_k=128,
                         device_tiles=False)
    fd, fh = dev(image), host(image)
    assert len(fd) == len(fh) and fd
    for a, b in zip(fd, fh):
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-6)


def test_multi_tile_global_coordinates(detector, rng):
    image = rng.integers(0, 255, (256, 384, 3), dtype=np.uint8)
    tiled = TiledDetector(detector, tile=128, overlap=32, top_k=128)
    faces = tiled(image)
    assert isinstance(faces, list) and faces
    for face in faces:
        assert face["landmarks"].shape == (5, 2)
    # Scores sorted descending from the global merge.
    scores = [float(f["score"]) for f in faces]
    assert scores == sorted(scores, reverse=True)
    # The merge leaves no overlapping duplicates above the NMS threshold.
    from terran_tpu.ops.nms import iou_matrix

    boxes = np.stack([f["bbox"] for f in faces])
    ious = np.array(iou_matrix(boxes, boxes))  # writable copy
    np.fill_diagonal(ious, 0.0)
    assert ious.max() <= 0.4 + 1e-5


def test_tile_granularity_respects_pad_bucketing(rng):
    params = convert_retinaface(random_retinaface_state_dict(rng))
    pad_det = RetinaFaceDetector(params=params, bucketing="pad")
    # 992 is a multiple of 32 but not of the 64 px pad bucket: device
    # tiles would reach the jitted program at a non-bucketed shape.
    with pytest.raises(ValueError, match="multiple of 64"):
        TiledDetector(pad_det, tile=992)
    TiledDetector(pad_det, tile=1024)  # fine

    exact_det = RetinaFaceDetector(params=params, bucketing="exact")
    TiledDetector(exact_det, tile=992)  # 32-multiple is enough here
