"""Tiled detection for very large frames.

The reference (and the exact-parity path here) resizes every input to a
short side of ~416px, so a 4K/8K frame loses most of its small faces. The
scaling analogue of 'long context' for this workload (SURVEY §5) is
spatial: split the frame into overlapping tiles at native resolution, run
the detector over the tile batch — which data-parallelises across chips
like any other batch — map the boxes back to global coordinates, and merge
duplicates from the overlap margins with one global NMS.

Detections are equivalent to whole-image inference for any face whose
receptive context fits inside a tile (the overlap must exceed the largest
expected face); faces larger than the overlap should be caught by a
regular resized pass — ``TiledDetector`` can fuse one in.
"""

import functools

import numpy as np

from terran_tpu.ops.nms import nms_fixed


def tile_layout(height, width, tile=1024, overlap=256):
    """Static tile origins covering (height, width).

    Tiles are ``tile`` squares placed every ``tile - overlap`` pixels, with
    the final row/column clamped so every tile lies fully inside the image
    (images smaller than ``tile`` get a single clamped tile).
    """
    if overlap >= tile:
        raise ValueError("overlap must be smaller than tile")
    stride = tile - overlap

    def starts(size):
        if size <= tile:
            return [0]
        last = size - tile
        out = list(range(0, last, stride))
        out.append(last)
        return out

    return [(y, x) for y in starts(height) for x in starts(width)]


def extract_tiles(image, origins, tile=1024):
    """Stack tiles into a (T, tile, tile, C) batch, zero-padding tiles that
    extend past a small image."""
    h, w = image.shape[:2]
    batch = np.zeros((len(origins), tile, tile, image.shape[2]),
                     dtype=image.dtype)
    for idx, (y, x) in enumerate(origins):
        ys = min(tile, h - y)
        xs = min(tile, w - x)
        batch[idx, :ys, :xs] = image[y: y + ys, x: x + xs]
    return batch


@functools.lru_cache(maxsize=32)
def _device_extract_fn(height, width, channels, origins, tile):
    """Jitted device-side equivalent of :func:`extract_tiles` for one
    (shape, origins) combination: the frame crosses the host->device link
    ONCE at native size and the overlapping tiles are sliced out in HBM —
    for a 4K frame with 256px overlaps that is ~2/3 of the bytes the
    host-extracted tile batch would re-upload, plus no host memcpy."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def extract(image):
        ph, pw = max(height, tile), max(width, tile)
        if (ph, pw) != (height, width):
            image = jnp.pad(
                image, ((0, ph - height), (0, pw - width), (0, 0))
            )
        return jnp.stack([
            jax.lax.dynamic_slice(image, (y, x, 0), (tile, tile, channels))
            for y, x in origins
        ])

    return extract


def extract_tiles_device(image, origins, tile=1024):
    """:func:`extract_tiles`, but on device: returns a (T, tile, tile, C)
    jax array; ``image`` may be a host or device array."""
    h, w, c = image.shape
    return _device_extract_fn(h, w, c, tuple(origins), tile)(image)


class TiledDetector:
    """Native-resolution face detection on arbitrarily large frames.

    Wraps a :class:`~terran_tpu.face.detection.RetinaFaceDetector`: the
    tile batch reuses its fixed-shape jitted program (one compilation for
    any image size), and a final fixed-K NMS merges the per-tile results
    in global coordinates.
    """

    def __init__(self, detector, tile=1024, overlap=256, top_k=256,
                 nms_threshold=0.4, device_tiles=None):
        self.detector = detector
        self.tile = tile
        self.overlap = overlap
        self.top_k = top_k
        self.nms_threshold = nms_threshold
        # The tile must be a shape the detector runs unpadded: a multiple
        # of 32 (the coarsest anchor stride) in 'exact' bucketing, and of
        # the 64 px bucket granularity in 'pad' mode — device-extracted
        # tiles reach detector.call as device arrays, which cannot be
        # host-padded to a bucket after the fact.
        multiple = 64 if getattr(detector, "bucketing", "exact") == "pad" \
            else 32
        if tile % multiple:
            raise ValueError(
                f"tile must be a multiple of {multiple} for a detector "
                f"with bucketing={getattr(detector, 'bucketing', 'exact')!r} "
                "so tile batches skip padding"
            )
        self.device_tiles = (
            device_tiles if device_tiles is not None else True
        )

    def __call__(self, image, threshold=0.5):
        """Detect on one (H, W, 3) uint8 image; returns the task-API list of
        ``{'bbox', 'landmarks', 'score'}`` dicts in global pixel coords."""
        image = np.asarray(image)
        origins = tile_layout(image.shape[0], image.shape[1],
                              self.tile, self.overlap)
        if self.device_tiles:
            tiles = extract_tiles_device(image, origins, self.tile)
        else:
            tiles = extract_tiles(image, origins, self.tile)

        per_tile = self.detector.call(tiles, threshold=threshold)

        boxes, landmarks, scores = [], [], []
        for (y, x), faces in zip(origins, per_tile):
            for face in faces:
                box = np.asarray(face["bbox"], dtype=np.float32)
                lmk = np.asarray(face["landmarks"], dtype=np.float32)
                boxes.append(box + [x, y, x, y])
                landmarks.append(lmk + [x, y])
                scores.append(face["score"])

        if not boxes:
            return []

        boxes = np.stack(boxes)
        landmarks = np.stack(landmarks)
        scores = np.asarray(scores, dtype=np.float32)

        # Merge overlap duplicates with one global NMS. top_k is a static
        # jit argument and the candidate count varies per frame, so pad the
        # inputs to a power-of-two bucket and keep top_k fixed — otherwise
        # every distinct detection count would compile a fresh program.
        bucket = 1
        while bucket < len(boxes):
            bucket *= 2
        if bucket > len(boxes):
            pad = bucket - len(boxes)
            boxes = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
            scores = np.concatenate([scores, np.full(pad, -1, np.float32)])

        kb, ks, keep, order, _overflow = nms_fixed(
            boxes, scores, self.nms_threshold,
            score_threshold=threshold, top_k=self.top_k,
        )
        kb = np.asarray(kb)
        ks = np.asarray(ks, dtype=np.float32)
        keep = np.asarray(keep)
        order = np.asarray(order)

        return [
            {
                "bbox": kb[i],
                "landmarks": landmarks[order[i]],
                "score": ks[i],
            }
            for i in np.flatnonzero(keep)
        ]
