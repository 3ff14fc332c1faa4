"""Masked fixed-K NMS vs an O(n^2) numpy oracle."""

import numpy as np

from terran_tpu.ops.nms import iou_matrix, nms_fixed, nms_numpy_reference


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, size=(n, 2))
    wh = rng.uniform(5, 60, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_iou_matrix_matches_naive(rng):
    boxes = random_boxes(rng, 32)
    got = np.asarray(iou_matrix(boxes, boxes))
    for i in range(32):
        for j in range(0, 32, 7):
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            expected = inter / (a1 + a2 - inter)
            assert abs(got[i, j] - expected) < 1e-5


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 100)
        scores = rng.uniform(0, 1, size=100).astype(np.float32)

        kept_boxes, kept_scores, keep_mask, order, overflow = nms_fixed(
            boxes, scores, 0.4, score_threshold=0.3, top_k=128
        )
        got = set(np.asarray(order)[np.asarray(keep_mask)].tolist())

        valid = scores >= 0.3
        expected_rel = nms_numpy_reference(boxes[valid], scores[valid], 0.4)
        expected = set(np.flatnonzero(valid)[expected_rel].tolist())
        assert got == expected
        assert not bool(overflow)  # 100 candidates fit in top_k=128


def test_nms_scores_sorted_and_masked(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(0, 1, size=50).astype(np.float32)
    _, kept_scores, keep_mask, _, _ = nms_fixed(
        boxes, scores, 0.4, score_threshold=0.99, top_k=64
    )
    kept_scores = np.asarray(kept_scores)
    keep_mask = np.asarray(keep_mask)
    # Above-0.99 candidates are rare; mask must reflect exactly those.
    assert keep_mask.sum() == (scores >= 0.99).sum()
    finite = kept_scores[np.isfinite(kept_scores)]
    assert np.all(np.diff(finite) <= 1e-6)


def test_nms_empty_input(rng):
    boxes = random_boxes(rng, 10)
    scores = np.zeros(10, np.float32)
    _, _, keep_mask, _, _ = nms_fixed(boxes, scores, 0.4,
                                      score_threshold=0.5, top_k=16)
    assert not np.asarray(keep_mask).any()


def test_nms_overflow_flag_and_topk_semantics(rng):
    """>K above-threshold candidates: overflow is flagged and the keep-set
    equals the oracle run on the K strongest candidates."""
    boxes = random_boxes(rng, 200)
    scores = rng.uniform(0.5, 1.0, size=200).astype(np.float32)

    top_k = 32
    _, _, keep_mask, order, overflow = nms_fixed(
        boxes, scores, 0.4, score_threshold=0.3, top_k=top_k
    )
    assert bool(overflow)
    got = set(np.asarray(order)[np.asarray(keep_mask)].tolist())

    strongest = np.argsort(-scores, kind="stable")[:top_k]
    expected_rel = nms_numpy_reference(boxes[strongest], scores[strongest], 0.4)
    assert got == set(strongest[expected_rel].tolist())

    # Same inputs under a large enough K: no overflow.
    *_, no_overflow = nms_fixed(
        boxes, scores, 0.4, score_threshold=0.3, top_k=256
    )
    assert not bool(no_overflow)


def test_sharded_nms_matches_single_device(rng):
    """Cross-chip NMS (local top-k + all_gather + exact merge) equals the
    single-device result when local capacity suffices."""
    import jax
    from terran_tpu.ops.nms import make_sharded_nms
    from terran_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8)
    a = 1024  # anchors, divisible by 8
    boxes = random_boxes(rng, a)
    scores = rng.uniform(0, 1, size=a).astype(np.float32)

    run = make_sharded_nms(mesh, iou_threshold=0.4, score_threshold=0.5,
                           local_top_k=128, top_k=128)
    sb, ss, smask, _, soverflow = run(boxes, scores)

    rb, rs, rmask, rorder, roverflow = nms_fixed(boxes, scores, 0.4,
                                         score_threshold=0.5, top_k=128)
    got = np.asarray(sb)[np.asarray(smask)]
    expected = np.asarray(rb)[np.asarray(rmask)]
    # Same kept boxes in the same score order.
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ss)[np.asarray(smask)],
        np.asarray(rs)[np.asarray(rmask)], rtol=1e-6,
    )
    # ~512 of 1024 candidates clear the 0.5 threshold, more than the final
    # top_k=128 — both paths must report the same (overflowed) regime.
    assert bool(np.asarray(soverflow)) == bool(np.asarray(roverflow))


def test_sharded_nms_flags_local_overflow(rng):
    """A shard holding more above-threshold candidates than local_top_k
    must raise the overflow flag (exactness no longer guaranteed)."""
    from terran_tpu.ops.nms import make_sharded_nms
    from terran_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8)
    a = 256
    boxes = random_boxes(rng, a)
    scores = rng.uniform(0.6, 1.0, size=a).astype(np.float32)  # all pass

    run = make_sharded_nms(mesh, iou_threshold=0.4, score_threshold=0.5,
                           local_top_k=16, top_k=256)
    *_, overflow = run(boxes, scores)
    assert bool(np.asarray(overflow))  # 32 per shard > local_top_k=16
