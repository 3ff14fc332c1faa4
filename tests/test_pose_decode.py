"""Pose decode: peaks, PAF line integrals, greedy matching, assembly.

Oracles here reimplement the reference semantics in plain numpy directly in
the tests (peak rule, line-integral scoring) and hand-constructed scenes
with known people for the assembly."""

import numpy as np
import jax.numpy as jnp

from terran_tpu.ops.pose_decode import (
    LIMBSEQ, MAP_IDX, NUM_LIMBS, NUM_PARTS, find_peaks, limb_scores,
)
from terran_tpu.ops.upsample import upsample_bicubic
from terran_tpu.pose.assembly import (
    assemble_humans, get_keypoints, greedy_connections,
)


def numpy_find_peaks(heatmap, threshold):
    """Reference peak rule (wrapper.py:241-250) in numpy, row-major order."""
    interior = heatmap[1:-1, 1:-1]
    mask = (
        (interior >= heatmap[0:-2, 1:-1])
        & (interior >= heatmap[1:-1, :-2])
        & (interior >= heatmap[2:, 1:-1])
        & (interior >= heatmap[1:-1, 2:])
        & (interior >= threshold)
    )
    return np.argwhere(mask) + 1


def test_find_peaks_matches_numpy(rng):
    heat = rng.normal(scale=0.2, size=(24, 30, NUM_PARTS)).astype(np.float32)
    coords, scores, valid, overflow = find_peaks(
        jnp.asarray(heat), 0.1, max_peaks=256
    )
    coords, scores, valid = map(np.asarray, (coords, scores, valid))
    assert not np.asarray(overflow).any()
    for p in range(NUM_PARTS):
        expected = numpy_find_peaks(heat[..., p], 0.1)
        n = valid[p].sum()
        assert n == len(expected)
        np.testing.assert_array_equal(coords[p, :n], expected)
        np.testing.assert_allclose(
            scores[p, :n],
            heat[expected[:, 0], expected[:, 1], p],
            rtol=1e-6,
        )


def test_find_peaks_overflow_keeps_strongest_row_major(rng):
    """Oversubscribed part: the K highest-scoring peaks survive, re-ordered
    row-major, and the part's overflow flag is set."""
    heat = np.zeros((12, 12, NUM_PARTS), np.float32)
    # 8 isolated peaks with distinct scores, scattered over the interior.
    spots = [(1, 1, 0.2), (1, 6, 0.9), (3, 3, 0.4), (4, 9, 0.8),
             (6, 2, 0.3), (7, 7, 0.7), (9, 4, 0.6), (10, 10, 0.5)]
    for y, x, v in spots:
        heat[y, x, :] = v

    coords, scores, valid, overflow = find_peaks(
        jnp.asarray(heat), 0.1, max_peaks=4
    )
    coords, scores, valid = map(np.asarray, (coords, scores, valid))
    assert np.asarray(overflow).all()
    assert valid.all()
    # Top-4 by score: 0.9@(1,6), 0.8@(4,9), 0.7@(7,7), 0.6@(9,4) — emitted
    # row-major, exactly the order the reference's torch.nonzero would give
    # for this subset.
    np.testing.assert_array_equal(
        coords[0], [[1, 6], [4, 9], [7, 7], [9, 4]]
    )
    np.testing.assert_allclose(scores[0], [0.9, 0.8, 0.7, 0.6], rtol=1e-6)


def test_find_peaks_plateau_tie_break(rng):
    heat = np.full((10, 10, NUM_PARTS), 0.9, np.float32)  # plateau: all peaks
    coords, scores, valid, overflow = find_peaks(
        jnp.asarray(heat), 0.1, max_peaks=4
    )
    coords, valid = np.asarray(coords), np.asarray(valid)
    assert valid.all()
    assert np.asarray(overflow).all()
    # Equal scores tie-break toward earlier row-major positions, so the
    # first interior row still comes first.
    np.testing.assert_array_equal(coords[0, 0], [1, 1])
    np.testing.assert_array_equal(coords[0, 1], [1, 2])


def test_limb_scores_sampled_bitwise_matches_materialized(rng):
    """The production path samples the bicubic field at segment points
    (limb_scores_sampled); it must be bit-identical to scoring against the
    fully materialised upsample."""
    from terran_tpu.ops.pose_decode import limb_scores_sampled
    from terran_tpu.ops.upsample import upsample_bicubic

    h, w, k, factor = 24, 30, 6, 8
    pafs_small = rng.normal(scale=0.3, size=(h, w, 38)).astype(np.float32)
    coords = rng.integers(
        0, min(h, w) * factor - 1, size=(NUM_PARTS, k, 2)
    ).astype(np.int32)
    valid = rng.uniform(size=(NUM_PARTS, k)) < 0.7

    pafs_up = upsample_bicubic(
        jnp.asarray(pafs_small)[None], factor
    )[0]
    reg_ref, accept_ref = limb_scores(
        pafs_up, jnp.asarray(coords), jnp.asarray(valid), 0.05
    )
    reg_got, accept_got = limb_scores_sampled(
        jnp.asarray(pafs_small), factor, jnp.asarray(coords),
        jnp.asarray(valid), 0.05
    )
    np.testing.assert_array_equal(np.asarray(reg_got), np.asarray(reg_ref))
    np.testing.assert_array_equal(
        np.asarray(accept_got), np.asarray(accept_ref)
    )


def test_limb_scores_matmul_bitwise_matches_gather(rng):
    """The one-hot-matmul sampler (limb_scores_matmul — MXU contraction
    instead of per-sample gather descriptors) must be BIT-identical to
    limb_scores: the indicator rows have a single 1.0, so every sampled
    value is exact, and the downstream _score_pairs arithmetic is shared.
    Covers full/empty/degenerate validity and out-of-field coordinates
    (clipped identically)."""
    from terran_tpu.ops.pose_decode import limb_scores_matmul

    h, w, k = 96, 160, 7
    pafs = rng.normal(scale=0.3, size=(h, w, 38)).astype(np.float32)
    coords = rng.integers(
        -4, max(h, w) + 4, size=(NUM_PARTS, k, 2)
    ).astype(np.int32)
    for valid in (
        rng.uniform(size=(NUM_PARTS, k)) < 0.7,
        np.ones((NUM_PARTS, k), bool),
        np.zeros((NUM_PARTS, k), bool),
    ):
        reg_ref, accept_ref = limb_scores(
            jnp.asarray(pafs), jnp.asarray(coords), jnp.asarray(valid),
            0.05,
        )
        reg_got, accept_got = limb_scores_matmul(
            jnp.asarray(pafs), jnp.asarray(coords), jnp.asarray(valid),
            0.05,
        )
        np.testing.assert_array_equal(
            np.asarray(reg_got), np.asarray(reg_ref)
        )
        np.testing.assert_array_equal(
            np.asarray(accept_got), np.asarray(accept_ref)
        )


def _upsampled_size(s):
    return s


def test_limb_scores_against_numpy(rng):
    h, w, k = 40, 56, 8
    pafs = rng.normal(scale=0.3, size=(h, w, 38)).astype(np.float32)
    coords = rng.integers(0, min(h, w) - 1, size=(NUM_PARTS, k, 2)).astype(
        np.int32
    )
    valid = rng.uniform(size=(NUM_PARTS, k)) < 0.7

    reg, accept = limb_scores(
        jnp.asarray(pafs), jnp.asarray(coords), jnp.asarray(valid), 0.05
    )
    reg, accept = np.asarray(reg), np.asarray(accept)

    for limb in range(0, NUM_LIMBS, 5):
        src_p, dst_p = LIMBSEQ[limb]
        cx, cy = MAP_IDX[limb]
        for i in range(0, k, 3):
            for j in range(0, k, 3):
                if not (valid[src_p, i] and valid[dst_p, j]):
                    assert not accept[limb, i, j]
                    continue
                src = coords[src_p, i].astype(np.float32)
                dst = coords[dst_p, j].astype(np.float32)
                diff = dst - src
                norm = np.linalg.norm(diff)
                if norm == 0:
                    assert not accept[limb, i, j]
                    continue
                direction = diff / norm
                # torch.linspace arithmetic in float32: start + i*step.
                ts = np.arange(10, dtype=np.float32)
                seg = (
                    src[None] + (diff / 9.0)[None] * ts[:, None]
                ).astype(np.int64)
                mids = (
                    pafs[seg[:, 0], seg[:, 1], cx] * direction[1]
                    + pafs[seg[:, 0], seg[:, 1], cy] * direction[0]
                )
                expected_reg = mids.mean() + min(0.5 * h / norm - 1, 0)
                np.testing.assert_allclose(
                    reg[limb, i, j], expected_reg, rtol=1e-4, atol=1e-5
                )
                expected_accept = (
                    ((mids > 0.05).sum() > 8) and (expected_reg > 0)
                )
                assert bool(accept[limb, i, j]) == expected_accept


def test_greedy_connections_order_and_exclusivity():
    reg = np.array([
        [0.9, 0.8, 0.0],
        [0.85, 0.2, 0.0],
        [0.0, 0.0, 0.5],
    ])
    accept = reg > 0.1
    conns = greedy_connections(reg, accept, 3, 3)
    # Highest score (0,0)=0.9 first; (0,1)/(1,0) blocked by reuse of 0;
    # (1,1)=0.2 next; (2,2)=0.5 comes before 0.2.
    got = [(int(a), int(b)) for a, b, _ in conns]
    assert got == [(0, 0), (2, 2), (1, 1)]


def test_greedy_connections_respects_min_count():
    reg = np.array([[0.9, 0.8], [0.7, 0.6]])
    accept = np.ones_like(reg, bool)
    conns = greedy_connections(reg, accept, 1, 2)  # min count 1 -> stop at 1
    assert len(conns) == 1


def _scene_with_people(people, shape=(96, 128)):
    """Synthetic heatmaps/PAFs for a list of people given as dicts
    part -> (y, x). Heatmap bumps at keypoints; PAFs filled along limbs."""
    h, w = shape
    heat = np.zeros((h, w, 19), np.float32)
    pafs = np.zeros((h, w, 38), np.float32)
    for person in people:
        for part, (y, x) in person.items():
            heat[y, x, part] = 1.0
        for limb in range(NUM_LIMBS):
            src_p, dst_p = LIMBSEQ[limb]
            if src_p not in person or dst_p not in person:
                continue
            src = np.array(person[src_p], np.float64)
            dst = np.array(person[dst_p], np.float64)
            direction = (dst - src) / max(np.linalg.norm(dst - src), 1e-6)
            cx, cy = MAP_IDX[limb]
            for t in np.linspace(0, 1, 40):
                y, x = (src + (dst - src) * t).astype(int)
                # Paint a thick stroke so integer sampling hits it.
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy = np.clip(y + dy, 0, h - 1)
                        xx = np.clip(x + dx, 0, w - 1)
                        pafs[yy, xx, cx] = direction[1]
                        pafs[yy, xx, cy] = direction[0]
    return heat, pafs


def _person(origin, spread=24):
    """A full 18-part person laid out on a grid around origin."""
    oy, ox = origin
    layout = {}
    for part in range(NUM_PARTS):
        layout[part] = (oy + (part // 6) * (spread // 3),
                        ox + (part % 6) * (spread // 4))
    return layout


def test_assembly_two_people_end_to_end():
    p1 = _person((10, 8))
    p2 = _person((60, 70))
    heat, pafs = _scene_with_people([p1, p2])

    coords, scores, valid, _ = find_peaks(jnp.asarray(heat[..., :18]), 0.1, 16)
    reg, accept = limb_scores(
        jnp.asarray(pafs), coords, valid, 0.05
    )
    peaks_by_id, humans = assemble_humans(
        *map(np.asarray, (coords, scores, valid, reg, accept))
    )
    assert humans.shape[0] == 2
    detections = get_keypoints(peaks_by_id, humans, scale=1.0)
    assert len(detections) == 2

    found = sorted(
        [{tuple(kp[:2]) for kp in d["keypoints"] if kp[2]} for d in detections],
        key=lambda s: min(s),
    )
    expected = sorted(
        [{(x, y) for (y, x) in p.values()} for p in (p1, p2)],
        key=lambda s: min(s),
    )
    assert found == expected


def test_get_keypoints_scale_truncation():
    peaks = np.array([[10.0, 21.0, 0.9]])
    humans = np.ones((1, 20)) * -1
    humans[0, 0] = 0
    humans[0, -1] = 4
    humans[0, -2] = 2.0
    dets = get_keypoints(peaks, humans, scale=2.0)
    # x = 21/2 -> 10 (truncation, reference wrapper.py:78-80), y = 10/2 = 5.
    np.testing.assert_array_equal(dets[0]["keypoints"][0], [10, 5, 1])
    assert dets[0]["score"] == 0.5


def test_limb_scores_wide_index_branch_matches(monkeypatch, rng):
    """Fields too large for a flat int32 gather index take a 2-component
    descriptor; both formulations must score identically."""
    import terran_tpu.ops.pose_decode as pd

    h, w = 48, 64
    pafs = rng.normal(size=(h, w, 38)).astype(np.float32)
    coords = np.stack([
        rng.integers(0, h, (18, 4)), rng.integers(0, w, (18, 4))
    ], axis=-1).astype(np.int32)
    valid = rng.random((18, 4)) < 0.7

    reg_a, acc_a = pd.limb_scores(pafs, coords, valid, 0.05)
    monkeypatch.setattr(pd, "_FLAT_INDEX_LIMIT", 0)  # force the wide branch
    reg_b, acc_b = pd.limb_scores(pafs, coords, valid, 0.05)
    np.testing.assert_array_equal(np.asarray(reg_a), np.asarray(reg_b))
    np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))


def test_segment_endpoint_truncation_invariant():
    """limb_scores gathers segment samples 0 and M-1 once per (limb,
    peak) — valid only because the f32 linspace arithmetic truncates
    EXACTLY onto the src/dst pixels for every integer coordinate pair
    the field can produce. Guard that invariant exhaustively up to the
    largest upsampled extent the defaults reach (short side 184 -> x8
    field 1472 rows), so a NUM_MIDPOINTS or arithmetic change that
    breaks the dedup fails loudly here."""
    from terran_tpu.ops.pose_decode import NUM_MIDPOINTS

    n = 1536
    a = np.arange(n, dtype=np.float32)[:, None]
    b = np.arange(n, dtype=np.float32)[None, :]
    m1 = np.float32(NUM_MIDPOINTS - 1)
    step = ((b - a) / m1).astype(np.float32)
    end = (a + step * m1).astype(np.float32)
    assert (end.astype(np.int64) == b.astype(np.int64)).all()
    start = (a + step * np.float32(0)).astype(np.float32)
    assert (start.astype(np.int64) == a.astype(np.int64)).all()
