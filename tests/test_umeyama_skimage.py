"""Pin ``ops.warp.umeyama`` against skimage's ``_umeyama`` semantics.

The reference's ArcFace alignment estimates landmarks -> template via
skimage ``SimilarityTransform.estimate`` (/root/reference/terran/face/
recognition/arcface/wrapper.py:52-61). The reference crosscheck shims
skimage with THIS repo's ``umeyama`` (reference_shims.py), which held the
alignment-estimation side of that crosscheck common by construction —
equivalence was asserted, never tested (r3 verdict Missing #4). This file
closes it two ways:

1. ``_skimage_umeyama`` below is a line-faithful transcription of
   scikit-image's ``transform/_geometric.py::_umeyama`` (the Umeyama 1991
   closed form INCLUDING skimage's exact branch structure: the
   ``det < 0`` d-flip, the rank == dim-1 special case that uses ``U @ V``
   for the rotation while keeping the flipped ``d`` in the scale, and the
   rank-0 NaN return). Every test compares ``ops.warp.umeyama`` against
   it live, over realistic, mirrored, and degenerate landmark sets.
2. ``FIXTURES`` commits the resulting matrices as constants, so a machine
   WITH scikit-image can verify the transcription itself in one line:
   ``SimilarityTransform(); t.estimate(src, TEMPLATE); t.params`` must
   reproduce each matrix. (scikit-image is not installed in this sandbox
   — zero egress — so regenerating the constants from the real library is
   part of the standing first-networked-session checklist.)

Known divergence, deliberate: for rank-0 input (all landmarks identical)
skimage returns an all-NaN matrix, which the reference feeds through
``np.linalg.inv`` into a NaN warp (garbage crop). Ours returns a pure
translation to the template centroid — a strictly graceful superset,
documented here rather than mirrored.
"""

import numpy as np
import pytest

from terran_tpu.ops.warp import ARCFACE_TEMPLATE, umeyama


def _skimage_umeyama(src, dst, estimate_scale=True):
    """Transcription of scikit-image ``_umeyama`` (Umeyama, IEEE TPAMI
    1991), kept branch-for-branch identical to the library so the
    committed fixtures are regenerable from the real thing."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_demean = src - src_mean
    dst_demean = dst - dst_mean
    A = dst_demean.T @ src_demean / num
    d = np.ones((dim,), dtype=np.double)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    T = np.eye(dim + 1, dtype=np.double)
    U, S, V = np.linalg.svd(A)  # V is Vh, as in the library
    rank = np.linalg.matrix_rank(A)
    if rank == 0:
        return np.nan * T
    elif rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(V) > 0:
            T[:dim, :dim] = U @ V
        else:
            s = d[dim - 1]
            d[dim - 1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ V
            d[dim - 1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ V
    if estimate_scale:
        scale = 1.0 / src_demean.var(axis=0).sum() * (S @ d)
    else:
        scale = 1.0
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean.T)
    T[:dim, :dim] *= scale
    return T


TEMPLATE = np.asarray(ARCFACE_TEMPLATE, np.float64)


def _landmark_cases():
    """Deterministic landmark sets: realistic jittered faces at varied
    rotation/scale/translation, a mirrored set (negative-determinant
    covariance -> the d-flip branch), and collinear sets (rank dim-1,
    both the ``U @ V`` and the flipped branch)."""
    rng = np.random.default_rng(2024)
    cases = {}
    for i in range(8):
        ang = rng.uniform(-0.6, 0.6)
        sc = rng.uniform(0.4, 3.0)
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]])
        pts = (TEMPLATE - TEMPLATE.mean(0)) @ rot.T * sc
        pts += rng.uniform(50, 800, 2)
        pts += rng.normal(0, 3.0, pts.shape)
        cases[f"realistic{i}"] = pts
    mirrored = TEMPLATE.copy()
    mirrored[:, 0] = -mirrored[:, 0]
    cases["mirrored"] = mirrored * 2 + 100
    t = np.linspace(0, 1, 5)[:, None]
    col = np.array([10.0, 20.0]) + t * np.array([60.0, 30.0])
    cases["collinear"] = col
    cases["collinear_rev"] = col[::-1].copy()
    return cases


@pytest.mark.parametrize("name", list(_landmark_cases()))
def test_matches_skimage_algorithm(name):
    pts = _landmark_cases()[name]
    expected = _skimage_umeyama(pts, TEMPLATE)
    got = umeyama(pts, TEMPLATE)
    assert not np.isnan(expected).any()
    # ours returns float32; translation entries reach ~1e3, so the f32
    # quantisation alone is ~1e-4 there.
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-6)


def test_rank0_divergence_documented():
    """All-identical landmarks: skimage -> NaN matrix (the reference would
    warp garbage); ours -> translation to the template centroid."""
    pts = np.tile([40.0, 60.0], (5, 1))
    assert np.isnan(_skimage_umeyama(pts, TEMPLATE)).all()
    got = umeyama(pts, TEMPLATE)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[:2, :2], np.eye(2), atol=1e-6)


# Committed fixtures: skimage ``SimilarityTransform.estimate(src,
# TEMPLATE).params`` for three canonical inputs, computed by the
# transcription above (float64, printed at 17 significant digits).
# Regenerate on any scikit-image machine to certify the transcription:
#   from skimage.transform import SimilarityTransform
#   t = SimilarityTransform(); t.estimate(SRC, TEMPLATE); print(t.params)
FIXTURES = {
    # src = TEMPLATE * 1.5 + (20, -10): pure similarity, recovered to
    # float64 rounding (the analytic answer is diag(2/3) and
    # translation (-40/3, 20/3)).
    "scaled_shifted": (
        TEMPLATE * 1.5 + np.array([20.0, -10.0]),
        np.array([
            [6.6666666666666652e-01, 1.0208213965756735e-17,
             -1.3333333333333321e+01],
            [-1.0284048201448416e-17, 6.6666666666666663e-01,
             6.6666666666666572e+00],
            [0.0, 0.0, 1.0],
        ]),
    ),
    # src = x-mirrored TEMPLATE: det(cov) < 0 exercises the d-flip.
    "mirrored_template": (
        np.stack([-TEMPLATE[:, 0], TEMPLATE[:, 1]], axis=1),
        np.array([
            [2.2530229836324134e-01, 2.5334037566820977e-03,
             6.8466828500300920e+01],
            [-2.5334037566820981e-03, 2.2530229836324137e-01,
             5.5559433096887048e+01],
            [0.0, 0.0, 1.0],
        ]),
    ),
    # collinear src (rank 1): the rank == dim-1 branch.
    "collinear": (
        np.array([10.0, 20.0])
        + np.linspace(0, 1, 5)[:, None] * np.array([60.0, 30.0]),
        np.array([
            [0.500415700276693, -0.5623235066731772,
             55.69085439046223],
            [0.5623235066731772, 0.5004157002766928,
             31.893291473388658],
            [0.0, 0.0, 1.0],
        ]),
    ),
}


@pytest.mark.parametrize("name", list(FIXTURES))
def test_committed_fixtures(name):
    src, expected = FIXTURES[name]
    np.testing.assert_allclose(
        _skimage_umeyama(src, TEMPLATE), expected, atol=1e-12, rtol=1e-12
    )
    np.testing.assert_allclose(
        umeyama(src, TEMPLATE), expected, atol=5e-4, rtol=1e-6
    )
