"""Fused Pallas upsample+peak-scan kernel vs the XLA reference path.

Runs through the Pallas interpreter on CPU. Ground truth is
find_peaks(upsample_bicubic(...)) — the oracle-tested XLA formulation.
Scores may differ by float-contraction ulps between the two lowerings, so
scores compare with a tight tolerance while coords/valid/overflow (and
therefore the selected peak SET) compare exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from terran_tpu.ops.fused_peaks import find_peaks_fused, fused_peaks_enabled
from terran_tpu.ops.pose_decode import NUM_PARTS, find_peaks
from terran_tpu.ops.upsample import upsample_bicubic


def reference(heat, threshold, max_peaks):
    ups = upsample_bicubic(jnp.asarray(heat)[None], 8)[0]
    return tuple(map(np.asarray, find_peaks(ups, threshold, max_peaks)))


def fused(heat, threshold, max_peaks, **kw):
    return tuple(map(np.asarray, find_peaks_fused(
        jnp.asarray(heat), threshold, max_peaks, interpret=True, **kw
    )))


def assert_matches(heat, threshold=0.1, max_peaks=16, **kw):
    c0, s0, v0, o0 = reference(heat, threshold, max_peaks)
    c1, s1, v1, o1 = fused(heat, threshold, max_peaks, **kw)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(o0, o1)
    for p in range(heat.shape[-1]):
        n = int(v0[p].sum())
        np.testing.assert_array_equal(c0[p, :n], c1[p, :n])
        np.testing.assert_allclose(s0[p, :n], s1[p, :n], rtol=1e-5)


def test_matches_reference_random(rng):
    heat = rng.normal(scale=0.2, size=(16, 26, 4)).astype(np.float32)
    assert_matches(heat)


def test_matches_reference_sparse_peaks(rng):
    # Non-saturated regime: a few isolated gaussian bumps. Centres sit off
    # the integer grid — symmetric bumps create exact floating-point ties
    # at mirrored neighbours, where the two lowerings may legitimately
    # disagree by one ulp.
    heat = np.zeros((24, 32, 3), np.float32)
    yy, xx = np.mgrid[0:24, 0:32]
    for (cy, cx, a, p) in [(5.3, 7.6, 0.9, 0), (15.8, 20.1, 0.7, 0),
                           (10.4, 10.7, 0.8, 1), (19.6, 27.3, 0.6, 2)]:
        heat[..., p] += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    c1, s1, v1, o1 = fused(heat, 0.1, 8)
    assert not o1.any()  # nothing saturated
    assert_matches(heat, max_peaks=8)


def test_band_remainder_rows(rng):
    # h=20 with band_rows=16 -> the second band covers only 4 real rows.
    heat = rng.normal(scale=0.2, size=(20, 26, 2)).astype(np.float32)
    assert_matches(heat, band_rows=16)


def test_plateau_row_major_order_and_overflow(rng):
    # A constant plateau is one giant knife-edge: every upsampled interior
    # pixel ties its neighbours to within an ulp, so the exact kept SET is
    # lowering-dependent (FMA contraction differs between the XLA and
    # Mosaic pipelines). The contracts that must hold regardless: full
    # saturation is flagged, every slot is valid, scores are at plateau
    # height, and the kept set is emitted in row-major order.
    heat = np.full((12, 14, 2), 0.9, np.float32)
    c1, s1, v1, o1 = fused(heat, 0.1, 4)
    assert v1.all() and o1.all()
    np.testing.assert_allclose(s1, 0.9, rtol=1e-5)
    lin = c1[..., 0].astype(np.int64) * 14 * 8 + c1[..., 1]
    assert (np.diff(lin, axis=-1) > 0).all()


def test_batch_dims(rng):
    heat = rng.normal(scale=0.2, size=(2, 16, 26, 3)).astype(np.float32)
    c, s, v, o = map(np.asarray, find_peaks_fused(
        jnp.asarray(heat), 0.1, 8, interpret=True
    ))
    assert c.shape == (2, 3, 8, 2) and o.shape == (2, 3)
    for b in range(2):
        c0, s0, v0, o0 = reference(heat[b], 0.1, 8)
        np.testing.assert_array_equal(v0, v[b])
        np.testing.assert_array_equal(o0, o[b])
        for p in range(3):
            n = int(v0[p].sum())
            np.testing.assert_array_equal(c0[p, :n], c[b, p, :n])


def test_band_rows_alignment_required(rng):
    heat = rng.normal(size=(16, 26, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        fused(heat, 0.1, 8, band_rows=12)


def test_enabled_resolution():
    assert fused_peaks_enabled("on") is True
    assert fused_peaks_enabled("off") is False
    # 'auto' is False on the CPU test backend.
    assert fused_peaks_enabled("auto") is False


def test_auto_plane_block_fits_probed_vmem_limits():
    """The plane_block auto-sizer must stay within the scoped-vmem
    ceilings probed on real v5e hardware (the CPU interpreter never
    enforces the 16M limit, so an over-sized block only fails on chip —
    exactly how the r4 formula shipped a (36, 14, 14) OOM). Probed
    2026-08-20 (benchmarks/fused_peaks_vmem_probe.py): band 16 fits
    pb<=4 (pb=6 lands 19.3M), band 32 fits pb<=2 (pb=3 lands 16.32M).
    The known-good OpenPose field config (band 24) must keep pb=3 — the
    measured 14.7M production block — not regress to a smaller one."""
    from terran_tpu.ops.fused_peaks import auto_plane_block

    assert 1 <= auto_plane_block(16, 14) <= 4
    assert 1 <= auto_plane_block(32, 81) <= 2
    assert auto_plane_block(24, 41) == 3
    # Degenerate tiny bands still return a sane positive block.
    assert auto_plane_block(8, 9) >= 1
    # Fields wider than one 128-lane tile scale the denominator: a
    # 240-wide native-resolution pose field (2 lane tiles) must halve
    # the budget relative to the 81-wide default field, not ignore the
    # extra tile (the review-caught regression: a lanes=128 constant
    # would have OOMed ~23M at (32, 240)).
    assert auto_plane_block(32, 240) == 1
    # And widths just under a tile boundary count the NEXT tile: the
    # kernel's operand rows are edge-padded by 3 each side.
    assert auto_plane_block(32, 125) == auto_plane_block(32, 240)


def test_row_piece_tie_plateau_flags_overflow():
    """The per-(cell, ry) top-2 pre-selection can only drop candidates
    when one row piece holds 3+ exact-tie peaks (a flat plateau — within
    one piece the interpolant is a single cubic, which otherwise admits
    at most two discrete maxima). A one-row plateau constructs exactly
    that: the XLA path keeps every plateau pixel with NO overflow (count
    fits the slots), and the kernel must raise the overflow flag to mark
    its kept set as incomplete rather than silently dropping."""
    heat = np.zeros((16, 26, 1), np.float32)
    heat[4, 10:14, 0] = 0.9
    c0, s0, v0, o0 = reference(heat, 0.1, 16)
    c1, s1, v1, o1 = fused(heat, 0.1, 16)
    assert int(v0.sum()) > int(v1.sum())   # candidates were dropped...
    assert not o0[0] and bool(o1[0])       # ...and the flag says so
    # Every kept peak is a real XLA-path peak at plateau height.
    kept = {tuple(p) for p in c1[0][v1[0]]}
    ref_scores = {
        tuple(p): s for p, s in zip(c0[0][v0[0]], s0[0][v0[0]])
    }
    assert kept <= set(ref_scores)
    for p, s in zip(c1[0][v1[0]], s1[0][v1[0]]):
        np.testing.assert_allclose(s, ref_scores[tuple(p)], rtol=1e-5)
