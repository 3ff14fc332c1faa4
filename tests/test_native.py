"""Native C++ assembly must match the Python reference implementation."""

import numpy as np
import pytest

from terran_tpu import native
from terran_tpu.ops.pose_decode import LIMBSEQ, NUM_LIMBS, NUM_PARTS
from terran_tpu.pose import assembly


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain available"
)


def random_decode_outputs(rng, k=8, peak_prob=0.5, accept_prob=0.2):
    coords = rng.integers(0, 100, size=(NUM_PARTS, k, 2)).astype(np.int32)
    scores = rng.uniform(0.1, 1.0, size=(NUM_PARTS, k)).astype(np.float32)
    # Valid slots are a prefix, as produced by the device decode.
    counts = rng.binomial(k, peak_prob, size=NUM_PARTS)
    valid = np.zeros((NUM_PARTS, k), bool)
    for p in range(NUM_PARTS):
        valid[p, : counts[p]] = True
    reg = rng.uniform(-0.5, 1.0, size=(NUM_LIMBS, k, k)).astype(np.float32)
    accept = rng.uniform(size=(NUM_LIMBS, k, k)) < accept_prob
    # Acceptance only on valid slots (as the device guarantees).
    for limb in range(NUM_LIMBS):
        sp, dp = LIMBSEQ[limb]
        accept[limb] &= valid[sp][:, None] & valid[dp][None, :]
    return coords, scores, valid, reg, accept


def test_greedy_connections_matches_python(rng):
    for _ in range(20):
        k = 8
        reg = rng.uniform(-0.5, 1.0, size=(k, k)).astype(np.float32)
        accept = rng.uniform(size=(k, k)) < 0.3
        cs, cd = rng.integers(1, k + 1, size=2)
        expected = assembly.greedy_connections(reg, accept, cs, cd)
        got = native.greedy_connections_native(reg, accept, cs, cd)
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_assemble_humans_matches_python(rng):
    mismatches = 0
    for trial in range(15):
        coords, scores, valid, reg, accept = random_decode_outputs(rng)
        _, expected = assembly.assemble_humans(
            coords, scores, valid, reg, accept, use_native=False
        )
        _, got = assembly.assemble_humans(
            coords, scores, valid, reg, accept, use_native=True
        )
        assert got.shape == expected.shape, trial
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_assemble_humans_empty(rng):
    coords = np.zeros((NUM_PARTS, 4, 2), np.int32)
    scores = np.zeros((NUM_PARTS, 4), np.float32)
    valid = np.zeros((NUM_PARTS, 4), bool)
    reg = np.zeros((NUM_LIMBS, 4, 4), np.float32)
    accept = np.zeros((NUM_LIMBS, 4, 4), bool)
    peaks, humans = assembly.assemble_humans(
        coords, scores, valid, reg, accept
    )
    assert peaks.shape == (0, 3)
    assert humans.shape[0] == 0


def test_native_speedup_sanity(rng):
    """The native path should not be slower than Python (soft check).

    Best-of-3 after a warm call on each path: a single-shot comparison is
    flaky under a loaded machine (first native call also pays the ctypes
    library load), and this test shares the box with the rest of the
    suite.
    """
    import time

    coords, scores, valid, reg, accept = random_decode_outputs(
        rng, k=32, peak_prob=0.9, accept_prob=0.3
    )

    def best_of(use_native, reps=3):
        assembly.assemble_humans(coords, scores, valid, reg, accept,
                                 use_native=use_native)  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            assembly.assemble_humans(coords, scores, valid, reg, accept,
                                     use_native=use_native)
            times.append(time.perf_counter() - t0)
        return min(times)

    assert best_of(True) < best_of(False)


def test_assemble_humans_matches_python_dense(rng):
    """Dense acceptance maps produce frequent merge/tiebreak conflicts,
    including 3+ humans matching one connection — the regime where a C++
    shortcut (breaking at the second match) diverged from the reference's
    skip semantics."""
    for trial in range(30):
        coords, scores, valid, reg, accept = random_decode_outputs(
            rng, k=10, peak_prob=0.9, accept_prob=0.7
        )
        _, expected = assembly.assemble_humans(
            coords, scores, valid, reg, accept, use_native=False
        )
        _, got = assembly.assemble_humans(
            coords, scores, valid, reg, accept, use_native=True
        )
        assert got.shape == expected.shape, trial
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
