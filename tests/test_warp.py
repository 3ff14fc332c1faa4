"""Umeyama estimation and PIL-parity of the on-device affine warp."""

import numpy as np
from PIL import Image

from terran_tpu.ops.warp import (
    ARCFACE_TEMPLATE, alignment_matrix, umeyama, warp_affine,
)


def make_similarity(scale, angle, tx, ty):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(3)
    m[:2, :2] = scale * np.array([[c, -s], [s, c]])
    m[:2, 2] = (tx, ty)
    return m


def test_umeyama_recovers_exact_transform(rng):
    src = rng.uniform(0, 100, size=(5, 2))
    truth = make_similarity(1.7, 0.3, 12.0, -5.0)
    dst = (truth[:2, :2] @ src.T).T + truth[:2, 2]
    est = umeyama(src, dst)
    np.testing.assert_allclose(est, truth, atol=1e-4)


def test_umeyama_least_squares_under_noise(rng):
    src = rng.uniform(0, 100, size=(5, 2))
    truth = make_similarity(0.8, -0.5, 3.0, 40.0)
    dst = (truth[:2, :2] @ src.T).T + truth[:2, 2] + rng.normal(0, 0.5, (5, 2))
    est = umeyama(src, dst)
    # With 0.5px noise on 5 points the translation component can move by
    # ~1px; assert the rotation/scale block tightly and translation loosely.
    np.testing.assert_allclose(est[:2, :2], truth[:2, :2], atol=0.05)
    np.testing.assert_allclose(est[:2, 2], truth[:2, 2], atol=2.0)


def test_umeyama_reflection_guard(rng):
    # Mirrored points must still produce a proper rotation (det=+1 block
    # scaled), not a reflection with negative determinant scale sign flip
    # breaking downstream warps.
    src = rng.uniform(0, 100, size=(5, 2))
    dst = src[:, ::-1]  # a swap = reflection-ish mapping
    est = umeyama(src, dst)
    block = est[:2, :2]
    # scale^2 * det(R) with det(R) = +1 -> det(block) >= 0.
    assert np.linalg.det(block) >= 0


def test_warp_matches_pil(rng):
    image = rng.integers(0, 255, size=(80, 60, 3), dtype=np.uint8)
    for scale, angle, tx, ty in [
        (1.0, 0.0, 0.0, 0.0),
        (0.5, 0.2, 5.0, -3.0),
        (2.0, -0.7, -10.0, 8.0),
    ]:
        inv = np.linalg.inv(make_similarity(scale, angle, tx, ty))[:2]
        pil = Image.fromarray(image).transform(
            size=(48, 56), method=Image.AFFINE, data=inv.flatten(),
            resample=Image.BILINEAR, fillcolor=0,
        )
        expected = np.asarray(pil).astype(np.float32)
        got = np.asarray(warp_affine(image, inv.astype(np.float32),
                                     out_h=56, out_w=48))
        # PIL rounds to uint8; allow 1 count of rounding difference, and
        # compare interiors (PIL's border fill handling is pixel-exact too,
        # but float rounding at exact edges can differ by one count).
        # PIL rounds to uint8 while ours stays float: per-pixel difference is
        # bounded by 1 count and averages ~0.25 over interior pixels.
        assert np.abs(got - expected).max() <= 1.01
        assert np.abs(got - expected).mean() < 0.5


def test_alignment_matrix_maps_template_to_landmarks(rng):
    # alignment_matrix returns the output->input map: applying it to the
    # template must land on the detected landmarks.
    truth = make_similarity(1.3, 0.4, 20.0, 30.0)
    landmarks = (truth[:2, :2] @ ARCFACE_TEMPLATE.T).T + truth[:2, 2]
    inv = alignment_matrix(landmarks)
    back = (inv[:, :2] @ ARCFACE_TEMPLATE.T).T + inv[:, 2]
    np.testing.assert_allclose(back, landmarks, atol=1e-2)



def test_warp_tiny_sources_match_pil(rng):
    # Degenerate 1-pixel-wide/tall sources take the padded fallback; PIL
    # itself accepts them, so parity must hold there too.
    for shape in [(1, 7, 3), (9, 1, 3), (1, 1, 3)]:
        image = rng.integers(0, 255, size=shape, dtype=np.uint8)
        inv = np.linalg.inv(make_similarity(0.5, 0.3, 1.0, -0.5))[:2]
        inv = inv.astype(np.float32)
        pil = Image.fromarray(image).transform(
            size=(6, 8), method=Image.AFFINE, data=inv.flatten(),
            resample=Image.BILINEAR, fillcolor=0,
        )
        got = np.asarray(warp_affine(image, inv, out_h=8, out_w=6))
        assert np.abs(got - np.asarray(pil).astype(np.float32)).max() <= 1.01


def test_windowed_warp_bit_identical(rng):
    from terran_tpu.ops.warp import warp_affine_windowed

    H, W, ws = 200, 300, 128
    image = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    out_h = out_w = 40
    cases = [
        (0.5, 0.3, 60.0, 50.0),    # interior
        (1.2, -0.8, 2.0, 1.0),     # near top-left (edge replication)
        (0.7, 0.1, 250.0, 150.0),  # spills past the right/bottom edges
        (1.0, 2.0, -20.0, -10.0),  # partially outside (fill)
    ]
    for scale, angle, tx, ty in cases:
        inv = np.linalg.inv(make_similarity(scale, angle, tx, ty))[:2]
        inv = inv.astype(np.float32)
        ref = np.asarray(warp_affine(image, inv, out_h=out_h, out_w=out_w))

        # Window placement exactly as the pipeline does it: source bbox of
        # the output corner pixel centres, margin 2, clipped to the frame.
        corners = np.array([[0.5, 0.5], [out_w - 0.5, 0.5],
                            [0.5, out_h - 0.5], [out_w - 0.5, out_h - 0.5]])
        src = corners @ inv[:, :2].T + inv[:, 2]
        oy = int(np.clip(np.floor(src[:, 1].min()) - 2, 0, H - ws))
        ox = int(np.clip(np.floor(src[:, 0].min()) - 2, 0, W - ws))
        extent = (src.max(axis=0) - src.min(axis=0)) + 4
        assert extent.max() <= ws, "test case must fit the window"

        window = image[oy:oy + ws, ox:ox + ws]
        got = np.asarray(warp_affine_windowed(
            window, inv, np.array([oy, ox], np.int32), H, W,
            out_h=out_h, out_w=out_w,
        ))
        np.testing.assert_array_equal(got, ref)


def test_host_warp_numpy_bitwise_matches_device(rng):
    """warp_affine_u8_batch_numpy (the 'host' transfer plan's CPU warp) is
    the device warp's arithmetic twin: identical f32 chain, identical
    half-to-even rounding. XLA may contract the blend's multiply-adds into
    FMAs, so samples landing within one ulp of an exact .5 tie can round
    the other way — the agreement contract is max one count, vanishingly
    few pixels (measured ~1 per 56x48 crop on the CPU backend)."""
    from terran_tpu.ops.warp import warp_affine_u8_batch_numpy

    image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    cases = [
        (0.5, 0.3, 40.0, 30.0),    # interior
        (1.2, -0.8, 1.0, 1.0),     # near top-left (edge replication)
        (0.7, 0.1, 140.0, 100.0),  # spills past right/bottom (fill)
        (1.0, 2.0, -20.0, -10.0),  # partially outside
    ]
    mats = np.stack([
        np.linalg.inv(make_similarity(*c))[:2].astype(np.float32)
        for c in cases
    ])
    got = warp_affine_u8_batch_numpy(image, mats, out_h=56, out_w=48)
    for m, g in zip(mats, got):
        ref = np.asarray(warp_affine(image, m, out_h=56, out_w=48))
        ref_u8 = np.round(ref).astype(np.uint8)
        diff = np.abs(g.astype(int) - ref_u8.astype(int))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 1e-3

    # Degenerate (collinear-landmark) solves produce non-finite matrices;
    # the device gather clamps them to fill — the host twin must too.
    bad = np.full((1, 2, 3), np.nan, np.float32)
    assert (warp_affine_u8_batch_numpy(image, bad) == 0).all()

    # Tiny sources take the same edge-padded fallback as warp_affine.
    tiny = rng.integers(0, 255, size=(1, 7, 3), dtype=np.uint8)
    m = np.linalg.inv(make_similarity(0.5, 0.3, 1.0, -0.5))[:2]
    m = m.astype(np.float32)[None]
    got_t = warp_affine_u8_batch_numpy(tiny, m, out_h=8, out_w=6)
    ref_t = np.round(
        np.asarray(warp_affine(tiny, m[0], out_h=8, out_w=6))
    ).astype(np.uint8)
    np.testing.assert_array_equal(got_t[0], ref_t)


def test_host_warp_cv2_matches_numpy_twin(rng):
    """The cv2 host-warp backend ('auto'/'cv2' fidelity) must sit within
    one uint8 count of the numpy device-twin on interior pixels, zero the
    same outside-frame samples, and zero crops for non-finite matrices.
    cv2's 5-bit fixed-point tap weights give the one-count slack; the
    inside mask is exact (same affine arithmetic)."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    del cv2
    from terran_tpu.ops.warp import (
        warp_affine_u8_batch_cv2, warp_affine_u8_batch_numpy,
    )

    image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    cases = [
        (0.5, 0.3, 40.0, 30.0),    # interior
        (1.2, -0.8, 1.0, 1.0),     # near top-left (edge replication)
        (0.7, 0.1, 140.0, 100.0),  # preimage ENTIRELY outside: all-fill crop
        (1.0, 2.0, 30.0, 40.0),    # partially outside (left/top exits)
    ]
    mats = [
        np.linalg.inv(make_similarity(*c))[:2].astype(np.float32)
        for c in cases
    ]
    # The inverted similarities above all exit the frame through the
    # left/top edges; build the output->source map DIRECTLY so its
    # preimage genuinely crosses x >= W AND y >= H, exercising the
    # right/bottom fill masking of warp_affine_u8_batch_cv2 (which cv2
    # itself would edge-replicate without the explicit outside mask).
    right_bottom = np.array([[1.0, 0.0, 130.0],
                             [0.0, 1.0, 95.0]], np.float32)
    mats.append(right_bottom)   # raw_x in [130.5, 177.5], raw_y in [95.5, 150.5]
    mats = np.stack(mats)
    via_cv2 = warp_affine_u8_batch_cv2(image, mats, out_h=56, out_w=48)
    via_np = warp_affine_u8_batch_numpy(image, mats, out_h=56, out_w=48)
    diff = np.abs(via_cv2.astype(int) - via_np.astype(int))
    assert diff.max() <= 1
    # Outside-frame fill agrees exactly: recompute the inside test (the
    # same affine arithmetic both backends use) and assert both zero it.
    ys = np.arange(56, dtype=np.float32) + 0.5
    xs = np.arange(48, dtype=np.float32) + 0.5
    xg, yg = np.meshgrid(xs, ys)
    for m, c2, np_ in zip(mats, via_cv2, via_np):
        raw_x = m[0, 0] * xg + m[0, 1] * yg + m[0, 2]
        raw_y = m[1, 0] * xg + m[1, 1] * yg + m[1, 2]
        outside = ~((raw_x >= 0) & (raw_x < 160)
                    & (raw_y >= 0) & (raw_y < 120))
        assert (c2[outside] == 0).all()
        assert (np_[outside] == 0).all()

    # Vacuousness guard: every frame edge must actually be crossed by some
    # case, so the fill masking is exercised on all four sides (the r4
    # guard checked only raw_x >= W — which no case hit — and shipped red).
    def _preimage(m):
        return (m[0, 0] * xg + m[0, 1] * yg + m[0, 2],
                m[1, 0] * xg + m[1, 1] * yg + m[1, 2])
    pre = [_preimage(m) for m in mats]
    assert any((rx >= 160).any() for rx, _ in pre), "no case exits right"
    assert any((ry >= 120).any() for _, ry in pre), "no case exits bottom"
    assert any((rx < 0).any() for rx, _ in pre), "no case exits left"
    assert any((ry < 0).any() for _, ry in pre), "no case exits top"
    # And most cases must keep SOME interior pixels, so the <=1-count
    # agreement assertion above isn't comparing all-zero crops (case #2's
    # preimage is deliberately fully outside: it pins the all-fill crop).
    n_interior = sum(
        bool(((rx >= 0) & (rx < 160) & (ry >= 0) & (ry < 120)).any())
        for rx, ry in pre
    )
    assert n_interior >= len(mats) - 1

    bad = np.full((1, 2, 3), np.nan, np.float32)
    assert (warp_affine_u8_batch_cv2(image, bad) == 0).all()


def test_alignment_matrices_batched_matches_scalar(rng):
    from terran_tpu.ops.warp import alignment_matrices

    lmks = []
    for _ in range(20):
        s = rng.uniform(0.2, 3.0)
        theta = rng.uniform(-1.5, 1.5)
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]]) * s
        t = rng.uniform(-50, 400, size=2)
        lmk = (ARCFACE_TEMPLATE - 56.0) @ rot.T + t
        lmks.append(np.round(lmk))  # int-rounded like real landmarks
    # Degenerate case the rank guard covers: collinear points.
    lmks.append(np.stack([np.arange(5), np.arange(5)], axis=1) * 10.0)
    lmks = np.stack(lmks).astype(np.float32)

    batched = alignment_matrices(lmks)
    for i in range(len(lmks)):
        np.testing.assert_array_equal(
            batched[i], alignment_matrix(lmks[i])
        )


def test_grouped_warp_bit_identical(rng):
    """The grouped-slab warp (one (3, 6, C) gather per ``group`` output
    pixels — group-x fewer descriptors on TPU) must be BIT-identical to
    the per-pixel path for every matrix passing grouped_warp_eligible at
    that group, including faces overlapping the frame border (edge
    replication + fill). Covers every group size the dispatcher picks."""
    import jax.numpy as jnp

    from terran_tpu.ops.warp import (
        WARP_GROUPS,
        grouped_warp_eligible,
        warp_affine,
        warp_affine_windowed_grouped,
    )

    H, W, WS = 500, 600, 256
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    corners = np.array([[0.5, 0.5], [111.5, 0.5],
                        [0.5, 111.5], [111.5, 111.5]])

    from terran_tpu.ops.warp import WARP_CONFIGS

    checked = {g: 0 for g in WARP_GROUPS}
    checked_cfg = {cfg: 0 for cfg in WARP_CONFIGS}
    for trial in range(110):
        # Rotations past +-14 deg are exactly what the taller-slab
        # ladder entries (8,(4,7)) / (4,(4,6)) exist for — sample wide
        # enough that each config gets eligible-only-at-that-slab cases.
        s = rng.uniform(0.25, 1.3)
        th = rng.uniform(-0.45, 0.45)
        # Mix interior faces with corner-overlapping ones.
        if trial % 3 == 0:
            cx, cy = rng.uniform(-20, 40), rng.uniform(-20, 40)
        else:
            cx, cy = rng.uniform(120, W - 120), rng.uniform(120, H - 120)
        m = np.array(
            [[s * np.cos(th), -s * np.sin(th), cx],
             [s * np.sin(th), s * np.cos(th), cy]], np.float32
        )
        src = corners @ m[:, :2].T + m[:, 2]
        if (src.max(axis=0) - src.min(axis=0)).max() + 10 > WS:
            continue
        lo = np.floor(src.min(axis=0)) - 3
        oy = int(np.clip(lo[1], 0, H - WS))
        ox = int(np.clip(lo[0], 0, W - WS))
        ref = None
        for group, slab in WARP_CONFIGS:
            if not grouped_warp_eligible(
                m[None], group=group, slab_h=slab[0], slab_w=slab[1]
            )[0]:
                continue
            if ref is None:
                ref = np.asarray(
                    warp_affine(jnp.asarray(frame), jnp.asarray(m))
                )
            got = np.asarray(warp_affine_windowed_grouped(
                jnp.asarray(frame[oy:oy + WS, ox:ox + WS]),
                jnp.asarray(m), jnp.asarray([oy, ox]), H, W, group=group,
                slab=slab,
            ))
            np.testing.assert_array_equal(got, ref)
            checked[group] += 1
            checked_cfg[(group, slab)] += 1
    assert all(c >= 10 for c in checked.values()), checked
    assert all(c >= 10 for c in checked_cfg.values()), checked_cfg


def test_best_warp_group_picks_largest_eligible():
    from terran_tpu.ops.warp import best_warp_group

    # G=8 with its (3, 7) slab admits |m00| <= 5/7; G=4 with (3, 6)
    # admits |m00| <= 4/3 (see GROUP_SLABS).
    small = np.array([[[0.571, 0, 0], [0, 0.571, 0]]])  # 64 px face
    medium = np.array([[[0.7, 0, 0], [0, 0.7, 0]]])     # <= 5/7
    large = np.array([[[1.2, 0, 0], [0, 1.2, 0]]])      # <= 4/3, > 5/7
    huge = np.array([[[1.4, 0, 0], [0, 1.4, 0]]])       # ineligible
    tilted = np.array([[[0.55, 0, 0], [0.16, 0.55, 0]]])  # y-drift > 1/7
    assert best_warp_group(small) == 8
    assert best_warp_group(medium) == 8
    assert best_warp_group(large) == 4
    assert best_warp_group(huge) is None
    assert best_warp_group(tilted) == 4
    # All-or-nothing over the batch: one large face demotes the group.
    assert best_warp_group(np.concatenate([small, large])) == 4


def test_best_warp_config_ladder():
    from terran_tpu.ops.warp import best_warp_config

    small = np.array([[[0.571, 0, 0], [0, 0.571, 0]]])    # 64 px face
    # y-drift in (1/7, 2/7]: fails (8,(3,7)), passes the taller (4,7)
    # slab — the rotation outlier the r4 all-or-nothing dispatch demoted
    # a whole batch to G=4 for (BASELINE.md "49/64 G=8-eligible").
    tilted = np.array([[[0.55, 0, 0], [0.16, 0.55, 0]]])
    large = np.array([[[1.2, 0, 0], [0, 1.2, 0]]])        # <= 4/3, > 5/7
    # Large AND rotated: only (4,(4,6)) admits it.
    large_tilted = np.array([[[1.2, 0, 0], [0.5, 1.2, 0]]])
    huge = np.array([[[1.4, 0, 0], [0, 1.4, 0]]])         # ineligible
    assert best_warp_config(small) == (8, (3, 7))
    assert best_warp_config(tilted) == (8, (4, 7))
    assert best_warp_config(large) == (4, (3, 6))
    assert best_warp_config(large_tilted) == (4, (4, 6))
    assert best_warp_config(huge) is None
    # All-or-nothing over the batch, like the window bucket: one
    # rotation outlier moves the whole batch to the taller slab (NOT
    # down to G=4 — the ladder's point), one huge face to None.
    assert best_warp_config(np.concatenate([small, tilted])) == (8, (4, 7))
    assert best_warp_config(np.concatenate([small, huge])) is None


def test_grouped_warp_eligibility_bounds():
    from terran_tpu.ops.warp import grouped_warp_eligible

    # m00 span: 3 * 1.33 = 3.99 <= 4 eligible; 3 * 1.34 > 4 not.
    ok = np.array([[[1.33, 0, 0], [0.0, 1.33, 0]]])
    too_wide = np.array([[[1.35, 0, 0], [0.0, 1.35, 0]]])
    tilted = np.array([[[1.0, 0, 0], [0.4, 1.0, 0]]])  # m10 too big
    assert grouped_warp_eligible(ok)[0]
    assert not grouped_warp_eligible(too_wide)[0]
    assert not grouped_warp_eligible(tilted)[0]
