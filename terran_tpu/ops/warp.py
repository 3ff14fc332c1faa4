"""Similarity-transform estimation and on-device affine warping.

Replaces the reference's face-alignment stack — skimage
``SimilarityTransform.estimate`` + PIL ``Image.transform(AFFINE, BILINEAR)``
(/root/reference/terran/face/recognition/arcface/wrapper.py:52-69) — with:

- :func:`umeyama`: the closed-form least-squares similarity estimate
  (Umeyama 1991, the algorithm skimage implements), host-side numpy on a
  5-point problem.
- :func:`warp_affine`: bilinear inverse-warp sampling on device, vmappable
  over faces, matching PIL's sampling convention: the output pixel grid is
  evaluated at pixel centres, i.e. ``src = M @ (dst + 0.5) - 0.5``, with
  zero fill outside the source (PIL ``fillcolor=0``).

This is the accuracy-critical piece for embedding parity: the aligned
112x112 crops must match the reference's within interpolation rounding.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Canonical 5-landmark destination template for 112x112 alignment
# (arcface/wrapper.py:39-48, including the +8px x-shift for width 112).
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def umeyama(src, dst):
    """Least-squares similarity transform mapping ``src`` points to ``dst``.

    Returns a (3, 3) matrix ``T`` with ``T @ [x, y, 1]^T ~= [x', y', 1]^T``.
    Equivalent to skimage ``SimilarityTransform.estimate(src, dst)``.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    n, d = src.shape

    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst

    cov = dst_c.T @ src_c / n
    u, s, vt = np.linalg.svd(cov)

    sign = np.ones(d)
    if np.linalg.det(cov) < 0:
        sign[-1] = -1
    rank = np.linalg.matrix_rank(cov)
    if rank == d - 1:
        if np.linalg.det(u) * np.linalg.det(vt) < 0:
            sign[-1] = -1
    rotation = u @ np.diag(sign) @ vt

    var_src = (src_c ** 2).sum() / n
    scale = (s * sign).sum() / var_src if var_src > 0 else 1.0

    t = np.eye(3)
    t[:d, :d] = scale * rotation
    t[:d, d] = mu_dst - scale * rotation @ mu_src
    return t.astype(np.float32)


def alignment_matrix(landmarks, template=ARCFACE_TEMPLATE):
    """Inverse (output->input) 2x3 matrix aligning a face to the template.

    The reference estimates landmarks->template and hands PIL the inverse
    (wrapper.py:52-61); this returns that inverse directly.
    """
    forward = umeyama(np.asarray(landmarks, dtype=np.float32), template)
    return np.linalg.inv(forward)[:2].astype(np.float32)


def alignment_matrices(landmarks, template=ARCFACE_TEMPLATE):
    """Batched :func:`alignment_matrix`: (M, 5, 2) -> (M, 2, 3).

    One vectorised Umeyama solve (batched 2x2 SVD) instead of a Python
    loop of tiny solves — the loop costs ~1 ms per face on host, which at
    a hundred faces per batch rivals the DEVICE time of the whole embed
    program. Matches the scalar path: same float64 arithmetic, same LAPACK
    SVD per 2x2 block, same reflection/rank guards.
    """
    src = np.asarray(landmarks, dtype=np.float64)
    if src.ndim != 3:
        raise ValueError("expected (M, points, 2) landmarks")
    m, n, d = src.shape
    dst = np.asarray(template, dtype=np.float64)

    mu_src = src.mean(axis=1)                       # (M, 2)
    mu_dst = dst.mean(axis=0)                       # (2,)
    src_c = src - mu_src[:, None]
    dst_c = dst - mu_dst

    cov = np.einsum("ki,mkj->mij", dst_c, src_c) / n   # (M, 2, 2)
    u, s, vt = np.linalg.svd(cov)                      # batched

    sign = np.ones((m, d))
    neg_det = np.linalg.det(cov) < 0
    sign[neg_det, -1] = -1
    # Rank-deficient (collinear) guard, vectorised like the scalar path:
    # rank d-1 flips the sign when det(u)*det(vt) < 0.
    tol = s[:, 0] * max(cov.shape[1:]) * np.finfo(np.float64).eps
    rank = (s > tol[:, None]).sum(axis=1)
    flip = (rank == d - 1) & (np.linalg.det(u) * np.linalg.det(vt) < 0)
    sign[flip & ~neg_det, -1] = -1

    rotation = u * sign[:, None, :] @ vt               # u @ diag(sign) @ vt
    var_src = (src_c ** 2).sum(axis=(1, 2)) / n
    scale = np.where(
        var_src > 0, (s * sign).sum(axis=1) / np.where(var_src > 0,
                                                       var_src, 1.0), 1.0
    )

    forward = np.zeros((m, 3, 3))
    forward[:, :d, :d] = scale[:, None, None] * rotation
    forward[:, :d, d] = mu_dst - np.einsum(
        "mij,mj->mi", scale[:, None, None] * rotation, mu_src
    )
    forward[:, d, d] = 1.0
    # The scalar path inverts the float32 matrix (umeyama returns f32);
    # invert in f32 here too so results match it bitwise.
    inverse = np.linalg.inv(forward.astype(np.float32))
    return inverse[:, :2].astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_affine(image, matrix, out_h=112, out_w=112):
    """Bilinear inverse-warp of ``image`` (H, W, C) by a 2x3 matrix.

    PIL convention: sample source at ``M @ (dst_idx + 0.5) - 0.5``; samples
    outside the source rectangle contribute the fill value 0.

    TPU cost notes (measured on v5e, scan-timed, 1080p batches):

    - The 2x2 taps are fetched as ONE (2, 2, C) patch gather instead of
      four independent float32 gathers — 4x fewer gather descriptors and
      4x fewer random-access bytes (50.3 -> 24.4 ms for 64 crops,
      identical results).
    - The source is gathered UNPADDED, with PIL's edge-replication of
      border taps reproduced by arithmetic selects on the fetched patch:
      an edge-padded copy of the frames (the earlier formulation) costs an
      operand-sized materialisation at ~4 GB/s — a fixed ~12 ms for an
      8-frame 1080p batch, dominating the warp at low face counts. Every
      INSIDE output pixel has its patch origin in [-1, size-1], so
      clamping the origin to [0, size-2] fetches the right two rows/cols
      except exactly at the borders, where the select duplicates the edge
      row/col — the same values the padded gather produced. Outside
      pixels take whatever taps the clamp yields and are overwritten by
      the fill.

    Sources smaller than 2x2 (degenerate, but PIL accepts them) take a
    padded-gather fallback where the (2, 2) window cannot fit.
    """
    h, w = image.shape[0], image.shape[1]
    if h < 2 or w < 2:
        # Edge-pad up to 2x2 so the patch window fits; the trailing edge
        # replicas make the core's over-fetch correct. The pad is at most
        # a few pixels — the operand-copy cost this function avoids for
        # real images is irrelevant here.
        image = jnp.pad(
            image, ((0, max(0, 2 - h)), (0, max(0, 2 - w)), (0, 0)),
            mode="edge",
        )
    return _warp_affine_core(image, matrix, out_h, out_w, h, w)


def _warp_affine_core(image, matrix, out_h, out_w, h, w, origin=None):
    """warp_affine's body; ``h``/``w`` are the LOGICAL source dims (the
    image may be edge-padded beyond them for the tiny-source fallback —
    edge replication makes the extra taps correct).

    With ``origin`` (y, x), ``image`` is a WINDOW of the logical source
    whose top-left sits at ``origin``: every coordinate computation stays
    in full-source space (same floats, same edge selects, same inside
    test — bit-identical output), and only the gather start shifts into
    window space. The caller guarantees every inside pixel's clamped
    patch origin lies within [origin, origin + window - 2]."""
    ys = jnp.arange(out_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(out_w, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(xs, ys)  # (out_h, out_w)

    # PIL (Geometry.c ImagingGenericTransform + bilinear filter) evaluates
    # the transform at output pixel centres, does the inside test on the RAW
    # coordinates in [0, size), and only then shifts by -0.5 and samples with
    # neighbour taps clamped to the image rectangle (edge replication).
    raw_x = matrix[0, 0] * xg + matrix[0, 1] * yg + matrix[0, 2]
    raw_y = matrix[1, 0] * xg + matrix[1, 1] * yg + matrix[1, 2]
    inside = (raw_x >= 0) & (raw_x < w) & (raw_y >= 0) & (raw_y < h)

    src_x = raw_x - 0.5
    src_y = raw_y - 0.5

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Patch origins clamped so the (2, 2) window stays inside the PHYSICAL
    # array (== logical except in the tiny-source fallback, where trailing
    # edge replicas make any over-fetch correct); border-tap replication
    # against the LOGICAL dims is restored by the selects below.
    if origin is None:
        oy = jnp.clip(y0i, 0, image.shape[0] - 2)
        ox = jnp.clip(x0i, 0, image.shape[1] - 2)
    else:
        # Full-source clamp first (identical tap choice), then shift into
        # window space; the caller's margin guarantee makes the second
        # clip a no-op for inside pixels (outside pixels are fill anyway).
        oy = jnp.clip(jnp.clip(y0i, 0, h - 2) - origin[0],
                      0, image.shape[0] - 2)
        ox = jnp.clip(jnp.clip(x0i, 0, w - 2) - origin[1],
                      0, image.shape[1] - 2)
    starts = jnp.stack([oy.reshape(-1), ox.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patches = jax.lax.gather(
        image, starts, dn, slice_sizes=(2, 2, image.shape[2]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).astype(jnp.float32).reshape(out_h, out_w, 2, 2, image.shape[2])

    p00 = patches[:, :, 0, 0]
    p01 = patches[:, :, 0, 1]
    p10 = patches[:, :, 1, 0]
    p11 = patches[:, :, 1, 1]

    return _blend_taps(p00, p01, p10, p11, x0i, y0i, fx, fy, inside, h, w)


def _blend_taps(p00, p01, p10, p11, x0i, y0i, fx, fy, inside, h, w):
    """Edge-replication selects + bilinear lerp shared by the per-pixel
    and grouped gather paths. ``p_ab`` are the fetched patch values at the
    CLAMPED per-pixel origin (+a rows, +b cols).

    Edge replication (PIL tap clamping): at y0 == -1 both tap rows are
    source row 0 (the fetched row 0); at y0 == h-1 both are row h-1 (the
    fetched row 1). Same for columns.
    """
    ly = (y0i == -1)[..., None]
    hy = (y0i == h - 1)[..., None]
    lx = (x0i == -1)[..., None]
    hx = (x0i == w - 1)[..., None]
    r0c0 = jnp.where(hy, p10, p00)
    r0c1 = jnp.where(hy, p11, p01)
    r1c0 = jnp.where(ly, p00, p10)
    r1c1 = jnp.where(ly, p01, p11)
    v00 = jnp.where(hx, r0c1, r0c0)
    v01 = jnp.where(lx, r0c0, r0c1)
    v10 = jnp.where(hx, r1c1, r1c0)
    v11 = jnp.where(lx, r1c0, r1c1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return jnp.where(inside[..., None], out, 0.0)


def warp_affine_u8_batch_numpy(image, matrices, out_h=112, out_w=112):
    """Host (numpy) twin of :func:`warp_affine` over a batch of matrices,
    rounded to uint8.

    Used by the pipeline's 'host' transfer plan: faces are aligned on the
    host so only the (out_h, out_w) uint8 crops cross the link (~37 KB per
    face vs the megabytes of a full frame or a per-face pixel window).
    Mirrors ``_warp_affine_core`` + ``_blend_taps`` + ``jnp.round``
    operation for operation in the same float32 order (``np.rint`` and
    ``jnp.round`` are both half-to-even), so the crops match the device
    program within ONE rounded count: XLA may contract the bilinear
    blend's multiply-adds into FMAs, so a sample landing within one ulp
    of an exact .5 tie can round the other way (measured ~1 pixel per
    56x48 crop on the CPU backend; everything else is bit-equal). Degenerate matrices (non-finite coordinates from
    a collinear-landmark solve) fall out through the inside test as fill,
    exactly like the device gather's clamp.
    """
    image = np.asarray(image)
    h, w = image.shape[0], image.shape[1]
    if h < 2 or w < 2:
        # Same tiny-source fallback as warp_affine: edge-pad so the 2x2
        # tap window fits; logical dims keep the inside test/selects.
        image = np.pad(
            image, ((0, max(0, 2 - h)), (0, max(0, 2 - w)), (0, 0)),
            mode="edge",
        )
    c = image.shape[2]
    mats = np.asarray(matrices, dtype=np.float32)  # (M, 2, 3)

    ys = np.arange(out_h, dtype=np.float32) + 0.5
    xs = np.arange(out_w, dtype=np.float32) + 0.5
    xg, yg = np.meshgrid(xs, ys)  # (out_h, out_w)

    with np.errstate(invalid="ignore", over="ignore"):
        raw_x = (mats[:, 0, 0, None, None] * xg
                 + mats[:, 0, 1, None, None] * yg
                 + mats[:, 0, 2, None, None])
        raw_y = (mats[:, 1, 0, None, None] * xg
                 + mats[:, 1, 1, None, None] * yg
                 + mats[:, 1, 2, None, None])
        inside = (raw_x >= 0) & (raw_x < w) & (raw_y >= 0) & (raw_y < h)

        src_x = raw_x - np.float32(0.5)
        src_y = raw_y - np.float32(0.5)
        x0 = np.floor(src_x)
        y0 = np.floor(src_y)
        fx = (src_x - x0)[..., None]
        fy = (src_y - y0)[..., None]
        x0i = x0.astype(np.int32)
        y0i = y0.astype(np.int32)

    oy = np.clip(y0i, 0, image.shape[0] - 2)
    ox = np.clip(x0i, 0, image.shape[1] - 2)
    flat = image.reshape(-1, c)
    base = oy.astype(np.int64) * image.shape[1] + ox
    p00 = flat[base].astype(np.float32)  # (M, out_h, out_w, C)
    p01 = flat[base + 1].astype(np.float32)
    p10 = flat[base + image.shape[1]].astype(np.float32)
    p11 = flat[base + image.shape[1] + 1].astype(np.float32)

    # Edge-replication selects, identical to _blend_taps.
    ly = (y0i == -1)[..., None]
    hy = (y0i == h - 1)[..., None]
    lx = (x0i == -1)[..., None]
    hx = (x0i == w - 1)[..., None]
    r0c0 = np.where(hy, p10, p00)
    r0c1 = np.where(hy, p11, p01)
    r1c0 = np.where(ly, p00, p10)
    r1c1 = np.where(ly, p01, p11)
    v00 = np.where(hx, r0c1, r0c0)
    v01 = np.where(lx, r0c0, r0c1)
    v10 = np.where(hx, r1c1, r1c0)
    v11 = np.where(lx, r1c0, r1c1)

    with np.errstate(invalid="ignore"):
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        out = top * (1 - fy) + bot * fy
        out = np.where(inside[..., None], out, np.float32(0.0))
        return np.rint(out).astype(np.uint8)


def warp_affine_u8_batch_cv2(image, matrices, out_h=112, out_w=112):
    """cv2 backend for the 'host' transfer plan's face warp: OpenCV's
    SIMD fixed-point bilinear (5-bit weights), within one uint8 count of
    :func:`warp_affine_u8_batch_numpy` and ~50x faster on a 1-core host
    (the numpy twin spends ~4.7 ms per 112x112 crop; cv2 ~0.1 ms). Same
    family of justification as the cv2 host-RESIZE backend: the
    reference's own host alignment is PIL bilinear
    (arcface/wrapper.py:58-71), to which the device warp is already
    <=1-count parity, so 'auto' fidelity is reference-grade, and 'exact'
    (the numpy twin) remains available for device-twin comparisons.

    Geometry: our matrices map output pixel CENTRES in the
    half-integer-centre convention (pixel (0,0) spans [0,1], centre 0.5)
    to raw source coordinates; cv2's WARP_INVERSE_MAP expects
    integer-centre maps, so the translation column shifts by
    M @ (0.5, 0.5, 0) - 0.5. BORDER_REPLICATE reproduces the device
    warp's edge-tap replication; samples whose CENTRE falls outside the
    frame are zeroed afterwards (the device warp's inside test) — the
    mask is only computed for faces whose crop-corner preimages leave
    the frame (the map is affine, so corners bound every sample).
    Non-finite matrices (collinear-landmark solves) produce zero crops,
    like the twins' inside-test fill.
    """
    import cv2

    image = np.asarray(image)
    h, w = image.shape[0], image.shape[1]
    mats = np.asarray(matrices, dtype=np.float32)  # (M, 2, 3)
    m = mats.shape[0]
    out = np.zeros((m, out_h, out_w) + image.shape[2:], np.uint8)

    corners = np.array(
        [[0.5, 0.5], [out_w - 0.5, 0.5],
         [0.5, out_h - 0.5], [out_w - 0.5, out_h - 0.5]], np.float32
    )
    # (M, 4, 2) raw-coordinate preimages of the output corners.
    pre = np.einsum("pk,mjk->mpj", corners, mats[:, :, :2]) + mats[:, None, :, 2]

    flags = cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
    for i in range(m):
        mat = mats[i]
        if not np.isfinite(mat).all():
            continue
        m_cv = mat.copy()
        m_cv[:, 2] = 0.5 * (mat[:, 0] + mat[:, 1]) + mat[:, 2] - 0.5
        out[i] = cv2.warpAffine(
            image, m_cv, (out_w, out_h), flags=flags,
            borderMode=cv2.BORDER_REPLICATE,
        )
        pi = pre[i]
        if not ((pi[:, 0] >= 0).all() and (pi[:, 0] < w).all()
                and (pi[:, 1] >= 0).all() and (pi[:, 1] < h).all()):
            ys = np.arange(out_h, dtype=np.float32) + 0.5
            xs = np.arange(out_w, dtype=np.float32) + 0.5
            xg, yg = np.meshgrid(xs, ys)
            raw_x = mat[0, 0] * xg + mat[0, 1] * yg + mat[0, 2]
            raw_y = mat[1, 0] * xg + mat[1, 1] * yg + mat[1, 2]
            inside = ((raw_x >= 0) & (raw_x < w)
                      & (raw_y >= 0) & (raw_y < h))
            # Channel-less (H, W) sources take the 2-D mask directly —
            # inside[..., None] would broadcast a 2-D out[i] to 3-D.
            if out[i].ndim == 3:
                inside = inside[..., None]
            out[i] = np.where(inside, out[i], 0)
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "frame_h", "frame_w"))
def warp_affine_windowed(window, matrix, origin, frame_h, frame_w,
                         out_h=112, out_w=112):
    """:func:`warp_affine` against a pre-sliced window of the source.

    ``window`` (ws, ws, C) is the source rows/cols starting at ``origin``
    (y, x) of a logical (frame_h, frame_w) frame; ``matrix`` maps output
    to FULL-FRAME coordinates. Bit-identical to
    ``warp_affine(full_frame, matrix)`` whenever the window covers every
    inside pixel's 2x2 tap patch — the caller sizes/places windows from
    the output quad's source bounding box with margin (see
    ``pipeline._dispatch_adaptive_embed``).

    Why: the patch gather pays an operand-proportional cost on TPU
    (~6 ms residual per 8-frame 1080p batch even pad-free); gathering
    from per-face windows removes it (measured 13.5 -> 7.4 ms for 16
    crops, windows included).
    """
    return _warp_affine_core(window, matrix, out_h, out_w,
                             frame_h, frame_w, origin=origin)


# Grouped-slab geometry: GROUP consecutive output-x pixels share one
# (SLAB_H, SLAB_W, C) gather descriptor. Eligibility (checked by the
# dispatcher against the alignment matrix): the group's source x-span
# |m00|*(GROUP-1) must fit SLAB_W - 2 columns and its y-drift
# |m10|*(GROUP-1) must fit SLAB_H - 2 rows (ceil of the span bounds the
# floor-coordinate spread). For upright faces m10 ~ 0 and m00 is the
# source scale, so faces up to ~1.33x source scale and ~±14 degrees
# qualify — the common case the adaptive dispatcher targets.
GROUP = 4
SLAB_H = 3
SLAB_W = 6
# Candidate group sizes, largest first, with each group's slab geometry.
# Every group must divide out_w (112). A larger group needs a wider slab
# (or a smaller source scale) to fit the group's source x-span: with its
# (3, 7) slab, G=8 admits |m00| <= 5/7 (faces up to ~80 px source) and
# |m10| <= 1/7 (~±14 degrees at 64 px); G=4 keeps the narrower (3, 6)
# slab and admits |m00| <= 4/3 (~149 px), |m10| <= 1/3. Crowds skew
# small, so most batches take G=8 at HALF the descriptors of G=4.
GROUP_SLABS = {8: (3, 7), 4: (3, 6)}
WARP_GROUPS = tuple(sorted(GROUP_SLABS, reverse=True))
# Dispatch ladder, best first: each entry is (group, (slab_h, slab_w)).
# The taller (4, 7) G=8 slab rescues ROTATION outliers — |m10| <= 2/7
# (~+-24 degrees at 64 px) instead of (3, 7)'s 1/7 — at ~2.2 ms over the
# (3, 7) program for a full-occupancy 64-crop batch (measured 21.7 vs
# 19.5) but ~1 ms UNDER the G=4 all-or-nothing fallback those batches
# previously took (22.6; BASELINE.md's "49/64 G=8-eligible" batch).
# Splitting such batches across two dispatches instead was measured and
# rejected: invalid slots still pay the full ArcFace forward
# (~0.21 ms/slot vs the ~0.045 ms/crop G=8-vs-G=4 gather saving), so
# bucket rounding of the second cohort always outweighs the win — see
# docs/architecture.md. The (4, 6) G=4 tail keeps large rotated faces
# (|m00| <= 4/3, |m10| <= 2/3) off the per-pixel fallback entirely.
WARP_CONFIGS = ((8, (3, 7)), (8, (4, 7)), (4, (3, 6)), (4, (4, 6)))
# Window margin that guarantees the slab fit-clip is a no-op for inside
# pixels, whichever config the dispatcher picks (see
# pipeline._dispatch_adaptive_embed): covers the widest slab axis of
# every ladder entry.
SLAB_MARGIN = max(
    max(s for s in slab) for _, slab in WARP_CONFIGS
) - 2


def grouped_warp_eligible(matrices, group=GROUP, slab_h=None, slab_w=None):
    """Per-matrix eligibility for the grouped-slab warp: (M, 2, 3) ->
    (M,) bool. Strictly conservative (ceil-span bound). The slab defaults
    to the group's :data:`GROUP_SLABS` entry."""
    if slab_h is None or slab_w is None:
        slab_h, slab_w = GROUP_SLABS[group]
    m = np.asarray(matrices)
    span_x = np.abs(m[:, 0, 0]) * (group - 1)
    span_y = np.abs(m[:, 1, 0]) * (group - 1)
    return (span_x <= slab_w - 2 - 1e-3) & (span_y <= slab_h - 2 - 1e-3)


def best_warp_group(matrices):
    """Largest group size in :data:`WARP_GROUPS` for which EVERY matrix
    passes :func:`grouped_warp_eligible` at its DEFAULT slab, or None
    (per-pixel fallback). Kept for profiling; the dispatcher uses
    :func:`best_warp_config`, whose ladder also tries taller slabs."""
    for g in WARP_GROUPS:
        if bool(grouped_warp_eligible(matrices, group=g).all()):
            return g
    return None


def best_warp_config(matrices):
    """First :data:`WARP_CONFIGS` ladder entry whose (group, slab) admits
    EVERY matrix, as ``(group, (slab_h, slab_w))``, else None (per-pixel
    fallback). The dispatcher compiles one program per (bucket, window,
    group, slab), so the choice is all-or-nothing per batch, like the
    window bucket — the ladder's taller-slab entries are what keep mixed
    small/rotated batches on a grouped program (see WARP_CONFIGS)."""
    for g, (sh, sw) in WARP_CONFIGS:
        ok = grouped_warp_eligible(matrices, group=g, slab_h=sh, slab_w=sw)
        if bool(ok.all()):
            return g, (sh, sw)
    return None


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "frame_h", "frame_w",
                                             "group", "slab"))
def warp_affine_windowed_grouped(window, matrix, origin, frame_h, frame_w,
                                 out_h=112, out_w=112, group=GROUP,
                                 slab=None):
    """:func:`warp_affine_windowed` with GROUPED gather descriptors.

    One (slab_h, slab_w, C) slab is fetched per ``group`` consecutive
    output pixels of a row instead of one (2, 2, C) patch per pixel —
    ``group``x fewer descriptors, and the per-pixel 2x2 taps are
    recovered from the slab by where-chains over the (tiny, static) slab
    axes on the VPU. The slab defaults to the group's
    :data:`GROUP_SLABS` entry. Bit-identical to the per-pixel path for
    matrices passing :func:`grouped_warp_eligible` at this ``group`` when
    the window carries :data:`SLAB_MARGIN` extra margin (the dispatcher
    sizes windows accordingly).

    Why: gathers are per-descriptor-bound (~25-33 ns each on v5e
    regardless of operand size — see docs/architecture.md); measured raw
    gather cost for the 64-crop full-occupancy batch drops 20.1 -> 11.0
    ms with (3, 6, 3) slabs at a quarter the descriptors (group=4), and
    small-face batches qualify for group=8 with a (3, 7) slab at an
    eighth (full embed program 22.4 -> 19.5 ms; a (4, 7) slab for wider
    rotation tolerance measured 21.7 — the extra row is not worth it).
    """
    slab_h, slab_w = GROUP_SLABS[group] if slab is None else slab
    h, w = frame_h, frame_w
    C = window.shape[2]
    ng = out_w // group
    assert out_w % group == 0

    ys = jnp.arange(out_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(out_w, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(xs, ys)

    raw_x = matrix[0, 0] * xg + matrix[0, 1] * yg + matrix[0, 2]
    raw_y = matrix[1, 0] * xg + matrix[1, 1] * yg + matrix[1, 2]
    inside = (raw_x >= 0) & (raw_x < w) & (raw_y >= 0) & (raw_y < h)

    src_x = raw_x - 0.5
    src_y = raw_y - 0.5
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Clamped per-pixel patch origins in full-source space (identical tap
    # choice to the per-pixel path), grouped along x.
    oy_pix = jnp.clip(y0i, 0, h - 2).reshape(out_h, ng, group)
    ox_pix = jnp.clip(x0i, 0, w - 2).reshape(out_h, ng, group)
    # Slab origin: the group minimum, shifted into window space. The
    # dispatcher's extra margin makes the fit clip a no-op for inside
    # pixels; outside pixels take arbitrary taps and are filled anyway.
    soy = jnp.clip(oy_pix.min(axis=2) - origin[0],
                   0, window.shape[0] - slab_h)
    sox = jnp.clip(ox_pix.min(axis=2) - origin[1],
                   0, window.shape[1] - slab_w)
    dy = jnp.clip(oy_pix - origin[0] - soy[..., None], 0, slab_h - 2)
    dx = jnp.clip(ox_pix - origin[1] - sox[..., None], 0, slab_w - 2)

    starts = jnp.stack([soy.reshape(-1), sox.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    slabs = jax.lax.gather(
        window, starts, dn, slice_sizes=(slab_h, slab_w, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).astype(jnp.float32).reshape(out_h, ng, slab_h, slab_w, C)

    # Tap extraction: where-chains over the static slab axes. Column pick
    # per slab row (cidx = dx + b), then row pick (ridx = dy + a).
    def col_pick(row_vals, cidx):
        acc = jnp.broadcast_to(
            row_vals[:, :, None, 0, :], cidx.shape + (C,)
        )
        for c in range(1, slab_w):
            acc = jnp.where((cidx == c)[..., None],
                            row_vals[:, :, None, c, :], acc)
        return acc

    picked = [
        [col_pick(slabs[:, :, r], dx + b) for b in (0, 1)]
        for r in range(slab_h)
    ]

    def row_pick(a, b):
        acc = picked[a][b]
        for d in range(1, slab_h - 1):
            acc = jnp.where((dy == d)[..., None], picked[d + a][b], acc)
        return acc.reshape(out_h, out_w, C)

    p00 = row_pick(0, 0)
    p01 = row_pick(0, 1)
    p10 = row_pick(1, 0)
    p11 = row_pick(1, 1)

    return _blend_taps(p00, p01, p10, p11, x0i, y0i, fx, fy, inside, h, w)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_affine_batch(image, matrices, out_h=112, out_w=112):
    """Warp many crops out of one source image: matrices (K, 2, 3) ->
    (K, out_h, out_w, C)."""
    return jax.vmap(
        lambda m: warp_affine(image, m, out_h=out_h, out_w=out_w)
    )(matrices)


def umeyama_jax(src, dst):
    """Jit-traceable Umeyama similarity estimate for a (5, 2) point set.

    Same algorithm as :func:`umeyama` but in jnp so alignment matrices can
    be computed inside a fused device pipeline (vmap over faces) instead of
    round-tripping landmarks to the host. Returns the (3, 3) forward matrix.
    """
    n, d = src.shape
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)

    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst

    cov = dst_c.T @ src_c / n
    u, s, vt = jnp.linalg.svd(cov)

    # Reflection guard: flip the last singular direction when det(cov) < 0
    # (the full-rank branch of the Umeyama sign correction; the rank-1
    # degenerate case — collinear landmarks — is not meaningful for faces).
    sign = jnp.where(
        jnp.linalg.det(cov) < 0,
        jnp.array([1.0, -1.0]),
        jnp.array([1.0, 1.0]),
    )
    rotation = u @ jnp.diag(sign) @ vt

    var_src = jnp.maximum((src_c ** 2).sum() / n, 1e-12)
    scale = (s * sign).sum() / var_src

    t = jnp.eye(3)
    t = t.at[:d, :d].set(scale * rotation)
    t = t.at[:d, d].set(mu_dst - scale * rotation @ mu_src)
    return t


def inverse_similarity(matrix3):
    """Invert a (3, 3) similarity transform, returning the (2, 3) block the
    warp consumes. jit-traceable."""
    a = matrix3[:2, :2]
    t = matrix3[:2, 2]
    inv_a = jnp.linalg.inv(a)
    return jnp.concatenate([inv_a, (-inv_a @ t)[:, None]], axis=1)


def alignment_matrices_jax(landmarks, template=None):
    """(K, 5, 2) landmarks -> (K, 2, 3) output->input alignment matrices,
    fully on device (vmapped umeyama + inversion)."""
    if template is None:
        template = ARCFACE_TEMPLATE
    template = jnp.asarray(template)

    def one(lmk):
        return inverse_similarity(umeyama_jax(lmk, template))

    return jax.vmap(one)(landmarks)
