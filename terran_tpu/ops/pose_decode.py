"""On-device OpenPose decode: peak finding and PAF line-integral scoring.

TPU-native replacement for the reference's per-image Python decode loop
(/root/reference/terran/pose/openpose/wrapper.py:226-366), which ping-pongs
between device tensors and host numpy per limb. Here the whole batch is
decoded in one jitted program with fixed-size masked outputs:

- **Peaks** (wrapper.py:235-262): 4-neighbour local maxima over each of the
  18 part heatmaps, `>=` comparisons with a 1px interior margin and score
  threshold, extracted into ``max_peaks`` slots per part in row-major order
  (the reference's ``torch.nonzero`` order) with a validity mask.
- **Limb scores** (wrapper.py:274-333): for all 19 limbs at once, the
  10-midpoint line integral of the PAF field between every (src, dst) peak
  pair, the length-regularised score, and the two acceptance criteria.

The data-dependent greedy matching and human assembly remain on host
(``terran_tpu.pose.assembly``) — they are tiny (K^2 per limb) and
inherently sequential.
"""

import numpy as np
import jax
import jax.numpy as jnp

# Limb topology tables for the CMU 2017 body model — public OpenPose
# constants (reference copies at openpose/wrapper.py:12-23). ``MAP_IDX``
# indexes PAF channel pairs (x, y) after the -19 offset; ``LIMBSEQ`` is
# 1-based keypoint ids per limb.
MAP_IDX = np.array([
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44],
    [19, 20], [21, 22], [23, 24], [25, 26], [27, 28], [29, 30],
    [47, 48], [49, 50], [53, 54], [51, 52], [55, 56], [37, 38],
    [45, 46],
]) - 19

LIMBSEQ = np.array([
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9],
    [9, 10], [10, 11], [2, 12], [12, 13], [13, 14], [2, 1],
    [1, 15], [15, 17], [1, 16], [16, 18], [3, 17], [6, 18],
]) - 1

# limb_scores fetches each (x, y) PAF pair as one 2-element gather, which
# requires every pair to be channel-adjacent.
assert (MAP_IDX[:, 1] == MAP_IDX[:, 0] + 1).all()

NUM_PARTS = 18
# Largest field for the flat channel-minor gather index (int32 safety).
_FLAT_INDEX_LIMIT = 2 ** 31
NUM_LIMBS = 19
NUM_MIDPOINTS = 10


def find_peaks(heatmaps, threshold, max_peaks):
    """Fixed-K local-maximum extraction per part.

    heatmaps: (H, W, P) float. Returns (coords (P, K, 2) int32 as (y, x),
    scores (P, K), valid (P, K) bool, overflow (P,) bool), peaks ordered
    row-major per part.

    When a part has more than ``max_peaks`` local maxima, the K
    highest-scoring ones are kept (score ties broken toward earlier
    row-major positions) and ``overflow`` is set for that part; the kept
    set is then re-ordered row-major, so downstream greedy matching sees
    the same ordering convention as the reference's ``torch.nonzero``
    extraction (wrapper.py:246-253) whenever nothing overflowed.
    """
    h, w, p = heatmaps.shape
    hm = jnp.transpose(heatmaps, (2, 0, 1))  # (P, H, W)

    interior = hm[:, 1:-1, 1:-1]
    peaks = (
        (interior >= hm[:, :-2, 1:-1])
        & (interior >= hm[:, 1:-1, :-2])
        & (interior >= hm[:, 2:, 1:-1])
        & (interior >= hm[:, 1:-1, 2:])
        & (interior >= threshold)
    )
    peaks = jnp.pad(peaks, ((0, 0), (1, 1), (1, 1)))  # back to (P, H, W)

    flat = peaks.reshape(p, -1)
    overflow = flat.sum(axis=1) > max_peaks

    # Keep the K strongest peaks per part (lax.top_k breaks score ties by
    # taking the earlier index, i.e. the earlier row-major position).
    sel_score = jnp.where(flat, hm.reshape(p, -1), -jnp.inf)
    top_scores, idx = jax.lax.top_k(sel_score, max_peaks)  # (P, K)
    valid = jnp.isfinite(top_scores)

    # Re-order the kept set row-major (invalid slots sort last).
    position = jnp.where(valid, idx, h * w)
    row_major = jnp.argsort(position, axis=1)
    idx = jnp.take_along_axis(idx, row_major, axis=1)
    valid = jnp.take_along_axis(valid, row_major, axis=1)
    scores = jnp.take_along_axis(hm.reshape(p, -1), idx, axis=1)

    ys = idx // w
    xs = idx % w
    coords = jnp.stack([ys, xs], axis=-1).astype(jnp.int32)
    return coords, jnp.where(valid, scores, 0.0), valid, overflow


def _limb_geometry(coords, valid, ups_h, ups_w):
    """Shared pair geometry for limb scoring.

    coords: (P, K, 2) int peak positions in the UPSAMPLED grid; valid:
    (P, K). Returns (seg_y, seg_x (L, K, K, M) int32 clipped to the
    upsampled bounds, dirs (L, K, K, 2), norms, safe_norms, pair_valid).
    """
    src_parts = LIMBSEQ[:, 0]  # (L,)
    dst_parts = LIMBSEQ[:, 1]

    loc_src = coords[src_parts].astype(jnp.float32)  # (L, K, 2)
    loc_dst = coords[dst_parts].astype(jnp.float32)
    val_src = valid[src_parts]  # (L, K)
    val_dst = valid[dst_parts]

    # directions (L, K_src, K_dst, 2) in (dy, dx), like the reference's
    # (y, x) peak coordinates (wrapper.py:296-301).
    diff = loc_dst[:, None, :, :] - loc_src[:, :, None, :]
    norms = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    safe_norms = jnp.maximum(norms, 1e-6)
    dirs = diff / safe_norms[..., None]

    # Segment sample points: linspace of NUM_MIDPOINTS between src and dst,
    # truncated to int (torch .type(torch.long), wrapper.py:304-306; coords
    # are non-negative so truncation == floor). Match torch.linspace's
    # arithmetic — start + i * (stop - start)/(steps-1) in float32 — so the
    # integer truncation lands on the same pixels.
    steps = jnp.arange(NUM_MIDPOINTS, dtype=jnp.float32)
    step_size = diff / (NUM_MIDPOINTS - 1)  # (L, K, K, 2)
    seg = (
        loc_src[:, :, None, None, :]
        + step_size[:, :, :, None, :] * steps[None, None, None, :, None]
    )  # (L, K, K, M, 2)
    seg = seg.astype(jnp.int32)
    seg_y = jnp.clip(seg[..., 0], 0, ups_h - 1)
    seg_x = jnp.clip(seg[..., 1], 0, ups_w - 1)

    pair_valid = val_src[:, :, None] & val_dst[:, None, :] & (norms > 0)
    return seg_y, seg_x, dirs, norms, safe_norms, pair_valid


def _score_pairs(px, py, dirs, safe_norms, pair_valid, ups_h,
                 thresh_midpoint):
    """Midpoint scores -> (reg, accept), given sampled PAF values."""
    # midpoint score = paf_x * dx + paf_y * dy (direction flip,
    # wrapper.py:308-315).
    mid = px * dirs[..., 1][..., None] + py * dirs[..., 0][..., None]

    # Length-regularised score (wrapper.py:320-323); the reference's
    # pafs.shape[1] is the upsampled height H.
    reg = mid.mean(axis=-1) + jnp.minimum(
        0.5 * ups_h / safe_norms - 1.0, 0.0
    )

    crit1 = (mid > thresh_midpoint).sum(axis=-1) > 0.8 * NUM_MIDPOINTS
    crit2 = reg > 0
    accept = crit1 & crit2 & pair_valid
    return reg, accept


def limb_scores(pafs, coords, valid, thresh_midpoint):
    """Line-integral limb scoring for all limbs/pairs at once.

    pafs: (H, W, 38) — the UPSAMPLED field; coords: (P, K, 2) int (y, x);
    valid: (P, K). Returns (reg_scores (L, K, K), accept (L, K, K) bool)
    where ``accept`` combines the reference's two criteria and slot
    validity. This dense-field form is the production path; the
    point-sampled :func:`limb_scores_sampled` avoids materialising the
    upsampled field but measured ~3x slower on TPU and is kept as the
    upsample's cross-check.

    Descriptor budget (TPU gathers are per-descriptor-bound): the first
    and last of the NUM_MIDPOINTS samples land EXACTLY on the src/dst
    peak pixels — ``a + (M-1) * ((b - a) / (M-1))`` in f32 truncates to
    ``b`` for every integer coordinate pair in the field (verified
    exhaustively over [0, 1472)^2, matching torch.linspace's pinned
    endpoint, wrapper.py:126-163) — so endpoint values are gathered once
    per (limb, peak) and broadcast across pairs: L*K*K*(M-2) + 2*L*K
    descriptors instead of L*K*K*M, ~20% fewer at K=16.
    """
    h, w, c = pafs.shape
    k = coords.shape[1]
    seg_y, seg_x, dirs, norms, safe_norms, pair_valid = _limb_geometry(
        coords, valid, h, w
    )

    # Each limb reads a PAF channel pair MAP_IDX[l] = (x, y), and every
    # pair is channel-adjacent (asserted below), so both components of a
    # sample point are ONE 2-element gather from the channel-minor layout —
    # half the gather descriptors of separate x/y lookups (TPU gathers are
    # per-descriptor-bound; measured on v5e this halves limb-sampling time).
    # Values are identical to the two-gather form. The fully-flattened
    # (pos * C + channel) index overflows int32 for upsampled fields past
    # ~56 M pixels (short_side >= ~736 at 16:9), which PROMISE_IN_BOUNDS
    # would turn into silent garbage — such fields (static shapes, known
    # at trace time) use a 2-component descriptor instead (measured
    # equal-or-faster at small K but ~1.3x slower at K=16, so the flat
    # form stays the common case).
    # In bounds by construction: seg_* are clipped into the field and
    # channel + 2 <= C for every MAP_IDX pair.
    def gather_pairs(pos_y, pos_x):
        """(L, ...) int32 positions -> (x, y) PAF values (2, L, ...),
        channel pair per limb (leading axis)."""
        shape = pos_y.shape
        if h * w * c < _FLAT_INDEX_LIMIT:
            flat = pafs.reshape(-1)  # (H*W*C,) channel-minor
            base = (pos_y * w + pos_x) * c
            ch = jnp.asarray(MAP_IDX[:, 0]).reshape(
                (NUM_LIMBS,) + (1,) * (len(shape) - 1)
            )
            starts = (base + ch).reshape(-1, 1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,),
            )
            vals = jax.lax.gather(
                flat, starts, dn, slice_sizes=(2,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
        else:
            grid = pafs.reshape(-1, c)  # (H*W, C) channel-minor
            pos = pos_y * w + pos_x
            ch = jnp.broadcast_to(
                jnp.asarray(MAP_IDX[:, 0]).reshape(
                    (NUM_LIMBS,) + (1,) * (len(shape) - 1)
                ),
                pos.shape,
            )
            starts = jnp.stack([pos.reshape(-1), ch.reshape(-1)], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            vals = jax.lax.gather(
                grid, starts, dn, slice_sizes=(1, 2),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )[:, 0]
        return vals[:, 0].reshape(shape), vals[:, 1].reshape(shape)

    # Interior samples (L, K, K, M-2); endpoints once per (limb, peak).
    ix, iy = gather_pairs(seg_y[..., 1:-1], seg_x[..., 1:-1])
    src_parts = LIMBSEQ[:, 0]
    dst_parts = LIMBSEQ[:, 1]
    src_y = jnp.clip(coords[src_parts, :, 0], 0, h - 1)  # (L, K)
    src_x = jnp.clip(coords[src_parts, :, 1], 0, w - 1)
    dst_y = jnp.clip(coords[dst_parts, :, 0], 0, h - 1)
    dst_x = jnp.clip(coords[dst_parts, :, 1], 0, w - 1)
    sx, sy = gather_pairs(src_y, src_x)   # (L, K) each
    dx_, dy_ = gather_pairs(dst_y, dst_x)

    px = jnp.concatenate([
        jnp.broadcast_to(sx[:, :, None, None], (NUM_LIMBS, k, k, 1)),
        ix,
        jnp.broadcast_to(dx_[:, None, :, None], (NUM_LIMBS, k, k, 1)),
    ], axis=-1)
    py = jnp.concatenate([
        jnp.broadcast_to(sy[:, :, None, None], (NUM_LIMBS, k, k, 1)),
        iy,
        jnp.broadcast_to(dy_[:, None, :, None], (NUM_LIMBS, k, k, 1)),
    ], axis=-1)

    return _score_pairs(
        px, py, dirs, safe_norms, pair_valid, h, thresh_midpoint
    )


def limb_scores_matmul(pafs, coords, valid, thresh_midpoint):
    """Limb scoring with one-hot MATMUL sampling instead of gathers.

    Same contract and bit-identical outputs to :func:`limb_scores` (same
    segment geometry, same f32 values into :func:`_score_pairs`), but the
    per-sample PAF reads run on the MXU: for each limb, a (S, W) 0/1
    column-indicator matrix contracts against the (H, W, 2) channel-pair
    planes (one batched matmul), then a (S, H) row indicator reduces the
    result on the VPU. One-hot rows make the matmul EXACT: the single
    nonzero product is 1.0 * value (exact in every precision mode whose
    operand decomposition sums to the f32 value — bf16x3/HIGHEST on TPU),
    and all other terms are exact zeros.

    Why: TPU gathers cost ~25-33 ns per descriptor, and at K=16 the
    gather form issues L*K*K*(M-2) + 2*L*K ~= 39 K descriptors per image
    — 8.76 ms/batch, the largest single decode cost after r3. The
    one-hot contraction replaces descriptors with ~47 GFLOP + ~2 GB of
    HBM traffic per batch 8 — a different (and on v5e cheaper) currency.
    The same reformulation measured 50.5 ms for the WARP and was
    rejected (docs/architecture.md: 1080p operands, (12544, 256, 3)
    intermediates); the pose field is ~60x smaller, which flips the
    economics. Endpoint dedup mirrors :func:`limb_scores`: the first and
    last midpoints land exactly on the (clipped) src/dst peak pixels, so
    they are sampled once per (limb, peak) and broadcast across pairs.

    Reference behaviour being reproduced: openpose/wrapper.py:304-323.
    """
    h, w, c = pafs.shape
    k = coords.shape[1]
    seg_y, seg_x, dirs, norms, safe_norms, pair_valid = _limb_geometry(
        coords, valid, h, w
    )

    # Per-limb channel-pair planes (L, H, W, 2); MAP_IDX covers all 38
    # channels exactly once, so this is one reshuffle of the field.
    planes = pafs[:, :, jnp.asarray(MAP_IDX)]          # (H, W, L, 2)
    planes = jnp.transpose(planes, (2, 0, 1, 3))       # (L, H, W, 2)

    # Sample list per limb: interior midpoints + src/dst endpoints once
    # per peak (positions clipped like the gather path).
    src_parts = LIMBSEQ[:, 0]
    dst_parts = LIMBSEQ[:, 1]
    n_int = k * k * (NUM_MIDPOINTS - 2)
    sy = jnp.concatenate([
        seg_y[..., 1:-1].reshape(NUM_LIMBS, n_int),
        jnp.clip(coords[src_parts, :, 0], 0, h - 1),
        jnp.clip(coords[dst_parts, :, 0], 0, h - 1),
    ], axis=1)                                         # (L, S)
    sx = jnp.concatenate([
        seg_x[..., 1:-1].reshape(NUM_LIMBS, n_int),
        jnp.clip(coords[src_parts, :, 1], 0, w - 1),
        jnp.clip(coords[dst_parts, :, 1], 0, w - 1),
    ], axis=1)

    ex = jax.nn.one_hot(sx, w, dtype=pafs.dtype)       # (L, S, W)
    ey = jax.nn.one_hot(sy, h, dtype=pafs.dtype)       # (L, S, H)
    # Column select on the MXU (exact: see docstring), row select as a
    # VPU masked reduce — a take_along_axis here would reissue one
    # descriptor per sample and forfeit the whole point.
    rows = jnp.einsum(
        "lsx,lhxc->lshc", ex, planes,
        precision=jax.lax.Precision.HIGHEST,
    )                                                  # (L, S, H, 2)
    vals = (rows * ey[..., None]).sum(axis=2)          # (L, S, 2)

    int_x = vals[:, :n_int, 0].reshape(NUM_LIMBS, k, k, NUM_MIDPOINTS - 2)
    int_y = vals[:, :n_int, 1].reshape(NUM_LIMBS, k, k, NUM_MIDPOINTS - 2)
    sx_v = vals[:, n_int:n_int + k]                    # (L, K, 2) src
    dx_v = vals[:, n_int + k:]                         # (L, K, 2) dst
    px = jnp.concatenate([
        jnp.broadcast_to(sx_v[:, :, None, None, 0], (NUM_LIMBS, k, k, 1)),
        int_x,
        jnp.broadcast_to(dx_v[:, None, :, None, 0], (NUM_LIMBS, k, k, 1)),
    ], axis=-1)
    py = jnp.concatenate([
        jnp.broadcast_to(sx_v[:, :, None, None, 1], (NUM_LIMBS, k, k, 1)),
        int_y,
        jnp.broadcast_to(dx_v[:, None, :, None, 1], (NUM_LIMBS, k, k, 1)),
    ], axis=-1)

    return _score_pairs(
        px, py, dirs, safe_norms, pair_valid, h, thresh_midpoint
    )


def limb_scores_sampled(pafs_small, factor, coords, valid, thresh_midpoint):
    """Limb scoring that samples the bicubic-upsampled PAF field directly.

    Bit-identical to ``limb_scores(upsample_bicubic(pafs_small, factor,
    axes=(0, 1)), ...)`` without materialising the x8 field.

    NOT the production path on TPU: the 16 gathers per sampled point lose
    to the dense phase-FIR upsample's VPU vectorisation (measured on v5e,
    batch 8 @1080p: 82.6 device-only fps materialised vs 25.3 sampled), so
    ``pipeline.py`` and ``make_pose_decode`` materialise. Kept as the
    memory-lean formulation for gather-friendly backends and as the
    bitwise cross-check of the upsample (test_pose_decode.py).

    pafs_small: (h, w, 38) — the network-resolution field.
    """
    from terran_tpu.ops.upsample import sample_bicubic

    h, w, _ = pafs_small.shape
    ups_h, ups_w = h * factor, w * factor
    seg_y, seg_x, dirs, norms, safe_norms, pair_valid = _limb_geometry(
        coords, valid, ups_h, ups_w
    )

    planes = jnp.transpose(pafs_small, (2, 0, 1))  # (38, h, w)
    px = sample_bicubic(planes[MAP_IDX[:, 0]], factor, seg_y, seg_x)
    py = sample_bicubic(planes[MAP_IDX[:, 1]], factor, seg_y, seg_x)

    return _score_pairs(
        px, py, dirs, safe_norms, pair_valid, ups_h, thresh_midpoint
    )


def forward_and_find_peaks(model, params, images, keypoint_threshold,
                           max_peaks, use_fused, factor=8, mesh=None):
    """Traced front half shared by ``pipeline`` and
    :func:`make_pose_decode`: normalise + CPM forward + fixed-K peak
    finding. ``images`` are already at the network input resolution.
    Returns (paf x1 float32, coords, scores, valid, overflow).

    With ``mesh``, the fused Pallas kernel runs per shard via
    ``shard_map`` over the batch axis — XLA's SPMD partitioner cannot
    split a custom call by itself, and the kernel is batch-parallel (its
    grid leads with the plane axis), so manual partitioning is exact.
    """
    x = images.astype(jnp.float32) / 255.0 - 0.5
    paf, heat = model.apply(
        {"params": params}, x.astype(model.compute_dtype)
    )
    paf = paf.astype(jnp.float32)

    if use_fused:
        from terran_tpu.ops.fused_peaks import find_peaks_fused

        fused = lambda hm: find_peaks_fused(
            hm, keypoint_threshold, max_peaks, factor=factor,
        )
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from terran_tpu.parallel.mesh import DATA_AXIS

            spec = P(DATA_AXIS)
            # check_vma=False: pallas_call outputs carry no varying-axis
            # annotation, and every in/out here is batch-sharded anyway.
            fused = shard_map(
                fused, mesh=mesh, in_specs=spec,
                out_specs=(spec, spec, spec, spec), check_vma=False,
            )
        coords, scores, valid, overflow = fused(
            heat.astype(jnp.float32)[..., :NUM_PARTS]
        )
    else:
        from terran_tpu.ops.upsample import upsample_bicubic

        # Slice off the background channel BEFORE the x8 FIR (the fused
        # branch above already does): upsampling all 19 channels spent
        # ~5% of the FIR and a 19/18 larger intermediate on a channel
        # find_peaks then discarded.
        heat_up = upsample_bicubic(
            heat.astype(jnp.float32)[..., :NUM_PARTS], factor
        )
        coords, scores, valid, overflow = jax.vmap(
            lambda hm: find_peaks(hm, keypoint_threshold, max_peaks)
        )(heat_up)
    return paf, coords, scores, valid, overflow


def pack_peaks(coords, scores, valid, overflow):
    """Pack peak outputs as (..., P, K, 5) = (y, x, score, valid,
    part_overflow broadcast along K) — the layout
    :func:`unpack_pose_outputs` consumes."""
    return jnp.concatenate(
        [
            coords.astype(jnp.float32),
            scores[..., None],
            valid[..., None].astype(jnp.float32),
            jnp.broadcast_to(
                overflow[..., None, None], coords.shape[:-1] + (1,)
            ).astype(jnp.float32),
        ],
        axis=-1,
    )


def make_pose_decode(model, height, width, *, keypoint_threshold=0.1,
                     thresh_midpoint=0.05, max_peaks=32,
                     downsampling_ratio=8, use_fused_peaks=None,
                     limb_backend=None):
    """Build the jitted batched decode for a fixed preprocessed input shape.

    Maps (params, images (N, H, W, 3) uint8/float RGB) to two packed arrays
    — peaks (N, P, K, 5) = (y, x, score, valid, part_overflow) and limbs
    (N, L, K, K, 2) = (reg_score, accept) — splittable with
    :func:`unpack_pose_outputs`.

    ``use_fused_peaks`` (default: config/auto) selects the fused Pallas
    upsample+peak-scan kernel on TPU; the PAF field is always materialised
    at x8 (dense phase-FIR beats point-sampling the Keys filter on TPU —
    see the measurement note in terran_tpu/pipeline.py::_pose_fn).
    ``limb_backend`` (default: config ``limb_backend``, 'auto' = matmul
    on TPU) picks the PAF sampler — :func:`limb_scores_matmul`'s one-hot
    MXU contraction or :func:`limb_scores`' gathers.
    """
    from terran_tpu.ops.fused_peaks import fused_peaks_enabled
    from terran_tpu.ops.upsample import upsample_bicubic

    if use_fused_peaks is None:
        use_fused_peaks = fused_peaks_enabled()
    if limb_backend is None:
        from terran_tpu.config import get_config

        limb_backend = get_config().limb_backend
    if limb_backend == "auto":
        limb_backend = (
            "matmul" if jax.devices()[0].platform == "tpu" else "gather"
        )
    score = limb_scores_matmul if limb_backend == "matmul" else limb_scores

    @jax.jit
    def decode(params, images):
        paf, coords, scores, valid, overflow = forward_and_find_peaks(
            model, params, images, keypoint_threshold, max_peaks,
            use_fused_peaks, factor=downsampling_ratio,
        )
        paf = upsample_bicubic(paf, downsampling_ratio)

        reg, accept = jax.vmap(
            lambda paf_i, c, v: score(paf_i, c, v, thresh_midpoint)
        )(paf, coords, valid)

        # Two packed arrays -> two d2h transfers (round trips through
        # tunneled runtimes cost ~25 ms each): peaks (N, P, K, 5) and
        # limbs (N, L, K, K, 2) = (reg, accept).
        peaks = pack_peaks(coords, scores, valid, overflow)
        limbs = jnp.stack([reg, accept.astype(jnp.float32)], axis=-1)
        return peaks, limbs

    return decode


def unpack_pose_outputs(peaks, limbs):
    """Split packed decode outputs back into
    (coords int32, scores, valid bool, reg, accept bool, overflow bool).

    ``overflow`` has the peak arrays' leading dims up to the part axis
    ((..., P)) — True where a part's local maxima exceeded the fixed K."""
    coords = peaks[..., :2].astype(np.int32)
    scores = peaks[..., 2]
    valid = peaks[..., 3] > 0.5
    overflow = peaks[..., 0, 4] > 0.5
    reg = limbs[..., 0]
    accept = limbs[..., 1] > 0.5
    return coords, scores, valid, reg, accept, overflow
