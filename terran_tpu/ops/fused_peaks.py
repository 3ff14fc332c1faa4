"""Fused bicubic-upsample + peak-scan Pallas kernel.

The OpenPose decode needs the local maxima of the x8 bicubic upsample of
each part heatmap (reference wrapper.py:212-262). The XLA path
materialises the upsampled field ((184, 328, 18) f32 per image at the
default 184 short side) and runs top_k over every element; scan-timed on
v5e at batch 8 that path costs 15.2 ms vs 5.9 ms for the round-3 form of
this kernel (2.6x) and less still for the current one (see below).
The kernel computes the upsample in PHASE SPACE: for a band of source
rows it builds the 64 phase images Q[ry, rx] (each the size of the
SOURCE band) in VMEM, applies the 4-neighbour/threshold peak rule
between phase images (a neighbour in the upsampled grid is the adjacent
phase, or the adjacent source row/column when the phase wraps), and
emits only a fixed-K candidate table per band — the x8 field never
exists in HBM.

Two structural choices (round 3, both measured on v5e):

- **Per-row-piece top-2 instead of scratch extraction.** Within one
  upsampled row, the stretch covered by a single source cell (the 8 rx
  phases) is ONE cubic polynomial piece, which admits at most two
  discrete local maxima — so a running top-2 per (source cell, ry),
  updated across the rx loop, captures every peak without staging all
  64 phase images to scratch. The fixed-K extraction then scans a
  16-row-piece candidate table (2 per ry) instead of the full 64-phase
  scratch: 4x less extraction work. Measured on noise fields (60
  planes): zero row pieces with 3+ peaks; the theoretical exception
  (exact-tie plateaus) is caught by a per-piece overflow counter that
  feeds the overflow flag.
- **Plane blocking.** The grid runs ``plane_block`` planes per program
  (3D tensors, constant program size), dividing the per-program launch
  overhead (~20 us on v5e, previously the dominant cost at 152
  single-plane programs per batch) by the block factor.

Semantics match ``find_peaks(upsample_bicubic(heat, 8))`` whenever a
part has at most ``max_peaks`` peaks (the non-saturated regime, same
guarantee the XLA path gives) and no single (source cell, ry) row piece
holds 3+ peaks (exact ties only; flagged as overflow): top-K by score,
score ties toward earlier row-major positions, kept set re-ordered
row-major, exact per-part overflow flags. Two further caveats: scores
can differ from the XLA path by float-contraction ulps (the two
lowerings fuse multiply-adds differently), which can flip knife-edge
comparisons on exact ties; and under saturation the kernel pre-selects
the strongest ``max_peaks`` per band before the global merge (the XLA
path selects globally) — the overflow flag marks that regime.

Kernel layout: grid (plane_blocks, bands); per program ``plane_block``
padded source planes (a few hundred KB) sit in VMEM, each band's 64
phase images are built by two 4-tap FIR passes (H then W, same tap order
as ops/upsample.py so values are bit-identical), the per-(cell, ry)
top-2 candidates accumulate in registers across the rx loop, and a
fixed-K iterative max-extraction over the (2 * factor) staged candidate
rows writes (score, linear row-major index) pairs plus the band's exact
peak count and lost-candidate count.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from terran_tpu.ops.upsample import _phase_table

_PAD = 3          # edge padding applied to the source plane (>= FIR reach)
_BIG = np.int32(2**31 - 1)


def _band_kernel(plane_ref, score_ref, lin_ref,
                 scores_scratch, lin_scratch, *,
                 factor, tb, h, w, threshold, k_out, pb):
    """One (plane-block, band) program: phase-space peak scan over ``tb``
    source rows (plus one halo row each side for cross-band neighbours)
    of ``pb`` planes at once."""
    band = pl.program_id(1)
    b0 = band * tb

    bases, weights = _phase_table(factor)

    # --- H-axis FIR: hq[ry] has rows yb_local in [-1, tb+1) -------------
    # Source row of tap i for output row (b0 + yb_local) is
    # b0 + yb_local + base_ry + (i - 1); +_PAD into the padded plane and
    # +(-1) for the halo start. Mosaic requires dynamic sublane offsets to
    # be provably 8-aligned, so one slab is loaded at the (8-aligned,
    # since tb % 8 == 0) band start and every tap is a static sub-slice:
    # relative to b0, tap rows sit at base + 1 + i in [0, 5].
    slab_rows = tb + 2
    slab_all = plane_ref[:, pl.ds(pl.multiple_of(b0, 8), tb + 6), :]
    hq = []
    for ry in range(factor):
        base = bases[ry]
        wv = weights[ry]
        rel = base + 1  # static
        taps = [
            slab_all[:, rel + i: rel + i + slab_rows, :] for i in range(4)
        ]
        hq.append(
            wv[0] * taps[0] + wv[1] * taps[1]
            + wv[2] * taps[2] + wv[3] * taps[3]
        )

    # --- W-axis FIR: q[ry][rx] is (pb, slab_rows, w) --------------------
    q = []
    for ry in range(factor):
        row = []
        for rx in range(factor):
            base = bases[rx]
            wv = weights[rx]
            start = base + _PAD - 1  # xb=0, j=0 (static)
            taps = [
                hq[ry][:, :, start + j: start + j + w] for j in range(4)
            ]
            row.append(
                wv[0] * taps[0] + wv[1] * taps[1]
                + wv[2] * taps[2] + wv[3] * taps[3]
            )
        q.append(row)

    # --- peak rule between phase images + per-(cell, ry) top-2 ----------
    # Band rows of q are slab rows [1, tb+1); slab row 0 / tb+1 are the
    # halo rows used when an upsampled neighbour crosses a source row.
    cur_sl = slice(1, tb + 1)
    up_h = h * factor
    up_w = w * factor

    yb_ids = jax.lax.broadcasted_iota(jnp.int32, (pb, tb, w), 1) + b0
    xb_ids = jax.lax.broadcasted_iota(jnp.int32, (pb, tb, w), 2)

    neg_inf = jnp.full((pb, tb, w), -jnp.inf, jnp.float32)
    big = jnp.full((pb, tb, w), _BIG, jnp.int32)
    cnt_all = jnp.zeros((pb, tb, w), jnp.int32)
    lost_all = jnp.zeros((pb, tb, w), jnp.int32)
    for ry in range(factor):
        s1, l1, s2, l2 = neg_inf, big, neg_inf, big
        cnt = jnp.zeros((pb, tb, w), jnp.int32)
        for rx in range(factor):
            cur = q[ry][rx][:, cur_sl]
            if ry > 0:
                up = q[ry - 1][rx][:, cur_sl]
            else:
                up = q[factor - 1][rx][:, 0:tb]
            if ry < factor - 1:
                down = q[ry + 1][rx][:, cur_sl]
            else:
                down = q[0][rx][:, 2:tb + 2]
            if rx > 0:
                left = q[ry][rx - 1][:, cur_sl]
            else:
                left = jnp.roll(q[ry][factor - 1][:, cur_sl], 1, axis=2)
            if rx < factor - 1:
                right = q[ry][rx + 1][:, cur_sl]
            else:
                right = jnp.roll(q[ry][0][:, cur_sl], -1, axis=2)

            y_ids = yb_ids * factor + ry   # upsampled row of each element
            x_ids = xb_ids * factor + rx
            interior = (
                (y_ids >= 1) & (y_ids <= up_h - 2)
                & (x_ids >= 1) & (x_ids <= up_w - 2)
                & (yb_ids < h)            # cdiv band padding
            )
            mask = (
                (cur >= up) & (cur >= down) & (cur >= left)
                & (cur >= right) & (cur >= threshold) & interior
            )
            cnt = cnt + mask.astype(jnp.int32)
            cand = jnp.where(mask, cur, -jnp.inf)
            cl = jnp.where(mask, y_ids * up_w + x_ids, _BIG)
            # Running top-2: strict > keeps the earlier rx (smaller
            # linear index) first on exact score ties, preserving the
            # row-major tie order the extraction relies on.
            better1 = cand > s1
            better2 = cand > s2
            s2, l2 = (
                jnp.where(better1, s1, jnp.where(better2, cand, s2)),
                jnp.where(better1, l1, jnp.where(better2, cl, l2)),
            )
            s1, l1 = (
                jnp.where(better1, cand, s1),
                jnp.where(better1, cl, l1),
            )
        cnt_all = cnt_all + cnt
        lost_all = lost_all + jnp.maximum(cnt - 2, 0)
        # Stage the piece's two candidate rows into 2D VMEM scratch at
        # static, PLANE-MAJOR row offsets. (Carrying the candidate
        # tensors through the extraction loop — like concatenating
        # FIR-sliced blocks — crashes the Mosaic lowering in this jax
        # version, and a 3D scratch ref is allocated per GRID STEP
        # rather than shared — 152 steps x ~230 KB blew the 16 MB scoped
        # vmem limit — so the table stays 2D like the proven round-2
        # layout.)
        rows = 2 * factor * tb
        for p in range(pb):
            base = p * rows
            scores_scratch[base + 2 * ry * tb:
                           base + (2 * ry + 1) * tb, :] = s1[p]
            lin_scratch[base + 2 * ry * tb:
                        base + (2 * ry + 1) * tb, :] = l1[p]
            scores_scratch[base + (2 * ry + 1) * tb:
                           base + (2 * ry + 2) * tb, :] = s2[p]
            lin_scratch[base + (2 * ry + 1) * tb:
                        base + (2 * ry + 2) * tb, :] = l2[p]

    # --- fixed-K extraction: strongest first, row-major tie-break -------
    # Per plane of the block (static python loop; each plane's candidate
    # table is a static row range of the shared 2D scratch).
    k_pad = k_out + 2
    rows = 2 * factor * tb
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    plane_ids = jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0)
    out_s_all = jnp.full((pb, k_pad), -jnp.inf, jnp.float32)
    out_l_all = jnp.full((pb, k_pad), _BIG, jnp.int32)
    for p in range(pb):
        base = p * rows

        def extract(idx, carry, base=base):
            out_s, out_l = carry
            sc = scores_scratch[base:base + rows, :]
            la = lin_scratch[base:base + rows, :]
            best = jnp.max(sc)
            best_lin = jnp.min(jnp.where(sc == best, la, _BIG))
            out_s = jnp.where(slot_ids == idx, best, out_s)
            out_l = jnp.where(slot_ids == idx, best_lin, out_l)
            scores_scratch[base:base + rows, :] = jnp.where(
                la == best_lin, -jnp.inf, sc
            )
            return out_s, out_l

        init = (
            jnp.full((1, k_pad), -jnp.inf, jnp.float32),
            jnp.full((1, k_pad), _BIG, jnp.int32),
        )
        out_s, out_l = jax.lax.fori_loop(0, k_out, extract, init)
        # The two pad slots of the lin table carry the plane's exact
        # band peak count and lost-candidate count (a separate
        # (pb,)-shaped output would need a sub-lane-dim store Mosaic
        # rejects).
        total = jnp.sum(cnt_all[p])
        lost = jnp.sum(lost_all[p])
        out_l = jnp.where(slot_ids == k_out, total, out_l)
        out_l = jnp.where(slot_ids == k_out + 1, lost, out_l)
        out_s_all = jnp.where(plane_ids == p, out_s, out_s_all)
        out_l_all = jnp.where(plane_ids == p, out_l, out_l_all)
    score_ref[:, 0, 0, :] = out_s_all
    lin_ref[:, 0, 0, :] = out_l_all


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "max_peaks", "factor", "band_rows",
                     "plane_block", "interpret"),
)
def _fused_peak_candidates(planes, threshold, max_peaks, factor, band_rows,
                           plane_block, interpret):
    """planes: (M, h, w) f32 -> (scores (M, B, K), lin (M, B, K),
    counts (M, B), lost (M, B))."""
    m, h, w = planes.shape
    if band_rows % 8:
        raise ValueError("band_rows must be a multiple of 8 (sublane "
                         "alignment of the per-band loads)")
    bands = pl.cdiv(h, band_rows)
    pb = max(1, min(plane_block, m))
    m_pad = pl.cdiv(m, pb) * pb
    k_pad = max_peaks + 2

    # Edge padding implements torch's clamped border taps; rows also pad
    # out to the band grid so every in-kernel slice is in range, and
    # planes pad out to the plane-block grid (zero planes produce no
    # kept output — their rows are sliced off below).
    rows_padded = bands * band_rows + 2 * _PAD
    padded = jnp.pad(
        planes, ((0, 0), (_PAD, _PAD), (_PAD, _PAD)), mode="edge"
    )
    padded = jnp.pad(
        padded, ((0, 0), (0, rows_padded - padded.shape[1]), (0, 0)),
        mode="edge",
    )
    padded = jnp.pad(padded, ((0, m_pad - m), (0, 0), (0, 0)))

    kernel = functools.partial(
        _band_kernel, factor=factor, tb=band_rows, h=h, w=w,
        threshold=threshold, k_out=max_peaks, pb=pb,
    )
    scores, lin = pl.pallas_call(
        kernel,
        grid=(m_pad // pb, bands),
        in_specs=[
            pl.BlockSpec(
                (pb, rows_padded, w + 2 * _PAD),
                lambda p, b: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((pb, 1, 1, k_pad), lambda p, b: (p, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1, 1, k_pad), lambda p, b: (p, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, bands, 1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, bands, 1, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pb * 2 * factor * band_rows, w), jnp.float32),
            pltpu.VMEM((pb * 2 * factor * band_rows, w), jnp.int32),
        ],
        interpret=interpret,
    )(padded)
    return (
        scores[:m, :, 0, :max_peaks],
        lin[:m, :, 0, :max_peaks],
        lin[:m, :, 0, max_peaks],
        lin[:m, :, 0, max_peaks + 1],
    )


def fused_peaks_enabled(setting=None):
    """Resolve the ``fused_peaks`` config setting ('auto'/'on'/'off'):
    'auto' enables the kernel exactly when the backend is a real TPU."""
    if setting is None:
        from terran_tpu.config import get_config

        setting = get_config().fused_peaks
    if setting == "on":
        return True
    if setting == "off":
        return False
    return jax.devices()[0].platform == "tpu"


def auto_plane_block(band_rows, w=128):
    """Largest plane block fitting the 16M v5e scoped-vmem budget, from
    PADDED tile dims: lanes pad to the next 128 multiple whatever the
    field width is, and sublanes to 8, so dividing by the raw w (the r4
    formula) over-sized the block ~3x on tiny fields — a (36, 14, 14)
    heat picked pb=13 and OOMed scoped vmem at 42M on the chip (the CPU
    interpreter the tests run never enforces the limit). Probed live
    set on v5e: 266 f32 values per padded (sublane x lane) unit of the
    (band_rows + 2)-row slab, at BOTH (14, 14)/band 16 (3.27M per
    plane, pb<=4 fits) and (46, 81)/band 32 (5.44M per plane, pb=3
    lands 16.32M — just over). 280 + a 15.5M budget keeps margin;
    reproduce with benchmarks/fused_peaks_vmem_probe.py. Fields wider
    than one 128-lane tile (w > 128, e.g. native-resolution pose at
    pose_short_side >= ~600) scale the denominator by the padded lane
    count — at 256 lanes band 32 drops to pb=1, matching the old
    formula's behaviour there."""
    slab_sub = -(-(band_rows + 2) // 8) * 8
    # The widest in-kernel rows are the edge-padded plane (w + 2*_PAD);
    # round that to the lane tile so w just under a 128 multiple doesn't
    # under-count the next tile.
    lanes = -(-(max(int(w), 1) + 2 * _PAD) // 128) * 128
    return max(1, 15_500_000 // (280 * slab_sub * lanes * 4))


def find_peaks_fused(heatmaps, threshold, max_peaks, factor=8,
                     band_rows=None, plane_block=None, interpret=None):
    """Drop-in fused equivalent of
    ``find_peaks(upsample_bicubic(heatmaps, factor), threshold, max_peaks)``.

    heatmaps: (..., h, w, P) SOURCE-resolution float maps (leading batch
    dims optional). Returns (coords (..., P, K, 2) int32 (y, x) in the
    UPSAMPLED grid, scores (..., P, K), valid (..., P, K) bool,
    overflow (..., P) bool), peaks ordered row-major per part.

    ``interpret`` defaults to True off-TPU (tests run the kernel through
    the Pallas interpreter on CPU). ``band_rows`` defaults to the smallest
    8-multiple covering the source height (capped at 32): the per-program
    VMEM footprint stays small at OpenPose field sizes, and one band per
    plane minimises the program count (the per-program launch overhead is
    ~20 us on v5e, which is why ``plane_block`` planes also share one
    program — see the module docstring).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    batch_shape = heatmaps.shape[:-3]
    h, w, parts = heatmaps.shape[-3:]
    if band_rows is None:
        band_rows = min(32, -(-h // 8) * 8)
    if plane_block is None:
        plane_block = auto_plane_block(band_rows, w)
    planes = jnp.moveaxis(heatmaps, -1, -3).reshape(-1, h, w)
    planes = planes.astype(jnp.float32)

    scores_b, lin_b, counts_b, lost_b = _fused_peak_candidates(
        planes, float(threshold), int(max_peaks), int(factor),
        int(band_rows), int(plane_block), bool(interpret),
    )
    m = planes.shape[0]
    scores_flat = scores_b.reshape(m, -1)
    lin_flat = lin_b.reshape(m, -1)

    # Global merge: strongest K overall. Candidates arrive band-major and,
    # within a band, extraction order (descending score, row-major ties),
    # so lax.top_k's positional tie-break keeps row-major order among
    # equal scores.
    top_scores, idx = jax.lax.top_k(scores_flat, max_peaks)
    valid = top_scores > -jnp.inf
    lin = jnp.take_along_axis(lin_flat, idx, axis=1)

    # Re-order the kept set row-major (invalid slots last), matching
    # ops/pose_decode.py::find_peaks.
    position = jnp.where(valid, lin, _BIG)
    order = jnp.argsort(position, axis=1)
    lin = jnp.take_along_axis(lin, order, axis=1)
    top_scores = jnp.take_along_axis(top_scores, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)

    up_w = w * factor
    ys = lin // up_w
    xs = lin % up_w
    coords = jnp.stack([ys, xs], axis=-1).astype(jnp.int32)
    coords = jnp.where(valid[..., None], coords, 0)
    scores = jnp.where(valid, top_scores, 0.0)
    # Overflow: more peaks than slots, or (exact-tie pathology) a row
    # piece held 3+ peaks and the per-piece top-2 dropped one.
    overflow = (counts_b.sum(axis=1) > max_peaks) | (lost_b.sum(axis=1) > 0)

    out_shape = batch_shape + (parts,)
    return (
        coords.reshape(out_shape + (max_peaks, 2)),
        scores.reshape(out_shape + (max_peaks,)),
        valid.reshape(out_shape + (max_peaks,)),
        overflow.reshape(out_shape),
    )
