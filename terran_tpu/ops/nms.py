"""Fixed-size masked non-maximum suppression, on device.

TPU-native replacement for the ``torchvision.ops.nms`` C++/CUDA kernel used by
the reference detector (/root/reference/terran/face/detection/retinaface/
wrapper.py:4,228). XLA requires static shapes, so instead of returning a
variable-length keep list we:

1. pre-select the top-K candidates by score (``jax.lax.top_k``),
2. run greedy suppression over the (K, K) IoU matrix with a ``fori_loop``,
3. return fixed-shape outputs plus a validity mask.

The greedy order (descending score) and the IoU definition match torchvision
(`inter / (area_a + area_b - inter)`, widths computed without the +1), so the
keep-set is identical to the reference whenever the true number of
above-threshold candidates is <= K.
"""

import functools

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU between two sets of boxes in (x1, y1, x2, y2) form.

    boxes_a: (A, 4), boxes_b: (B, 4) -> (A, B) float32.
    """
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])

    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # (A, B, 2)
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # (A, B, 2)
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("top_k",))
def nms_fixed(boxes, scores, iou_threshold, score_threshold=0.0, top_k=256):
    """Greedy NMS with fixed-size outputs.

    Parameters
    ----------
    boxes : (A, 4) float array, (x1, y1, x2, y2).
    scores : (A,) float array.
    iou_threshold : float, suppression threshold (reference default 0.4,
        /root/reference/terran/face/detection/retinaface/wrapper.py:94).
    score_threshold : float, candidates below it are masked out before NMS
        (reference filters at 0.5 before sorting, wrapper.py:133,212).
    top_k : int, static number of candidates to consider / return.

    Returns
    -------
    (boxes, scores, keep_mask, order, overflow):
        boxes (top_k, 4), scores (top_k,) sorted descending, keep_mask
        (top_k,) bool marking survivors, order (top_k,) int32 indices into
        the input arrays (meaningful where keep_mask is set), and overflow —
        a scalar bool set when more than ``top_k`` candidates cleared
        ``score_threshold``, i.e. when the fixed-K pre-selection dropped
        real candidates and the keep-set is no longer guaranteed to match
        unbounded greedy NMS. Callers surface it rather than saturating
        silently (the reference's dynamic-shape path cannot overflow;
        /root/reference/terran/face/detection/retinaface/wrapper.py:207-236).
    """
    above = scores >= score_threshold
    overflow = above.sum() > top_k
    scores = jnp.where(above, scores, -jnp.inf)
    k = min(top_k, scores.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    if k < top_k:
        pad = top_k - k
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=-jnp.inf)
        order = jnp.pad(order, (0, pad))
    top_boxes = boxes[order]

    valid = jnp.isfinite(top_scores)
    ious = iou_matrix(top_boxes, top_boxes)

    def body(i, suppressed):
        # Candidate i survives iff not already suppressed (and valid); if it
        # survives, it suppresses every lower-scored overlapping candidate.
        keep_i = jnp.logical_not(suppressed[i]) & valid[i]
        row = ious[i] > iou_threshold
        later = jnp.arange(top_k) > i
        return suppressed | (keep_i & row & later)

    suppressed = jax.lax.fori_loop(0, top_k, body, jnp.zeros(top_k, bool))
    keep = jnp.logical_not(suppressed) & valid

    return top_boxes, top_scores, keep, order, overflow


def make_sharded_nms(mesh, axis_name="data", *, iou_threshold=0.4,
                     score_threshold=0.5, local_top_k=128, top_k=256):
    """Cross-chip NMS for a single image whose anchors are sharded.

    The latency-oriented complement to the batch-parallel pipeline (SURVEY
    §2: collectives appear only in the optional cross-chip NMS/top-K
    merge): each chip pre-selects its local top-``local_top_k`` candidates
    from its anchor shard, an ``all_gather`` over ICI assembles the
    survivors, and every chip runs the exact greedy NMS on the merged set
    (replicated output).

    Exactness: identical to single-device NMS whenever no more than
    ``local_top_k`` above-threshold candidates live on any one shard —
    greedy NMS only ever keeps candidates that would also survive local
    pre-selection by score. The returned ``overflow`` flag covers both
    failure modes: a shard dropping above-threshold candidates during
    pre-selection, and the merged set exceeding the final ``top_k``.

    Returns a function (boxes (A, 4), scores (A,)) -> fixed-size outputs
    like :func:`nms_fixed`, with ``order`` indexing the *gathered* arrays
    (boxes/scores returned directly, so callers rarely need it). ``A`` must
    be divisible by the mesh size.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    def local_select(boxes, scores):
        # Top-K within this chip's anchor shard.
        above = scores >= score_threshold
        masked = jnp.where(above, scores, -jnp.inf)
        top_scores, idx = jax.lax.top_k(masked, local_top_k)
        return boxes[idx], top_scores, above.sum() > local_top_k

    def sharded(boxes, scores):
        local_boxes, local_scores, local_overflow = local_select(boxes, scores)
        all_boxes = jax.lax.all_gather(
            local_boxes, axis_name, tiled=True
        )  # (n_dev * local_top_k, 4)
        all_scores = jax.lax.all_gather(local_scores, axis_name, tiled=True)
        any_local_overflow = jax.lax.psum(
            local_overflow.astype(jnp.int32), axis_name
        ) > 0
        kb, ks, keep, order, merged_overflow = nms_fixed(
            all_boxes, all_scores, iou_threshold,
            score_threshold=score_threshold, top_k=top_k,
        )
        return kb, ks, keep, order, merged_overflow | any_local_overflow

    fn = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    spec = NamedSharding(mesh, P(axis_name))

    @jax.jit
    def run(boxes, scores):
        boxes = jax.lax.with_sharding_constraint(boxes, spec)
        scores = jax.lax.with_sharding_constraint(scores, spec)
        return fn(boxes, scores)

    return run


def nms_numpy_reference(boxes, scores, iou_threshold):
    """O(n^2) numpy greedy NMS, used as the test oracle."""
    import numpy as np

    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        for jdx in order:
            if jdx == idx or suppressed[jdx]:
                continue
            if scores[jdx] <= scores[idx]:
                x1 = max(boxes[idx, 0], boxes[jdx, 0])
                y1 = max(boxes[idx, 1], boxes[jdx, 1])
                x2 = min(boxes[idx, 2], boxes[jdx, 2])
                y2 = min(boxes[idx, 3], boxes[jdx, 3])
                inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
                area_i = (boxes[idx, 2] - boxes[idx, 0]) * (
                    boxes[idx, 3] - boxes[idx, 1]
                )
                area_j = (boxes[jdx, 2] - boxes[jdx, 0]) * (
                    boxes[jdx, 3] - boxes[jdx, 1]
                )
                union = area_i + area_j - inter
                if union > 0 and inter / union > iou_threshold:
                    suppressed[jdx] = True
    return np.array(keep, dtype=np.int64)
