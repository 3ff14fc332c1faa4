"""Spatial sharding of a single huge frame across the mesh (halo exchange).

The batch mesh (``terran_tpu.parallel.mesh``) scales *stream count*; this
module scales *one frame* past what a single chip should hold: the frame's
rows are sharded across the mesh, each chip trades ``halo`` boundary rows
with its neighbours over ICI (``jax.lax.ppermute``), runs RetinaFace on its
extended slab, claims exactly the anchors whose centres fall inside its own
rows, and the per-chip candidates are merged with the same
all-gather + fixed-K NMS collective that ``ops.nms.make_sharded_nms`` uses.
The full-resolution frame is never resident on any one device.

This is the SURVEY §5 "long-context" analogue for vision (scaling spatial
resolution instead of sequence length) that round 1 deferred; the host-side
alternative is ``terran_tpu.ops.tiling.TiledDetector``, which runs at native
resolution on ONE device by batching overlapping tiles. Trade-offs:

- ``TiledDetector``: no mesh needed; duplicates compute over every tile
  overlap; the whole frame and the whole tile batch live on one chip.
- ``SpatialShardedDetector``: n-chip HBM and FLOPs for one frame; overlap
  compute is limited to the halo bands; the merge is a collective, not a
  host round trip.

Equivalence to whole-frame inference: the extended slabs' conv grids are
aligned to the global stride-32 grid (slab and halo heights are multiples of
32), so an owned anchor's score/box matches the whole-frame result exactly
whenever its receptive field lies inside the extended slab. Anchors within a
receptive field of the frame's true top/bottom edge see an explicit zero
halo instead of per-layer zero padding — the same approximation
``TiledDetector.extract_tiles`` makes for edge tiles. Raise ``halo`` to
widen the exact region.

Reference contrast: the reference resizes everything to a ~416px short side
on one GPU (/root/reference/terran/face/detection/__init__.py:108-135); it
has no native-resolution or multi-device story at all (SURVEY §2/§5).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from terran_tpu.models.retinaface import (
    FEATURE_STRIDES,
    RetinaFace,
    anchor_cell_meta,
    anchors_for_shape,
    decode_outputs,
    unpack_detections,
)
from terran_tpu.ops.nms import nms_fixed
from terran_tpu.parallel.mesh import DATA_AXIS, create_mesh

# Slab and halo heights must be multiples of the coarsest feature stride so
# every extended slab's anchor grid lands exactly on the global grid.
GRID = max(FEATURE_STRIDES)


def slab_layout(height, n_devices, multiple=GRID):
    """(slab_height, padded_height) for sharding ``height`` rows over
    ``n_devices``: the smallest multiple-of-``multiple`` slab whose
    ``n_devices`` copies cover the frame."""
    slab = -(-height // (n_devices * multiple)) * multiple
    return slab, slab * n_devices


@functools.lru_cache(maxsize=64)
def ext_anchor_meta(slab_h, width, halo):
    """Anchor metadata for one extended slab of shape
    (slab_h + 2*halo, width), as numpy arrays:

    ``anchors`` (A, 4) in extended-slab coordinates, per-anchor feature-map
    ``cell_x``/``cell_y`` indices, ``cell_stride``, and ``ctr_y`` — the
    anchor centre's y in extended-slab coordinates (used for row ownership).
    Shared by the sharded program and the single-device test oracle.
    """
    ext_h = slab_h + 2 * halo
    anchors = anchors_for_shape(ext_h, width)
    # Same cell-meta helper as make_detect_fn — the ownership partition
    # stays aligned with decode order by construction.
    cell_x, cell_y, cell_stride = anchor_cell_meta(ext_h, width)
    ctr_y = (anchors[:, 1] + anchors[:, 3]) / 2.0
    return anchors, cell_x, cell_y, cell_stride, ctr_y


def slab_candidates(scores, boxes, landmarks, *, device_index, slab_h, halo,
                    width, valid_h, valid_w, threshold, local_top_k):
    """One device's owned, globally-positioned top-K candidates.

    Pure jnp math shared by the shard_map body and the test oracle: mask to
    anchors that are (a) inside the valid frame region and (b) owned by this
    slab (anchor centre-y within its rows), shift to global coordinates, and
    pre-select the ``local_top_k`` best by score.

    Returns (boxes (K, 4), landmarks (K, 5, 2), scores (K,), overflow bool).
    """
    _, cell_x, cell_y, cell_stride, ctr_y = ext_anchor_meta(
        slab_h, width, halo
    )
    start = device_index * slab_h
    offset = jnp.asarray(start - halo, jnp.float32)

    # Validity: the anchor's cell, in GLOBAL grid indices, must be one the
    # whole-frame detector would evaluate for the unpadded frame (same
    # ceil-cell rule as models.retinaface.make_detect_fn).
    stride = jnp.asarray(cell_stride)
    gy = jnp.asarray(cell_y) + (start - halo) // stride
    valid = (
        (gy >= 0)
        & (gy < (valid_h + stride - 1) // stride)
        & (jnp.asarray(cell_x) < (valid_w + stride - 1) // stride)
    )
    # Ownership: anchor centre row inside this slab. Every global anchor is
    # owned by exactly one device, so the union over the mesh is the exact
    # whole-frame candidate set.
    gctr = jnp.asarray(ctr_y) + offset
    own = (gctr >= start) & (gctr < start + slab_h)
    # Mask to -inf, not 0: a threshold <= 0 must not resurrect non-owned
    # anchors as score-0 candidates duplicated across devices.
    scores = jnp.where(valid & own, scores, -jnp.inf)

    zero = jnp.zeros((), jnp.float32)
    boxes = boxes + jnp.stack([zero, offset, zero, offset])
    landmarks = landmarks + jnp.stack([zero, offset])

    above = scores >= threshold
    overflow = above.sum() > local_top_k
    masked = jnp.where(above, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, local_top_k)
    # -inf marks empty pre-selection slots; NMS downstream treats them as
    # below any score_threshold.
    return boxes[idx], landmarks[idx], top_scores, overflow


def make_spatial_detect_fn(model, mesh, slab_h, width, halo, *,
                           nms_threshold=0.4, top_k=256, local_top_k=None,
                           axis_name=DATA_AXIS):
    """Build the jitted halo-exchange detection program for one frame shape.

    The returned function maps
    ``(params, frame (n*slab_h, width, 3) uint8 RGB, threshold, valid_w,
    valid_h)`` to the packed ``(top_k, 17)`` detection array of
    ``models.retinaface.make_detect_fn`` (global pixel coordinates,
    replicated on every device). Channel 16 carries merged-NMS overflow OR
    any per-device pre-selection overflow.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if slab_h % GRID or halo % GRID:
        raise ValueError(f"slab_h and halo must be multiples of {GRID}")
    if halo <= 0:
        raise ValueError("halo must be positive")
    if halo > slab_h:
        # The exchange trades rows with IMMEDIATE neighbours only;
        # slab[-halo:] of a shorter slab would silently ship fewer rows
        # than the anchor grid expects. (Multi-hop exchange would lift
        # this; no frame/mesh combination has needed it.)
        raise ValueError(
            f"halo ({halo}) must not exceed slab_h ({slab_h})"
        )
    if local_top_k is None:
        local_top_k = top_k
    n = mesh.devices.size
    anchors, *_ = ext_anchor_meta(slab_h, width, halo)

    def local_step(params, slab, threshold, valid_w, valid_h):
        idx = jax.lax.axis_index(axis_name)
        # Halo exchange over ICI: my top halo is my upper neighbour's last
        # rows, my bottom halo the lower neighbour's first rows. Frame-edge
        # devices receive zeros (ppermute's no-source fill), i.e. an
        # explicit zero margin past the frame boundary.
        top = jax.lax.ppermute(
            slab[-halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        bottom = jax.lax.ppermute(
            slab[:halo], axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        ext = jnp.concatenate([top, slab, bottom], axis=0)

        outputs = model.apply(
            {"params": params}, ext.astype(model.compute_dtype)[None]
        )
        scores, boxes, landmarks = decode_outputs(outputs, anchors)
        lb, ll, ls, local_overflow = slab_candidates(
            scores[0], boxes[0], landmarks[0],
            device_index=idx, slab_h=slab_h, halo=halo, width=width,
            valid_h=valid_h, valid_w=valid_w, threshold=threshold,
            local_top_k=local_top_k,
        )

        all_boxes = jax.lax.all_gather(lb, axis_name, tiled=True)
        all_lmks = jax.lax.all_gather(ll, axis_name, tiled=True)
        all_scores = jax.lax.all_gather(ls, axis_name, tiled=True)
        any_overflow = jax.lax.psum(
            local_overflow.astype(jnp.int32), axis_name
        ) > 0

        kb, ks, keep, order, merged_overflow = nms_fixed(
            all_boxes, all_scores, nms_threshold,
            score_threshold=threshold, top_k=top_k,
        )
        kl = all_lmks[order]
        overflow = merged_overflow | any_overflow
        packed = jnp.concatenate(
            [
                kb,
                kl.reshape(top_k, 10),
                ks[:, None],
                keep[:, None].astype(jnp.float32),
                jnp.broadcast_to(overflow, (top_k,)).astype(jnp.float32)[
                    :, None
                ],
            ],
            axis=-1,
        )
        return packed

    P_ = P
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P_(), P_(axis_name), P_(), P_(), P_()),
        out_specs=P_(),
        check_vma=False,
    )
    frame_spec = NamedSharding(mesh, P_(axis_name))

    @jax.jit
    def run(params, frame, threshold, valid_w, valid_h):
        frame = jax.lax.with_sharding_constraint(frame, frame_spec)
        return fn(
            params, frame,
            jnp.asarray(threshold, jnp.float32),
            jnp.asarray(valid_w, jnp.int32),
            jnp.asarray(valid_h, jnp.int32),
        )

    return run


class SpatialShardedDetector:
    """Native-resolution detection on one frame sharded across the mesh.

    Wraps the params/model of a
    :class:`~terran_tpu.face.detection.RetinaFaceDetector`; one program is
    compiled per (slab, width) so fixed-size streams compile once. Returns
    the task-API list of ``{'bbox', 'landmarks', 'score'}`` dicts in global
    pixel coordinates, score-descending.
    """

    def __init__(self, detector=None, *, mesh=None, halo=256, top_k=256,
                 local_top_k=None, nms_threshold=None, params=None,
                 model=None, max_escalations=None):
        if detector is not None:
            params = detector.params if params is None else params
            model = detector.model if model is None else model
            if nms_threshold is None:
                nms_threshold = detector.nms_threshold
        if params is None or model is None:
            raise ValueError("pass a detector, or params and model")
        from terran_tpu.config import get_config

        if nms_threshold is None:
            nms_threshold = get_config().nms_iou_threshold
        # Overflow escalation, like every other fixed-capacity path
        # (pipeline detect/pose/embed): a saturated per-device
        # pre-selection or merged NMS re-dispatches the frame at doubled
        # local_top_k/top_k instead of warning-and-dropping — this path's
        # whole point is huge crowded frames, and the reference's dynamic
        # shapes cannot drop detections (retinaface/wrapper.py:207-236).
        self.max_escalations = (
            get_config().max_escalations if max_escalations is None
            else max_escalations
        )
        self.escalations = 0
        self.mesh = mesh if mesh is not None else create_mesh()
        self.n_devices = self.mesh.devices.size
        self.halo = -(-halo // GRID) * GRID
        self.top_k = top_k
        self.local_top_k = local_top_k
        self.nms_threshold = nms_threshold
        self.params = params
        self.model = model
        self._fns = {}

    def _fn(self, slab_h, width, top_k=None, local_top_k=None):
        top_k = self.top_k if top_k is None else top_k
        if local_top_k is None:
            local_top_k = self.local_top_k
        key = (slab_h, width, top_k, local_top_k)
        if key not in self._fns:
            # A short frame can make slab_h < the configured halo; the
            # exchange only reaches immediate neighbours, so clamp (the
            # whole neighbouring slab is then in view — the maximum
            # context a one-hop exchange can provide).
            self._fns[key] = make_spatial_detect_fn(
                self.model, self.mesh, slab_h, width,
                min(self.halo, slab_h),
                nms_threshold=self.nms_threshold, top_k=top_k,
                local_top_k=local_top_k,
            )
        return self._fns[key]

    def __call__(self, image, threshold=0.5):
        image = np.asarray(image)
        h, w = image.shape[:2]
        slab_h, padded_h = slab_layout(h, self.n_devices)
        padded_w = -(-w // GRID) * GRID
        if (padded_h, padded_w) != (h, w):
            frame = np.zeros((padded_h, padded_w, 3), dtype=image.dtype)
            frame[:h, :w] = image
        else:
            frame = image

        # Capacity ceilings: the per-device pre-selection cannot exceed the
        # extended slab's anchor count, and the merged NMS cannot keep more
        # than the all-gather delivers. At the full clamp no overflow is
        # possible (above.sum() <= A and kept <= n * local_top_k), so a
        # clamped escalation is guaranteed to terminate unsaturated.
        n_anchors = len(
            ext_anchor_meta(slab_h, padded_w, min(self.halo, slab_h))[0]
        )

        def _clamp(t, l):
            l = min(l, n_anchors)
            return min(t, self.n_devices * l), l

        top_k, local_top_k = _clamp(
            self.top_k, self.local_top_k or self.top_k
        )
        packed = np.asarray(
            self._fn(slab_h, padded_w, top_k, local_top_k)(
                self.params, frame, threshold, w, h
            )
        )
        boxes, landmarks, scores, mask, overflow = unpack_detections(
            packed[None]
        )
        attempts = 0
        while bool(overflow[0]) and attempts < self.max_escalations:
            new_top_k, new_local = _clamp(top_k * 2, local_top_k * 2)
            if (new_top_k, new_local) == (top_k, local_top_k):
                break  # already at the ceiling; re-dispatch cannot help
            attempts += 1
            self.escalations += 1
            top_k, local_top_k = new_top_k, new_local
            packed = np.asarray(
                self._fn(slab_h, padded_w, top_k, local_top_k)(
                    self.params, frame, threshold, w, h
                )
            )
            boxes, landmarks, scores, mask, overflow = unpack_detections(
                packed[None]
            )
        if bool(overflow[0]):
            from terran_tpu.utils.profiling import get_logger

            get_logger().warning(
                "spatial detection still saturated after %d escalations "
                "(top_k=%s local_top_k=%s); low-scoring faces may be "
                "dropped — raise max_escalations or top_k",
                attempts, top_k, local_top_k,
            )
        keep = mask[0]
        return [
            {"bbox": b, "landmarks": l, "score": np.float32(s)}
            for b, l, s in zip(boxes[0][keep], landmarks[0][keep],
                               scores[0][keep])
        ]
