"""RetinaFace (pseudo-MobileNet-0.25 backbone) in Flax, NHWC, TPU-first.

Re-implements the behaviour of the reference network
(/root/reference/terran/face/detection/retinaface/model.py) and its anchor
machinery (/root/reference/terran/face/detection/retinaface/anchors.py), with
a fused, fully on-device decode + masked NMS replacing the reference's
per-image Python loop + torchvision NMS (/root/reference/terran/face/
detection/retinaface/wrapper.py:133-238).

TPU-first deviations from the reference implementation (behaviour preserved):
- NHWC layout; BatchNorm folded to (scale, bias) at weight-conversion time.
- The RGB->BGR input flip (wrapper.py:146) is folded into the first conv's
  weights by the converter, so the model takes RGB input directly.
- The two-class softmax over anchors reduces to a sigmoid of the logit
  difference, fused into the decode.
- Anchor planes are precomputed host-side per (H, W) and baked into the
  jitted program as constants.
- NMS is the fixed-K masked kernel from ``terran_tpu.ops.nms``, vmapped over
  the batch; outputs are fixed-shape arrays + validity masks.
"""

import functools


import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from terran_tpu.models.layers import ConvAffine, upsample2x_nearest
from terran_tpu.ops.nms import nms_fixed

# Anchor configuration for the `mnet` backbone, matching
# /root/reference/terran/face/detection/retinaface/wrapper.py:100-117.
FEATURE_STRIDES = (32, 16, 8)
ANCHOR_SCALES = {32: (32, 16), 16: (8, 4), 8: (2, 1)}
ANCHOR_BASE_SIZE = 16
NUM_ANCHORS = 2


class ConvSepBlock(nn.Module):
    """1x1 conv-BN-ReLU followed by a depthwise 3x3 conv-BN-ReLU.

    Mirrors model.py:6-50. When ``return_both`` the 1x1 output doubles as a
    feature-pyramid tap.
    """

    features: int
    stride: int = 1
    return_both: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = ConvAffine(
            self.features, (1, 1), 1, 0, compute_dtype=self.compute_dtype,
            name="conv_block",
        )(x)
        sep = ConvAffine(
            self.features, (3, 3), self.stride, 1, groups=self.features,
            compute_dtype=self.compute_dtype, name="sep_block",
        )(conv)
        return (conv, sep) if self.return_both else sep


class BaseNetwork(nn.Module):
    """Pseudo-MobileNet(0.25) emitting stride-8/16/32 features (model.py:53-112)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        x = ConvAffine(8, (3, 3), 2, 1, compute_dtype=dt, name="first_conv")(x)
        x = ConvAffine(8, (3, 3), 1, 1, groups=8, compute_dtype=dt, name="first_sep")(x)

        # Scale group 0 -> stride-8 tap.
        x = ConvSepBlock(16, stride=2, compute_dtype=dt, name="s0_b0")(x)
        x = ConvSepBlock(32, compute_dtype=dt, name="s0_b1")(x)
        x = ConvSepBlock(32, stride=2, compute_dtype=dt, name="s0_b2")(x)
        x = ConvSepBlock(64, compute_dtype=dt, name="s0_b3")(x)
        feat8, x = ConvSepBlock(
            64, stride=2, return_both=True, compute_dtype=dt, name="s0_b4"
        )(x)

        # Scale group 1 -> stride-16 tap.
        for i in range(5):
            x = ConvSepBlock(128, compute_dtype=dt, name=f"s1_b{i}")(x)
        feat16, x = ConvSepBlock(
            128, stride=2, return_both=True, compute_dtype=dt, name="s1_b5"
        )(x)

        # Final block -> stride-32 tap.
        x = ConvSepBlock(256, compute_dtype=dt, name="final_b0")(x)
        feat32 = ConvAffine(256, (1, 1), 1, 0, compute_dtype=dt, name="final_conv")(x)

        return feat8, feat16, feat32


class ContextModule(nn.Module):
    """3x3/5x5/7x7 receptive-field mixer (model.py:115-165)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        ctx3 = ConvAffine(32, (3, 3), 1, 1, compute_dtype=dt, name="ctx3")(x)
        red = ConvAffine(16, (3, 3), 1, 1, compute_dtype=dt, name="reducer")(x)
        ctx5 = ConvAffine(16, (3, 3), 1, 1, compute_dtype=dt, name="ctx5")(red)
        ctx7 = ConvAffine(16, (3, 3), 1, 1, compute_dtype=dt, name="ctx7a")(red)
        ctx7 = ConvAffine(16, (3, 3), 1, 1, compute_dtype=dt, name="ctx7b")(ctx7)
        return jnp.concatenate([ctx3, ctx5, ctx7], axis=-1)


class PyramidRefiner(nn.Module):
    """FPN top-down refinement + context modules (model.py:168-245)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        dt = self.compute_dtype
        f8, f16, f32 = feats
        p8 = ConvAffine(64, (1, 1), 1, 0, compute_dtype=dt, name="conv_s8")(f8)
        p16 = ConvAffine(64, (1, 1), 1, 0, compute_dtype=dt, name="conv_s16")(f16)
        p32 = ConvAffine(64, (1, 1), 1, 0, compute_dtype=dt, name="conv_s32")(f32)

        p16 = p16 + upsample2x_nearest(p32, p16.shape[1], p16.shape[2])
        p16 = ConvAffine(64, (3, 3), 1, 1, compute_dtype=dt, name="aggr_s16")(p16)

        p8 = p8 + upsample2x_nearest(p16, p8.shape[1], p8.shape[2])
        p8 = ConvAffine(64, (3, 3), 1, 1, compute_dtype=dt, name="aggr_s8")(p8)

        c8 = ContextModule(compute_dtype=dt, name="ctx_s8")(p8)
        c16 = ContextModule(compute_dtype=dt, name="ctx_s16")(p16)
        c32 = ContextModule(compute_dtype=dt, name="ctx_s32")(p32)
        return c8, c16, c32


class Heads(nn.Module):
    """Per-stride 1x1 heads: cls (2A), bbox (4A), landmarks (10A).

    Mirrors OutputsPredictor (model.py:248-316) but defers the softmax to the
    fused decode.
    """

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = {}
        for stride, feat in zip((8, 16, 32), feats):
            cls = nn.Conv(
                2 * NUM_ANCHORS, (1, 1), use_bias=True, dtype=self.compute_dtype,
                param_dtype=jnp.float32, name=f"cls_s{stride}",
            )(feat)
            box = nn.Conv(
                4 * NUM_ANCHORS, (1, 1), use_bias=True, dtype=self.compute_dtype,
                param_dtype=jnp.float32, name=f"bbox_s{stride}",
            )(feat)
            lmk = nn.Conv(
                10 * NUM_ANCHORS, (1, 1), use_bias=True, dtype=self.compute_dtype,
                param_dtype=jnp.float32, name=f"landmark_s{stride}",
            )(feat)
            outs[stride] = (cls, box, lmk)
        return outs


class RetinaFace(nn.Module):
    """Full detector graph: backbone -> FPN refine -> heads (model.py:319-341)."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = BaseNetwork(compute_dtype=self.compute_dtype, name="base")(x)
        feats = PyramidRefiner(compute_dtype=self.compute_dtype, name="refiner")(feats)
        return Heads(compute_dtype=self.compute_dtype, name="heads")(feats)


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------

def anchor_reference(stride):
    """(A, 4) anchor template for a stride, centred on the first cell.

    Equivalent to generate_anchors(base_size=16, ratios=(1,), scales)
    (anchors.py:75-134): with ratio 1 the template for scale ``s`` is a
    square of side ``16 * s`` centred at (7.5, 7.5).
    """
    anchors = []
    for s in ANCHOR_SCALES[stride]:
        side = ANCHOR_BASE_SIZE * s
        ctr = (ANCHOR_BASE_SIZE - 1) / 2.0
        anchors.append(
            [ctr - 0.5 * (side - 1), ctr - 0.5 * (side - 1),
             ctr + 0.5 * (side - 1), ctr + 0.5 * (side - 1)]
        )
    return np.array(anchors, dtype=np.float32)


@functools.lru_cache(maxsize=256)
def anchors_for_shape(height, width):
    """All anchors for an input of (height, width), concatenated over strides
    32, 16, 8 in the reference's order (wrapper.py:169,200-202).

    Returns (A_total, 4) float32 numpy array in (x1, y1, x2, y2) image coords.
    """
    planes = []
    for stride in FEATURE_STRIDES:
        fh = -(-height // stride)
        fw = -(-width // stride)
        ref = anchor_reference(stride)  # (A, 4)
        shift_x = (np.arange(fw) * stride).astype(np.float32)
        shift_y = (np.arange(fh) * stride).astype(np.float32)
        sx, sy = np.meshgrid(shift_x, shift_y)  # (fh, fw)
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        plane = (ref[None, :, :] + shifts).reshape(-1, 4)
        planes.append(plane)
    return np.concatenate(planes, axis=0)


def anchor_cell_meta(height, width):
    """Per-anchor feature-map CELL coordinates and stride for an input of
    (height, width): (cell_x, cell_y, cell_stride) int32 numpy arrays,
    concatenated over strides in :data:`FEATURE_STRIDES` order — the same
    anchor order as :func:`anchors_for_shape`. Shared by the ceil-cell
    validity masking in :func:`make_detect_fn` and the spatial-sharding
    ownership partition (``parallel/spatial.py``), which must stay
    aligned with decode order by construction, not by two hand-synced
    copies."""
    cell_x, cell_y, cell_stride = [], [], []
    for stride in FEATURE_STRIDES:
        fh = -(-height // stride)
        fw = -(-width // stride)
        ys, xs = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        for arr, vals in ((cell_x, xs), (cell_y, ys)):
            arr.append(np.repeat(vals.reshape(-1), NUM_ANCHORS))
        cell_stride.append(np.full(fh * fw * NUM_ANCHORS, stride))
    return (
        np.concatenate(cell_x).astype(np.int32),
        np.concatenate(cell_y).astype(np.int32),
        np.concatenate(cell_stride).astype(np.int32),
    )


def decode_outputs(outputs, anchors):
    """Fused decode of the raw head outputs into scores/boxes/landmarks.

    Matches decode_bboxes/decode_landmarks (wrapper.py:25-89) and the
    score/reshape plumbing of wrapper.py:169-202, for the whole batch at once.

    Parameters
    ----------
    outputs : dict stride -> (cls, box, lmk) NHWC tensors from the model.
    anchors : (A_total, 4) array, from :func:`anchors_for_shape`.

    Returns
    -------
    scores (N, A_total), boxes (N, A_total, 4), landmarks (N, A_total, 5, 2),
    all float32.
    """
    scores_l, boxes_l, lmks_l = [], [], []
    for stride in FEATURE_STRIDES:
        cls, box, lmk = outputs[stride]
        n, h, w, _ = cls.shape
        cls = cls.astype(jnp.float32)
        # Channels are [bg_a0, bg_a1, face_a0, face_a1]; the per-anchor
        # two-way softmax reduces to sigmoid(face - bg).
        face = jax.nn.sigmoid(
            cls[..., NUM_ANCHORS:] - cls[..., :NUM_ANCHORS]
        )  # (N, H, W, A)
        scores_l.append(face.reshape(n, -1))
        boxes_l.append(box.astype(jnp.float32).reshape(n, -1, 4))
        lmks_l.append(lmk.astype(jnp.float32).reshape(n, -1, 5, 2))

    scores = jnp.concatenate(scores_l, axis=1)
    deltas = jnp.concatenate(boxes_l, axis=1)
    lmk_deltas = jnp.concatenate(lmks_l, axis=1)

    anchors = jnp.asarray(anchors)
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    ctr_x = anchors[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = anchors[:, 1] + 0.5 * (heights - 1.0)

    pred_ctr_x = deltas[..., 0] * widths + ctr_x
    pred_ctr_y = deltas[..., 1] * heights + ctr_y
    pred_w = jnp.exp(deltas[..., 2]) * widths
    pred_h = jnp.exp(deltas[..., 3]) * heights
    boxes = jnp.stack(
        [
            pred_ctr_x - 0.5 * (pred_w - 1.0),
            pred_ctr_y - 0.5 * (pred_h - 1.0),
            pred_ctr_x + 0.5 * (pred_w - 1.0),
            pred_ctr_y + 0.5 * (pred_h - 1.0),
        ],
        axis=-1,
    )

    landmarks = jnp.stack(
        [
            lmk_deltas[..., 0] * widths[None, :, None] + ctr_x[None, :, None],
            lmk_deltas[..., 1] * heights[None, :, None] + ctr_y[None, :, None],
        ],
        axis=-1,
    )

    return scores, boxes, landmarks


def make_detect_fn(model: RetinaFace, height: int, width: int, *,
                   nms_threshold: float = 0.4, top_k: int = 256):
    """Build the jitted end-to-end detection step for a fixed input shape.

    The returned function maps (params, images_u8 (N,H,W,3) uint8 RGB,
    threshold, valid_w, valid_h) to fixed-shape per-image detections:
    boxes (N, K, 4), landmarks (N, K, 5, 2), scores (N, K), mask (N, K).

    ``valid_w``/``valid_h`` mask out anchors whose feature-map CELL lies
    beyond the valid region when the pad-bucketing mode is active (pass
    width/height for a no-op). The test is on cell indices, not anchor
    centres: the reference evaluates every cell of its ceil-sized feature
    maps (anchors_plane over ceil(H/stride) x ceil(W/stride),
    wrapper.py:153-163), and the last cell's anchor centre can exceed the
    image width whenever width % stride != 0 — masking by centre would
    silently drop real edge detections even in exact mode.
    """
    anchors = anchors_for_shape(height, width)
    cell_x, cell_y, cell_stride = anchor_cell_meta(height, width)

    @jax.jit
    def detect(params, images, threshold=0.5, valid_w=width, valid_h=height):
        x = images.astype(model.compute_dtype)
        outputs = model.apply({"params": params}, x)
        scores, boxes, landmarks = decode_outputs(outputs, anchors)

        # Cell valid iff its index < ceil(valid / stride) — exactly the
        # cells the reference would evaluate for the unpadded size.
        stride = jnp.asarray(cell_stride)
        valid_cells_x = (valid_w + stride - 1) // stride
        valid_cells_y = (valid_h + stride - 1) // stride
        in_bounds = (jnp.asarray(cell_x) < valid_cells_x) & (
            jnp.asarray(cell_y) < valid_cells_y
        )
        scores = jnp.where(in_bounds[None, :], scores, 0.0)

        def per_image(s, b, l):
            kb, ks, keep, order, overflow = nms_fixed(
                b, s, nms_threshold, score_threshold=threshold, top_k=top_k
            )
            return kb, l[order], ks, keep, overflow

        boxes, landmarks, scores, mask, overflow = jax.vmap(per_image)(
            scores, boxes, landmarks
        )
        # Pack everything into ONE (N, K, 17) array so a single d2h
        # transfer returns all results: each host<->device round trip
        # costs ~25 ms through a tunneled runtime and dominates batch-1
        # latency for this tiny model. Channel 16 is the per-image NMS
        # overflow flag broadcast along K.
        packed = jnp.concatenate(
            [
                boxes,
                landmarks.reshape(landmarks.shape[0], landmarks.shape[1], 10),
                scores[..., None],
                mask[..., None].astype(jnp.float32),
                jnp.broadcast_to(
                    overflow[:, None, None], scores.shape + (1,)
                ).astype(jnp.float32),
            ],
            axis=-1,
        )
        return packed

    return detect


def unpack_detections(packed):
    """Split the packed (N, K, 17) detect output back into (boxes (N,K,4),
    landmarks (N,K,5,2), scores (N,K), mask (N,K) bool, overflow (N,) bool).

    ``overflow`` marks images where more candidates cleared the score
    threshold than the fixed top-K pre-selection kept — the only regime
    where the keep-set can diverge from unbounded greedy NMS."""
    n, k, _ = packed.shape
    boxes = packed[..., :4]
    landmarks = packed[..., 4:14].reshape(n, k, 5, 2)
    scores = packed[..., 14]
    mask = packed[..., 15] > 0.5
    overflow = packed[..., 0, 16] > 0.5
    return boxes, landmarks, scores, mask, overflow
