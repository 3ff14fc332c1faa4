"""RetinaFace: anchors, decode plumbing, and full conversion parity vs the
torch functional oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terran_tpu.models.retinaface import (
    RetinaFace, anchor_reference, anchors_for_shape, decode_outputs,
    make_detect_fn, unpack_detections,
)
from terran_tpu.utils.convert import convert_retinaface
from torch_oracle import random_retinaface_state_dict, retinaface_forward


def test_anchor_reference_values():
    # ratio 1, base 16 -> squares of side 16*s centred at 7.5.
    ref32 = anchor_reference(32)
    assert ref32.shape == (2, 4)
    # scale 32: side 512 -> [7.5-255.5, ..., 7.5+255.5]
    np.testing.assert_allclose(ref32[0], [-248.0, -248.0, 263.0, 263.0])
    np.testing.assert_allclose(ref32[1], [-120.0, -120.0, 135.0, 135.0])
    ref8 = anchor_reference(8)
    np.testing.assert_allclose(ref8[0], [-8.0, -8.0, 23.0, 23.0])
    np.testing.assert_allclose(ref8[1], [0.0, 0.0, 15.0, 15.0])


def test_anchor_plane_layout():
    anchors = anchors_for_shape(64, 96)
    # ceil sizes per stride: 32 -> 2x3, 16 -> 4x6, 8 -> 8x12; 2 anchors each.
    expected = (2 * 3 + 4 * 6 + 8 * 12) * 2
    assert anchors.shape == (expected, 4)
    # First plane rows iterate anchors fastest, then x, then y.
    np.testing.assert_allclose(anchors[0], [-248.0, -248.0, 263.0, 263.0])
    np.testing.assert_allclose(anchors[1], [-120.0, -120.0, 135.0, 135.0])
    np.testing.assert_allclose(anchors[2], [-248.0 + 32, -248.0, 263.0 + 32, 263.0])


def _np_reference_decode(outputs_nchw, height, width):
    """Decode per the reference wrapper's semantics (wrapper.py:153-202),
    reimplemented in numpy as a test oracle."""
    strides = [32, 16, 8]
    anchors = anchors_for_shape(height, width)
    offsets = []
    total = 0
    for s in strides:
        fh, fw = -(-height // s), -(-width // s)
        offsets.append((total, total + fh * fw * 2))
        total += fh * fw * 2

    scores_l, boxes_l, lmks_l = [], [], []
    for idx, s in enumerate(strides):
        cls, box, lmk = [np.asarray(o) for o in outputs_nchw[idx * 3: idx * 3 + 3]]
        n = cls.shape[0]
        scores = cls[:, 2:, :, :].transpose(0, 2, 3, 1).reshape(n, -1)
        box = box.transpose(0, 2, 3, 1).reshape(n, -1, 4)
        lmk = lmk.transpose(0, 2, 3, 1).reshape(n, -1, 5, 2)
        scores_l.append(scores)
        boxes_l.append(box)
        lmks_l.append(lmk)

    scores = np.concatenate(scores_l, axis=1)
    deltas = np.concatenate(boxes_l, axis=1)
    lmk_deltas = np.concatenate(lmks_l, axis=1)

    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    ctr_x = anchors[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = anchors[:, 1] + 0.5 * (heights - 1.0)

    pcx = deltas[..., 0] * widths + ctr_x
    pcy = deltas[..., 1] * heights + ctr_y
    pw = np.exp(deltas[..., 2]) * widths
    ph = np.exp(deltas[..., 3]) * heights
    boxes = np.stack([
        pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
        pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1),
    ], axis=-1)
    lmks = np.stack([
        lmk_deltas[..., 0] * widths[None, :, None] + ctr_x[None, :, None],
        lmk_deltas[..., 1] * heights[None, :, None] + ctr_y[None, :, None],
    ], axis=-1)
    return scores, boxes, lmks


@pytest.fixture(scope="module")
def converted():
    rng = np.random.default_rng(42)
    sd = random_retinaface_state_dict(rng)
    params = convert_retinaface(sd)
    return sd, params


def test_conversion_structure(converted):
    sd, params = converted
    model = RetinaFace()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )["params"]
    got_paths = set(jax.tree_util.tree_leaves_with_path(params, is_leaf=None) and
                    [jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]])
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    assert got_paths == ref_paths
    # Shapes must match too.
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(ref)[0]}
    for p, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        assert np.asarray(v).shape == ref_shapes[jax.tree_util.keystr(p)], p


def test_full_model_parity(converted):
    """flax(convert(sd), RGB) must match torch-oracle(sd, BGR) end to end."""
    sd, params = converted
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, size=(2, 64, 96, 3)).astype(np.float32)

    # Oracle: reference feeds BGR NCHW (wrapper.py:144-146).
    torch_outs = retinaface_forward(
        sd, images[..., ::-1].transpose(0, 3, 1, 2).copy()
    )
    exp_scores, exp_boxes, exp_lmks = _np_reference_decode(
        [o.numpy() for o in torch_outs], 64, 96
    )

    model = RetinaFace()
    outputs = model.apply({"params": params}, jnp.asarray(images))
    scores, boxes, lmks = decode_outputs(outputs, anchors_for_shape(64, 96))

    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=2e-4)
    np.testing.assert_allclose(np.asarray(boxes), exp_boxes, rtol=1e-3,
                               atol=0.15)
    np.testing.assert_allclose(np.asarray(lmks), exp_lmks, rtol=1e-3, atol=0.15)


def test_detect_fn_shapes(converted):
    _, params = converted
    model = RetinaFace()
    detect = make_detect_fn(model, 64, 96, top_k=32)
    images = np.zeros((2, 64, 96, 3), np.uint8)
    boxes, lmks, scores, mask, _ = unpack_detections(
        np.asarray(detect(params, images, 0.5))
    )
    assert boxes.shape == (2, 32, 4)
    assert lmks.shape == (2, 32, 5, 2)
    assert scores.shape == (2, 32)
    assert mask.shape == (2, 32)
