"""Decompose the detect program's device cost on TPU (round-3 perf attack).

The detect program (pipeline._perception_fn) is resize -> RetinaFace
forward -> decode -> vmapped fixed-K NMS -> pack. Architecture notes
record decode+NMS at ~4.6 ms of the ~6.7 ms program with K=64 x 8
images — suspiciously close to pure `fori_loop` overhead (64 sequential
(8, 64)-element steps). This script scan-times (the only trustworthy
clock through the axon relay — see CLAUDE.md) each piece and the NMS
suppression loop at several unroll factors.

Prints one JSON line per measurement.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from device_time import scan_time


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _random_params
    from terran_tpu.models.retinaface import (
        anchors_for_shape, decode_outputs,
    )
    from terran_tpu.ops.nms import iou_matrix
    from terran_tpu.ops.resize import resize_bilinear, resized_shape
    from terran_tpu.pipeline import PerceptionPipeline

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    def want(section):
        return only is None or section in only

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    batch, h, w = 8, 1080, 1920
    top_k = 64
    pipe = PerceptionPipeline(
        det_params=_random_params("retinaface"),
        rec_params=None, with_embeddings=False,
        pose_params=None, with_pose=False,
        top_k=top_k, max_escalations=0,
    )
    frames = np.random.default_rng(0).integers(
        0, 255, (batch, h, w, 3), dtype=np.uint8
    )
    frames_dev = jax.block_until_ready(jax.device_put(frames))

    def emit(name, ms):
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    # 1. Full detect program (the production path).
    if want("full"):
        step = pipe._perception_fn(h, w)
        t0 = time.time()
        ms, _ = scan_time(
            lambda p, r, f: step(p, r, f),
            (pipe.det_params, None, frames_dev), perturb_index=2, iters=16,
        )
        emit("detect_full", ms)
        print(json.dumps({"compile_s": round(time.time() - t0, 1)}),
              flush=True)

    det_h, det_w, det_scale = resized_shape(h, w, pipe.det_short_side)
    anchors = anchors_for_shape(det_h, det_w)
    print(json.dumps({"det_hw": [det_h, det_w],
                      "anchors": int(anchors.shape[0])}), flush=True)

    # 2. Resize alone.
    rs = jax.jit(lambda f: jnp.round(resize_bilinear(f, det_h, det_w)))
    if want("resize"):
        ms, _ = scan_time(rs, (frames_dev,), perturb_index=0, iters=16)
        emit("resize", ms)

    frames_det = jax.block_until_ready(rs(frames_dev))

    # 3. RetinaFace forward alone (on pre-resized frames).
    fwd = jax.jit(lambda p, x: pipe.det_model.apply(
        {"params": p}, x.astype(pipe.det_model.compute_dtype)
    ))
    if want("fwd"):
        ms, _ = scan_time(fwd, (pipe.det_params, frames_det),
                          perturb_index=1, iters=16)
        emit("retinaface_fwd", ms)

    outputs = jax.block_until_ready(fwd(pipe.det_params, frames_det))

    # 4. Decode alone (sigmoid + box/landmark decode, no NMS).
    dec = jax.jit(lambda o: decode_outputs(o, anchors))
    # Perturb one head tensor (the first stride's cls logits).
    keys = list(outputs)
    cls0 = outputs[keys[0]][0]
    rest0 = tuple(outputs[keys[0]][1:])
    others = {k: outputs[k] for k in keys[1:]}
    if want("decode"):
        ms, _ = scan_time(
            lambda c0, r0, oth: decode_outputs(
                {keys[0]: (c0,) + tuple(r0), **oth}, anchors),
            (cls0, rest0, others),
            perturb_index=0, iters=16,
        )
        emit("decode", ms)

    scores, boxes, landmarks = jax.block_until_ready(
        dec(outputs)
    )

    # 5. NMS variants on the real decoded candidates.
    def nms_variant(unroll):
        def one(s, b):
            above = s >= pipe.threshold
            overflow = above.sum() > top_k
            s = jnp.where(above, s, -jnp.inf)
            top_scores, order = jax.lax.top_k(s, top_k)
            top_boxes = b[order]
            valid = jnp.isfinite(top_scores)
            ious = iou_matrix(top_boxes, top_boxes)

            def body(i, suppressed):
                keep_i = jnp.logical_not(suppressed[i]) & valid[i]
                row = ious[i] > pipe.nms_threshold
                later = jnp.arange(top_k) > i
                return suppressed | (keep_i & row & later)

            if unroll == "python":
                suppressed = jnp.zeros(top_k, bool)
                for i in range(top_k):
                    suppressed = body(i, suppressed)
            else:
                suppressed = jax.lax.fori_loop(
                    0, top_k, body, jnp.zeros(top_k, bool),
                    unroll=unroll,
                )
            keep = jnp.logical_not(suppressed) & valid
            return top_boxes, top_scores, keep, overflow

        return jax.jit(jax.vmap(one))

    if want("nms"):
        for unroll in (1, 4, 16, "python"):
            fn = nms_variant(unroll)
            ms, _ = scan_time(fn, (scores, boxes), perturb_index=0,
                              iters=16)
            emit(f"nms_unroll_{unroll}", ms)

    # 6. top_k preselect alone (is the sort the cost, or the loop?).
    if want("topk"):
        tk = jax.jit(jax.vmap(lambda s: jax.lax.top_k(s, top_k)))
        ms, _ = scan_time(tk, (scores,), perturb_index=0, iters=16)
        emit("topk_only", ms)

    # 7. Calibration: the scan-step floor for a near-empty body on the
    # same input — subtract this from the small measurements above.
    if want("noop"):
        ms, _ = scan_time(lambda s: jnp.sum(s), (scores,),
                          perturb_index=0, iters=16)
        emit("noop_floor", ms)

    # 8. Fused decode+NMS exactly as the detect program composes them —
    # the marginal over `decode` is what NMS really adds in context.
    if want("declnms"):
        from terran_tpu.ops.nms import nms_fixed

        def decnms(c0, r0, oth):
            s, b, l = decode_outputs(
                {keys[0]: (c0,) + tuple(r0), **oth}, anchors)

            def one(s_i, b_i, l_i):
                kb, ks, keep, order, overflow = nms_fixed(
                    b_i, s_i, pipe.nms_threshold,
                    score_threshold=pipe.threshold, top_k=top_k,
                )
                return kb, l_i[order], ks, keep, overflow

            return jax.vmap(one)(s, b, l)

        ms, _ = scan_time(decnms, (cls0, rest0, others),
                          perturb_index=0, iters=16)
        emit("decode_plus_nms", ms)


if __name__ == "__main__":
    main()
