"""Decompose the warp+embed device cost on TPU (round-3 perf attack).

Times, scan-timed (the only trustworthy clock through the axon relay —
see CLAUDE.md): the full windowed warp+embed program at full occupancy,
the ArcFace forward alone (f32-stored vs bf16-stored params), the warp
gather alone, and the head projection in f32 vs bf16-with-f32-accum.
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

from device_time import scan_time, synthetic_embed_packed


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _random_params
    from terran_tpu.pipeline import PerceptionPipeline

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))

    batch, h, w, mf = 8, 1080, 1920, 8
    rec = _random_params("arcface")
    pipe = PerceptionPipeline(
        det_params=_random_params("retinaface"),
        rec_params=rec,
        pose_params=None, with_pose=False,
        max_faces=mf, top_k=64, max_escalations=0,
    )
    frames = np.random.default_rng(0).integers(
        0, 255, (batch, h, w, 3), dtype=np.uint8
    )
    frames_dev = jax.block_until_ready(jax.device_put(frames))
    ws = 256
    packed = jnp.asarray(synthetic_embed_packed(batch, mf, h, w, window=ws))

    def emit(name, ms):
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)

    # 1. Full windowed warp+embed program (current hot path).
    we = pipe._warp_embed_window_fn(mf, ws, frames_dev.shape)
    t0 = time.time()
    ms, _ = scan_time(lambda rp, f, pk: we(rp, f, pk),
                      (pipe.rec_params, frames_dev, packed),
                      perturb_index=1, iters=10)
    emit("warp_embed_full", ms)
    print(json.dumps({"compile_s": round(time.time() - t0, 1)}))

    # 2. ArcFace forward alone, f32-stored params (today's storage).
    crops = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (batch * mf, 112, 112, 3)
    ).astype(np.float32))
    model = pipe.rec_model

    def fwd(rp, x):
        return model.apply({"params": rp}, x.astype(model.compute_dtype))

    f = jax.jit(fwd)
    ms, _ = scan_time(f, (pipe.rec_params, crops), perturb_index=1, iters=10)
    emit("arcface_fwd_f32_params", ms)

    # 3. ArcFace forward, bf16-stored params (cast moved to load time).
    from terran_tpu.runtime import cast_params_for_compute

    rec_bf16 = jax.device_put(
        cast_params_for_compute(rec, jnp.bfloat16)
    )
    # Keep the head Dense f32 (it computes in f32 deliberately).
    rec_bf16["embed"] = jax.device_put(rec["embed"])
    ms, _ = scan_time(f, (rec_bf16, crops), perturb_index=1, iters=10)
    emit("arcface_fwd_bf16_params", ms)

    # 4. Warp alone (windowed gather, no embed).
    from terran_tpu.ops.warp import warp_affine_windowed

    def warp_only(f_, pk):
        b = f_.shape[0]
        mats = pk[..., :6].reshape(b * mf, 2, 3)
        oyx = pk[..., 7:9].astype(jnp.int32)

        def slice_one(img, o):
            return jax.lax.dynamic_slice(img, (o[0], o[1], 0),
                                         (ws, ws, img.shape[2]))

        wins = jax.vmap(jax.vmap(slice_one, in_axes=(None, 0)))(f_, oyx)
        wflat = wins.reshape((b * mf,) + wins.shape[2:])
        crops_ = jax.vmap(
            lambda wdw, m, o: warp_affine_windowed(wdw, m, o, h, w)
        )(wflat, mats, oyx.reshape(-1, 2))
        return jnp.round(crops_)

    wo = jax.jit(warp_only)
    ms, _ = scan_time(wo, (frames_dev, packed), perturb_index=0, iters=10)
    emit("warp_only", ms)

    # 5. Head projection: f32 vs bf16-in/f32-accum.
    head_in = jnp.asarray(np.random.default_rng(2).normal(
        size=(batch * mf, 7 * 7 * 512)
    ).astype(np.float32))
    kern = jnp.asarray(np.random.default_rng(3).normal(
        size=(7 * 7 * 512, 512)
    ).astype(np.float32) * 0.01)

    hf32 = jax.jit(lambda x, k: x @ k)
    ms, _ = scan_time(hf32, (head_in, kern), perturb_index=0, iters=10)
    emit("head_dense_f32", ms)

    hbf16 = jax.jit(lambda x, k: jax.lax.dot_general(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ))
    kern16 = kern.astype(jnp.bfloat16)
    ms, _ = scan_time(
        lambda x, k: jax.lax.dot_general(
            x.astype(jnp.bfloat16), k,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32),
        (head_in, kern16), perturb_index=0, iters=10)
    emit("head_dense_bf16_f32accum", ms)


if __name__ == "__main__":
    main()
