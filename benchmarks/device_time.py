"""Relay-proof device timing: N iterations inside ONE jitted program.

Through a tunneled/relayed TPU runtime, per-dispatch timing loops measure
the RPC path, not the device: dispatch latency swings 1-35 ms between
sessions, and `block_until_ready` on this relay returns before execution
finishes (only fetching result BYTES forces completion — measured here by
comparing against the chip's 369 TFLOP/s peak: a dispatch-loop "0.8 ms"
embed implies 1800+ TFLOP/s, which is impossible).

`scan_time(fn, args, iters)` wraps ``fn`` in a `lax.scan` whose carry
perturbs one array input each step (so XLA cannot hoist the body or CSE the
iterations), dispatches ONCE, fetches one scalar, and divides. The result
is device wall-time per iteration with a single RPC round trip amortised
over all iterations.

Usage: `python benchmarks/device_time.py` prints the per-program device
times of the three pipeline programs at 1080p batch 8 as one JSON line.
"""

import json
import time

import numpy as np


def scan_time(fn, args, *, perturb_index=0, iters=32, warm=True):
    """Median-free single-shot device timing of ``fn(*args)``.

    fn must be jit-compatible; args[perturb_index] must be an array whose
    first element can be bumped by an iteration counter (keeps every scan
    step distinct). Returns (ms_per_iter, result_of_last_iter_scalar).
    """
    import jax
    import jax.numpy as jnp

    args = list(args)
    base = jnp.asarray(args[perturb_index])

    @jax.jit
    def many(*a):
        x0 = jnp.asarray(a[perturb_index])

        def body(carry, i):
            x = x0 + i.astype(x0.dtype)  # distinct input per step
            inner = list(a)
            inner[perturb_index] = x
            out = fn(*inner)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return carry + acc, ()

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(iters, dtype=jnp.int32),
        )
        return total

    if warm:
        float(np.asarray(many(*args)))  # compile + one full execution
    t0 = time.perf_counter()
    val = float(np.asarray(many(*args)))
    elapsed = time.perf_counter() - t0
    return elapsed / iters * 1000.0, val


def scalar_roundtrip_ms(iters=7):
    """Median wall time of a tiny jitted bump + value fetch — the pure
    dispatch/transfer round trip that floors every batch-1 latency.
    Shared by bench.py (link context) and benchmarks/run_all.py (config
    0) so their 'round trip' numbers measure the same thing."""
    import jax

    bump = jax.jit(lambda x: x + 1)
    probe = np.zeros((8,), np.float32)
    np.asarray(bump(probe))  # compile
    trips = []
    for _ in range(max(iters, 3)):
        t0 = time.perf_counter()
        np.asarray(bump(probe))
        trips.append(time.perf_counter() - t0)
    return float(np.median(trips) * 1000.0)


def synthetic_embed_packed(batch, k_slots, height, width, face_px=64,
                           seed=0, window=None):
    """Full-occupancy adaptive-embed plan: (batch, k_slots, 9) f32 of
    plausible in-frame faces (6 alignment-matrix entries + validity +
    window y, x), for worst-case warp+embed timing. Slice ``[..., :7]``
    for the full-frame program; pass ``window`` to clip origins for the
    windowed one."""
    from terran_tpu.ops.warp import ARCFACE_TEMPLATE, alignment_matrix

    rng = np.random.default_rng(seed)
    corners = np.array([[0.5, 0.5], [111.5, 0.5], [0.5, 111.5],
                        [111.5, 111.5]])
    packed = np.zeros((batch, k_slots, 9), np.float32)
    for i in range(batch):
        for j in range(k_slots):
            scale = face_px / 112.0
            theta = rng.uniform(-0.3, 0.3)
            rot = np.array(
                [[np.cos(theta), -np.sin(theta)],
                 [np.sin(theta), np.cos(theta)]], np.float32
            ) * scale
            t = np.array([
                rng.uniform(0, max(1.0, width - face_px)),
                rng.uniform(0, max(1.0, height - face_px)),
            ])
            lmk = (ARCFACE_TEMPLATE - 56.0) @ rot.T + t + face_px / 2
            m = alignment_matrix(lmk)
            packed[i, j, :6] = m.reshape(-1)
            packed[i, j, 6] = 1.0
            src = corners @ m[:, :2].T + m[:, 2]
            lo = np.floor(src.min(axis=0)) - 3
            packed[i, j, 7] = lo[1]
            packed[i, j, 8] = lo[0]
    if window is not None:
        packed[..., 7] = np.clip(packed[..., 7], 0, height - window)
        packed[..., 8] = np.clip(packed[..., 8], 0, width - window)
    return packed


def synthetic_peak_plan(batch, parts, kb, ups_h, ups_w, seed=0):
    """Full-occupancy limb plan: (batch, parts, kb, 3) f32 of random
    in-field peak coordinates (y, x, valid), for worst-case limb timing."""
    rng = np.random.default_rng(seed)
    cv = np.ones((batch, parts, kb, 3), np.float32)
    cv[..., 0] = rng.integers(0, ups_h, (batch, parts, kb))
    cv[..., 1] = rng.integers(0, ups_w, (batch, parts, kb))
    return cv


def main():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tests")
    )
    import jax

    from __graft_entry__ import _random_params
    from terran_tpu.pipeline import PerceptionPipeline

    batch, height, width = 8, 1080, 1920
    iters = 16

    pipeline = PerceptionPipeline(
        det_params=_random_params("retinaface"),
        rec_params=_random_params("arcface"),
        pose_params=_random_params("openpose"),
        max_faces=8, top_k=64, max_peaks=16,
    )
    frames = np.random.default_rng(0).integers(
        0, 255, (batch, height, width, 3), dtype=np.uint8
    )
    fd = jax.block_until_ready(pipeline.put_frames(frames))
    step = pipeline._perception_fn(height, width)

    import sys as _sys

    detect_ms, _ = scan_time(
        lambda p, r, f: step(p, r, f), (pipeline.det_params,
                                        pipeline.rec_params, fd),
        perturb_index=2, iters=iters,
    )
    print(f"# detect {detect_ms:.2f} ms", file=_sys.stderr, flush=True)
    if pipeline.embed_dispatch == "adaptive":
        # Worst case: every slot occupied -> the full-capacity bucket.
        # The ~64 px synthetic faces select the smallest window bucket,
        # exactly as the pipeline would. Perturbing the (uint8, wrapping)
        # frames keeps scan steps distinct without disturbing the plan's
        # gather geometry.
        import jax.numpy as jnp

        ws = next((w for w in pipeline.embed_windows
                   if w <= min(height, width)), None)
        if ws is not None:
            packed = jnp.asarray(synthetic_embed_packed(
                batch, pipeline.max_faces, height, width, window=ws
            ))
            we = pipeline._warp_embed_window_fn(
                pipeline.max_faces, ws, fd.shape
            )
        else:
            packed = jnp.asarray(synthetic_embed_packed(
                batch, pipeline.max_faces, height, width
            )[..., :7])
            we = pipeline._warp_embed_fn(pipeline.max_faces, fd.shape)
        embed_ms, _ = scan_time(
            lambda p, f, pk: we(p, f, pk),
            (pipeline.rec_params, fd, packed), perturb_index=1,
            iters=iters,
        )
    else:
        out = step(pipeline.det_params, pipeline.rec_params, fd)
        embed = pipeline._embed_fn()
        # Perturb the float crop input for embed.
        embed_ms, _ = scan_time(
            lambda p, c, m: embed(p, c, m),
            (pipeline.rec_params, out["crops"], out["emb_mask_dev"]),
            perturb_index=1, iters=iters,
        )
    print(f"# embed {embed_ms:.2f} ms", file=_sys.stderr, flush=True)
    if pipeline.limb_dispatch == "adaptive":
        import jax.numpy as jnp

        from terran_tpu.ops.pose_decode import NUM_PARTS

        pd = pipeline._pose_detect_fn(height, width)
        p1_ms, _ = scan_time(
            lambda p, f: pd(p, f), (pipeline.pose_params, fd),
            perturb_index=1, iters=iters,
        )
        _, paf = pd(pipeline.pose_params, fd)
        fh, fw = paf.shape[1:3]
        cv = jnp.asarray(synthetic_peak_plan(
            batch, NUM_PARTS, pipeline.max_peaks, fh * 8, fw * 8
        ))
        limb = pipeline._limb_fn(pipeline.max_peaks, paf.shape)
        limb_ms, _ = scan_time(
            lambda pf, c: limb(pf, c), (paf, cv), perturb_index=0,
            iters=iters,
        )
        pose_ms = p1_ms + limb_ms
        print(f"# pose: detect {p1_ms:.2f} + limbs {limb_ms:.2f} ms",
              file=_sys.stderr, flush=True)
    else:
        posefn = pipeline._pose_fn(height, width)
        pose_ms, _ = scan_time(
            lambda p, f: posefn(p, f), (pipeline.pose_params, fd),
            perturb_index=1, iters=iters,
        )
    print(f"# pose {pose_ms:.2f} ms", file=_sys.stderr, flush=True)

    total_ms = detect_ms + embed_ms + pose_ms
    print(json.dumps({
        "metric": "device-only ms/batch (scan-timed, batch 8 @1080p)",
        "detect_ms": round(detect_ms, 2),
        "embed_ms": round(embed_ms, 2),
        "pose_ms": round(pose_ms, 2),
        "total_ms": round(total_ms, 2),
        "device_only_fps": round(batch / (total_ms / 1000.0), 1),
        "iters": iters,
    }))


if __name__ == "__main__":
    main()
