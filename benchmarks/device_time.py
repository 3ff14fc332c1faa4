"""Relay-proof device timing: N iterations inside ONE jitted program.

Through a tunneled/relayed TPU runtime, per-dispatch timing loops measure
the RPC path, not the device: dispatch latency swings 1-35 ms between
sessions, and `block_until_ready` on this relay returns before execution
finishes (only fetching result BYTES forces completion — measured here by
comparing against the chip's ~191 TFLOP/s bf16 peak (benchmarks/peak.py):
a dispatch-loop "0.8 ms" embed implies 1800+ TFLOP/s, which is
impossible).

`scan_time(fn, args, iters)` wraps ``fn`` in a device loop whose carry
perturbs one array input each step (so XLA cannot hoist the body or CSE
the iterations). The loop's trip count is a RUNTIME argument
(`lax.while_loop`), so ONE compiled program is timed at two different
counts and the per-iteration time is the slope between them — the
dispatch+fetch round trip (30-45 ms on this relay, session-dependent)
cancels exactly instead of being amortised. Earlier rounds divided a
single dispatch by ``iters``, which silently adds RPC/iters (~2 ms at
iters=16) to every number; the slope form removes that bias with the
same single compile.

Usage: `python benchmarks/device_time.py` prints the per-program device
times of the three pipeline programs at 1080p batch 8 as one JSON line.
"""

import json
import time

import numpy as np


def scan_time(fn, args, *, perturb_index=0, iters=32, reps=3):
    """Slope-timed device cost of ``fn(*args)``.

    fn must be jit-compatible; args[perturb_index] must be an array whose
    first element can be bumped by an iteration counter (keeps every loop
    step distinct). The body runs ``iters`` times and ``iters // 4``
    times (same compiled program, runtime trip count), each timed
    best-of-``reps``; the per-iteration ms is the slope, which cancels
    the constant dispatch+fetch term. Returns (ms_per_iter,
    accumulated_total_of_a_full_iters_run).
    """
    import jax
    import jax.numpy as jnp

    args = list(args)

    @jax.jit
    def many(n, *a):
        x0 = jnp.asarray(a[perturb_index])

        def body(carry):
            i, acc = carry
            x = x0 + i.astype(x0.dtype)  # distinct input per step
            inner = list(a)
            inner[perturb_index] = x
            out = fn(*inner)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return i + 1, acc + s

        _, total = jax.lax.while_loop(
            lambda c: c[0] < n,
            body,
            (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)),
        )
        return total

    n_hi = jnp.asarray(iters, jnp.int32)
    n_lo = jnp.asarray(max(1, iters // 4), jnp.int32)
    # Compile + one full execution; also the returned accumulator (the
    # tests pin its value to prove every step saw a distinct input).
    val = float(np.asarray(many(n_hi, *args)))

    def timed(n):
        best = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            float(np.asarray(many(n, *args)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(n_lo)
    t_hi = timed(n_hi)
    steps = int(n_hi) - int(n_lo)
    if steps <= 0:
        return t_hi / max(int(n_hi), 1) * 1000.0, val
    ms = (t_hi - t_lo) / steps * 1000.0
    # Relay jitter can make the short run measure longer than the long
    # one for near-empty bodies; clamp to a non-negative epsilon rather
    # than report a negative time.
    return max(ms, 1e-4), val


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

        from terran_tpu.ops.warp import best_warp_config

        ws = next((w for w in pipeline.embed_windows
                   if w <= min(height, width)), None)
        if ws is not None:
            packed = jnp.asarray(synthetic_embed_packed(
                batch, pipeline.max_faces, height, width, window=ws
            ))
            # Mirror the pipeline's dispatch (pipeline.py
            # _dispatch_adaptive_embed): the best WARP_CONFIGS ladder
            # entry — which is what production would run on this plan.
            mats = np.asarray(packed[..., :6]).reshape(-1, 2, 3)
            cfg = best_warp_config(mats)
            group, slab = cfg if cfg is not None else (None, None)
            we = pipeline._warp_embed_window_fn(
                pipeline.max_faces, ws, fd.shape, group=group, slab=slab
            )
            print(f"# embed program: window={ws} group={group} "
                  f"slab={slab}", file=_sys.stderr, flush=True)
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
