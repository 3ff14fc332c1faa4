"""Shared int8 post-training-quantisation helpers (opt-in paths).

The MXU's int8 rate is 2x bf16 (380 vs 190.7 TFLOP/s measured on this
chip — benchmarks/peak.py). These helpers implement the standard robust
PTQ recipe — symmetric per-output-channel static weight scales,
symmetric per-tensor dynamic activation scales — for the opt-in
quantised model paths (models/arcface.py, models/openpose.py
``apply_int8``). The reference has no quantised path, so every parity
surface defaults to full precision; accuracy against real weights runs
through the same golden protocol as everything else
(tests/test_goldens.py) once checkpoint downloads are possible.
"""

import jax
import jax.numpy as jnp


def quantize_conv_kernels(params, compute_dtype=jnp.float32, keep_f32=()):
    """Derive an int8 param tree from a f32 master tree.

    Every ``{'kernel': f32[kh, kw, cin, cout]}`` leaf outside a
    ``keep_f32`` subtree becomes ``kernel_q`` (int8) + ``kernel_scale``
    (f32 per-output-channel symmetric scales). All other float32 leaves
    are cast to ``compute_dtype`` — the same values the native path's
    load-time pre-cast produces — while ``keep_f32`` subtrees stay
    float32 (runtime.PARAMS_KEEP_F32 semantics).
    """
    compute_dtype = jnp.dtype(compute_dtype)
    keep = set(keep_f32)

    def walk(node, kept):
        if isinstance(node, dict):
            if "kernel" in node and not kept:
                w = jnp.asarray(node["kernel"], jnp.float32)
                axes = tuple(range(w.ndim - 1))
                scale = jnp.maximum(
                    jnp.max(jnp.abs(w), axis=axes) / 127.0, 1e-12
                )
                wq = jnp.clip(
                    jnp.round(w / scale), -127, 127
                ).astype(jnp.int8)
                out = {"kernel_q": wq, "kernel_scale": scale}
                for k, v in node.items():
                    if k != "kernel":
                        out[k] = walk(v, kept)
                return out
            return {k: walk(v, kept or k in keep) for k, v in node.items()}
        x = jnp.asarray(node)
        if (not kept and x.dtype == jnp.float32
                and compute_dtype != jnp.float32):
            return x.astype(compute_dtype)
        return x

    return walk(params, False)


def quant_conv(x, qp, stride, padding, dt):
    """int8 conv with a dynamic per-tensor activation scale; returns the
    dequantised (f32-scaled) output cast to ``dt``.

    The input is quantised symmetrically from its runtime max-abs (for
    post-ReLU tensors this naturally maps [0, max] onto [0, 127]); the
    MXU accumulates int8 x int8 -> int32 exactly, and the two scales
    fold into one f32 multiply on the way out.
    """
    xs = jnp.maximum(
        jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12
    )
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / xs), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, qp["kernel_q"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (
        acc.astype(jnp.float32) * (xs * qp["kernel_scale"])
    ).astype(dt)
