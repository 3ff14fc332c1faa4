"""Integer-factor bicubic upsampling matching torch's semantics.

The reference upsamples PAFs/heatmaps x8 with
``F.interpolate(mode='bicubic', align_corners=False)``
(/root/reference/terran/pose/openpose/wrapper.py:212-223). torch's bicubic
uses the Keys kernel with A = -0.75 and half-pixel centres
(``src = (dst + 0.5) / 8 - 0.5``) with border taps clamped.
``jax.image.resize`` uses A = -0.5, so it would NOT match; instead, for a
fixed integer factor the fractional phase cycles through ``factor`` values,
letting us express the op as ``factor`` fixed 4-tap FIR filters per axis —
a handful of fused multiply-adds on the VPU, no gathers.
"""

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x, a=-0.75):
    x = abs(float(x))
    if x <= 1.0:
        return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0
    if x < 2.0:
        return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a
    return 0.0


@functools.lru_cache(maxsize=8)
def _phase_table(factor):
    """Per-phase (base offset, 4 tap weights) for the half-pixel mapping."""
    bases, weights = [], []
    for r in range(factor):
        src = (r + 0.5) / factor - 0.5
        base = int(np.floor(src))
        t = src - base
        w = [_cubic_kernel(t + 1.0), _cubic_kernel(t), _cubic_kernel(1.0 - t),
             _cubic_kernel(2.0 - t)]
        bases.append(base)
        weights.append(w)
    return tuple(bases), tuple(tuple(w) for w in weights)


def _upsample_axis(x, factor, axis):
    n = x.shape[axis]
    bases, weights = _phase_table(factor)
    # Taps reach from base-1 to base+2 with base in {-1, 0}; edge-replicate
    # padding of 2 both sides covers every case (torch clamps border taps).
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (2, 2)
    xp = jnp.pad(x, pad_width, mode="edge")

    def tap(offset):
        # Slice of length n at position (2 + offset) along axis.
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(2 + offset, 2 + offset + n)
        return xp[tuple(idx)]

    phases = []
    for base, w in zip(bases, weights):
        acc = (
            w[0] * tap(base - 1) + w[1] * tap(base)
            + w[2] * tap(base + 1) + w[3] * tap(base + 2)
        )
        phases.append(acc)

    stacked = jnp.stack(phases, axis=axis + 1)  # (..., n, factor, ...)
    new_shape = list(x.shape)
    new_shape[axis] = n * factor
    return stacked.reshape(new_shape)


def upsample_bicubic(x, factor, axes=(1, 2)):
    """Bicubic upsample of NHWC ``x`` by an integer ``factor`` along ``axes``,
    numerically matching ``F.interpolate(mode='bicubic',
    align_corners=False)``."""
    for axis in axes:
        x = _upsample_axis(x, factor, axis)
    return x
