"""Shared Flax building blocks for the inference models.

All models run NHWC with explicit torch-style padding so converted weights
reproduce the reference graphs exactly. BatchNorm layers from the reference
are *folded at conversion time* into a per-channel (scale, bias) affine — the
TPU-first representation of inference-time BN (XLA fuses the affine into the
producing convolution). See ``terran_tpu/utils/convert.py`` for the folding.

Reference BN configs being folded:
- RetinaFace: momentum=0.9, eps=1e-5 (base) / 2e-5 (FPN+context), see
  /root/reference/terran/face/detection/retinaface/model.py:28,128.
- ArcFace: momentum=0.9, eps=2e-5, /root/reference/terran/face/recognition/
  arcface/model.py:12-27.
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvAffine(nn.Module):
    """Conv (no bias) + folded-BN affine + optional activation.

    Matches torch's ``Conv2d(..., bias=False) -> BatchNorm2d -> act`` at
    inference time. Padding is explicit/symmetric, like torch's integer
    ``padding=`` argument (flax 'SAME' pads asymmetrically under stride 2,
    which would break parity).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 0
    groups: int = 1
    act: str = "relu"  # 'relu' | 'prelu' | 'none'
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "prelu":
            alpha = self.param(
                "prelu", nn.initializers.constant(0.25), (self.features,), jnp.float32
            )
            x = jnp.where(x >= 0, x, x * alpha.astype(x.dtype))
        return x


class ConvBias(nn.Module):
    """Plain conv with bias and optional ReLU (no BN), torch-style padding."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 0
    act: str = "none"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=True,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.act == "relu":
            x = nn.relu(x)
        return x


def upsample2x_nearest(x, out_h, out_w):
    """Nearest-neighbour 2x upsample then crop to (out_h, out_w).

    Matches ``F.interpolate(scale_factor=2)`` + slicing used by the reference
    FPN (/root/reference/terran/face/detection/retinaface/model.py:226-235).
    """
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, :out_h, :out_w, :]


def max_pool_2x2(x):
    """Torch MaxPool2d(kernel=2, stride=2, padding=0) for NHWC (floor mode)."""
    h, w = x.shape[1], x.shape[2]
    x = x[:, : h - h % 2, : w - w % 2, :]
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
