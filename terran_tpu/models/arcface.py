"""ArcFace LResNet100E-IR in Flax, NHWC, TPU-first.

Re-implements the reference ``FaceResNet100``
(/root/reference/terran/face/recognition/arcface/model.py:38-97): pre-act
residual units (BN-Conv-BN-PReLU-Conv-BN with conv shortcut on stride-2
units, model.py:4-35), stages [3, 13, 30, 3] at channels [64, 64, 128, 256,
512], inline preprocessing ``(x - 127.5) * 0.0078125`` (model.py:48-49,88)
and a BN-Flatten-Linear-BN1d head (model.py:79-85).

TPU-first notes:
- BN layers are folded (scale, bias) affines produced at conversion time;
  the head's BN1d is folded directly into the linear projection.
- The reference's dropout (p=0.4) is inference-disabled, so it is omitted.
- The BGR input flip (wrapper.py:72) is folded into the first conv's
  weights; this model takes aligned RGB 112x112 crops.
- Embeddings are L2-normalised on device (the reference normalises on host
  via sklearn, wrapper.py:176).
"""

import jax.numpy as jnp
from flax import linen as nn

from terran_tpu.models.layers import ConvAffine
from terran_tpu.models.quant import quant_conv, quantize_conv_kernels

UNITS_PER_STAGE = (3, 13, 30, 3)
CHANNELS = (64, 64, 128, 256, 512)
PREPROC_MEAN = 127.5
PREPROC_STD = 0.0078125
EMBEDDING_DIM = 512


class Affine(nn.Module):
    """Standalone folded-BN affine (the pre-activation BN of each unit)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Unit(nn.Module):
    """Pre-act residual unit (arcface/model.py:4-35)."""

    features: int
    stride: int = 1
    has_shortcut: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        body = Affine(x.shape[-1], name="pre")(x)
        body = ConvAffine(
            self.features, (3, 3), 1, 1, act="none", compute_dtype=dt, name="conv1"
        )(body)
        alpha = self.param(
            "prelu", nn.initializers.constant(0.25), (self.features,), jnp.float32
        )
        body = jnp.where(body >= 0, body, body * alpha.astype(body.dtype))
        body = ConvAffine(
            self.features, (3, 3), self.stride, 1, act="none", compute_dtype=dt,
            name="conv2",
        )(body)

        if self.has_shortcut:
            shortcut = ConvAffine(
                self.features, (1, 1), self.stride, 0, act="none",
                compute_dtype=dt, name="shortcut",
            )(x)
        else:
            shortcut = x
        return body + shortcut


class FaceResNet100(nn.Module):
    """100-layer face-embedding ResNet producing unnormalised 512-d features."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        x = ((x.astype(jnp.float32) - PREPROC_MEAN) * PREPROC_STD).astype(dt)

        x = ConvAffine(
            CHANNELS[0], (3, 3), 1, 1, act="none", compute_dtype=dt, name="initial"
        )(x)
        alpha = self.param(
            "initial_prelu", nn.initializers.constant(0.25), (CHANNELS[0],),
            jnp.float32,
        )
        x = jnp.where(x >= 0, x, x * alpha.astype(x.dtype))

        for stage_idx, num_units in enumerate(UNITS_PER_STAGE):
            features = CHANNELS[stage_idx + 1]
            for unit_idx in range(num_units):
                x = Unit(
                    features,
                    stride=2 if unit_idx == 0 else 1,
                    has_shortcut=unit_idx == 0,
                    compute_dtype=dt,
                    name=f"stage{stage_idx}_unit{unit_idx}",
                )(x)

        x = Affine(CHANNELS[-1], name="head_pre")(x)
        # Flatten NHWC (7, 7, 512); the converter permutes the linear weights
        # to match this ordering. Accumulate the projection in float32.
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dense(EMBEDDING_DIM, param_dtype=jnp.float32, name="embed")(x)
        return x


def normalize_embeddings(features):
    """L2-normalise embeddings (reference: sklearn normalize, wrapper.py:176)."""
    norm = jnp.sqrt(jnp.sum(features * features, axis=-1, keepdims=True))
    return features / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# Opt-in int8 inference path
# ---------------------------------------------------------------------------
# The MXU's int8 throughput is 2x bf16 (380 vs 190.7 TFLOP/s measured on
# this chip — benchmarks/peak.py), and ArcFace is the FLOPs-heaviest
# program in the pipeline. This path quantises every residual-trunk conv
# to int8 (per-output-channel static weight scales, per-tensor dynamic
# activation scales — the standard robust post-training recipe) and keeps
# the folded-BN affines, PReLUs and the f32 head projection untouched. It
# is OFF by default (config.embed_precision='native'): the reference has
# no quantised path, so parity runs never take it; accuracy vs real
# weights is validated by the same golden protocol as everything else
# (tests/test_goldens.py) once checkpoint downloads are possible.


def quantize_params(params, compute_dtype=jnp.float32):
    """Derive the int8 param tree from the f32 master tree: every trunk
    conv kernel becomes int8 + per-channel scales; the f32-accumulated
    'embed' head stays float32 (models/quant.py does the walking)."""
    return quantize_conv_kernels(
        params, compute_dtype, keep_f32=("embed",)
    )


def _affine(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _prelu(alpha, x):
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def _quant_conv_affine(p, x, stride, padding, dt):
    return _affine(p, quant_conv(x, p["conv"], stride, padding, dt))


def apply_int8(qparams, x, compute_dtype=jnp.float32):
    """FaceResNet100 forward on the :func:`quantize_params` tree.

    Mirrors :class:`FaceResNet100.__call__` exactly, with every trunk
    conv running int8 x int8 -> int32 on the MXU. Takes uint8-valued
    (B, 112, 112, 3) RGB crops, returns unnormalised (B, 512) f32."""
    dt = jnp.dtype(compute_dtype)
    x = ((x.astype(jnp.float32) - PREPROC_MEAN) * PREPROC_STD).astype(dt)

    x = _quant_conv_affine(qparams["initial"], x, 1, 1, dt)
    x = _prelu(qparams["initial_prelu"], x)

    for stage_idx, num_units in enumerate(UNITS_PER_STAGE):
        for unit_idx in range(num_units):
            p = qparams[f"stage{stage_idx}_unit{unit_idx}"]
            stride = 2 if unit_idx == 0 else 1
            body = _affine(p["pre"], x)
            body = _quant_conv_affine(p["conv1"], body, 1, 1, dt)
            body = _prelu(p["prelu"], body)
            body = _quant_conv_affine(p["conv2"], body, stride, 1, dt)
            if unit_idx == 0:
                shortcut = _quant_conv_affine(
                    p["shortcut"], x, stride, 0, dt
                )
            else:
                shortcut = x
            x = body + shortcut

    x = _affine(qparams["head_pre"], x)
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    return x @ qparams["embed"]["kernel"] + qparams["embed"]["bias"]
