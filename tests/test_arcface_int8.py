"""Opt-in int8 ArcFace trunk (models/arcface.py apply_int8).

The MXU's int8 rate is 2x bf16 (380 vs 190.7 TFLOP/s measured,
benchmarks/peak.py); the quantised path must (a) quantise exactly the
103 trunk convs and nothing else, and (b) agree with the f32 flax
forward closely enough that identity ranking is unaffected. Random
converted weights are the harsh case here — folded-BN affines from
random torch state dicts have wilder per-channel ranges than trained
ones — so the cosine floors below are conservative for real weights
(whose golden validation runs via tests/test_goldens.py once downloads
are possible).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from terran_tpu.models.arcface import (
    UNITS_PER_STAGE, FaceResNet100, apply_int8, normalize_embeddings,
    quantize_params,
)
from terran_tpu.utils.convert import convert_arcface
from torch_oracle import random_arcface_state_dict

# initial conv + 2 convs per unit + one shortcut conv per stage.
NUM_TRUNK_CONVS = 1 + 2 * sum(UNITS_PER_STAGE) + len(UNITS_PER_STAGE)


@pytest.fixture(scope="module")
def arc_params():
    return convert_arcface(random_arcface_state_dict(
        np.random.default_rng(7)
    ))


def test_quantized_tree_structure(arc_params):
    q = quantize_params(arc_params, jnp.bfloat16)

    def walk(node, found):
        if isinstance(node, dict):
            if "kernel_q" in node:
                assert node["kernel_q"].dtype == jnp.int8
                assert node["kernel_scale"].dtype == jnp.float32
                assert (node["kernel_scale"].shape
                        == node["kernel_q"].shape[-1:])
                found.append(node)
            for v in node.values():
                walk(v, found)
        return found

    quantised = walk(q, [])
    assert len(quantised) == NUM_TRUNK_CONVS
    # The f32-accumulated head projection stays a full-precision Dense.
    assert q["embed"]["kernel"].dtype == jnp.float32
    assert "kernel_q" not in q["embed"]
    # Folded-BN affines follow the compute dtype.
    assert q["initial"]["scale"].dtype == jnp.bfloat16
    # Symmetric quantisation actually uses the full int8 range.
    assert int(jnp.abs(quantised[0]["kernel_q"]).max()) == 127


def test_int8_embeddings_track_f32(arc_params, rng):
    x = rng.integers(0, 255, (2, 112, 112, 3)).astype(np.float32)
    ref = np.asarray(normalize_embeddings(
        FaceResNet100().apply({"params": arc_params}, x)
    ))
    out = np.asarray(normalize_embeddings(
        apply_int8(quantize_params(arc_params), x)
    ))
    cos = (ref * out).sum(-1)
    assert (cos > 0.98).all(), cos
