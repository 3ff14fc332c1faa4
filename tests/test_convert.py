"""Weight converter unit tests: folding math, layout transposes, and
strictness guarantees."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from terran_tpu.utils.convert import (
    Mapper, bn_affine, conv_kernel, convert_retinaface,
)
from torch_oracle import random_retinaface_state_dict


def test_bn_affine_matches_torch_batchnorm(rng):
    ch = 8
    sd = {
        "bn.weight": rng.normal(size=ch).astype(np.float32),
        "bn.bias": rng.normal(size=ch).astype(np.float32),
        "bn.running_mean": rng.normal(size=ch).astype(np.float32),
        "bn.running_var": (np.abs(rng.normal(size=ch)) + 0.3).astype(np.float32),
    }
    scale, bias = bn_affine(sd, "bn", eps=2e-5)
    x = rng.normal(size=(4, ch)).astype(np.float32)
    expected = F.batch_norm(
        torch.as_tensor(x), torch.as_tensor(sd["bn.running_mean"]),
        torch.as_tensor(sd["bn.running_var"]), torch.as_tensor(sd["bn.weight"]),
        torch.as_tensor(sd["bn.bias"]), training=False, eps=2e-5,
    ).numpy()
    np.testing.assert_allclose(x * scale + bias, expected, rtol=1e-5,
                               atol=1e-6)


def test_conv_kernel_layouts(rng):
    w = rng.normal(size=(6, 3, 5, 5)).astype(np.float32)  # (O, I, kh, kw)
    flax = conv_kernel(w)
    assert flax.shape == (5, 5, 3, 6)
    np.testing.assert_array_equal(flax[2, 4, 1, 3], w[3, 1, 2, 4])

    flipped = conv_kernel(w, flip_rgb=True)
    np.testing.assert_array_equal(flipped[..., 0, :], flax[..., 2, :])

    dw = rng.normal(size=(6, 1, 3, 3)).astype(np.float32)
    depth = conv_kernel(dw, depthwise=True)
    assert depth.shape == (3, 3, 1, 6)
    np.testing.assert_array_equal(depth[1, 2, 0, 4], dw[4, 0, 1, 2])


def test_conv_bias_folded_through_bn(rng):
    """BN(Wx + b) == (scale*W)x + (scale*b + bias_bn)."""
    ch = 4
    m = Mapper({
        "c.weight": rng.normal(size=(ch, 2, 1, 1)).astype(np.float32),
        "c.bias": rng.normal(size=ch).astype(np.float32),
        "b.weight": rng.normal(size=ch).astype(np.float32) + 1,
        "b.bias": rng.normal(size=ch).astype(np.float32),
        "b.running_mean": rng.normal(size=ch).astype(np.float32),
        "b.running_var": (np.abs(rng.normal(size=ch)) + 0.5).astype(np.float32),
    })
    out = m.conv_affine("c", "b", eps=1e-5)
    x = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
    conv = np.einsum("nhwi,klio->nhwo", x, out["conv"]["kernel"])
    got = conv * out["scale"] + out["bias"]

    tx = torch.as_tensor(x.transpose(0, 3, 1, 2))
    ref = F.conv2d(tx, torch.as_tensor(m.sd["c.weight"]),
                   torch.as_tensor(m.sd["c.bias"]))
    ref = F.batch_norm(
        ref, torch.as_tensor(m.sd["b.running_mean"]),
        torch.as_tensor(m.sd["b.running_var"]),
        torch.as_tensor(m.sd["b.weight"]), torch.as_tensor(m.sd["b.bias"]),
        training=False, eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_strict_conversion_rejects_extra_keys():
    sd = random_retinaface_state_dict(np.random.default_rng(0))
    sd["some.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_retinaface(sd)


def test_conversion_fails_on_missing_keys():
    sd = random_retinaface_state_dict(np.random.default_rng(0))
    del sd["outputs.cls_stride8.weight"]
    with pytest.raises(KeyError):
        convert_retinaface(sd)
