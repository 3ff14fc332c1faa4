"""PyTorch ``.pth`` state-dict -> JAX pytree weight conversion.

The reference distributes pretrained torch checkpoints (registry at
/root/reference/terran/checkpoint.py:29-103). This module converts them into
the layout the Flax models here expect, applying TPU-first folds:

- **BatchNorm folding**: inference BN becomes a per-channel (scale, bias)
  affine: ``scale = gamma / sqrt(var + eps)``, ``bias = beta - mean * scale``.
- **BGR folding**: the reference feeds BGR images (RetinaFace wrapper.py:146,
  ArcFace wrapper.py:72); we instead flip the input-channel axis of the first
  convolution so the converted models take RGB directly.
- **Layout**: torch conv weights (O, I, kh, kw) -> flax (kh, kw, I, O);
  depthwise (C, 1, kh, kw) -> (kh, kw, 1, C); linear (O, I) -> (I, O).
- **BN1d-into-Linear folding** for the ArcFace embedding head
  (arcface/model.py:79-85).

Each ``convert_*`` function consumes a dict of numpy arrays keyed by the
reference's state-dict names and returns a nested params dict matching the
corresponding model in ``terran_tpu.models``. Conversion is strict: unmapped
keys raise, so a registry/architecture drift is caught immediately.
"""

import numpy as np


def _np(t):
    """Accept torch tensors or numpy arrays."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_kernel(w, flip_rgb=False, depthwise=False):
    w = _np(w)
    if depthwise:
        # (C, 1, kh, kw) -> (kh, kw, 1, C)
        return np.transpose(w, (2, 3, 1, 0))
    if flip_rgb:
        w = w[:, ::-1, :, :]  # reverse input-channel (RGB<->BGR) axis
    # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def bn_affine(sd, prefix, eps):
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale, bias


class Mapper:
    """Tracks consumed keys so we can assert full coverage."""

    def __init__(self, state_dict):
        self.sd = {k: v for k, v in state_dict.items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def conv_affine(self, conv_prefix, bn_prefix, eps, flip_rgb=False,
                    depthwise=False):
        kernel = conv_kernel(
            self.take(f"{conv_prefix}.weight"), flip_rgb=flip_rgb,
            depthwise=depthwise,
        )
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            self.used.add(f"{bn_prefix}.{suffix}")
        # torch BN also stores num_batches_tracked; ignore if present.
        self.used.add(f"{bn_prefix}.num_batches_tracked")
        scale, bias = bn_affine(self.sd, bn_prefix, eps)
        # Some reference convs keep their default bias=True despite feeding a
        # BN (e.g. the FPN/context convs, retinaface/model.py:126-203). Fold
        # the conv bias through the BN affine:
        # BN(Wx + b) = (scale*W)x + (scale*b + bias).
        conv_bias_key = f"{conv_prefix}.bias"
        if conv_bias_key in self.sd:
            bias = bias + scale * _np(self.take(conv_bias_key))
        return {"conv": {"kernel": kernel}, "scale": scale, "bias": bias}

    def affine(self, bn_prefix, eps):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            self.used.add(f"{bn_prefix}.{suffix}")
        self.used.add(f"{bn_prefix}.num_batches_tracked")
        scale, bias = bn_affine(self.sd, bn_prefix, eps)
        return {"scale": scale, "bias": bias}

    def conv_bias(self, prefix, flip_rgb=False):
        return {
            "kernel": conv_kernel(self.take(f"{prefix}.weight"), flip_rgb),
            "bias": _np(self.take(f"{prefix}.bias")),
        }

    def prelu(self, prefix):
        return _np(self.take(f"{prefix}.weight"))

    def assert_consumed(self):
        remaining = [
            k for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]
        if remaining:
            raise ValueError(
                f"unconverted checkpoint keys ({len(remaining)}): "
                f"{sorted(remaining)[:8]}..."
            )


# ---------------------------------------------------------------------------
# RetinaFace (reference module paths from retinaface/model.py)
# ---------------------------------------------------------------------------

def convert_retinaface(state_dict):
    m = Mapper(state_dict)
    eps_base, eps_fpn = 1e-5, 2e-5  # model.py:28 vs model.py:128,180

    def sep_block(torch_prefix):
        return {
            "conv_block": m.conv_affine(
                f"{torch_prefix}.conv_block.0", f"{torch_prefix}.conv_block.1",
                eps_base,
            ),
            "sep_block": m.conv_affine(
                f"{torch_prefix}.sep_block.0", f"{torch_prefix}.sep_block.1",
                eps_base, depthwise=True,
            ),
        }

    base = {
        "first_conv": m.conv_affine(
            "base.first_conv_block.0", "base.first_conv_block.1", eps_base,
            flip_rgb=True,
        ),
        "first_sep": m.conv_affine(
            "base.first_conv_block.3", "base.first_conv_block.4", eps_base,
            depthwise=True,
        ),
    }
    for i in range(5):
        base[f"s0_b{i}"] = sep_block(f"base.scales.0.{i}")
    for i in range(6):
        base[f"s1_b{i}"] = sep_block(f"base.scales.1.{i}")
    base["final_b0"] = sep_block("base.final_conv.0")
    base["final_conv"] = m.conv_affine(
        "base.final_conv.1", "base.final_conv.2", eps_base
    )

    def conv_bn_fpn(conv_prefix, bn_prefix):
        return m.conv_affine(conv_prefix, bn_prefix, eps_fpn)

    def context(torch_prefix):
        return {
            "ctx3": conv_bn_fpn(f"{torch_prefix}.context_3x3.0", f"{torch_prefix}.context_3x3.1"),
            "reducer": conv_bn_fpn(f"{torch_prefix}.dimension_reducer.0", f"{torch_prefix}.dimension_reducer.1"),
            "ctx5": conv_bn_fpn(f"{torch_prefix}.context_5x5.0", f"{torch_prefix}.context_5x5.1"),
            "ctx7a": conv_bn_fpn(f"{torch_prefix}.context_7x7.0", f"{torch_prefix}.context_7x7.1"),
            "ctx7b": conv_bn_fpn(f"{torch_prefix}.context_7x7.3", f"{torch_prefix}.context_7x7.4"),
        }

    refiner = {
        "conv_s8": conv_bn_fpn("refiner.conv_stride8.0", "refiner.conv_stride8.1"),
        "conv_s16": conv_bn_fpn("refiner.conv_stride16.0", "refiner.conv_stride16.1"),
        "conv_s32": conv_bn_fpn("refiner.conv_stride32.0", "refiner.conv_stride32.1"),
        "aggr_s8": conv_bn_fpn("refiner.aggr_stride8.0", "refiner.aggr_stride8.1"),
        "aggr_s16": conv_bn_fpn("refiner.aggr_stride16.0", "refiner.aggr_stride16.1"),
        "ctx_s8": context("refiner.context_stride8"),
        "ctx_s16": context("refiner.context_stride16"),
        "ctx_s32": context("refiner.context_stride32"),
    }

    heads = {}
    for stride in (8, 16, 32):
        heads[f"cls_s{stride}"] = m.conv_bias(f"outputs.cls_stride{stride}")
        heads[f"bbox_s{stride}"] = m.conv_bias(f"outputs.bbox_stride{stride}")
        heads[f"landmark_s{stride}"] = m.conv_bias(
            f"outputs.landmark_stride{stride}"
        )

    m.assert_consumed()
    return {"base": base, "refiner": refiner, "heads": heads}


# ---------------------------------------------------------------------------
# ArcFace FaceResNet100 (reference module paths from arcface/model.py)
# ---------------------------------------------------------------------------

ARCFACE_UNITS_PER_STAGE = (3, 13, 30, 3)  # arcface/model.py:44


def convert_arcface(state_dict):
    m = Mapper(state_dict)
    eps = 2e-5

    params = {
        "initial": m.conv_affine("initial_layer.0", "initial_layer.1", eps,
                                 flip_rgb=True),
        "initial_prelu": m.prelu("initial_layer.2"),
    }

    for stage_idx, num_units in enumerate(ARCFACE_UNITS_PER_STAGE):
        for unit_idx in range(num_units):
            p = f"stages.{stage_idx}.{unit_idx}"
            unit = {
                "pre": m.affine(f"{p}.body.0", eps),
                "conv1": m.conv_affine(f"{p}.body.1", f"{p}.body.2", eps),
                "prelu": m.prelu(f"{p}.body.3"),
                "conv2": m.conv_affine(f"{p}.body.4", f"{p}.body.5", eps),
            }
            if unit_idx == 0:  # stride-2 unit has a projection shortcut
                unit["shortcut"] = m.conv_affine(
                    f"{p}.shortcut.0", f"{p}.shortcut.1", eps
                )
            params[f"stage{stage_idx}_unit{unit_idx}"] = unit

    # Head: BN2d -> (Dropout) -> Flatten -> Linear -> BN1d; the BN1d is folded
    # into the linear (arcface/model.py:79-85).
    params["head_pre"] = m.affine("final_layer.0", eps)
    w = _np(m.take("final_layer.3.weight"))  # (512, 7*7*512)
    b = _np(m.take("final_layer.3.bias"))
    scale, bias = bn_affine(m.sd, "final_layer.4", eps)
    for suffix in ("weight", "bias", "running_mean", "running_var",
                   "num_batches_tracked"):
        m.used.add(f"final_layer.4.{suffix}")
    # Torch flatten of (N, C, 7, 7) orders features (C, h, w); our NHWC
    # flatten orders (h, w, C). Permute the linear's input dim accordingly.
    w = w.reshape(512, 512, 7, 7).transpose(0, 2, 3, 1).reshape(512, -1)
    params["embed"] = {
        "kernel": (w * scale[:, None]).T,  # (I, O) with BN1d folded
        "bias": b * scale + bias,
    }

    m.assert_consumed()
    return params


# ---------------------------------------------------------------------------
# OpenPose body model (reference module paths from openpose/model.py)
# ---------------------------------------------------------------------------

OPENPOSE_BLOCK0 = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv3_4", "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM",
)


def convert_openpose(state_dict):
    m = Mapper(state_dict)
    params = {}
    for name in OPENPOSE_BLOCK0:
        # OpenPose input is RGB already (openpose/wrapper.py:116-122).
        params[name] = {"conv": m.conv_bias(f"model0.{name}")}
    for branch in (1, 2):
        for i in range(1, 6):
            params[f"conv5_{i}_CPM_L{branch}"] = {
                "conv": m.conv_bias(f"model1_{branch}.conv5_{i}_CPM_L{branch}")
            }
    for stage in range(2, 7):
        for branch in (1, 2):
            for i in range(1, 8):
                name = f"Mconv{i}_stage{stage}_L{branch}"
                params[name] = {
                    "conv": m.conv_bias(f"model{stage}_{branch}.{name}")
                }
    m.assert_consumed()
    return params


CONVERTERS = {
    "retinaface": convert_retinaface,
    "arcface": convert_arcface,
    "openpose": convert_openpose,
}


# ---------------------------------------------------------------------------
# Pytree (de)serialisation: flat .npz with '/'-joined keys
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix=""):
    flat = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_tree(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_tree(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path, params):
    np.savez(path, **flatten_tree(params))


def load_params(path):
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})


def convert_torch_checkpoint(model_key, pth_path, out_path):
    """Convert a reference ``.pth`` file to this framework's ``.npz`` format.

    Requires torch (CPU) to deserialise the pickle; torch is only ever
    imported here, never on the inference path.
    """
    import torch

    state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    params = CONVERTERS[model_key](state_dict)
    save_params(out_path, params)
    return params
