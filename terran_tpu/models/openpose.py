"""OpenPose (CMU 2017 body model) in Flax, NHWC, TPU-first.

Re-implements the reference ``BodyPoseModel``
(/root/reference/terran/pose/openpose/model.py:27-141): a VGG-style trunk
(``block0``, model.py:41-57) followed by six refinement stages with two
branches each — L1 predicting 38-channel part-affinity fields and L2
predicting 19-channel keypoint heatmaps — where each stage consumes
``concat(prev_L1, prev_L2, trunk)`` (185 channels, model.py:114-141).

All convolutions carry bias and no BN. The 7x7 convolutions in stages 2-6
dominate the FLOPs; XLA maps them onto the MXU directly, and channel counts
(128/185) stay MXU-friendly in NHWC.
"""

import jax.numpy as jnp
from flax import linen as nn

from terran_tpu.models.layers import ConvBias, max_pool_2x2
from terran_tpu.models.quant import quant_conv, quantize_conv_kernels

PAF_CHANNELS = 38
HEATMAP_CHANNELS = 19
TRUNK_CHANNELS = 128


class BodyPoseModel(nn.Module):
    """Returns (pafs, heatmaps) NHWC tensors at 1/8 input resolution."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype

        def conv(name, features, kernel=3, pad=1, act="relu"):
            def apply(h):
                return ConvBias(
                    features, (kernel, kernel), 1, pad, act=act,
                    compute_dtype=dt, name=name,
                )(h)
            return apply

        # block0 trunk (model.py:41-57).
        h = conv("conv1_1", 64)(x)
        h = conv("conv1_2", 64)(h)
        h = max_pool_2x2(h)
        h = conv("conv2_1", 128)(h)
        h = conv("conv2_2", 128)(h)
        h = max_pool_2x2(h)
        h = conv("conv3_1", 256)(h)
        h = conv("conv3_2", 256)(h)
        h = conv("conv3_3", 256)(h)
        h = conv("conv3_4", 256)(h)
        h = max_pool_2x2(h)
        h = conv("conv4_1", 512)(h)
        h = conv("conv4_2", 512)(h)
        h = conv("conv4_3_CPM", 256)(h)
        trunk = conv("conv4_4_CPM", TRUNK_CHANNELS)(h)

        # Stage 1 branches (model.py:58-71); final convs have no ReLU.
        def stage1(branch, out_ch):
            h = trunk
            for i in range(1, 4):
                h = conv(f"conv5_{i}_CPM_L{branch}", 128)(h)
            h = conv(f"conv5_4_CPM_L{branch}", 512, kernel=1, pad=0)(h)
            return conv(
                f"conv5_5_CPM_L{branch}", out_ch, kernel=1, pad=0, act="none"
            )(h)

        paf = stage1(1, PAF_CHANNELS)
        heat = stage1(2, HEATMAP_CHANNELS)

        # Stages 2-6 (model.py:77-98,120-139).
        for stage in range(2, 7):
            inp = jnp.concatenate([paf, heat, trunk], axis=-1)  # 185 channels

            def refine(branch, out_ch, inp=inp, stage=stage):
                h = inp
                for i in range(1, 6):
                    h = conv(f"Mconv{i}_stage{stage}_L{branch}", 128, kernel=7, pad=3)(h)
                h = conv(f"Mconv6_stage{stage}_L{branch}", 128, kernel=1, pad=0)(h)
                # Reference quirk kept for parity: its no-ReLU list names
                # 'Mconv7_stage6_L1' twice instead of L2 (model.py:32-39), so
                # the final stage-6 *heatmap* conv is followed by a ReLU while
                # every other Mconv7 is not.
                act = "relu" if (stage == 6 and branch == 2) else "none"
                return conv(
                    f"Mconv7_stage{stage}_L{branch}", out_ch, kernel=1, pad=0,
                    act=act,
                )(h)

            paf = refine(1, PAF_CHANNELS)
            heat = refine(2, HEATMAP_CHANNELS)

        return paf, heat


# ---------------------------------------------------------------------------
# Opt-in int8 inference path (see models/quant.py for the recipe and the
# parity stance). The 7x7 stage convs that dominate this model's FLOPs
# run int8 x int8 -> int32 on the MXU at 2x the bf16 rate; biases add in
# f32 after dequantisation, activations re-quantise per conv.
# ---------------------------------------------------------------------------


def quantize_params(params, compute_dtype=jnp.float32):
    """int8 param tree for :func:`apply_int8` (all convs quantised)."""
    return quantize_conv_kernels(params, compute_dtype)


class Int8BodyPoseModel:
    """Duck-typed stand-in for :class:`BodyPoseModel` (same ``apply`` /
    ``compute_dtype`` surface) running :func:`apply_int8`; its params
    must be a :func:`quantize_params` tree."""

    def __init__(self, compute_dtype=jnp.float32):
        self.compute_dtype = jnp.dtype(compute_dtype)

    def apply(self, variables, x):
        return apply_int8(variables["params"], x, self.compute_dtype)


def apply_int8(qparams, x, compute_dtype=jnp.float32):
    """BodyPoseModel forward on the :func:`quantize_params` tree.

    Mirrors :class:`BodyPoseModel.__call__` exactly — same layer names,
    same stage-6 L2 ReLU quirk — with every conv quantised."""
    dt = jnp.dtype(compute_dtype)
    x = x.astype(dt)

    def conv(name, h, kernel=3, pad=1, act="relu"):
        p = qparams[name]["conv"]  # ConvBias nests nn.Conv as 'conv'
        y = quant_conv(h, p, 1, pad, jnp.float32)
        y = y + p["bias"].astype(jnp.float32)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        return y.astype(dt)

    h = conv("conv1_1", x)
    h = conv("conv1_2", h)
    h = max_pool_2x2(h)
    h = conv("conv2_1", h)
    h = conv("conv2_2", h)
    h = max_pool_2x2(h)
    for i in range(1, 5):
        h = conv(f"conv3_{i}", h)
    h = max_pool_2x2(h)
    h = conv("conv4_1", h)
    h = conv("conv4_2", h)
    h = conv("conv4_3_CPM", h)
    trunk = conv("conv4_4_CPM", h)

    def stage1(branch):
        h = trunk
        for i in range(1, 4):
            h = conv(f"conv5_{i}_CPM_L{branch}", h)
        h = conv(f"conv5_4_CPM_L{branch}", h, kernel=1, pad=0)
        return conv(f"conv5_5_CPM_L{branch}", h, kernel=1, pad=0,
                    act="none")

    paf, heat = stage1(1), stage1(2)

    for stage in range(2, 7):
        inp = jnp.concatenate([paf, heat, trunk], axis=-1)

        def refine(branch, inp=inp, stage=stage):
            h = inp
            for i in range(1, 6):
                h = conv(f"Mconv{i}_stage{stage}_L{branch}", h, kernel=7,
                         pad=3)
            h = conv(f"Mconv6_stage{stage}_L{branch}", h, kernel=1, pad=0)
            act = "relu" if (stage == 6 and branch == 2) else "none"
            return conv(f"Mconv7_stage{stage}_L{branch}", h, kernel=1,
                        pad=0, act=act)

        paf, heat = refine(1), refine(2)

    return paf, heat
