"""OpenPose model conversion + forward parity vs the torch functional oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terran_tpu.models.openpose import BodyPoseModel
from terran_tpu.utils.convert import convert_openpose
from torch_oracle import openpose_forward, random_openpose_state_dict


@pytest.fixture(scope="module")
def converted():
    rng = np.random.default_rng(2)
    sd = random_openpose_state_dict(rng)
    params = convert_openpose(sd)
    return sd, params


def test_conversion_structure(converted):
    _, params = converted
    model = BodyPoseModel()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    )["params"]
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_shapes = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert got_shapes == ref_shapes


def test_full_model_parity(converted):
    sd, params = converted
    rng = np.random.default_rng(4)
    # Wrapper preprocessing is x/255 - 0.5 (openpose/wrapper.py:116-122);
    # feed identical preprocessed inputs to both implementations.
    images = rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
    preproc = images / 255.0 - 0.5

    exp_paf, exp_heat = openpose_forward(
        sd, preproc.transpose(0, 3, 1, 2).copy()
    )
    model = BodyPoseModel()
    paf, heat = model.apply({"params": params}, jnp.asarray(preproc))

    assert paf.shape == (1, 8, 12, 38)
    assert heat.shape == (1, 8, 12, 19)
    np.testing.assert_allclose(
        np.asarray(paf), exp_paf.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(heat), exp_heat.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
