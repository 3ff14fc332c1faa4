"""ArcFace conversion + forward parity vs the torch functional oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terran_tpu.models.arcface import FaceResNet100, normalize_embeddings
from terran_tpu.utils.convert import convert_arcface
from torch_oracle import arcface_forward, random_arcface_state_dict


@pytest.fixture(scope="module")
def converted():
    rng = np.random.default_rng(1)
    sd = random_arcface_state_dict(rng)
    params = convert_arcface(sd)
    return sd, params


def test_conversion_structure(converted):
    _, params = converted
    model = FaceResNet100()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    )["params"]
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_shapes = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert got_shapes == ref_shapes


def test_full_model_parity(converted):
    sd, params = converted
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, size=(2, 112, 112, 3)).astype(np.float32)

    expected = arcface_forward(
        sd, images[..., ::-1].transpose(0, 3, 1, 2).copy()
    ).numpy()

    model = FaceResNet100()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(images)))

    assert got.shape == (2, 512)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)

    # Cosine similarity of normalised embeddings must be ~identical.
    ge = np.asarray(normalize_embeddings(jnp.asarray(got)))
    ee = expected / np.linalg.norm(expected, axis=1, keepdims=True)
    cos = (ge * ee).sum(axis=1)
    assert np.all(cos > 1.0 - 1e-6)


def test_normalize_embeddings():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 512)))
    n = np.asarray(normalize_embeddings(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-6)
