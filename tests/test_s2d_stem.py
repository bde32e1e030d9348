"""Eval-time space-to-depth stem: exactness + parameter-tree identity.

The S2D stem (models/dla.py:_stem_s2d) reparameterizes the full/half-res
stem convs (reference dla.py:18-312 base_layer/level0/level1) into s2d(2)
space — it must be numerically the plain stem (same params, same outputs)
or checkpoints/goldens silently diverge.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.models.dla import (
    DLA, _depth_to_space, _space_to_depth)


@pytest.fixture(scope="module")
def tree():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 64, 3), jnp.float32)
    v = DLA(s2d_stem=False, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x, True)
    # nonzero BN stats so the eval affine is exercised
    v = {
        "params": v["params"],
        "batch_stats": jax.tree.map(
            lambda a: a + 0.25 * np.random.RandomState(1).standard_normal(
                a.shape).astype(np.float32) ** 2,
            v["batch_stats"]),
    }
    return x, v


def test_s2d_matches_plain_stem(tree):
    x, v = tree
    f_plain = DLA(s2d_stem=False, dtype=jnp.float32).apply(v, x, False)
    f_s2d = DLA(s2d_stem=True, dtype=jnp.float32).apply(v, x, False)
    for i, (a, b) in enumerate(zip(f_plain, f_s2d)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        assert rel < 2e-5, (i, rel)


def test_s2d_param_tree_identical(tree):
    x, v = tree
    v2 = DLA(s2d_stem=True, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x, False)
    shape_of = lambda t: jax.tree.map(lambda a: (a.shape, str(a.dtype)), t)
    assert shape_of(v2["params"]) == shape_of(v["params"])
    assert shape_of(v2["batch_stats"]) == shape_of(v["batch_stats"])


def test_s2d_train_path_unchanged(tree):
    """train=True must use the plain stem (BN batch stats update there)."""
    x, v = tree
    out_a, mut_a = DLA(s2d_stem=True, dtype=jnp.float32).apply(
        v, x, True, mutable=["batch_stats"])
    out_b, mut_b = DLA(s2d_stem=False, dtype=jnp.float32).apply(
        v, x, True, mutable=["batch_stats"])
    for a, b in zip(out_a, out_b):
        assert np.allclose(np.asarray(a), np.asarray(b))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)), mut_a, mut_b)


def test_s2d_roundtrip():
    x = jnp.asarray(np.arange(2 * 4 * 6 * 3).reshape(2, 4, 6, 3), jnp.float32)
    assert np.array_equal(_depth_to_space(_space_to_depth(x, 2), 2), x)
