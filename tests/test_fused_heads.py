"""Fused head-tower execution (MODEL.FUSED_HEAD_TOWERS, opt-in): one wide tower_0
conv must be bit-equivalent to per-tower execution and fully trainable.
Reference towers: detectHeads.py:59-115."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model


def _cfg(fused):
    return load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "DATASET.RADAR_PC", "True", "MODEL.FRUSTUM", "True",
              "MODEL.FUSION_STRATEGY", "'middle'",
              "MODEL.FUSED_HEAD_TOWERS", str(fused),
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )


@pytest.fixture(scope="module")
def inputs(rng=None):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 64, 128, 3).astype(np.float32))
    pc = jnp.asarray(np.abs(rng.randn(2, 16, 32, 3)).astype(np.float32))
    calib = jnp.tile(
        jnp.asarray([[400.0, 0, 64, 0], [0, 400.0, 32, 0], [0, 0, 1, 0]]),
        (2, 1, 1),
    )
    return img, pc, calib


@pytest.mark.slow
def test_fused_heads_match_per_tower(inputs):
    img, pc, calib = inputs
    outs = {}
    for fused in (True, False):
        model = build_model(_cfg(fused))
        v = model.init(jax.random.PRNGKey(0), img, None, pc, calib,
                       train=False)
        y = model.apply(v, img, None, pc, calib, train=False)[-1]
        outs[fused] = {k: np.asarray(val) for k, val in y.items()
                       if k != "calib"}
    assert set(outs[True]) == set(outs[False])
    for k in outs[True]:
        np.testing.assert_allclose(outs[True][k], outs[False][k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_fused_heads_gradients_per_head(inputs):
    """Grads flow through the fused conv into each head's own tower_0 and
    stay zero for heads that don't feed the loss."""
    img, pc, calib = inputs
    model = build_model(_cfg(True))
    v = model.init(jax.random.PRNGKey(0), img, None, pc, calib, train=False)
    g = jax.grad(
        lambda v: jnp.sum(
            model.apply(v, img, None, pc, calib, train=False)[-1]["dimension"]
            ** 2
        )
    )(v)
    heads = g["params"]["detect_head_0"]
    assert float(jnp.abs(heads["dimension"]["tower_0"]["kernel"]).max()) > 0
    assert float(jnp.abs(heads["heatmap"]["tower_0"]["kernel"]).max()) == 0.0
