"""Shifted-window Pallas DCN kernel vs the XLA formulation (interpreter
mode on CPU; the same kernel compiles natively on TPU — see ROADMAP.md)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpreter-mode checks of the shelved Pallas kernel

from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d
from centerfusiondetect3d_tpu.ops.pallas_dcn import (
    deform_conv2d_fast,
    deform_conv2d_pallas,
    deform_conv2d_pallas_static,
)
from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_shift


def _inputs(rng, b=2, h=10, w=12, c=8, o=16, off_scale=2.0):
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.randn(b, h, w, 18) * off_scale).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(o).astype(np.float32))
    return x, offset, mask, weight, bias


def test_pallas_dcn_matches_xla(rng):
    x, offset, mask, weight, bias = _inputs(rng)
    ref = np.asarray(deform_conv2d(x, offset, mask, weight, bias))
    got = np.asarray(
        deform_conv2d_pallas(x, offset, mask, weight, bias, interpret=True)
    )
    # kernel computes slices/matmuls in bf16 with f32 accumulation
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.02)


def test_pallas_dcn_remainder_row_blocks(rng):
    # H not divisible by block_rows exercises the padded-rows path
    x, offset, mask, weight, bias = _inputs(rng, b=1, h=37, w=9, c=8, o=8)
    ref = np.asarray(deform_conv2d(x, offset, mask, weight, bias))
    got = np.asarray(
        deform_conv2d_pallas(
            x, offset, mask, weight, bias, block_rows=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.02)


def test_pallas_dcn_clamps_large_offsets(rng):
    # offsets beyond max_offset are clamped; the XLA oracle with pre-clamped
    # offsets is the ground truth
    x, offset, mask, weight, bias = _inputs(rng, off_scale=9.0)
    clamped = jnp.clip(offset, -4.0, 4.0)
    ref = np.asarray(deform_conv2d(x, clamped, mask, weight, bias))
    got = np.asarray(
        deform_conv2d_pallas(
            x, offset, mask, weight, bias, max_offset=4.0, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.02)


def test_pallas_dcn_zero_offsets_is_plain_conv(rng):
    x, _, _, weight, bias = _inputs(rng, b=1)
    b_, h, w_, _ = x.shape
    offset = jnp.zeros((b_, h, w_, 18), jnp.float32)
    mask = jnp.ones((b_, h, w_, 9), jnp.float32)
    ref = np.asarray(deform_conv2d(x, offset, mask, weight, bias))
    got = np.asarray(
        deform_conv2d_pallas(x, offset, mask, weight, bias, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=0.1, rtol=0.02)


def test_pallas_static_matches_shift(rng):
    # the static element-window kernel shares clamping semantics with
    # deform_conv2d_shift — same ±R window, bf16 data path
    x, offset, mask, weight, bias = _inputs(rng, off_scale=2.0)
    ref = np.asarray(
        deform_conv2d_shift(x, offset, mask, weight, bias, max_offset=1.0)
    )
    got = np.asarray(
        deform_conv2d_pallas_static(
            x, offset, mask, weight, bias, max_offset=1.0, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.02)


def test_pallas_static_remainder_row_blocks(rng):
    x, offset, mask, weight, bias = _inputs(rng, b=1, h=37, w=9, c=8, o=8,
                                            off_scale=0.7)
    ref = np.asarray(
        deform_conv2d_shift(x, offset, mask, weight, bias, max_offset=1.0)
    )
    got = np.asarray(
        deform_conv2d_pallas_static(
            x, offset, mask, weight, bias, max_offset=1.0, block_rows=8,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.02)


def test_deform_conv2d_fast_gradients_match_xla(rng):
    x, offset, mask, weight, bias = _inputs(rng, b=1, h=6, w=7, c=4, o=4,
                                            off_scale=1.0)

    def loss_fast(p):
        out = deform_conv2d_fast(p["x"], p["off"], p["mask"], p["w"],
                                 p["b"], 8.0, True)
        return jnp.sum(out * out)

    def loss_xla(p):
        out = deform_conv2d(p["x"], p["off"], p["mask"], p["w"], p["b"])
        return jnp.sum(out * out)

    p = {"x": x, "off": offset, "mask": mask, "w": weight, "b": bias}
    g_fast = jax.grad(loss_fast)(p)
    g_xla = jax.grad(loss_xla)(p)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g_fast[k]), np.asarray(g_xla[k]), atol=0.5, rtol=0.05
        )


def test_deform_conv2d_fast_gradients_bf16(rng):
    """bf16 mixed precision: the custom vjp must accept the bf16 cotangent
    (a float32 cast inside _fast_bwd used to raise ValueError, making the
    pallas impl untrainable under MIXED_PRECISION)."""
    x, offset, mask, weight, bias = _inputs(rng, b=1, h=6, w=7, c=4, o=4,
                                            off_scale=1.0)
    p = {"x": x.astype(jnp.bfloat16), "off": offset.astype(jnp.bfloat16),
         "mask": mask.astype(jnp.bfloat16), "w": weight.astype(jnp.bfloat16),
         "b": bias.astype(jnp.bfloat16)}

    def loss(p):
        out = deform_conv2d_fast(p["x"], p["off"], p["mask"], p["w"],
                                 p["b"], 8.0, True)
        return jnp.sum((out * out).astype(jnp.float32))

    g = jax.grad(loss)(p)
    for k in p:
        arr = np.asarray(g[k], np.float32)
        assert arr.dtype == np.float32 and np.isfinite(arr).all()
        assert g[k].dtype == p[k].dtype
    assert float(np.abs(np.asarray(g["w"], np.float32)).sum()) > 0
