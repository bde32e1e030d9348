"""Shifted-window (gather-free) DCN: oracle parity, clamping, gradients,
and the DeformConvNode impl switch. Reference op: torchvision
deform_conv2d (dla.py:461-472); oracle: ops/dcn.py gather formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d, deform_conv2d_shift


@pytest.fixture
def case(rng):
    b, h, w, c, o = 2, 10, 12, 8, 16
    return (
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)),
        jnp.asarray((rng.randn(b, h, w, 18) * 0.8).astype(np.float32)),
        jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32)),
        jnp.asarray((rng.randn(3, 3, c, o) * 0.1).astype(np.float32)),
        jnp.asarray(rng.randn(o).astype(np.float32)),
    )


def test_shift_matches_gather_oracle(case):
    x, off, m, wt, bias = case
    a = np.asarray(deform_conv2d(x, jnp.clip(off, -2, 2), m, wt, bias))
    b = np.asarray(deform_conv2d_shift(x, off, m, wt, bias, max_offset=2.0))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_shift_clamps_large_offsets(case):
    x, _, m, wt, bias = case
    rng = np.random.RandomState(7)
    off = jnp.asarray((rng.randn(*x.shape[:3], 18) * 5.0).astype(np.float32))
    a = np.asarray(deform_conv2d(x, jnp.clip(off, -2, 2), m, wt, bias))
    b = np.asarray(deform_conv2d_shift(x, off, m, wt, bias, max_offset=2.0))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_shift_r1_window(case):
    x, off, m, wt, bias = case
    a = np.asarray(deform_conv2d(x, jnp.clip(off, -1, 1), m, wt, bias))
    b = np.asarray(deform_conv2d_shift(x, off, m, wt, bias, max_offset=1.0))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_shift_zero_offsets_is_plain_conv(rng):
    b, h, w, c, o = 1, 8, 9, 4, 6
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wt = jnp.asarray((rng.randn(3, 3, c, o) * 0.1).astype(np.float32))
    got = deform_conv2d_shift(
        x, jnp.zeros((b, h, w, 18)), jnp.ones((b, h, w, 9)), wt
    )
    ref = jax.lax.conv_general_dilated(
        x, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_shift_gradients_match_oracle(case):
    x, off, m, wt, _ = case

    def loss(fn):
        def f(x, off, m, wt):
            return jnp.sum(fn(x, off, m, wt) ** 2)
        return f

    # oracle with the same straight-through clamp inside the differentiated
    # function, so the two paths compute the same mathematical map. R=1.9
    # (fractional): clamped sample positions land OFF the integer grid, where
    # both formulations are differentiable — at integer boundaries the two
    # kink-subgradient conventions (floor-bilinear vs tent-max) differ.
    from centerfusiondetect3d_tpu.ops.dcn import _st_clip

    ga = jax.grad(
        loss(lambda x, off, m, wt: deform_conv2d(
            x, _st_clip(off, -1.9, 1.9), m, wt)),
        argnums=(0, 1, 2, 3),
    )(x, off, m, wt)
    gb = jax.grad(
        loss(lambda *a: deform_conv2d_shift(*a, max_offset=1.9)),
        argnums=(0, 1, 2, 3),
    )(x, off, m, wt)
    for a, b, name in zip(ga, gb, ("x", "offset", "mask", "weight")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_shift_offset_gradients_nonzero_outside_clamp(case):
    """The clamp is straight-through: offsets beyond ±R still receive
    gradient, so TPU training can learn offsets past the window instead of
    freezing at the boundary (a hard jnp.clip has zero gradient there —
    VERDICT r2 weak #2; the reference op never clamps, dla.py:461-472)."""
    x, _, m, wt, _ = case
    rng2 = np.random.RandomState(3)
    # every offset far outside the R=1 window
    off = jnp.asarray(
        (rng2.randn(*x.shape[:3], 18) * 0.5 + 4.0).astype(np.float32)
    )

    g = jax.grad(
        lambda o: jnp.sum(deform_conv2d_shift(x, o, m, wt, max_offset=1.0) ** 2)
    )(off)
    # R=1 clamps to an integer grid position, where tent-kink subgradients
    # occasionally cancel — most but not all entries carry gradient
    frac_nonzero = float(np.mean(np.abs(np.asarray(g)) > 0))
    assert frac_nonzero > 0.8, frac_nonzero
    # at a fractional clamp the boundary is smooth: gradient everywhere in
    # the interior (border pixels can sample only zero padding)
    g = jax.grad(
        lambda o: jnp.sum(deform_conv2d_shift(x, o, m, wt, max_offset=1.5) ** 2)
    )(off)
    interior = np.asarray(g)[:, 3:-3, 3:-3, :]
    assert float(np.mean(np.abs(interior) > 0)) > 0.99


def test_select_matches_shift(case):
    """4-corner select formulation == shift formulation (identical clamp
    semantics), for in-range, clamped, and R=2 offset regimes."""
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_select

    x, off, m, wt, bias = case
    for r, scale in ((1.0, 1.0), (1.0, 5.0), (2.0, 1.0)):
        a = np.asarray(
            deform_conv2d_shift(x, off * scale, m, wt, bias, max_offset=r))
        b = np.asarray(
            deform_conv2d_select(x, off * scale, m, wt, bias, max_offset=r))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   err_msg=f"r={r} scale={scale}")


def test_select_gradients_match_oracle(case):
    """Away from integer sampling points the select gradient equals the
    gather oracle's bilinear gradient (same STE clamp)."""
    from centerfusiondetect3d_tpu.ops.dcn import _st_clip, deform_conv2d_select

    x, off, m, wt, _ = case
    off = off * 0.5  # strictly inside ±1: no clamp kinks

    ga = jax.grad(
        lambda x, o, m, w: jnp.sum(
            deform_conv2d(x, _st_clip(o, -1.0, 1.0), m, w) ** 2),
        argnums=(0, 1, 2, 3),
    )(x, off, m, wt)
    gb = jax.grad(
        lambda x, o, m, w: jnp.sum(
            deform_conv2d_select(x, o, m, w, max_offset=1.0) ** 2),
        argnums=(0, 1, 2, 3),
    )(x, off, m, wt)
    for a, b, name in zip(ga, gb, ("x", "offset", "mask", "weight")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_select_offset_gradients_nonzero_outside_clamp(case):
    """STE clamp + one-sided floor-bilinear derivative: offsets beyond ±R
    carry gradient everywhere in the interior (the tent formulation's
    integer-kink tie-split can cancel; the select form cannot)."""
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_select

    x, _, m, wt, _ = case
    rng2 = np.random.RandomState(3)
    off = jnp.asarray(
        (rng2.randn(*x.shape[:3], 18) * 0.5 + 4.0).astype(np.float32)
    )
    g = jax.grad(
        lambda o: jnp.sum(deform_conv2d_select(x, o, m, wt,
                                               max_offset=1.0) ** 2)
    )(off)
    interior = np.asarray(g)[:, 3:-3, 3:-3, :]
    assert float(np.mean(np.abs(interior) > 0)) > 0.99


def test_select_requires_integer_r(case):
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_select

    x, off, m, wt, bias = case
    with pytest.raises(AssertionError):
        deform_conv2d_select(x, off, m, wt, bias, max_offset=1.5)


@pytest.mark.slow
def test_node_select_impl_matches_xla(rng):
    from centerfusiondetect3d_tpu.models.layers import DeformConvNode

    x = jnp.asarray(rng.randn(1, 8, 10, 6).astype(np.float32))
    out = {}
    for impl in ("xla", "select"):
        node = DeformConvNode(features=4, dcn_impl=impl)
        v = node.init(jax.random.PRNGKey(0), x, train=False)
        out[impl] = np.asarray(node.apply(v, x, train=False))
    np.testing.assert_allclose(out["xla"], out["select"], rtol=1e-5,
                               atol=1e-5)


@pytest.mark.slow
def test_node_shift_impl_matches_xla(rng):
    from centerfusiondetect3d_tpu.models.layers import DeformConvNode

    x = jnp.asarray(rng.randn(1, 8, 10, 6).astype(np.float32))
    out = {}
    for impl in ("xla", "shift"):
        node = DeformConvNode(features=4, dcn_impl=impl)
        v = node.init(jax.random.PRNGKey(0), x, train=False)
        out[impl] = np.asarray(node.apply(v, x, train=False))
    # zero-init offsets: both impls are exactly in range -> identical
    np.testing.assert_allclose(out["xla"], out["shift"], rtol=1e-5, atol=1e-5)


def test_shift_hybrid_corrects_clamped_pixels():
    """shift_hybrid == exact DCN wherever the top-M correction covers the
    overflowing pixels; with enough budget it matches the exact op even when
    most offsets exceed R (offsets sigma=2, R=1)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.ops.dcn import (
        deform_conv2d,
        deform_conv2d_shift,
        deform_conv2d_shift_hybrid,
    )

    rs = np.random.RandomState(3)
    B, H, W, C, O = 1, 12, 16, 8, 8
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    mask = jnp.asarray((1 / (1 + np.exp(-rs.randn(B, H, W, 9)))).astype(np.float32))
    wt = jnp.asarray((rs.randn(3, 3, C, O) * 0.2).astype(np.float32))
    bias = jnp.asarray(rs.randn(O).astype(np.float32))
    # a handful of large-offset pixels on an otherwise small-offset field
    off = (rs.randn(B, H, W, 18) * 0.2).astype(np.float32)
    hot = [(2, 3), (7, 11), (9, 4)]
    for (yy, xx) in hot:
        off[0, yy, xx] = rs.randn(18) * 3.0
    off = jnp.asarray(off)

    exact = np.asarray(deform_conv2d(x, off, mask, wt, bias))
    plain = np.asarray(
        deform_conv2d_shift(x, off, mask, wt, bias, max_offset=1.0)
    )
    hybrid = np.asarray(
        deform_conv2d_shift_hybrid(
            x, off, mask, wt, bias, max_offset=1.0, correct_frac=0.05,
            approx=False,
        )
    )
    # plain shift is wrong at the hot pixels; hybrid matches exact everywhere
    assert np.abs(plain - exact).max() > 1e-3
    np.testing.assert_allclose(hybrid, exact, rtol=1e-4, atol=1e-4)

    # gradients flow through the corrected path
    def loss(o):
        return jnp.sum(
            deform_conv2d_shift_hybrid(
                x, o, mask, wt, bias, max_offset=1.0, correct_frac=0.05,
                approx=False,
            ) ** 2
        )

    g = np.asarray(jax.grad(loss)(off))
    assert np.isfinite(g).all()
    # nonzero offset gradient at a corrected (overflowing) pixel
    assert np.abs(g[0, hot[0][0], hot[0][1]]).max() > 0


def test_hybrid_approx_flag_plumbs_from_config():
    """MODEL.DLA.DCN_CORRECT_APPROX reaches the DeformConv nodes: the strict
    'residual error only above DCN_CORRECT_FRAC overflow' guarantee needs
    exact top_k selection, which must be reachable from config (approx_max_k
    recall is ~0.95)."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.models import build_model

    cfg = load_config(
        opts=["MODEL.DLA.NODE", "DeformConv", "MODEL.DLA.DCN_IMPL",
              "'shift_hybrid'", "MODEL.DLA.DCN_CORRECT_APPROX", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    assert model.dcn_correct_approx is False
    assert build_model(load_config(num_classes=10)).dcn_correct_approx is True


def test_deep_node_impl_override_plumbs():
    """MODEL.DLA.DCN_DEEP_IMPL/DCN_DEEP_MIN_CH reach the DCN nodes: deep
    nodes (measured trained-offset p99 ~8 px, scripts/overfit_tpu.py) must
    route to the exact-corrected impl while shallow nodes keep the fast
    clamped path."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.models import build_model

    model = build_model(load_config(num_classes=10))
    assert model.dcn_deep_impl == "shift_hybrid"
    assert model.dcn_deep_min_ch == 256

    cfg = load_config(opts=["MODEL.DLA.DCN_DEEP_IMPL", "''"], num_classes=10)
    assert build_model(cfg).dcn_deep_impl == ""
