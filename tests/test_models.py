import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import (
    DLA,
    BilinearUp,
    build_model,
)
from centerfusiondetect3d_tpu.models.layers import bilinear_kernel
from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d


# ---------------------------------------------------------------- DCN oracle
def _dcn_oracle(x, offset, mask, weight, bias):
    """Independent loop-based DCNv2 (zero-padded bilinear sampling)."""
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    out = np.zeros((b, h, w, o), np.float32)

    def sample(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        val = np.zeros(c, np.float32)
        for yi, wy in ((y0, y0 + 1 - py), (y0 + 1, py - y0)):
            for xi, wx in ((x0, x0 + 1 - px), (x0 + 1, px - x0)):
                if 0 <= yi < h and 0 <= xi < w:
                    val += wy * wx * img[yi, xi]
        return val

    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                acc = np.zeros(o, np.float32)
                for k in range(kh * kw):
                    i, j = divmod(k, kw)
                    py = yy + i - 1 + offset[bi, yy, xx, 2 * k]
                    px = xx + j - 1 + offset[bi, yy, xx, 2 * k + 1]
                    s = sample(x[bi], py, px) * mask[bi, yy, xx, k]
                    acc += s @ weight[i, j]
                out[bi, yy, xx] = acc + bias
    return out


def test_dcn_matches_oracle(rng):
    b, h, w, c, o = 1, 6, 7, 4, 5
    x = rng.randn(b, h, w, c).astype(np.float32)
    offset = (rng.randn(b, h, w, 18) * 1.5).astype(np.float32)
    mask = rng.rand(b, h, w, 9).astype(np.float32)
    weight = rng.randn(3, 3, c, o).astype(np.float32) * 0.2
    bias = rng.randn(o).astype(np.float32)
    expected = _dcn_oracle(x, offset, mask, weight, bias)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_dcn_zero_offset_equals_conv(rng):
    """With zero offsets and mask=1, DCN must equal a plain 3x3 conv."""
    b, h, w, c, o = 2, 8, 8, 3, 4
    x = rng.randn(b, h, w, c).astype(np.float32)
    weight = rng.randn(3, 3, c, o).astype(np.float32) * 0.3
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4)


@pytest.mark.slow
def test_dcn_is_differentiable(rng):
    b, h, w, c, o = 1, 4, 4, 2, 2
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offset = jnp.asarray(rng.randn(b, h, w, 18).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32))

    def loss(x, offset, weight):
        return jnp.sum(deform_conv2d(x, offset, mask, weight) ** 2)

    gx, goff, gw = jax.grad(loss, argnums=(0, 1, 2))(x, offset, weight)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(goff)).all()
    assert np.abs(np.asarray(goff)).sum() > 0  # offsets get gradient


# ------------------------------------------------------------- upsampling
def test_bilinear_kernel_matches_reference_formula():
    # factor 2 -> 4x4 kernel with rows [.0625 .1875 .1875 .0625]*... pattern
    k = bilinear_kernel(2)
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k[1, 1], 0.75 * 0.75, atol=1e-6)
    np.testing.assert_allclose(k.sum(), 4.0, atol=1e-5)  # partition of unity x4


def test_bilinear_up_constant_map(rng):
    m = BilinearUp(features=3, factor=2)
    x = jnp.ones((1, 5, 6, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 10, 12, 3)
    # interior of an upsampled constant map stays constant
    np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2], 1.0, atol=1e-5)


# ------------------------------------------------------------------ DLA
def test_dla_backbone_shapes(rng):
    model = DLA()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [
        (1, 64, 64, 16),
        (1, 32, 32, 32),
        (1, 16, 16, 64),
        (1, 8, 8, 128),
        (1, 4, 4, 256),
        (1, 2, 2, 512),
    ]


def test_dla_batchnorm_updates_in_train(rng):
    model = DLA()
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["base_layer"]["bn"]["mean"]
    after = updates["batch_stats"]["base_layer"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


# ------------------------------------------------------------- full model
@pytest.fixture(scope="module")
def small_cfg():
    return load_config(
        opts=[
            "MODEL.INPUT_SIZE", "(64, 128)",
            "MODEL.DLA.NODE", "Conv",
            "MODEL.K", "16",
            "MIXED_PRECISION", "False",
        ],
        num_classes=10,
    )


def _inputs(cfg, rng, train):
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    pc_hm = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(
        np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0], [0, 0, 1, 0]]], np.float32)
    )
    return dict(image=image, pc_hm=pc_hm, pc_dep=pc_dep, calib=calib, train=train)


def test_full_model_train_and_eval(small_cfg, rng):
    cfg = small_cfg
    model = build_model(cfg)
    kwargs = _inputs(cfg, rng, train=False)
    variables = model.init(jax.random.PRNGKey(0), **kwargs)

    # eval forward (frustum association from predictions)
    outs = model.apply(variables, **kwargs)
    assert isinstance(outs, list) and len(outs) == 1
    y = outs[0]
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    assert y["heatmap"].shape == (1, oh, ow, 10)
    assert y["reg"].shape == (1, oh, ow, 2)
    assert y["depth"].shape == (1, oh, ow, 1)
    assert y["rotation"].shape == (1, oh, ow, 8)
    assert y["depth2"].shape == (1, oh, ow, 1)
    assert y["rotation2"].shape == (1, oh, ow, 8)
    assert y["velocity"].shape == (1, oh, ow, 3)
    assert y["nuscenes_att"].shape == (1, oh, ow, 8)
    # heatmap is sigmoid-clamped
    hm = np.asarray(y["heatmap"])
    assert hm.min() >= 1e-4 and hm.max() <= 1 - 1e-4
    # depth is positive after 1/sigmoid - 1
    assert np.asarray(y["depth"]).min() >= 0

    # train forward updates batch stats and uses provided pc_hm
    kwargs_t = _inputs(cfg, rng, train=True)
    outs_t, updates = model.apply(variables, **kwargs_t, mutable=["batch_stats"])
    assert "batch_stats" in updates
    assert outs_t[0]["depth2"].shape == (1, oh, ow, 1)


def test_full_model_decode_integration(small_cfg, rng):
    from centerfusiondetect3d_tpu.ops import fusion_decode

    cfg = small_cfg
    model = build_model(cfg)
    kwargs = _inputs(cfg, rng, train=False)
    variables = model.init(jax.random.PRNGKey(0), **kwargs)
    outs = model.apply(variables, **kwargs)
    ret = fusion_decode(outs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K)
    assert ret["scores"].shape == (1, cfg.MODEL.K)
    assert ret["bboxes"].shape == (1, cfg.MODEL.K, 4)
    assert np.isfinite(np.asarray(ret["depth"])).all()


def test_camera_only_model(rng):
    cfg = load_config(
        opts=[
            "MODEL.INPUT_SIZE", "(64, 128)",
            "MODEL.DLA.NODE", "Conv",
            "DATASET.RADAR_PC", "False",
            "MIXED_PRECISION", "False",
        ],
        num_classes=10,
    )
    model = build_model(cfg)
    h, w = cfg.MODEL.INPUT_SIZE
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), image)
    outs = model.apply(variables, image)
    y = outs[0]
    # camera-only: no secondary radar heads, but nuScenes velocity/att remain
    # as first-stage heads (reference detectHeads.py:32-132 with no fusion)
    assert "depth2" not in y and "rotation2" not in y
    assert y["velocity"].shape[-1] == 3 and y["nuscenes_att"].shape[-1] == 8
    assert y["heatmap"].shape[-1] == 10


def test_deformconv_model_forward(rng):
    cfg = load_config(
        opts=[
            "MODEL.INPUT_SIZE", "(64, 64)",
            "MODEL.DLA.NODE", "DeformConv",
            "DATASET.RADAR_PC", "False",
            "MIXED_PRECISION", "False",
        ],
        num_classes=3,
    )
    model = build_model(cfg)
    image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), image)
    y = model.apply(variables, image)[0]
    assert y["heatmap"].shape == (1, 16, 16, 3)
    # zero-init offsets: finite, reasonable outputs
    assert np.isfinite(np.asarray(y["depthMap"])).all()


def test_early_fusion_model(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.FUSION_STRATEGY", "'early'", "MODEL.FRUSTUM", "False",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    # early fusion: no secondary heads derived
    assert "depth2" not in cfg.heads
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    pc = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, pc, pc, calib)
    y = model.apply(variables, image, pc, pc, calib)[0]
    assert y["heatmap"].shape == (1, oh, ow, 10)
    # stem conv consumed 3 image + 3 radar channels
    stem = variables["params"]["base"]["base_layer"]["conv"]["kernel"]
    assert stem.shape[2] == 6


def test_globalconv_node_model(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "GlobalConv",
              "DATASET.RADAR_PC", "False", "MIXED_PRECISION", "False"],
        num_classes=3,
    )
    model = build_model(cfg)
    image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), image)
    y = model.apply(variables, image)[0]
    assert y["heatmap"].shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(y["depthMap"])).all()


def test_one_hot_frustum_rejected():
    with pytest.raises(ValueError):
        load_config(
            opts=["DATASET.ONE_HOT_PC", "True", "MODEL.FRUSTUM", "True"],
            num_classes=10,
        )


def test_resnet_backbone_family(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.ARCH", "'resnet_18'",
              "MODEL.DLA.NODE", "Conv", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    pc = jnp.asarray(np.abs(rng.randn(1, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.array([[[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, pc, pc, calib)
    y = model.apply(variables, image, pc, pc, calib)[0]
    assert y["heatmap"].shape == (1, oh, ow, 10)
    assert y["depth2"].shape == (1, oh, ow, 1)  # same fusion heads on resnet
    # backbone params are ResNet-shaped (layer4 exists, no tree names)
    assert any(k.startswith("layer4") for k in variables["params"]["base"])


def test_unknown_arch_rejected():
    cfg = load_config(opts=["MODEL.ARCH", "'vit_base'"], num_classes=10)
    with pytest.raises(NotImplementedError):
        build_model(cfg)


@pytest.mark.slow
def test_remat_backbone_matches_plain(rng):
    import jax as _jax

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "Conv",
              "DATASET.RADAR_PC", "False", "MIXED_PRECISION", "False"],
        num_classes=3,
    )
    cfg_r = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 64)", "MODEL.DLA.NODE", "Conv",
              "DATASET.RADAR_PC", "False", "TPU.REMAT", "True",
              "MIXED_PRECISION", "False"],
        num_classes=3,
    )
    image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    plain = build_model(cfg)
    remat = build_model(cfg_r)
    v = plain.init(_jax.random.PRNGKey(0), image)
    y0 = plain.apply(v, image)[0]["heatmap"]
    y1 = remat.apply(v, image)[0]["heatmap"]  # identical params tree
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
    # gradients flow through the remat boundary
    def loss(params):
        return remat.apply({"params": params, "batch_stats": v["batch_stats"]},
                           image, train=True, mutable=["batch_stats"])[0][0]["heatmap"].sum()
    g = _jax.grad(loss)(v["params"])
    assert np.isfinite(np.asarray(_jax.tree.leaves(g)[0])).all()
