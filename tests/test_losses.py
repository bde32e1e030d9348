import numpy as np
import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.losses import (
    fast_focal_loss,
    reg_weighted_l1,
    weighted_bce,
    bin_rot_loss,
    uncertainty_depth_loss,
    decoupled_loss,
    giou_2d,
    GenericLoss,
    build_layer_masks,
)
from centerfusiondetect3d_tpu.config import load_config


def test_fast_focal_loss_manual(rng):
    B, H, W, C, M = 1, 4, 5, 2, 3
    pred = np.clip(rng.rand(B, H, W, C).astype(np.float32), 1e-4, 1 - 1e-4)
    target = np.zeros((B, H, W, C), np.float32)
    target[0, 1, 2, 0] = 1.0
    ind = np.array([[1 * W + 2, 0, 0]], np.int32)
    mask = np.array([[1.0, 0.0, 0.0]], np.float32)
    cat = np.array([[0, 0, 0]], np.int32)

    neg = (np.log(1 - pred) * pred ** 2 * (1 - target) ** 4).sum()
    p = pred[0, 1, 2, 0]
    pos = np.log(p) * (1 - p) ** 2
    expected = -(pos + neg) / 1.0

    got = float(
        fast_focal_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(ind),
            jnp.asarray(mask), jnp.asarray(cat),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_fast_focal_loss_no_positives(rng):
    B, H, W, C = 1, 4, 4, 2
    pred = np.clip(rng.rand(B, H, W, C).astype(np.float32), 1e-4, 1 - 1e-4)
    target = np.zeros((B, H, W, C), np.float32)
    ind = np.zeros((1, 2), np.int32)
    mask = np.zeros((1, 2), np.float32)
    cat = np.zeros((1, 2), np.int32)
    neg = (np.log(1 - pred) * pred ** 2).sum()
    got = float(fast_focal_loss(jnp.asarray(pred), jnp.asarray(target),
                                jnp.asarray(ind), jnp.asarray(mask), jnp.asarray(cat)))
    np.testing.assert_allclose(got, -neg, rtol=1e-5)


def test_reg_weighted_l1_manual(rng):
    B, H, W, C, M = 1, 3, 4, 2, 2
    out = rng.randn(B, H, W, C).astype(np.float32)
    ind = np.array([[5, 11]], np.int32)
    mask = np.array([[[1.0, 1.0], [0.0, 0.0]]], np.float32)
    target = rng.randn(B, M, C).astype(np.float32)
    flat = out.reshape(B, H * W, C)
    expected = np.abs(flat[0, 5] - target[0, 0]).sum() / mask.sum()
    got = float(reg_weighted_l1(jnp.asarray(out), jnp.asarray(mask),
                                jnp.asarray(ind), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_reg_weighted_l1_empty_mask_guard(rng):
    out = rng.randn(1, 3, 4, 2).astype(np.float32)
    got = float(
        reg_weighted_l1(
            jnp.asarray(out), jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32),
            jnp.zeros((1, 2, 2)),
        )
    )
    assert got == 0.0  # sum(0)/1e7


def test_weighted_bce_manual(rng):
    B, H, W, F, M = 1, 2, 3, 4, 2
    out = rng.randn(B, H, W, F).astype(np.float32)
    ind = np.array([[1, 4]], np.int32)
    mask = np.zeros((B, M, F), np.float32)
    mask[0, 0, :2] = 1
    target = rng.randint(0, 2, (B, M, F)).astype(np.float32)
    flat = out.reshape(B, H * W, F)
    pred = flat[0, [1, 4]]
    bce = np.maximum(pred, 0) - pred * target[0] + np.log1p(np.exp(-np.abs(pred)))
    expected = (mask[0] * bce).sum() / mask.sum()
    got = float(weighted_bce(jnp.asarray(out), jnp.asarray(mask),
                             jnp.asarray(ind), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bin_rot_loss_manual(rng):
    B, H, W, M = 1, 2, 3, 2
    out = rng.randn(B, H, W, 8).astype(np.float32)
    ind = np.array([[2, 0]], np.int32)
    mask = np.array([[1.0, 0.0]], np.float32)
    rotbin = np.array([[[1, 0], [0, 0]]], np.int64)
    rotres = np.array([[[0.3, 0.0], [0.0, 0.0]]], np.float32)

    pred = out.reshape(B, H * W, 8)[0, 2]
    # bin1 CE over masked row
    def ce(logits, t):
        z = np.log(np.exp(logits).sum())
        return z - logits[t]
    expected = ce(pred[0:2], 1) + ce(pred[4:6], 0)
    # residual over rows with bin1 set
    def sl1(x):
        return 0.5 * x * x if abs(x) < 1 else abs(x) - 0.5
    expected += sl1(pred[2] - np.sin(0.3)) + sl1(pred[3] - np.cos(0.3))

    got = float(bin_rot_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
                             jnp.asarray(rotbin), jnp.asarray(rotres)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_uncertainty_depth_loss(rng):
    B, H, W, M = 1, 2, 3, 2
    out = rng.randn(B, H, W, 1).astype(np.float32)
    unc = np.zeros((B, H, W, 1), np.float32)  # sigma_log = 0 -> weighted == l1
    ind = np.array([[1, 3]], np.int32)
    mask = np.ones((B, M, 1), np.float32)
    target = rng.randn(B, M, 1).astype(np.float32)
    d, u = uncertainty_depth_loss(jnp.asarray(out), jnp.asarray(mask),
                                  jnp.asarray(ind), jnp.asarray(target), jnp.asarray(unc))
    np.testing.assert_allclose(float(d), float(u), rtol=1e-6)


def test_decoupled_loss_inside_outside(rng):
    B, H, W, M = 1, 2, 3, 1
    out = rng.randn(B, H, W, 2).astype(np.float32)
    ind = np.array([[2]], np.int32)
    mask = np.ones((B, M, 2), np.float32)
    target = rng.randn(B, M, 2).astype(np.float32)
    # non-truncated: plain masked-mean L1
    not_trunc = np.zeros((B, M, 2), np.float32)
    l1 = np.abs(out.reshape(1, 6, 2)[0, 2] - target[0, 0])
    got = float(decoupled_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
                               jnp.asarray(target), jnp.asarray(not_trunc)))
    np.testing.assert_allclose(got, l1.mean(), rtol=1e-5)
    # truncated: log(1 + l1)
    trunc = np.ones((B, M, 2), np.float32)
    got_t = float(decoupled_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind),
                                 jnp.asarray(target), jnp.asarray(trunc)))
    np.testing.assert_allclose(got_t, np.log1p(l1).mean(), rtol=1e-5)


def test_giou_perfect_and_disjoint():
    box = np.array([[[0.0, 0.0, 4.0, 4.0]]], np.float32)
    mask = np.ones((1, 1), np.float32)
    perfect = float(giou_2d(jnp.asarray(box), jnp.asarray(box), jnp.asarray(mask)))
    np.testing.assert_allclose(perfect, 0.0, atol=1e-6)
    far = np.array([[[10.0, 10.0, 14.0, 14.0]]], np.float32)
    disjoint = float(giou_2d(jnp.asarray(box), jnp.asarray(far), jnp.asarray(mask)))
    assert disjoint > 1.0


def test_layer_masks():
    wh = np.array([[[2.0, 2.0], [30.0, 30.0], [100.0, 100.0]]], np.float32)
    masks = np.asarray(build_layer_masks(jnp.asarray(wh), (112, 200), 2))
    # areas/22400: 1.8e-4, 4e-2, 0.45 -> layer0: (0, 0.0018); layer1: > 0.0018
    assert masks.shape == (1, 2, 3)
    assert masks[0, 0].tolist() == [True, False, False]
    assert masks[0, 1].tolist() == [False, True, True]


def _synthetic_batch(cfg, rng, b=2):
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    m = 8
    batch = {
        "heatmap0": np.zeros((b, oh, ow, 10), np.float32),
        "classIds": rng.randint(0, 10, (b, m)).astype(np.int64),
        "mask": (rng.rand(b, m) > 0.5).astype(np.float32),
        "truncMask": np.zeros((b, m), np.float32),
        "widthHeight": rng.rand(b, m, 2).astype(np.float32) * 30,
        "reg": rng.rand(b, m, 2).astype(np.float32),
        "depth": rng.rand(b, m, 1).astype(np.float32) * 50,
        "dimension": rng.rand(b, m, 3).astype(np.float32) * 3,
        "amodal_offset": rng.randn(b, m, 2).astype(np.float32),
        "nuscenes_att": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "nuscenes_att_mask": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "velocity": rng.randn(b, m, 3).astype(np.float32),
        "rotbin": rng.randint(0, 2, (b, m, 2)).astype(np.int64),
        "rotres": rng.randn(b, m, 2).astype(np.float32) * 0.2,
        "calib": np.tile(
            np.array([[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0], [0, 0, 1, 0]], np.float32),
            (b, 1, 1),
        ),
        "target": {
            "heatCenters": np.stack(
                [rng.rand(b, m) * (ow - 1), rng.rand(b, m) * (oh - 1)], -1
            ).astype(np.float32),
            "bboxes": rng.rand(b, m, 4).astype(np.float32) * 30,
            "bboxes3d": rng.randn(b, m, 8, 3).astype(np.float32),
        },
    }
    batch["heatmap0"][:, 5, 5, 0] = 1.0
    return jax.tree.map(jnp.asarray, batch)


def _model_outputs(cfg, rng, b=2):
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    y = {}
    for name, n in cfg.heads.items():
        v = rng.randn(b, oh, ow, n).astype(np.float32)
        if name == "heatmap":
            v = np.clip(1 / (1 + np.exp(-v)), 1e-4, 1 - 1e-4)
        y[name] = jnp.asarray(v)
    y["depthMap"] = y["depth"]
    return [y]


def test_generic_loss_runs_and_is_finite(rng):
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(64, 128)", "MIXED_PRECISION", "False"],
                      num_classes=10)
    loss_fn = GenericLoss(cfg)
    batch = _synthetic_batch(cfg, rng)
    outputs = _model_outputs(cfg, rng)
    total, parts = jax.jit(lambda o, b: loss_fn(o, b))(outputs, batch)
    assert np.isfinite(float(total))
    for k in ("heatmap", "depth", "depth2", "rotation", "rotation2",
              "velocity", "nuscenes_att", "reg", "widthHeight", "dimension"):
        assert k in parts and np.isfinite(float(parts[k])), k


def test_generic_loss_zero_objects(rng):
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(64, 128)", "MIXED_PRECISION", "False"],
                      num_classes=10)
    loss_fn = GenericLoss(cfg)
    batch = _synthetic_batch(cfg, rng)
    batch = dict(batch)
    batch["mask"] = jnp.zeros_like(batch["mask"])
    total, _ = loss_fn(_model_outputs(cfg, rng), batch)
    assert np.isfinite(float(total))


def test_generic_loss_gradients_flow(rng):
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(64, 128)", "MIXED_PRECISION", "False"],
                      num_classes=10)
    loss_fn = GenericLoss(cfg)
    batch = _synthetic_batch(cfg, rng)
    outputs = _model_outputs(cfg, rng)

    def f(hm):
        outs = [dict(outputs[0], heatmap=jnp.clip(hm, 1e-4, 1 - 1e-4))]
        return loss_fn(outs, batch)[0]

    g = jax.grad(f)(outputs[0]["heatmap"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_generic_loss_bbox3d_with_per_sample_trans_mat(rng):
    """LOSS_WEIGHTS.BBOX_3D > 0 computes a real bbox3d loss from the
    per-sample (B,2,3) trans_mat the dataset now ships (the guard used to
    be dead: nothing produced 'trans_mat' and the loss silently stayed 0)."""
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(64, 128)",
                            "MIXED_PRECISION", "False",
                            "LOSS_WEIGHTS.BBOX_3D", "1.0"],
                      num_classes=10)
    loss_fn = GenericLoss(cfg)
    batch = dict(_synthetic_batch(cfg, rng))
    b = batch["mask"].shape[0]
    tm = np.tile(np.array([[4.0, 0, 1.0], [0, 4.0, 2.0]], np.float32),
                 (b, 1, 1))
    tm[1, :, 2] += 5.0  # distinct per-sample offsets
    batch["trans_mat"] = jnp.asarray(tm)
    total, parts = jax.jit(lambda o, b_: loss_fn(o, b_))(
        _model_outputs(cfg, rng), batch)
    assert np.isfinite(float(total))
    assert "bbox3d" in parts and float(parts["bbox3d"]) > 0

    # shared (2,3) matrix (the golden fixtures' shape) still works
    batch["trans_mat"] = jnp.asarray(tm[0])
    total2, parts2 = loss_fn(_model_outputs(cfg, rng), batch)
    assert np.isfinite(float(total2)) and float(parts2["bbox3d"]) > 0
