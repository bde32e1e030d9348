"""Coverage for less-common config paths: uncertainty head, decoupled
representation, NORM_2D, PC_ROI_METHOD variants, one-hot radar encoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.data import radar as R


def _mini_batch(cfg, rng, b=1, m=4):
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    h, w = cfg.MODEL.INPUT_SIZE
    nc = cfg.DATASET.NUM_CLASSES
    batch = {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "pc_hm": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "pc_dep": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "calib": np.tile(np.array([[120.0, 0, ow / 2, 0], [0, 120.0, oh / 2, 0],
                                   [0, 0, 1, 0]], np.float32), (b, 1, 1)),
        "heatmap0": np.zeros((b, oh, ow, nc), np.float32),
        "classIds": rng.randint(0, nc, (b, m)),
        "mask": np.ones((b, m), np.float32),
        "truncMask": rng.randint(0, 2, (b, m)).astype(np.float32),
        "widthHeight": rng.rand(b, m, 2).astype(np.float32) * 20,
        "reg": rng.rand(b, m, 2).astype(np.float32),
        "depth": rng.rand(b, m, 1).astype(np.float32) * 40,
        "dimension": rng.rand(b, m, 3).astype(np.float32) * 2,
        "amodal_offset": rng.randn(b, m, 2).astype(np.float32),
        "nuscenes_att": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "nuscenes_att_mask": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "velocity": rng.randn(b, m, 3).astype(np.float32),
        "rotbin": rng.randint(0, 2, (b, m, 2)),
        "rotres": rng.randn(b, m, 2).astype(np.float32) * 0.2,
        "target": {
            "heatCenters": np.stack([rng.rand(b, m) * (ow - 1),
                                     rng.rand(b, m) * (oh - 1)], -1).astype(np.float32),
            "bboxes": rng.rand(b, m, 4).astype(np.float32) * 20,
            "bboxes3d": rng.randn(b, m, 8, 3).astype(np.float32),
        },
    }
    return jax.tree.map(jnp.asarray, batch)


@pytest.mark.slow
def test_uncertainty_head_and_loss(rng):
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.ops import fusion_decode

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "TRAIN.UNCERTAINTY_LOSS", "True", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    assert cfg.heads.uncertainty == 1
    model = build_model(cfg)
    batch = _mini_batch(cfg, rng)
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
                           batch["pc_dep"], batch["calib"], train=True)
    outs, _ = model.apply(variables, batch["image"], batch["pc_hm"], batch["pc_dep"],
                          batch["calib"], train=True, mutable=["batch_stats"])
    assert outs[0]["uncertainty"].shape[-1] == 1
    total, parts = GenericLoss(cfg)(outs, batch, train=True)
    assert np.isfinite(float(total))
    # decode applies the exp(-exp(u)) score scaling without NaN
    dets = fusion_decode(outs, cfg.MODEL.OUTPUT_SIZE, k=8)
    assert np.isfinite(np.asarray(dets["scores"])).all()


def test_decoupled_rep_loss(rng):
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "DATASET.DECOUPLE_REP", "True", "DATASET.HEATMAP_REP", "'3d'",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    batch = _mini_batch(cfg, rng)
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
                           batch["pc_dep"], batch["calib"], train=True)
    outs, _ = model.apply(variables, batch["image"], batch["pc_hm"], batch["pc_dep"],
                          batch["calib"], train=True, mutable=["batch_stats"])
    total, parts = GenericLoss(cfg)(outs, batch, train=True)
    assert np.isfinite(float(total))
    assert "amodal_offset" in parts


def _pc_inputs(rng, n=30):
    pc_2d = np.zeros((3, n), np.float32)
    pc_2d[0] = rng.rand(n) * 600
    pc_2d[1] = rng.rand(n) * 360
    pc_2d[2] = rng.rand(n) * 50 + 2
    pc_3d = np.zeros((18, n), np.float32)
    pc_3d[2] = pc_2d[2]
    pc_3d[8] = rng.randn(n)
    pc_3d[9] = rng.randn(n)
    trans = np.array([[0.25, 0, 0], [0, 0.26, 0]], np.float64)
    calib = np.array([[400.0, 0, 200, 0], [0, 400, 150, 0], [0, 0, 1, 0]], np.float32)
    return pc_2d, pc_3d, trans, calib


@pytest.mark.parametrize("method", ["pillars", "heatmap", "points"])
def test_pc_roi_methods(rng, method):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(96, 160)", "DATASET.PC_ROI_METHOD", repr(method),
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    pc_2d, pc_3d, trans, calib = _pc_inputs(rng)
    out2d, out3d, dm = R.process_point_cloud(pc_2d, pc_3d, cfg, trans, calib)
    assert dm.shape == (24, 40, 3)
    assert dm[..., 0].max() > 0  # some depth was rasterized
    assert np.isfinite(dm).all()


def test_one_hot_pc_depth_map(rng):
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(96, 160)", "DATASET.ONE_HOT_PC", "True",
              "MODEL.FRUSTUM", "False", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    pc_2d, pc_3d, trans, calib = _pc_inputs(rng)
    _, _, dm = R.process_point_cloud(pc_2d, pc_3d, cfg, trans, calib)
    max_dist = int(cfg.DATASET.MAX_PC_DIST)
    assert dm.shape == (24, 40, 3 * max_dist)
    # depth values land in their integer-depth layer
    ys, xs, cs = np.nonzero(dm[..., :max_dist])
    for y, x, c in zip(ys[:10], xs[:10], cs[:10]):
        assert int(dm[y, x, c]) == c
