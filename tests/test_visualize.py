"""Visualization surface: overlays, BEV, pillar debug, attention maps
(reference logger.py:35-485, generic_dataset.py:959-1129 + 1208-1237)."""

import os

import numpy as np
import pytest


@pytest.fixture
def img(rng):
    return (rng.rand(96, 160, 3) * 255).astype(np.uint8)


def test_pc_heatmap_overlay(img):
    from centerfusiondetect3d_tpu.utils.visualize import pc_heatmap_overlay

    hm = np.zeros((24, 40), np.float32)
    hm[6:9, 10:13] = 0.5
    out = pc_heatmap_overlay(img, hm)
    assert out.shape == img.shape
    # active region: blue/red zeroed, green carries the heat value
    region = out[24:36, 40:52]
    assert region[..., 0].max() == 0 and region[..., 2].max() == 0
    assert region[..., 1].max() == int(0.5 * 255)
    # inactive pixels untouched
    assert np.array_equal(out[0:10, 0:10], img[0:10, 0:10])


def test_pc_heatmap_overlay_nhwc_depthmap(img):
    from centerfusiondetect3d_tpu.utils.visualize import pc_heatmap_overlay

    pc_dep = np.zeros((24, 40, 3), np.float32)
    pc_dep[5, 5, 0] = 1.0
    out = pc_heatmap_overlay(img, pc_dep)
    assert (out != img).any()


def test_box3d_overlay_draws_and_filters(img):
    from centerfusiondetect3d_tpu.utils.visualize import box3d_overlay

    calib = np.array([[400.0, 0, 80, 0], [0, 400.0, 48, 0], [0, 0, 1, 0]],
                     np.float32)
    trans = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    hi = {"dimension": [1.6, 1.9, 4.5], "location": [0.0, 0.5, 12.0],
          "yaw": 0.2, "score": 0.9}
    lo = dict(hi, score=0.01)
    behind = dict(hi, location=[0.0, 0.5, -5.0])
    assert (box3d_overlay(img, [hi], calib, trans) != img).any()
    assert np.array_equal(box3d_overlay(img, [lo], calib, trans), img)
    assert np.array_equal(box3d_overlay(img, [behind], calib, trans), img)


def test_bev_gt_vs_pred_colors():
    from centerfusiondetect3d_tpu.utils.visualize import (
        GT_COLOR, PRED_COLOR, bev_gt_vs_pred)

    gt = [{"dimension": [1.6, 1.9, 4.5], "location": [-8.0, 0.5, 20.0],
           "yaw": 0.0}]
    pred = [dict(gt[0], location=[8.0, 0.5, 20.0], score=0.9)]
    bev = bev_gt_vs_pred(gt, pred, radar_pc=np.zeros((18, 2), np.float32))
    # both colors present on the canvas
    assert (bev == np.array(GT_COLOR)).all(-1).any()
    assert (bev == np.array(PRED_COLOR)).all(-1).any()


def test_debug_pillars_writes_files(tmp_path, img):
    from centerfusiondetect3d_tpu.utils.visualize import debug_pillars

    pc_2d = np.array([[10.0, 20.0], [12.0, 8.0], [15.0, 40.0]], np.float32)
    pillar_wh = np.array([[2.0, 1.0], [3.0, 2.0]], np.float32)
    trans_in = np.array([[0.4, 0, 0], [0, 0.4, 0]], np.float32)
    trans_out = trans_in / 4.0
    paths = debug_pillars(img, pc_2d, pillar_wh, trans_in, trans_out,
                          (96, 160), (24, 40), str(tmp_path), index=3)
    assert len(paths) == 4
    for p in paths:
        assert os.path.exists(p) and "3_" in os.path.basename(p)


def test_dataset_debug_pillars_hook(tmp_path, rng, monkeypatch):
    """DEBUG>1 writes pillar renders during get_item (debugPillar gate)."""
    import cv2

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.data.dataset import GenericDataset

    # minimal COCO-format dir with one image + one radar-ready img_info
    root = tmp_path / "ds"
    (root / "imgs").mkdir(parents=True)
    cv2.imwrite(str(root / "imgs" / "i0.jpg"),
                (rng.rand(60, 80, 3) * 255).astype(np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "imgs/i0.jpg", "width": 80,
                    "height": 60, "camera_intrinsic":
                        [[100.0, 0, 40.0], [0, 100.0, 30.0], [0, 0, 1]],
                    "calib": [[100.0, 0, 40.0, 0], [0, 100.0, 30.0, 0],
                              [0, 0, 1, 0]]}],
        "annotations": [],
        "categories": [{"name": "car", "id": 1}],
    }
    import json

    (root / "ann.json").write_text(json.dumps(ann))

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(32, 64)", "DATASET.RADAR_PC", "True",
              "MODEL.FRUSTUM", "True", "MODEL.FUSION_STRATEGY", "'middle'",
              "DEBUG", "2", "OUTPUT_DIR", repr(str(tmp_path / "out")),
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )

    class DS(GenericDataset):
        class_name = ["car"]
        num_categories = 1
        default_resolution = (60, 80)

        def load_radar(self, img_info):
            radar = np.zeros((18, 1), np.float32)
            radar[:3, 0] = (1.0, 0.3, 8.0)
            return radar

        def load_lidar(self, img_info):
            return None

    ds = DS(cfg, "val", str(root / "ann.json"), str(root))
    ds.get_item(0)
    debug_dir = tmp_path / "out" / "debug"
    assert debug_dir.is_dir()
    assert any("pillarInput2D" in p for p in os.listdir(debug_dir))


def test_normalize_depthmaps_and_attention_overlay(img):
    from centerfusiondetect3d_tpu.utils.visualize import (
        attention_overlay, normalize_depthmaps)

    extras = {
        "depthMap": np.random.RandomState(0).rand(2, 24, 40, 1).astype(np.float32),
        "pc_hm": None,  # absent head: skipped
    }
    maps = normalize_depthmaps(extras)
    assert set(maps) == {"depthMap"}
    assert maps["depthMap"].dtype == np.uint8
    assert maps["depthMap"].shape == (2, 24, 40)
    assert maps["depthMap"].max() == 255 and maps["depthMap"].min() == 0
    ov = attention_overlay(img, maps["depthMap"][0])
    assert ov.shape == (24, 40, 3)
