"""Device radar rasterization vs the host paint (ops/rasterize.py).

The device path must be BIT-identical to the host overwrite-ordered paint
(reference drawPcHeat semantics, nuscenes.py:234-263): later rows win at
covered pixels, values pass through untouched.
"""

import numpy as np
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.data.radar import (
    paint_rows_host,
    prepare_radar_points,
    process_point_cloud,
    process_point_cloud_rows,
)
from centerfusiondetect3d_tpu.ops import paint_rects_device


def _random_rows(rng, n, h, w):
    y1 = rng.randint(0, h, n)
    y2 = y1 + rng.randint(0, h // 2, n)
    x1 = rng.randint(0, w, n)
    x2 = x1 + rng.randint(0, w // 2, n)
    boxes = np.stack([y1, np.minimum(y2, h), x1, np.minimum(x2, w)], 1)
    boxes = boxes.astype(np.int32)
    values = rng.randn(n, 3).astype(np.float32)
    return boxes, values


def test_device_paint_matches_host_bitexact(rng):
    h, w = 28, 50
    boxes, values = _random_rows(rng, 200, h, w)
    # force heavy overlap: duplicate some boxes with different values so the
    # overwrite order is actually exercised
    boxes[50:100] = boxes[:50]
    host = paint_rows_host(boxes, values, (h, w))
    dev = np.asarray(paint_rects_device(boxes, values, (h, w), chunk=64))
    np.testing.assert_array_equal(host, dev)


def test_device_paint_empty_and_padded(rng):
    h, w = 16, 24
    # all-zero rows (the MAX_PC padding) cover nothing
    boxes = np.zeros((32, 4), np.int32)
    values = rng.randn(32, 3).astype(np.float32)
    dev = np.asarray(paint_rects_device(boxes, values, (h, w)))
    assert dev.shape == (h, w, 3)
    np.testing.assert_array_equal(dev, 0.0)
    # non-multiple-of-chunk row count works (internal padding)
    boxes2, values2 = _random_rows(rng, 37, h, w)
    host = paint_rows_host(boxes2, values2, (h, w))
    dev2 = np.asarray(paint_rects_device(boxes2, values2, (h, w), chunk=16))
    np.testing.assert_array_equal(host, dev2)


@pytest.mark.parametrize("method", ["pillars", "heatmap", "points"])
def test_rows_reproduce_host_raster(rng, method):
    """Painting process_point_cloud_rows' output reproduces the host
    process_point_cloud raster bit for bit for every ROI method."""
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "DATASET.PC_ROI_METHOD",
              f"'{method}'"],
        num_classes=10,
    )
    n = 40
    pc_2d = np.stack([
        rng.rand(n) * 600 + 10, rng.rand(n) * 330 + 10, rng.rand(n) * 55 + 2
    ]).astype(np.float32)
    pc_3d = rng.randn(18, n).astype(np.float32)
    pc_3d[2] = pc_2d[2]
    trans_out = np.array([[0.2, 0, 0], [0, 0.2, -1.0]], np.float32)
    calib = np.array([[120.0, 0, 16, 0], [0, 120.0, 8, 0], [0, 0, 1, 0]],
                     np.float32)

    _, _, pc_dep = process_point_cloud(pc_2d, pc_3d, cfg, trans_out, calib)
    _, _, boxes, values = process_point_cloud_rows(
        pc_2d, pc_3d, cfg, trans_out, calib
    )
    out_size = tuple(cfg.MODEL.OUTPUT_SIZE)
    host_from_rows = paint_rows_host(boxes, values, out_size)
    np.testing.assert_array_equal(pc_dep, host_from_rows)
    dev = np.asarray(paint_rects_device(boxes, values, out_size))
    np.testing.assert_array_equal(pc_dep, dev)


def test_prepare_radar_points_return_paint(rng):
    """The padded rows from return_paint paint the same map the dense path
    returns, and one-hot is rejected."""
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(64, 128)"], num_classes=10)
    radar = np.zeros((18, 50), np.float32)
    radar[0] = rng.randn(50) * 15
    radar[1] = rng.rand(50) * 2 - 1
    radar[2] = rng.rand(50) * 50 + 2
    radar[8] = rng.randn(50)
    radar[9] = rng.randn(50)
    info = {
        "width": 1600, "height": 900,
        "calib": [[1266.4, 0, 800, 0], [0, 1266.4, 450, 0], [0, 0, 1, 0]],
        "camera_intrinsic": [[1266.4, 0, 800], [0, 1266.4, 450], [0, 0, 1]],
    }
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    trans_out = np.array([[ow / 1600, 0, 0], [0, ow / 1600, -2.0]], np.float32)

    _, n_dense, pc_dep, _ = prepare_radar_points(
        radar, info, cfg, trans_out, False, 1600, 900
    )
    _, n_rows, (boxes, values), _ = prepare_radar_points(
        radar, info, cfg, trans_out, False, 1600, 900, return_paint=True
    )
    assert int(n_dense) == int(n_rows)
    assert boxes.shape == (cfg.DATASET.MAX_PC, 4)
    host = paint_rows_host(boxes, values, (oh, ow))
    np.testing.assert_array_equal(pc_dep, host)
    dev = np.asarray(paint_rects_device(boxes, values, (oh, ow)))
    np.testing.assert_array_equal(pc_dep, dev)

    cfg1h = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "DATASET.ONE_HOT_PC", "True",
              "MODEL.FRUSTUM", "False"],
        num_classes=10,
    )
    with pytest.raises(ValueError, match="ONE_HOT_PC"):
        prepare_radar_points(radar, info, cfg1h, trans_out, False, 1600, 900,
                             return_paint=True)


def test_detector_device_rasterize_matches_host(rng):
    """End-to-end: a Detector with TEST.DEVICE_RASTERIZE on and off yields
    identical detections (the painted maps are bit-equal, so the compiled
    program consumes identical inputs)."""
    from centerfusiondetect3d_tpu.runtime.detector import Detector

    base = ["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
            "MODEL.K", "8", "MIXED_PRECISION", "False"]
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    radar = np.zeros((18, 30), np.float32)
    radar[0] = rng.randn(30) * 10
    radar[1] = rng.rand(30)
    radar[2] = rng.rand(30) * 40 + 2
    radar[8] = rng.randn(30)
    radar[9] = rng.randn(30)

    rets = {}
    for flag in (True, False):
        cfg = load_config(
            opts=base + ["TEST.DEVICE_RASTERIZE", str(flag)], num_classes=10
        )
        det = Detector(cfg)
        rets[flag] = det.run(img, radar_pcs=[radar])

    a = rets[True]["results"][0]
    b = rets[False]["results"][0]
    assert len(a) == len(b)
    for ia, ib in zip(a, b):
        np.testing.assert_allclose(ia["score"], ib["score"], rtol=1e-6)
        np.testing.assert_allclose(ia["location"], ib["location"], rtol=1e-5,
                                   atol=1e-5)
