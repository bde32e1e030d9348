import numpy as np
import pytest

from centerfusiondetect3d_tpu import native


@pytest.fixture(scope="module")
def has_native():
    if native.lib() is None:
        pytest.skip("no C++ toolchain for native kernels")
    return True


def test_paint_rects_matches_numpy(has_native, rng):
    h, w, c = 30, 40, 3
    n = 20
    boxes = np.zeros((n, 4), np.int32)
    boxes[:, 0] = rng.randint(0, h - 5, n)
    boxes[:, 1] = boxes[:, 0] + rng.randint(1, 6, n)
    boxes[:, 2] = rng.randint(0, w - 5, n)
    boxes[:, 3] = boxes[:, 2] + rng.randint(1, 6, n)
    values = rng.rand(n, c).astype(np.float32)

    ref = np.zeros((h, w, c), np.float32)
    for i in range(n):
        y1, y2, x1, x2 = boxes[i]
        ref[y1:y2, x1:x2] = values[i]

    out = np.zeros((h, w, c), np.float32)
    assert native.paint_rects(out, boxes, values)
    np.testing.assert_array_equal(out, ref)


def test_paint_rects_clips_out_of_range(has_native):
    out = np.zeros((10, 10, 3), np.float32)
    boxes = np.array([[-5, 20, -3, 20]], np.int32)
    values = np.ones((1, 3), np.float32)
    assert native.paint_rects(out, boxes, values)
    assert (out == 1).all()


def test_paint_rects_channels(has_native):
    out = np.zeros((8, 8, 9), np.float32)
    boxes = np.array([[2, 4, 2, 4]], np.int32)
    values = np.array([[5.0, 1.0, -1.0]], np.float32)
    channels = np.array([[5, 5 + 1, 5 + 2]], np.int32)
    assert native.paint_rects_channels(out, boxes, values, channels)
    assert out[3, 3, 5] == 5.0 and out[3, 3, 6] == 1.0 and out[3, 3, 7] == -1.0
    assert out[3, 3, 0] == 0.0


def test_splat_gaussians_matches_reference(has_native):
    from centerfusiondetect3d_tpu.geometry import draw_gaussian

    h, w = 32, 32
    ref = np.zeros((h, w), np.float32)
    draw_gaussian(ref, (16, 16), (4, 2))
    draw_gaussian(ref, (3, 30), 3)

    out = np.zeros((h, w), np.float32)
    centers = np.array([[16, 16], [3, 30]], np.float32)  # (x, y)
    radii = np.array([[4, 2], [3, 3]], np.int32)
    assert native.splat_gaussians(out, centers, radii)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_radar_pipeline_uses_native(has_native, rng):
    """process_point_cloud native path == pure-numpy fallback."""
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.data import radar as R

    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(96, 160)", "MIXED_PRECISION", "False"],
                      num_classes=10)
    n = 50
    pc_2d = np.zeros((3, n), np.float32)
    pc_2d[0] = rng.rand(n) * 600
    pc_2d[1] = rng.rand(n) * 360
    pc_2d[2] = rng.rand(n) * 50 + 2
    pc_3d = np.zeros((18, n), np.float32)
    pc_3d[0] = rng.randn(n) * 10
    pc_3d[1] = rng.rand(n)
    pc_3d[2] = pc_2d[2]
    pc_3d[8] = rng.randn(n)
    pc_3d[9] = rng.randn(n)
    trans = np.array([[0.25, 0, 0], [0, 0.26, 0]], np.float64)
    calib = np.array([[400.0, 0, 200, 0], [0, 400, 150, 0], [0, 0, 1, 0]], np.float32)

    _, _, dm_native = R.process_point_cloud(pc_2d, pc_3d, cfg, trans, calib)

    import centerfusiondetect3d_tpu.data.radar as rmod

    orig = rmod._native_paint
    rmod._native_paint = lambda *a, **k: False
    try:
        _, _, dm_numpy = R.process_point_cloud(pc_2d, pc_3d, cfg, trans, calib)
    finally:
        rmod._native_paint = orig
    np.testing.assert_allclose(dm_native, dm_numpy, atol=1e-6)
