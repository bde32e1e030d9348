import numpy as np
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.runtime.detector import Detector


@pytest.fixture(scope="module")
def detector():
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "16", "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    return Detector(cfg)


def test_detector_runs_on_ndarray(detector, rng):
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    radar = np.zeros((18, 20), np.float32)
    radar[2] = rng.rand(20) * 40 + 2
    ret = detector.run(img, radar_pcs=[radar])
    assert 0 in ret["results"]
    assert set(detector.timer.summary()) >= {"load", "preprocess", "net", "merge", "total"}
    # fields of any returned detection are complete
    for it in ret["results"][0]:
        assert {"class", "score", "dimension", "location", "yaw"} <= set(it)


def test_detector_runs_on_path(detector, rng, tmp_path):
    import cv2

    path = tmp_path / "img.jpg"
    cv2.imwrite(str(path), (rng.rand(240, 320, 3) * 255).astype(np.uint8))
    ret = detector.run(str(path), radar_pcs=[np.zeros((18, 0), np.float32)])
    assert 0 in ret["results"]


def test_fast_decode_geometry_matches_full(detector, rng, tmp_path):
    """TEST.FAST_DECODE half-res decode keeps original-image geometry:
    metas/calib identical, the warped input close to the full-decode warp."""
    import cv2

    img = (rng.rand(512, 640, 3) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)  # smooth: half-res preserves it
    path = str(tmp_path / "big.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 98])

    imgs_fast, scales = detector.load_data(path, return_scales=True)
    assert scales == [2.0]
    assert imgs_fast[0].shape[:2] == (256, 320)
    batch_fast, metas_fast = detector.pre_process(
        imgs_fast, decode_scales=scales)

    detector.config.defrost()
    old = detector.config.TEST.FAST_DECODE
    detector.config.TEST.FAST_DECODE = False
    try:
        imgs_full, scales_full = detector.load_data(path, return_scales=True)
        assert scales_full == [1.0]
        batch_full, metas_full = detector.pre_process(
            imgs_full, decode_scales=scales_full)
    finally:
        detector.config.TEST.FAST_DECODE = old
        detector.config.freeze()

    # geometry identical: original-image center/scale/size
    assert metas_fast[0]["width"] == metas_full[0]["width"] == 640
    assert metas_fast[0]["height"] == metas_full[0]["height"] == 512
    np.testing.assert_allclose(metas_fast[0]["center"], metas_full[0]["center"])
    assert metas_fast[0]["scale"] == metas_full[0]["scale"]
    # warped content close (uint8 bilinear from half res vs full res)
    a = batch_fast["image"][0].astype(np.float32)
    b = batch_full["image"][0].astype(np.float32)
    assert np.mean(np.abs(a - b)) < 6.0, np.mean(np.abs(a - b))


def test_detector_missing_file_raises(detector):
    with pytest.raises(FileNotFoundError):
        detector.run("/nonexistent/img.jpg")


def test_metrics_logger(tmp_path):
    import json

    from centerfusiondetect3d_tpu.utils.metrics_logger import MetricsLogger

    ml = MetricsLogger(str(tmp_path), run_id="r1")
    ml.scalars({"loss": 1.5}, step=3, prefix="train/")
    ml.alert("hot")
    ml.summary({"nds": 0.45})
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["kind"] == "alert"
    state = json.load(open(tmp_path / "run_state.json"))
    assert state["run_id"] == "r1" and state["summary"]["nds"] == 0.45
    # resume keeps the run id
    ml2 = MetricsLogger(str(tmp_path), resume=True)
    assert ml2.run_id == "r1"


@pytest.mark.slow
def test_detector_multi_scale(rng):
    from centerfusiondetect3d_tpu.config import load_config as _lc

    cfg = _lc(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "8", "TEST.MULTI_SCALE", "(0.5, 1.0)",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    det = Detector(cfg)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    ret = det.run(img, radar_pcs=[np.zeros((18, 0), np.float32)])
    assert 0 in ret["results"]
    assert len(ret["results"][0]) <= cfg.MODEL.K
    # the scaled detector was created and compiled at a 32-aligned size
    assert 0.5 in det._scaled
    assert det._scaled[0.5].config.MODEL.INPUT_SIZE == (32, 64)


def test_detector_mixed_size_batch(detector, rng):
    """Two different-size images in one batch get per-image inverse affines:
    the same network output maps to each image's own pixel frame."""
    cfg = detector.config
    det2 = Detector(cfg, variables=detector.variables, batch_size=2)
    img_a = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    img_b = (rng.rand(480, 800, 3) * 255).astype(np.uint8)
    ret = det2.run([img_a, img_b],
                   radar_pcs=[np.zeros((18, 0), np.float32)] * 2)
    assert set(ret["results"]) == {0, 1}
    for img_id, (h, w) in [(0, (240, 320)), (1, (480, 800))]:
        for it in ret["results"][img_id]:
            x1, y1, x2, y2 = it["bbox"]
            # boxes live in the image's own pixel frame (pad ring allowed:
            # the square letterbox warp can map slightly outside)
            assert -w <= x1 <= 2 * w and -h <= y1 <= 2 * h


def test_cross_scale_nms_dedups():
    from centerfusiondetect3d_tpu.runtime.detector import _cross_scale_nms

    mk = lambda score, cls, x, z: {
        "score": score, "class": cls,
        "location": np.array([x, 1.0, z], np.float32),
    }
    items = [
        mk(0.9, 1.0, 10.0, 30.0),   # object A, best
        mk(0.7, 1.0, 10.2, 30.1),   # A again at another scale -> dropped
        mk(0.6, 1.0, 14.0, 30.0),   # distinct object, kept
        mk(0.5, 2.0, 10.0, 30.0),   # same place, other class -> kept
        mk(0.4, 1.0, 10.1, 29.9),   # A at a third scale -> dropped
    ]
    kept = _cross_scale_nms(items)
    assert len(kept) == 3
    assert [it["score"] for it in kept] == [0.9, 0.6, 0.5]
    # two TRUE objects 0.45 m apart are distinguishable at the tightest
    # nuScenes matching threshold (0.5 m) and must both survive
    close = [mk(0.9, 1.0, 10.0, 30.0), mk(0.7, 1.0, 10.45, 30.0)]
    assert len(_cross_scale_nms(close)) == 2


def test_run_stream_abandonment_reaps_producer(detector, rng):
    """Breaking out of run_stream must unblock and reap the producer thread
    (it previously blocked forever on the bounded queue)."""
    import threading

    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)

    def frames(n):
        for _ in range(n):
            yield ([img], None, [np.zeros((18, 0), np.float32)])

    before = threading.active_count()
    gen = detector.run_stream(frames(20), prefetch=1, depth=1)
    next(gen)  # consume one batch, abandon the rest
    gen.close()
    # the stop event + drain lets the producer exit promptly
    for _ in range(50):
        if threading.active_count() <= before:
            break
        import time

        time.sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"


def test_run_stream_order_with_decoupled_fetch(detector, rng):
    """Results must yield strictly in input order even though the blocking
    device->host fetches run on side threads (fetch_workers>1) that can
    complete out of order."""
    imgs = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(6)]

    def frames():
        for i, img in enumerate(imgs):
            # distinct per-batch img_info rides through to metas untouched
            yield ([img], [{"width": 320, "height": 240 + i}],
                   [np.zeros((18, 0), np.float32)])

    heights = [
        ret["metas"][0]["height"]
        for ret in detector.run_stream(frames(), depth=3, fetch_workers=3)
    ]
    assert heights == [240 + i for i in range(6)]
    # overlap accounting stages exist on the streaming path
    stats = detector.stage_stats()
    assert {"get_wait", "dispatch", "fetch"} <= set(stats)


def test_run_stream_propagates_producer_error(detector, rng):
    """An exception in the frames iterable / host preprocessing surfaces to
    the consumer instead of hanging the pipeline."""
    def frames():
        yield ([(rng.rand(240, 320, 3) * 255).astype(np.uint8)], None,
               [np.zeros((18, 0), np.float32)])
        raise RuntimeError("boom in producer")

    with pytest.raises(RuntimeError, match="boom in producer"):
        for _ in detector.run_stream(frames(), depth=2):
            pass


def test_detector_normalizes_float_frames(detector, rng):
    """Float [0,255] frames get the same /255-mean/std treatment as uint8
    (the normalization is fused on-device for both dtypes)."""
    img_u8 = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    ret_u8 = detector.run(img_u8, radar_pcs=[np.zeros((18, 0), np.float32)])
    ret_f32 = detector.run(img_u8.astype(np.float32),
                           radar_pcs=[np.zeros((18, 0), np.float32)])
    s_u8 = [it["score"] for it in ret_u8["results"][0]]
    s_f32 = [it["score"] for it in ret_f32["results"][0]]
    np.testing.assert_allclose(s_u8, s_f32, rtol=1e-3, atol=1e-4)


def test_fetch_packed_with_vector_entry():
    """A (B,)-shaped entry that sorts first must not disable the packed
    single-transfer path — the pack shape keys off 'scores' explicitly."""
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.runtime.detector import _fetch_packed

    rng = np.random.RandomState(0)
    b, k = 3, 5
    processed = {
        "aaa_flag": jnp.asarray(rng.rand(b).astype(np.float32)),  # sorts first
        "scores": jnp.asarray(rng.rand(b, k).astype(np.float32)),
        "classes": jnp.asarray(rng.randint(0, 10, (b, k)).astype(np.float32)),
        "location": jnp.asarray(rng.randn(b, k, 3).astype(np.float32)),
    }
    out = _fetch_packed(processed)
    for key, val in processed.items():
        np.testing.assert_allclose(out[key], np.asarray(val), rtol=1e-6)


def test_batch_split_guard(detector, rng, caplog):
    """Batches larger than TEST.MAX_DEVICE_BATCH split into sequential device
    programs (the v5e bs>6 XLA fusion cliff) with identical results."""
    import logging

    cfg = detector.config.clone()
    cfg.defrost()
    cfg.TEST.MAX_DEVICE_BATCH = 2
    cfg.freeze()
    det = Detector(cfg, variables=detector.variables, batch_size=5)
    imgs = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(5)]
    radars = [np.zeros((18, 0), np.float32)] * 5
    with caplog.at_level(logging.WARNING, logger="cfd3d.detector"):
        ret = det.run(imgs, radar_pcs=radars)
    assert any("MAX_DEVICE_BATCH" in r.message for r in caplog.records)
    assert set(ret["results"]) == {0, 1, 2, 3, 4}

    cfg2 = detector.config.clone()
    cfg2.defrost()
    cfg2.TEST.MAX_DEVICE_BATCH = 0  # guard off: one bs5 program
    cfg2.freeze()
    det2 = Detector(cfg2, variables=detector.variables, batch_size=5)
    ret2 = det2.run(imgs, radar_pcs=radars)
    for i in range(5):
        a = sorted(it["score"] for it in ret["results"][i])
        c = sorted(it["score"] for it in ret2["results"][i])
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def test_detector_one_hot_radar(rng):
    """ONE_HOT_PC: the init dummy and the real rasterized map must agree on
    3*MAX_PC_DIST channels (a 3-channel init used to shape the second-stage
    kernels wrong and crash model.apply on the real map)."""
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
              "MODEL.K", "8", "MIXED_PRECISION", "False",
              "DATASET.ONE_HOT_PC", "True", "DATASET.MAX_PC_DIST", "10",
              "MODEL.FRUSTUM", "False"],
        num_classes=10,
    )
    det = Detector(cfg)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    radar = np.zeros((18, 20), np.float32)
    radar[2] = rng.rand(20) * 8 + 1
    ret = det.run(img, radar_pcs=[radar])
    assert 0 in ret["results"]


def test_one_hot_depth_at_max_dist_clamps():
    """A radar point at exactly MAX_PC_DIST survives the inclusive distance
    filter; its one-hot channel must clamp instead of overflowing."""
    from centerfusiondetect3d_tpu.data.radar import (
        draw_pc_heat, draw_pc_points, empty_depth_map)

    md = 10
    m = empty_depth_map((8, 12), md, True)
    row = np.zeros(18, np.float32)
    row[8], row[9] = 1.5, -0.5
    draw_pc_heat(m, (1, 3, 2, 5), float(md), md, True, row)
    assert m[1, 2, md - 1] == md  # clamped into the last channel
    m2 = empty_depth_map((8, 12), md, True)
    draw_pc_points(m2, np.array([[4], [5]], np.int64),
                   np.array([float(md)], np.float32), md, True,
                   np.tile(row[:, None], (1, 1)))
    assert m2[5, 4, md - 1] == md


def test_derive_stream_defaults_scales_with_cores():
    """Multi-core hosts get wider stream defaults; the 1-core floor stays
    the swept (1, 2, 2) winner (VERDICT r4 next #5)."""
    from centerfusiondetect3d_tpu.runtime.detector import derive_stream_defaults

    one = derive_stream_defaults(cpu_count=1)
    assert one == {"workers": 1, "fetch_workers": 2, "prefetch": 2}
    eight = derive_stream_defaults(cpu_count=8)
    assert eight["workers"] > one["workers"]
    assert eight["fetch_workers"] >= one["fetch_workers"]
    assert eight["prefetch"] >= eight["workers"]  # no worker starves the queue
    # monotone, capped: 64 cores must not spawn 63 decode threads
    huge = derive_stream_defaults(cpu_count=64)
    assert huge["workers"] <= 8
    # matches the ambient host when called without an argument
    import os

    assert derive_stream_defaults() == derive_stream_defaults(os.cpu_count() or 1)


def test_batch_map_split_matches_monolithic(detector, rng):
    """TEST.DEVICE_BATCH_MAP: a batch that is a multiple of
    MAX_DEVICE_BATCH runs as ONE lax.map program over sub-batches
    (measured +7% aggregate fps over bs6 on the v5e and no fusion-cliff
    temp blowup — probe table at Detector._process_inner) with results
    identical to the monolithic program and to the sequential split."""
    imgs = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(4)]
    radars = [np.zeros((18, 0), np.float32)] * 4

    def run_with(max_db, use_map):
        cfg = detector.config.clone()
        cfg.defrost()
        cfg.TEST.MAX_DEVICE_BATCH = max_db
        cfg.TEST.DEVICE_BATCH_MAP = use_map
        cfg.freeze()
        det = Detector(cfg, variables=detector.variables, batch_size=4)
        return det.run(imgs, radar_pcs=radars)

    mapped = run_with(2, True)
    sequential = run_with(2, False)
    monolithic = run_with(0, False)
    for i in range(4):
        a = sorted(it["score"] for it in mapped["results"][i])
        b = sorted(it["score"] for it in sequential["results"][i])
        c = sorted(it["score"] for it in monolithic["results"][i])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def test_batch_map_split_with_radar_tuple(detector, rng):
    """The mapped sub-batch program must also thread the DEVICE_RASTERIZE
    (pc_boxes, pc_values) TUPLE through lax.map xs — non-empty radar so the
    painted rows actually flow."""
    imgs = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(4)]
    radar = np.zeros((18, 12), np.float32)
    radar[0] = rng.randn(12) * 8
    radar[1] = rng.rand(12) * 2 - 1
    radar[2] = rng.rand(12) * 40 + 3
    radars = [radar] * 4

    def run_with(max_db, use_map):
        cfg = detector.config.clone()
        cfg.defrost()
        cfg.TEST.MAX_DEVICE_BATCH = max_db
        cfg.TEST.DEVICE_BATCH_MAP = use_map
        cfg.TEST.DEVICE_RASTERIZE = True
        cfg.freeze()
        det = Detector(cfg, variables=detector.variables, batch_size=4)
        return det.run(imgs, radar_pcs=radars)

    mapped = run_with(2, True)
    sequential = run_with(2, False)
    for i in range(4):
        a = sorted(it["score"] for it in mapped["results"][i])
        b = sorted(it["score"] for it in sequential["results"][i])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
