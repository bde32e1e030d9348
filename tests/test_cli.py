"""CLI-level smoke tests (programmatic invocation)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_inference_cli(tmp_path, rng):
    import cv2

    from centerfusiondetect3d_tpu import inference as inf

    img_path = tmp_path / "frame.jpg"
    cv2.imwrite(str(img_path), (rng.rand(120, 160, 3) * 255).astype(np.uint8))
    out_dir = tmp_path / "out"
    results = inf.main([
        "--input", str(img_path),
        "--save-dir", str(out_dir),
        "--conf-thresh", "-2",
        "MODEL.INPUT_SIZE", "(64, 128)",
        "MODEL.DLA.NODE", "Conv",
        "MODEL.K", "8",
        "DATASET.RADAR_PC", "False",
        "MIXED_PRECISION", "False",
    ])
    assert "frame.jpg" in results
    assert (out_dir / "results.json").exists()
    saved = json.loads((out_dir / "results.json").read_text())
    assert "frame.jpg" in saved


@pytest.mark.slow
def test_inference_cli_stream(tmp_path, rng):
    """--stream pipelines a folder through run_stream; results keyed per
    frame in input order, identical keys to the serial path."""
    import cv2

    from centerfusiondetect3d_tpu import inference as inf

    src = tmp_path / "frames"
    src.mkdir()
    for i in range(4):
        cv2.imwrite(str(src / f"f{i}.jpg"),
                    (rng.rand(120, 160, 3) * 255).astype(np.uint8))
    opts = [
        "--input", str(src), "--conf-thresh", "-2", "--stream",
        "MODEL.INPUT_SIZE", "(64, 128)", "MODEL.DLA.NODE", "Conv",
        "MODEL.K", "8", "DATASET.RADAR_PC", "False",
        "MIXED_PRECISION", "False",
    ]
    results = inf.main(opts)
    assert list(results) == [f"f{i}.jpg" for i in range(4)]
    serial = inf.main([o for o in opts if o != "--stream"])
    assert list(serial) == list(results)
    for k in results:
        assert len(results[k]) == len(serial[k])


def test_eval_cli(tmp_path):
    """evaluation CLI over synthetic raw tables + a perfect submission."""
    from centerfusiondetect3d_tpu.evaluation import cli as ecli
    from centerfusiondetect3d_tpu.utils import quaternion as quat

    version = tmp_path / "v1.0-mini"
    version.mkdir()

    def w(name, obj):
        (version / f"{name}.json").write_text(json.dumps(obj))

    w("scene", [{"token": "sc0", "name": "s", "description": "Rain"}])
    w("sample", [{"token": "sa0", "scene_token": "sc0", "timestamp": 0,
                  "prev": "", "next": ""}])
    w("category", [{"token": "c0", "name": "vehicle.car"}])
    w("instance", [{"token": "i0", "category_token": "c0"}])
    w("attribute", [{"token": "a0", "name": "vehicle.moving"}])
    w("sample_annotation", [
        {"token": "an0", "sample_token": "sa0", "instance_token": "i0",
         "translation": [8, 0, 0], "size": [2, 4.5, 1.6],
         "rotation": [1, 0, 0, 0], "attribute_tokens": ["a0"],
         "prev": "", "next": "", "num_lidar_pts": 5, "num_radar_pts": 1},
    ])
    w("ego_pose", [{"token": "e0", "translation": [0, 0, 0], "rotation": [1, 0, 0, 0]}])
    w("sample_data", [{"token": "sd0", "sample_token": "sa0", "ego_pose_token": "e0",
                       "is_key_frame": True, "filename": "samples/LIDAR_TOP/x.bin"}])

    sub = {
        "meta": {},
        "results": {"sa0": [{
            "sample_token": "sa0", "translation": [8, 0, 0], "size": [2, 4.5, 1.6],
            "rotation": [1, 0, 0, 0], "velocity": [0, 0],
            "detection_name": "car", "attribute_name": "vehicle.moving",
            "detection_score": 0.9,
        }]},
    }
    sub_path = tmp_path / "sub.json"
    sub_path.write_text(json.dumps(sub))
    summaries = ecli.main([
        str(sub_path), "--output_dir", str(tmp_path / "evalout"),
        "--dataroot", str(tmp_path), "--version", "v1.0-mini", "--verbose", "0",
    ])
    assert summaries["range_all"]["label_aps"]["car"]["0.5"] == pytest.approx(1.0)
    assert (tmp_path / "evalout" / "range_all" / "mAR.csv").exists()
    # extreme variant includes the rainy scene
    assert summaries["range_all_extreme"]["mean_ap"] > 0


def test_loader_prefetch_error_propagates(tmp_path):
    from centerfusiondetect3d_tpu.data.pipeline import _prefetch_iter

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = _prefetch_iter(gen(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_draw_detections_scale():
    """FAST_DECODE overlays: boxes (original-image coords) are divided by the
    decode scale so they land correctly on the half-resolution frame."""
    import numpy as np

    from centerfusiondetect3d_tpu.inference import draw_detections

    img = np.zeros((100, 100, 3), np.uint8)
    items = [{"score": 0.9, "class": 1.0,
              "bbox": np.array([40.0, 40.0, 160.0, 160.0])}]
    out = draw_detections(img, items, ["car"] * 10, 0.5, scale=2.0)
    # rectangle drawn at 20..80, not clipped at the frame edge
    assert out[20, 50].any() and out[80, 50].any()
    assert not out[95, 50].any()  # below the scaled box: nothing drawn


def test_render_bev_transforms_other_cameras():
    """Non-front cameras' detections are transformed into the front camera's
    frame via the per-image trans_matrix (they used to be drawn in their own
    frames, putting rear objects in front of the ego)."""
    import numpy as np

    from centerfusiondetect3d_tpu.demo import BEV_SIZE, render_bev

    items = {0: [], 1: [{"score": 1.0, "location": [0.0, 0.0, 10.0],
                         "yaw": 0.0, "dimension": [1.5, 2.0, 4.0]}]}
    ry = np.eye(4)
    ry[0, 0] = ry[2, 2] = -1.0  # Ry(pi): back camera
    infos = [{"trans_matrix": np.eye(4).tolist()},
             {"trans_matrix": ry.tolist()}]
    green = lambda c: np.nonzero(np.all(c == (80, 220, 80), axis=-1))
    ys, _ = green(render_bev(items, None, 0.5, infos))
    assert ys.size and ys.min() > BEV_SIZE / 2  # behind the ego

    # without matrices the camera-local fallback draws it in front
    ys2, _ = green(render_bev(items, None, 0.5, None))
    assert ys2.size and ys2.max() < BEV_SIZE / 2
