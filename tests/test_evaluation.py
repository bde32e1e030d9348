import json

import numpy as np
import pytest

from centerfusiondetect3d_tpu.evaluation import (
    DetectionConfig,
    DetectionEval,
    EvalBox,
    EvalBoxes,
    evaluate_boxes,
    nd_score,
)
from centerfusiondetect3d_tpu.utils import quaternion as quat


def _box(token, xy, cls="car", score=-1.0, yaw=0.0, size=(2.0, 4.5, 1.6),
         vel=(1.0, 0.0), attr="vehicle.moving", ego=(0.0, 0.0, 0.0)):
    t = np.array([xy[0], xy[1], 0.0])
    return EvalBox(
        sample_token=token,
        translation=t,
        size=np.array(size),
        rotation=quat.from_axis_angle([0, 0, 1], yaw),
        velocity=np.array(vel),
        detection_name=cls,
        detection_score=score,
        attribute_name=attr,
        ego_translation=t - np.asarray(ego),
    )


def _make_sets(offset=0.0, yaw_off=0.0, attr_ok=True, vel_off=0.0):
    gt = EvalBoxes()
    pred = EvalBoxes()
    for s in range(4):
        token = f"s{s}"
        gts, preds = [], []
        for i in range(5):
            xy = (10.0 * i + 5, 3.0 * s)
            gts.append(_box(token, xy))
            preds.append(
                _box(
                    token,
                    (xy[0] + offset, xy[1]),
                    score=0.9 - 0.1 * i,
                    yaw=yaw_off,
                    vel=(1.0 + vel_off, 0.0),
                    attr="vehicle.moving" if attr_ok else "vehicle.parked",
                )
            )
        gt.add_boxes(token, gts)
        pred.add_boxes(token, preds)
    return gt, pred


def test_perfect_predictions():
    gt, pred = _make_sets()
    m = evaluate_boxes(gt, pred)
    assert m["mean_dist_aps"]["car"] == pytest.approx(1.0, abs=1e-6)
    assert m["label_tp_errors"]["car"]["trans_err"] == pytest.approx(0.0, abs=1e-9)
    assert m["label_tp_errors"]["car"]["orient_err"] == pytest.approx(0.0, abs=1e-9)
    # mAP over 10 classes: only car has GT; empty classes give AP 0
    assert m["mean_ap"] == pytest.approx(0.1, abs=1e-6)


def test_translation_error_and_threshold_matching():
    gt, pred = _make_sets(offset=1.5)
    m = evaluate_boxes(gt, pred)
    aps = m["label_aps"]["car"]
    assert aps["0.5"] == pytest.approx(0.0, abs=1e-6)
    assert aps["1.0"] == pytest.approx(0.0, abs=1e-6)
    assert aps["2.0"] == pytest.approx(1.0, abs=1e-6)
    assert aps["4.0"] == pytest.approx(1.0, abs=1e-6)
    assert m["label_tp_errors"]["car"]["trans_err"] == pytest.approx(1.5, abs=1e-6)


def test_orientation_and_velocity_errors():
    gt, pred = _make_sets(yaw_off=0.5, vel_off=0.3)
    m = evaluate_boxes(gt, pred)
    assert m["label_tp_errors"]["car"]["orient_err"] == pytest.approx(0.5, abs=1e-6)
    assert m["label_tp_errors"]["car"]["vel_err"] == pytest.approx(0.3, abs=1e-6)


def test_attribute_error():
    gt, pred = _make_sets(attr_ok=False)
    m = evaluate_boxes(gt, pred)
    assert m["label_tp_errors"]["car"]["attr_err"] == pytest.approx(1.0, abs=1e-6)


def test_nd_score_formula():
    tp = {m: 0.0 for m in ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")}
    assert nd_score(1.0, tp) == pytest.approx(1.0)
    tp_bad = {m: 2.0 for m in tp}
    assert nd_score(0.0, tp_bad) == pytest.approx(0.0)


def test_range_filtering_drops_far_boxes():
    gt = EvalBoxes()
    pred = EvalBoxes()
    # one box at 5m, one at 45m from ego
    gt.add_boxes("s0", [_box("s0", (5, 0)), _box("s0", (45, 0))])
    pred.add_boxes("s0", [_box("s0", (5, 0), score=0.9), _box("s0", (45, 0), score=0.8)])
    from centerfusiondetect3d_tpu.evaluation import filter_eval_boxes

    cfg = DetectionConfig()
    cfg.class_range = {"car": 10.0}
    kept = filter_eval_boxes(gt, cfg)
    assert len(kept["s0"]) == 1
    cfg.min_dist = 40.0
    cfg.class_range = {"car": 50.0}
    kept2 = filter_eval_boxes(gt, cfg)
    assert len(kept2["s0"]) == 1
    assert kept2["s0"][0].translation[0] == 45


def test_detection_eval_end_to_end(tmp_path):
    gt, pred = _make_sets(offset=0.5)
    records = {
        "results": {
            token: [
                {
                    "sample_token": token,
                    "translation": b.translation.tolist(),
                    "size": b.size.tolist(),
                    "rotation": b.rotation.tolist(),
                    "velocity": b.velocity.tolist(),
                    "detection_name": b.detection_name,
                    "detection_score": b.detection_score,
                    "attribute_name": b.attribute_name,
                }
                for b in pred[token]
            ]
            for token in pred.sample_tokens
        },
        "meta": {},
    }
    results_path = tmp_path / "results.json"
    results_path.write_text(json.dumps(records))

    # mark scene of sample s0 as rainy for the extreme filter
    desc = {f"s{i}": ("Rain" if i == 0 else "sunny day") for i in range(4)}
    ev = DetectionEval(gt, str(results_path), str(tmp_path / "out"),
                       sample_scene_description=desc)
    summaries = ev.run()
    assert set(summaries) == {
        "range_10", "range_30", "range_50", "range_all",
        "range_10_extreme", "range_30_extreme", "range_50_extreme", "range_all_extreme",
    }
    assert (tmp_path / "out" / "range_all" / "metrics_summary.json").exists()
    # full-range normal eval matches everything at 0.5m offset
    assert summaries["range_all"]["label_aps"]["car"]["1.0"] == pytest.approx(1.0, abs=1e-6)
    # extreme subset only contains the rainy scene's samples
    assert summaries["range_all_extreme"]["mean_ap"] > 0


def test_gt_loader_from_raw_tables(tmp_path):
    """Parse synthetic raw nuScenes tables (no devkit)."""
    from centerfusiondetect3d_tpu.evaluation import load_gt

    version_dir = tmp_path / "v1.0-mini"
    version_dir.mkdir()

    def w(name, obj):
        (version_dir / f"{name}.json").write_text(json.dumps(obj))

    w("scene", [{"token": "sc0", "name": "scene-0001", "description": "Night drive"}])
    w("sample", [
        {"token": "sa0", "scene_token": "sc0", "timestamp": 1_000_000, "prev": "", "next": "sa1"},
        {"token": "sa1", "scene_token": "sc0", "timestamp": 1_500_000, "prev": "sa0", "next": ""},
    ])
    w("category", [{"token": "c0", "name": "vehicle.car"}])
    w("instance", [{"token": "i0", "category_token": "c0"}])
    w("attribute", [{"token": "at0", "name": "vehicle.moving"}])
    w("sample_annotation", [
        {"token": "a0", "sample_token": "sa0", "instance_token": "i0",
         "translation": [10, 0, 0], "size": [2, 4.5, 1.6],
         "rotation": [1, 0, 0, 0], "attribute_tokens": ["at0"],
         "prev": "", "next": "a1", "num_lidar_pts": 5, "num_radar_pts": 1},
        {"token": "a1", "sample_token": "sa1", "instance_token": "i0",
         "translation": [11, 0, 0], "size": [2, 4.5, 1.6],
         "rotation": [1, 0, 0, 0], "attribute_tokens": ["at0"],
         "prev": "a0", "next": "", "num_lidar_pts": 5, "num_radar_pts": 1},
    ])
    w("ego_pose", [{"token": "e0", "translation": [0, 0, 0], "rotation": [1, 0, 0, 0]}])
    w("sample_data", [{"token": "sd0", "sample_token": "sa0", "ego_pose_token": "e0",
                       "is_key_frame": True, "filename": "samples/LIDAR_TOP/x.bin"}])

    boxes, desc, ego, bike_racks = load_gt(str(tmp_path), "v1.0-mini")
    assert len(boxes) == 2
    assert boxes["sa0"][0].detection_name == "car"
    assert boxes["sa0"][0].attribute_name == "vehicle.moving"
    # finite-difference velocity: 1m over 0.5s = 2 m/s in x
    np.testing.assert_allclose(boxes["sa0"][0].velocity, [2.0, 0.0], atol=1e-6)
    assert "night" in desc["sa0"].lower()
    np.testing.assert_allclose(ego["sa0"], [0, 0, 0])
    assert bike_racks == {}


def test_bike_rack_filter(tmp_path):
    """Bicycles inside a bicycle_rack box are dropped from eval
    (loaders.py:297-329); cars and outside bicycles survive."""
    from centerfusiondetect3d_tpu.evaluation import load_gt
    from centerfusiondetect3d_tpu.evaluation.detection import (
        DetectionConfig, add_ego_translation, filter_eval_boxes)

    version_dir = tmp_path / "v1.0-mini"
    version_dir.mkdir()

    def w(name, obj):
        (version_dir / f"{name}.json").write_text(json.dumps(obj))

    w("scene", [{"token": "sc0", "name": "scene-0001", "description": "day"}])
    w("sample", [{"token": "sa0", "scene_token": "sc0",
                  "timestamp": 1_000_000, "prev": "", "next": ""}])
    w("category", [
        {"token": "c_bike", "name": "vehicle.bicycle"},
        {"token": "c_car", "name": "vehicle.car"},
        {"token": "c_rack", "name": "static_object.bicycle_rack"},
    ])
    w("instance", [
        {"token": "i_b1", "category_token": "c_bike"},
        {"token": "i_b2", "category_token": "c_bike"},
        {"token": "i_car", "category_token": "c_car"},
        {"token": "i_rack", "category_token": "c_rack"},
    ])
    w("attribute", [])

    def ann(tok, inst, xyz, size=(0.6, 1.8, 1.2), rot=(1, 0, 0, 0)):
        return {"token": tok, "sample_token": "sa0", "instance_token": inst,
                "translation": list(xyz), "size": list(size),
                "rotation": list(rot), "attribute_tokens": [],
                "prev": "", "next": "", "num_lidar_pts": 5,
                "num_radar_pts": 1}

    w("sample_annotation", [
        ann("a_b1", "i_b1", (10.0, 5.0, 0.5)),       # inside the rack
        ann("a_b2", "i_b2", (30.0, -4.0, 0.5)),      # free-standing
        ann("a_car", "i_car", (10.0, 5.0, 0.5),      # rack only hits bikes
            size=(2.0, 4.5, 1.6)),
        ann("a_rack", "i_rack", (10.0, 5.0, 0.5), size=(4.0, 6.0, 2.0)),
    ])
    w("ego_pose", [{"token": "e0", "translation": [0, 0, 0],
                    "rotation": [1, 0, 0, 0]}])
    w("sample_data", [{"token": "sd0", "sample_token": "sa0",
                       "ego_pose_token": "e0", "is_key_frame": True,
                       "filename": "samples/LIDAR_TOP/x.bin"}])

    boxes, _, ego, bike_racks = load_gt(str(tmp_path), "v1.0-mini")
    assert len(bike_racks["sa0"]) == 1
    names = sorted(b.detection_name for b in boxes["sa0"])
    assert names == ["bicycle", "bicycle", "car"]  # rack itself is not GT

    add_ego_translation(boxes, ego)
    kept = filter_eval_boxes(boxes, DetectionConfig(), bike_racks=bike_racks)
    kept_names = sorted((b.detection_name, tuple(b.translation[:2]))
                        for b in kept["sa0"])
    assert ("bicycle", (10.0, 5.0)) not in kept_names, "racked bike survived"
    assert ("bicycle", (30.0, -4.0)) in kept_names
    assert ("car", (10.0, 5.0)) in kept_names

    # rotated rack: bike at +x 2.5m from center fits inside an l=6 rack
    # rotated 90deg (length along y) only if rotation is honored -> outside
    import math
    q = (math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4))
    racks_rot = {"sa0": [{"translation": np.array([30.0, -4.0, 0.5]),
                          "size": np.array([1.0, 6.0, 2.0]),
                          "rotation": np.array(q)}]}
    kept2 = filter_eval_boxes(boxes, DetectionConfig(), bike_racks=racks_rot)
    # the free bike sits at the rack center -> inside regardless of rotation
    assert ("bicycle", (30.0, -4.0)) not in sorted(
        (b.detection_name, tuple(b.translation[:2])) for b in kept2["sa0"])


def test_zero_point_gt_filter(tmp_path):
    """GT boxes with zero lidar+radar points are dropped (loaders.py:292-295);
    predictions (num_pts = -1) are unaffected."""
    from centerfusiondetect3d_tpu.evaluation.detection import (
        DetectionConfig, EvalBox, EvalBoxes, filter_eval_boxes)

    def box(num_pts):
        b = EvalBox(sample_token="s", translation=np.array([5.0, 0, 0]),
                    size=np.array([2, 4, 1.5]), rotation=np.array([1, 0, 0, 0]),
                    velocity=np.zeros(2), detection_name="car",
                    num_pts=num_pts)
        b.ego_translation = b.translation
        return b

    boxes = EvalBoxes()
    boxes.add_boxes("s", [box(0), box(3), box(-1)])
    kept = filter_eval_boxes(boxes, DetectionConfig())
    assert [b.num_pts for b in kept["s"]] == [3, -1]


def test_extreme_scene_segment_matching():
    """The extreme filter matches exact comma-separated description segments
    like the reference (evaluate.py:106-112 key_dict + loaders.py:273-280),
    not substrings — 'dark' scenes without 'night' must qualify and
    'rainy day' must not."""
    from centerfusiondetect3d_tpu.evaluation.evaluate import (
        is_extreme_description)

    assert is_extreme_description("dark, parked cars")
    assert is_extreme_description("Night")
    assert is_extreme_description("heavy rain, construction")
    assert is_extreme_description("something, very dark")
    assert not is_extreme_description("rainy day")  # substring-only
    assert not is_extreme_description("nightfall approaching")
    assert not is_extreme_description("sunny day")


def test_gt_loader_keeps_nan_velocity(tmp_path):
    """GT boxes with no prev/next neighbor keep NaN velocity (the devkit
    semantics): accumulate's cummean then EXCLUDES those matches from
    vel_err instead of charging the prediction's full speed."""
    import json

    root = tmp_path / "nan_vel"
    ver = root / "v1.0-mini"
    ver.mkdir(parents=True)

    def w(name, obj):
        (ver / f"{name}.json").write_text(json.dumps(obj))

    w("scene", [{"token": "sc0", "name": "scene-0001", "description": "day"}])
    w("sample", [{"token": "sa0", "scene_token": "sc0",
                  "timestamp": 1_000_000, "prev": "", "next": ""}])
    w("sensor", []); w("calibrated_sensor", []); w("sample_data", [])
    w("ego_pose", [])
    w("category", [{"token": "cat", "name": "vehicle.car"}])
    w("instance", [{"token": "in0", "category_token": "cat"}])
    w("attribute", [])
    w("sample_annotation", [
        {"token": "an0", "sample_token": "sa0", "instance_token": "in0",
         "translation": [10.0, 0.0, 1.0], "size": [2, 4, 1.5],
         "rotation": [1, 0, 0, 0], "attribute_tokens": [],
         "prev": "", "next": "", "visibility_token": "4",
         "num_lidar_pts": 5, "num_radar_pts": 1},
    ])
    from centerfusiondetect3d_tpu.evaluation import load_gt

    boxes, _, _, _ = load_gt(str(root), "v1.0-mini", {"sa0"})
    (box,) = boxes.boxes["sa0"]
    assert np.isnan(box.velocity).all()
