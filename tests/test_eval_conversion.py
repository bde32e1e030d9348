import numpy as np
import pytest

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.data import NuScenesDataset, make_synthetic_nuscenes
from centerfusiondetect3d_tpu.data.nuscenes_eval import (
    convert_eval_format,
    detections_to_results,
)
from centerfusiondetect3d_tpu.evaluation import (
    EvalBox,
    EvalBoxes,
    deserialize_results,
    evaluate_boxes,
    DetectionConfig,
)
from centerfusiondetect3d_tpu.utils import quaternion as quat


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthe")
    make_synthetic_nuscenes(str(root), n_samples=4, img_wh=(160, 96))
    cfg = load_config(
        opts=["DATASET.ROOT", repr(str(root) + "/"), "MODEL.INPUT_SIZE", "(96, 160)",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    return NuScenesDataset(cfg, "mini_val")


def _perfect_results(ds):
    """Fabricate detections exactly matching the GT annotations."""
    results = {}
    for img_id in ds.images:
        anns = ds.coco.load_anns(ds.coco.get_ann_ids(img_id))
        items = []
        for ann in anns:
            att = np.zeros(8, np.float32)
            if ann["attributes"] > 0:
                att[ann["attributes"] - 1] = 1.0
            items.append(
                {
                    "class": float(ann["category_id"]),
                    "score": 0.9,
                    "dimension": np.asarray(ann["dimension"], np.float32),
                    "location": np.asarray(ann["location"], np.float32),
                    "yaw": float(ann["yaw"]),
                    "nuscenes_att": att,
                    "velocity": np.asarray(ann["velocity_cam"][:3], np.float32),
                }
            )
        results[img_id] = items
    return results


def _gt_eval_boxes(ds):
    """GT EvalBoxes straight from converter annotations (identity transforms)."""
    gt = EvalBoxes()
    for img_id in ds.images:
        info = ds.coco.load_imgs(img_id)[0]
        token = info["sample_token"]
        boxes = []
        for ann in ds.coco.load_anns(ds.coco.get_ann_ids(img_id)):
            h, w, l = ann["dimension"]
            loc = np.array(ann["location"], np.float64)
            boxes.append(
                EvalBox(
                    sample_token=token,
                    translation=np.array([loc[0], loc[1] - h, loc[2]]),
                    size=np.array([w, l, h]),
                    rotation=quat.from_axis_angle([0, 1, 0], ann["yaw"]),
                    velocity=np.array(ann["velocity"][:2]),
                    detection_name=ds.class_name[ann["category_id"] - 1],
                    attribute_name=ds.id_to_attribute[ann["attributes"]]
                    if ann["attributes"] > 0 else "",
                    ego_translation=np.array([loc[0], loc[1] - h, loc[2]]),
                )
            )
        gt.add_boxes(token, boxes)
    return gt


def test_convert_eval_format_schema(ds):
    results = _perfect_results(ds)
    sub = convert_eval_format(results, ds)
    assert sub["meta"]["use_radar"] is True
    assert len(sub["results"]) == 4
    rec = next(iter(sub["results"].values()))[0]
    assert {
        "sample_token", "translation", "size", "rotation", "velocity",
        "detection_name", "attribute_name", "detection_score",
    } <= set(rec)
    assert len(rec["rotation"]) == 4
    # size is (w, l, h)
    img0 = ds.images[0]
    ann0 = ds.coco.load_anns(ds.coco.get_ann_ids(img0))[0]
    h, w, l = ann0["dimension"]
    token0 = ds.coco.load_imgs(img0)[0]["sample_token"]
    np.testing.assert_allclose(sub["results"][token0][0]["size"], [w, l, h], rtol=1e-5)


def test_perfect_detections_score_full_ap(ds, tmp_path):
    import json

    results = _perfect_results(ds)
    sub = convert_eval_format(results, ds)
    path = tmp_path / "sub.json"
    path.write_text(json.dumps(sub))
    pred = deserialize_results(sub)
    # ego at origin: ego translation == translation
    for token in pred.sample_tokens:
        for b in pred[token]:
            b.ego_translation = b.translation
    gt = _gt_eval_boxes(ds)
    metrics = evaluate_boxes(gt, pred, DetectionConfig())
    present = [c for c, aps in metrics["label_aps"].items()
               if any(b.detection_name == c for b in gt.all)]
    for cls in present:
        assert metrics["mean_dist_aps"][cls] == pytest.approx(1.0, abs=1e-6), cls
        for m in ("trans_err", "scale_err", "vel_err"):
            err = metrics["label_tp_errors"][cls][m]
            if np.isnan(err):  # officially excluded (cone/barrier) metrics
                continue
            assert err == pytest.approx(0.0, abs=1e-5), (cls, m)
    # global TP errors include absent classes at error 1.0 (official protocol)
    n_absent = 10 - len(present)
    assert metrics["tp_errors"]["trans_err"] == pytest.approx(n_absent / 10, abs=1e-5)
    assert metrics["nd_score"] > 0.5


def test_detections_to_results_filters():
    processed = {
        "scores": np.array([[0.9, 0.2, -2.0]]),
        "classIds": np.array([[1.0, 2.0, 3.0]]),
        "dimension": np.array([[[1, 1, 1], [0, 1, 1], [1, 1, 1]]], np.float32),
        "locations": np.zeros((1, 3, 3), np.float32),
        "yaws": np.zeros((1, 3), np.float32),
        "velocity": np.zeros((1, 3, 3), np.float32),
    }
    res = detections_to_results(processed, [7], conf_thresh=-1.0)
    # k=1 dropped (dim<=0), k=2 dropped (score<=-1)
    assert len(res[7]) == 1
    assert res[7][0]["score"] == pytest.approx(0.9)


def test_kitti_export(tmp_path):
    from centerfusiondetect3d_tpu.evaluation.kitti_export import export_kitti
    from centerfusiondetect3d_tpu.data.dataset import NuScenesDataset

    results = {
        3: [
            {"class": 1.0, "score": 0.8, "dimension": np.array([1.6, 1.9, 4.5]),
             "location": np.array([2.0, 1.0, 12.0]), "yaw": 0.3,
             "bbox": np.array([100.0, 50.0, 200.0, 120.0])},
            {"class": 6.0, "score": 0.1, "dimension": np.array([1.7, 0.6, 0.6]),
             "location": np.array([-1.0, 1.0, 8.0]), "yaw": -0.5},
        ]
    }
    n = export_kitti(results, str(tmp_path), NuScenesDataset.class_name,
                     conf_thresh=0.5)
    assert n == 1
    lines = (tmp_path / "000003.txt").read_text().strip().split("\n")
    assert len(lines) == 1  # low-score pedestrian filtered
    parts = lines[0].split()
    assert parts[0] == "Car"
    assert float(parts[8]) == 1.6 and float(parts[13]) == 12.0


def test_convert_coco_format():
    from centerfusiondetect3d_tpu.data.nuscenes_eval import convert_coco_format

    results = {
        5: [
            {"class": 2.0, "score": 0.77,
             "bbox": np.array([10.0, 20.0, 50.0, 60.0]),
             "dimension": np.ones(3), "location": np.zeros(3), "yaw": 0.0},
            {"class": 1.0, "score": 0.5,
             "dimension": np.ones(3), "location": np.zeros(3), "yaw": 0.0},
        ]
    }
    dets = convert_coco_format(results)
    assert len(dets) == 1  # bbox-less detection skipped
    d = dets[0]
    assert d["image_id"] == 5 and d["category_id"] == 2
    assert d["bbox"] == [10.0, 20.0, 40.0, 40.0]  # xywh
    assert d["score"] == 0.77
