import json
import os
import pickle
import struct

import numpy as np
import pytest

from centerfusiondetect3d_tpu.data.convert_nuscenes import (
    RawNuScenes,
    aggregate_radar,
    export_split,
    read_radar_pcd,
    read_lidar_bin,
    scene_splits,
)


def _write_radar_pcd(path, points18: np.ndarray):
    """Minimal binary PCD with 18 float32 fields (nuScenes radar layout)."""
    fields = ("x y z dyn_prop id rcs vx vy vx_comp vy_comp is_quality_valid "
              "ambig_state x_rms y_rms invalid_state pdh0 vx_rms vy_rms").split()
    n = points18.shape[1]
    header = "\n".join([
        "VERSION 0.7",
        "FIELDS " + " ".join(fields),
        "SIZE " + " ".join(["4"] * 18),
        "TYPE " + " ".join(["F"] * 18),
        "COUNT " + " ".join(["1"] * 18),
        f"WIDTH {n}",
        "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0",
        f"POINTS {n}",
        "DATA binary",
    ]) + "\n"
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(points18.T.astype("<f4").tobytes())


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    """Synthetic raw nuScenes tables + sensor files (identity transforms)."""
    root = tmp_path_factory.mktemp("rawnusc")
    version = root / "v1.0-mini"
    version.mkdir()
    scene_name = scene_splits()["mini_train"][0]

    def w(name, obj):
        (version / f"{name}.json").write_text(json.dumps(obj))

    w("scene", [{"token": "sc0", "name": scene_name, "description": "sunny"}])
    w("sample", [
        {"token": "sa0", "scene_token": "sc0", "timestamp": 1_000_000,
         "prev": "", "next": "sa1"},
        {"token": "sa1", "scene_token": "sc0", "timestamp": 1_500_000,
         "prev": "sa0", "next": ""},
    ])
    w("sensor", [
        {"token": "se_cam", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "se_rad", "channel": "RADAR_FRONT", "modality": "radar"},
        {"token": "se_lid", "channel": "LIDAR_TOP", "modality": "lidar"},
    ])
    w("calibrated_sensor", [
        {"token": "cs_cam", "sensor_token": "se_cam", "translation": [0, 0, 0],
         "rotation": [1, 0, 0, 0],
         "camera_intrinsic": [[400.0, 0, 200.0], [0, 400.0, 150.0], [0, 0, 1]]},
        {"token": "cs_rad", "sensor_token": "se_rad", "translation": [0, 0, 0],
         "rotation": [1, 0, 0, 0], "camera_intrinsic": []},
        {"token": "cs_lid", "sensor_token": "se_lid", "translation": [0, 0, 0],
         "rotation": [1, 0, 0, 0], "camera_intrinsic": []},
    ])
    w("ego_pose", [
        {"token": "ep0", "translation": [0, 0, 0], "rotation": [1, 0, 0, 0]},
    ])
    sds = []
    for i, sa in enumerate(["sa0", "sa1"]):
        sds += [
            {"token": f"sd_cam{i}", "sample_token": sa, "ego_pose_token": "ep0",
             "calibrated_sensor_token": "cs_cam", "is_key_frame": True,
             "filename": f"samples/CAM_FRONT/img{i}.jpg", "width": 400, "height": 300,
             "prev": "", "next": ""},
            {"token": f"sd_rad{i}", "sample_token": sa, "ego_pose_token": "ep0",
             "calibrated_sensor_token": "cs_rad", "is_key_frame": True,
             "filename": f"samples/RADAR_FRONT/r{i}.pcd", "width": 0, "height": 0,
             "prev": "", "next": ""},
            {"token": f"sd_lid{i}", "sample_token": sa, "ego_pose_token": "ep0",
             "calibrated_sensor_token": "cs_lid", "is_key_frame": True,
             "filename": f"samples/LIDAR_TOP/l{i}.pcd.bin", "width": 0, "height": 0,
             "prev": "", "next": ""},
        ]
    w("sample_data", sds)
    w("category", [{"token": "cat_car", "name": "vehicle.car"}])
    w("instance", [{"token": "in0", "category_token": "cat_car"}])
    w("attribute", [{"token": "at_mv", "name": "vehicle.moving"}])
    w("sample_annotation", [
        {"token": "an0", "sample_token": "sa0", "instance_token": "in0",
         "translation": [0.5, 0.2, 10.0], "size": [1.9, 4.5, 1.6],
         "rotation": [1, 0, 0, 0], "attribute_tokens": ["at_mv"],
         "prev": "", "next": "an1", "visibility_token": "4",
         "num_lidar_pts": 10, "num_radar_pts": 2},
        {"token": "an1", "sample_token": "sa1", "instance_token": "in0",
         "translation": [0.5, 0.2, 11.0], "size": [1.9, 4.5, 1.6],
         "rotation": [1, 0, 0, 0], "attribute_tokens": ["at_mv"],
         "prev": "an0", "next": "", "visibility_token": "4",
         "num_lidar_pts": 10, "num_radar_pts": 2},
    ])

    # sensor files
    for i in range(2):
        rad_dir = root / "samples" / "RADAR_FRONT"
        rad_dir.mkdir(parents=True, exist_ok=True)
        pts = np.zeros((18, 5), np.float32)
        pts[0] = [1, 2, 3, 12, 20]     # x (forward in radar frame)
        pts[1] = [0.5, -1, 2, 1, -2]   # y
        pts[2] = 0.5                   # z
        pts[8] = 1.0                   # vx_comp
        pts[9] = 0.5                   # vy_comp
        _write_radar_pcd(str(rad_dir / f"r{i}.pcd"), pts)

        lid_dir = root / "samples" / "LIDAR_TOP"
        lid_dir.mkdir(parents=True, exist_ok=True)
        scan = np.zeros((50, 5), np.float32)
        scan[:, 0] = np.random.RandomState(i).rand(50) * 2 - 1
        scan[:, 1] = np.random.RandomState(i + 1).rand(50) * 2 - 1
        scan[:, 2] = np.random.RandomState(i + 2).rand(50) * 30 + 2
        scan.tofile(str(lid_dir / f"l{i}.pcd.bin"))
    return str(root)


def test_read_radar_pcd_roundtrip(tmp_path):
    pts = np.arange(18 * 3, dtype=np.float32).reshape(18, 3)
    _write_radar_pcd(str(tmp_path / "a.pcd"), pts)
    out = read_radar_pcd(str(tmp_path / "a.pcd"))
    np.testing.assert_allclose(out, pts)


def test_read_lidar_bin(tmp_path):
    scan = np.random.RandomState(0).rand(7, 5).astype(np.float32)
    scan.tofile(str(tmp_path / "l.bin"))
    out = read_lidar_bin(str(tmp_path / "l.bin"))
    np.testing.assert_allclose(out, scan[:, :4].T)


def test_export_split_end_to_end(raw_root):
    out_path = export_split(raw_root, "mini_train", verbose=False)
    with open(out_path) as f:
        data = json.load(f)
    assert len(data["images"]) == 2  # 2 samples x 1 camera present
    assert len(data["annotations"]) == 2
    img = data["images"][0]
    assert img["sensor_id"] == 1
    assert np.allclose(img["trans_matrix"], np.eye(4))
    ann = data["annotations"][0]
    # identity transforms: camera frame == global; z=10 depth, bottom-center y
    assert ann["depth"] == pytest.approx(10.0)
    h, w, l = ann["dimension"]
    assert (h, w, l) == pytest.approx((1.6, 1.9, 4.5))
    assert ann["location"][1] == pytest.approx(0.2 + h / 2)
    assert ann["yaw"] == pytest.approx(0.0, abs=1e-6)
    assert ann["attributes"] == 6  # vehicle.moving
    # finite-difference velocity: 1m z over 0.5s
    assert ann["velocity"][2] == pytest.approx(2.0, abs=1e-6)
    # amodal center: principal point + fx * x/z
    assert ann["amodal_center"][0] == pytest.approx(200 + 400 * 0.5 / 10, rel=1e-3)
    # bbox sane and inside the image
    x, y, bw, bh = ann["bbox"]
    assert 0 <= x < 400 and 0 <= y < 300 and bw > 0 and bh > 0

    # radar pickle exists and has aggregated points
    radar_file = os.path.join(raw_root, "annotations", "radar_pc", "CAM_FRONT",
                              "sa0.bin")
    with open(radar_file, "rb") as f:
        radar = np.array(pickle.load(f))
    assert radar.shape[0] == 18 and radar.shape[1] > 0
    # identity chain: points unchanged; depth row z = forward distance
    assert radar[0].max() == pytest.approx(20.0)


def test_converted_feeds_dataset(raw_root):
    """Converter output -> CocoReader -> NuScenesDataset item."""
    import cv2

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.data import NuScenesDataset

    # the dataset expects ROOT/nuscenes/<...>; link the raw root
    ns_root = os.path.join(raw_root, "nuscenes")
    if not os.path.exists(ns_root):
        os.symlink(raw_root, ns_root)
    for i in range(2):
        img_path = os.path.join(raw_root, "samples", "CAM_FRONT", f"img{i}.jpg")
        os.makedirs(os.path.dirname(img_path), exist_ok=True)
        cv2.imwrite(img_path, np.zeros((300, 400, 3), np.uint8))

    cfg = load_config(
        opts=["DATASET.ROOT", repr(raw_root + "/"), "MODEL.INPUT_SIZE", "(96, 160)",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    ds = NuScenesDataset(cfg, "mini_train")
    item = ds.get_item(0, rng=None)
    assert item["mask"].sum() == 1
    assert item["depth"][0, 0] == pytest.approx(10.0, rel=1e-3)
    assert np.isfinite(item["pc_dep"]).all()
