"""Synthetic dataset generators.

Two layers of the data stack, both devkit-free:

- ``make_synthetic_nuscenes``: CONVERTER-OUTPUT format (COCO json + radar/
  lidar pickles, the schema of the reference's convert_nuScenes.py output)
  — feeds GenericDataset directly; used by tests and the TPU overfit smoke.
- ``make_synthetic_raw_tables``: RAW-TABLE format (v1.0-mini json tables +
  camera JPEGs + radar PCD sweeps + lidar bins) — feeds the converter
  itself; used by ``tools rehearse`` and the flagship e2e suite.

Raw-table generator (dress-rehearsal data).

Writes a minimal but *complete* v1.0-mini table set — camera JPEGs, radar
PCD sweeps, lidar bins, annotations — that the converter
(`data/convert_nuscenes.py`, mirroring the reference's
`src/convert_nuScenes.py`) ingests exactly like the real download. One
scene per requested split, one car per sample with a radar return on it,
so converter -> dataset -> train -> val -> NDS runs end-to-end with zero
external data. Used by ``tools rehearse`` and the flagship e2e tests.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# one car per sample, camera frame (x right, y down, z forward); identity
# sensor/ego transforms make radar-sensor == camera == global frames.
CAR_XYZ = (2.0, 0.5, 10.0)
CAR_WLH = (1.9, 4.5, 1.6)

PCD_FIELDS = (
    "x y z dyn_prop id rcs vx vy vx_comp vy_comp is_quality_valid "
    "ambig_state x_rms y_rms invalid_state pdh0 vx_rms vy_rms"
)


def write_radar_pcd(path, points) -> None:
    """nuScenes-style 18-field radar PCD (ascii). points: (N, 18)."""
    points = np.asarray(points, np.float32)
    n = len(points)
    header = "\n".join(
        [
            "# .PCD v0.7 - Point Cloud Data file format",
            "VERSION 0.7",
            f"FIELDS {PCD_FIELDS}",
            "SIZE " + " ".join(["4"] * 18),
            "TYPE " + " ".join(["F"] * 18),
            "COUNT " + " ".join(["1"] * 18),
            f"WIDTH {n}",
            "HEIGHT 1",
            "VIEWPOINT 0 0 0 1 0 0 0",
            f"POINTS {n}",
            "DATA ascii",
        ]
    )
    rows = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in points)
    with open(path, "wb") as f:
        f.write((header + "\n" + rows + "\n").encode())


def radar_point(x, y, z, vx_comp=4.0, vy_comp=0.5):
    row = np.zeros(18, np.float32)
    row[:3] = (x, y, z)
    row[8], row[9] = vx_comp, vy_comp
    return row


def make_synthetic_raw_tables(root: str,
                            splits: Dict[str, int] | None = None,
                            seed: int = 3) -> str:
    """Write synthetic raw tables under ``root`` for the given
    ``{split: n_samples}`` map (default ``{"mini_val": 3}``).

    One scene per split (named from ``scene_splits()`` so the converter's
    split filter picks it up). The first scene keeps the bare sa{i}/sd_*
    token names the flagship e2e fixtures assert on; later scenes prefix
    tokens with the scene index. Returns ``root``.
    """
    import cv2

    from .convert_nuscenes import scene_splits

    splits = dict(splits or {"mini_val": 3})
    version = os.path.join(root, "v1.0-mini")
    os.makedirs(version, exist_ok=True)

    def w(name, obj):
        with open(os.path.join(version, f"{name}.json"), "w") as f:
            json.dump(obj, f)

    all_splits = scene_splits()
    scenes, samples, sample_data, annotations = [], [], [], []
    cam_dir = os.path.join(root, "samples", "CAM_FRONT")
    rad_dir = os.path.join(root, "samples", "RADAR_FRONT")
    lid_dir = os.path.join(root, "samples", "LIDAR_TOP")
    for d in (cam_dir, rad_dir, lid_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.RandomState(seed)
    for k, (split, n_samples) in enumerate(splits.items()):
        pfx = "" if k == 0 else f"s{k}"
        scene_name = all_splits[split][0]
        scenes.append({"token": f"{pfx}sc0", "name": scene_name,
                       "description": "rain"})
        for i in range(n_samples):
            samples.append(
                {
                    "token": f"{pfx}sa{i}",
                    "scene_token": f"{pfx}sc0",
                    "timestamp": 1_000_000 + 500_000 * i + 10_000_000 * k,
                    "prev": f"{pfx}sa{i - 1}" if i else "",
                    "next": f"{pfx}sa{i + 1}" if i < n_samples - 1 else "",
                }
            )
            sample_data += [
                {"token": f"{pfx}sd_cam{i}", "sample_token": f"{pfx}sa{i}",
                 "ego_pose_token": "ep0", "calibrated_sensor_token": "cs_cam",
                 "is_key_frame": True,
                 "filename": f"samples/CAM_FRONT/{pfx}img{i}.jpg",
                 "width": 400, "height": 300, "prev": "", "next": ""},
                {"token": f"{pfx}sd_rad{i}", "sample_token": f"{pfx}sa{i}",
                 "ego_pose_token": "ep0", "calibrated_sensor_token": "cs_rad",
                 "is_key_frame": True,
                 "filename": f"samples/RADAR_FRONT/{pfx}r{i}.pcd",
                 "width": 0, "height": 0, "prev": "", "next": ""},
                {"token": f"{pfx}sd_lid{i}", "sample_token": f"{pfx}sa{i}",
                 "ego_pose_token": "ep0", "calibrated_sensor_token": "cs_lid",
                 "is_key_frame": True,
                 "filename": f"samples/LIDAR_TOP/{pfx}l{i}.pcd.bin",
                 "width": 0, "height": 0, "prev": "", "next": ""},
            ]
            annotations.append(
                {"token": f"{pfx}an{i}", "sample_token": f"{pfx}sa{i}",
                 "instance_token": f"{pfx}in0", "translation": list(CAR_XYZ),
                 "size": list(CAR_WLH), "rotation": [1, 0, 0, 0],
                 "attribute_tokens": ["at_mv"], "prev": "", "next": "",
                 "visibility_token": "4", "num_lidar_pts": 12,
                 "num_radar_pts": 3},
            )
            img = (rng.rand(300, 400, 3) * 40).astype(np.uint8)
            cv2.imwrite(os.path.join(cam_dir, f"{pfx}img{i}.jpg"), img)
            # a radar return on the car plus one clutter point; the
            # min-distance filter needs |(x, y)| >= 1 in the radar frame
            write_radar_pcd(
                os.path.join(rad_dir, f"{pfx}r{i}.pcd"),
                [radar_point(*CAR_XYZ),
                 radar_point(-3.0, 0.2, 22.0, 0.0, 0.0)],
            )
            lidar = np.zeros((8, 5), np.float32)
            lidar[:, 0] = CAR_XYZ[0] + rng.randn(8) * 0.3
            lidar[:, 1] = CAR_XYZ[1]
            lidar[:, 2] = CAR_XYZ[2] + rng.randn(8) * 0.5
            lidar.tofile(os.path.join(lid_dir, f"{pfx}l{i}.pcd.bin"))

    w("scene", scenes)
    w("sample", samples)
    w("sensor", [
        {"token": "se_cam", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "se_rad", "channel": "RADAR_FRONT", "modality": "radar"},
        {"token": "se_lid", "channel": "LIDAR_TOP", "modality": "lidar"},
    ])
    w("calibrated_sensor", [
        {"token": "cs_cam", "sensor_token": "se_cam",
         "translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": [[400.0, 0, 200.0], [0, 400.0, 150.0],
                              [0, 0, 1]]},
        {"token": "cs_rad", "sensor_token": "se_rad",
         "translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
        {"token": "cs_lid", "sensor_token": "se_lid",
         "translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
    ])
    w("ego_pose", [{"token": "ep0", "translation": [0, 0, 0],
                    "rotation": [1, 0, 0, 0]}])
    w("sample_data", sample_data)
    w("sample_annotation", annotations)
    w("category", [{"token": "cat_car", "name": "vehicle.car"}])
    w("instance", [{"token": f"s{k}in0" if k else "in0",
                    "category_token": "cat_car"}
                   for k in range(len(splits))])
    w("attribute", [{"token": "at_mv", "name": "vehicle.moving"}])
    return root


def make_synthetic_nuscenes(root: str, n_samples: int = 4, img_wh=(160, 96),
                            n_objects: int = 3, n_radar: int = 40, seed: int = 0):
    """Write a synthetic nuScenes-converter-format dataset under ``root``.

    Returns the data directory (root/nuscenes). Image files are small random
    JPEGs; calibration uses a pinhole camera scaled to img_wh.
    """
    rng = np.random.RandomState(seed)
    w, h = img_wh
    data_dir = os.path.join(root, "nuscenes")
    ann_dir = os.path.join(data_dir, "annotations")
    os.makedirs(os.path.join(ann_dir, "radar_pc", "CAM_FRONT"), exist_ok=True)
    os.makedirs(os.path.join(ann_dir, "lidar_pc", "CAM_FRONT"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "samples"), exist_ok=True)

    fx = w * 0.8
    calib = [[fx, 0.0, w / 2, 0.0], [0.0, fx, h / 2, 0.0], [0.0, 0.0, 1.0, 0.0]]
    intr = [[fx, 0.0, w / 2], [0.0, fx, h / 2], [0.0, 0.0, 1.0]]

    images, annotations = [], []
    ann_id = 0
    for i in range(n_samples):
        token = f"sample{i:04d}"
        fname = f"samples/img_{i:04d}.jpg"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        if cv2 is not None:
            cv2.imwrite(os.path.join(data_dir, fname), img)
        images.append(
            {
                "id": i + 1,
                "prev_id": max(1, i),
                "file_name": fname,
                "calib": calib,
                "video_id": 1,
                "frame_id": i + 1,
                "sensor_id": 1,  # CAM_FRONT
                "sample_token": token,
                "trans_matrix": np.eye(4).tolist(),
                "velocity_trans_matrix": np.eye(4).tolist(),
                "width": w,
                "height": h,
                "pose_record_trans": [0.0, 0.0, 0.0],
                "pose_record_rot": [1.0, 0.0, 0.0, 0.0],
                "cs_record_trans": [0.0, 0.0, 0.0],
                "cs_record_rot": [1.0, 0.0, 0.0, 0.0],
                "camera_intrinsic": intr,
            }
        )

        for _ in range(n_objects):
            depth = float(rng.rand() * 40 + 5)
            x3d = float(rng.randn() * depth * 0.3)
            y3d = float(rng.rand() * 1.5)
            dim = [1.5 + rng.rand(), 1.6 + rng.rand() * 0.4, 3.5 + rng.rand()]
            yaw = float(rng.rand() * 2 * np.pi - np.pi)
            cx = fx * x3d / depth + w / 2
            cy = fx * (y3d - dim[0] / 2) / depth + h / 2
            bw = fx * dim[2] / depth
            bh = fx * dim[0] / depth
            x1 = float(np.clip(cx - bw / 2, 0, w - 2))
            y1 = float(np.clip(cy - bh / 2, 0, h - 2))
            bw = float(min(bw, w - 1 - x1))
            bh = float(min(bh, h - 1 - y1))
            alpha = yaw - np.arctan2(cx - w / 2, fx)
            vel = rng.randn(3) * 2
            ann_id += 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": int(rng.randint(1, 11)),
                    "dimension": dim,
                    "location": [x3d, y3d, depth],
                    "depth": depth,
                    "occluded": 0,
                    "yaw": yaw,
                    "amodal_center": [float(cx), float(cy)],
                    "track_id": ann_id,
                    "attributes": int(rng.randint(0, 9)),
                    "velocity": vel.tolist(),
                    "velocity_cam": [*vel.tolist(), 0.0],
                    "truncated": 0,
                    "bbox": [x1, y1, bw, bh],
                    "area": bw * bh,
                    "alpha": float(alpha),
                }
            )

        # radar: 18-row point cloud, camera frame (x right, y down, z fwd)
        radar = np.zeros((18, n_radar), np.float32)
        radar[2] = rng.rand(n_radar) * 50 + 2  # depth
        radar[0] = rng.randn(n_radar) * radar[2] * 0.3
        radar[1] = rng.rand(n_radar) * 2
        radar[8] = rng.randn(n_radar)  # vx
        radar[9] = rng.randn(n_radar)  # vz
        with open(os.path.join(ann_dir, "radar_pc", "CAM_FRONT", f"{token}.bin"), "wb") as f:
            pickle.dump(radar.tolist(), f)

        lidar = np.zeros((3, 200), np.float32)
        lidar[0] = rng.rand(200) * (w - 2) + 1
        lidar[1] = rng.rand(200) * (h - 2) + 1
        lidar[2] = rng.rand(200) * 50 + 1
        with open(os.path.join(ann_dir, "lidar_pc", "CAM_FRONT", f"{token}.bin"), "wb") as f:
            pickle.dump(lidar.tolist(), f)

    for split in ("train", "mini_train", "mini_val", "val"):
        with open(os.path.join(ann_dir, f"{split}.json"), "w") as f:
            json.dump(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": [
                        {"name": f"c{j}", "id": j + 1} for j in range(10)
                    ],
                    "videos": [{"id": 1, "file_name": "scene-0001"}],
                    "pointclouds": [],
                },
                f,
            )
    return data_dir
