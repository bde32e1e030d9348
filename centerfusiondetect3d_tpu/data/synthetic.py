"""Synthetic raw-nuScenes table generator (dress-rehearsal data).

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
from typing import Dict

import numpy as np

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


def make_synthetic_nuscenes(root: str,
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
