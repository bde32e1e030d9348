"""Synthetic converter-format dataset generator for tests and benchmarks.

Produces a tiny on-disk dataset with the exact schema of the reference's
nuScenes converter output (/root/reference/src/convert_nuScenes.py:126-359):
COCO json (images with calib/trans_matrix/sensor ids, annotations with 3D
fields) + per-sample radar pickles - so the full data pipeline and eval
plumbing run end-to-end without the real nuScenes download.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


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
