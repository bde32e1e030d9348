"""KITTI interchange tests (evaluation/kitti.py).

Covers the reference's KITTI surface
(/root/reference/src/lib/nuScenes_lib/utils_kitti.py, export_kitti.py):
label-line roundtrip, frame transforms against hand-computed values, box
projection, and a devkit-free GT export -> nuScenes submission roundtrip
on the synthetic raw tables from test_converter.
"""

import numpy as np
import pytest

from centerfusiondetect3d_tpu.evaluation import kitti
from centerfusiondetect3d_tpu.utils import quaternion as quat

from test_converter import raw_root  # noqa: F401  (pytest fixture)


def test_from_rotation_matrix_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        axis = rng.randn(3)
        q = quat.from_axis_angle(axis, rng.uniform(-np.pi, np.pi))
        q2 = quat.from_rotation_matrix(quat.rotation_matrix(q))
        # quaternion double cover: q and -q are the same rotation
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-10


def test_label_line_roundtrip():
    center = (2.5, 1.1, 14.3)
    wlh = (1.9, 4.5, 1.6)
    line = kitti.box_to_string("car", center, wlh, yaw=0.75,
                               bbox_2d=(10.0, 20.0, 110.0, 90.0),
                               truncation=0.0, occlusion=0, alpha=-0.3,
                               score=0.8123)
    b = kitti.parse_label_line(line)
    assert b["name"] == "car"
    assert np.allclose(b["xyz_camera"], center, atol=0.01)
    assert np.allclose(b["wlh"], wlh, atol=0.01)
    assert abs(b["yaw_camera"] - 0.75) < 0.01
    assert np.allclose(b["bbox_camera"], (10, 20, 110, 90), atol=0.01)
    assert abs(b["alpha"] + 0.3) < 0.01
    assert abs(b["score"] - 0.8123) < 1e-4

    # GT lines carry no score column and parse to NaN (utils_kitti.py:112-115)
    gt = kitti.box_to_string("pedestrian", center, wlh, yaw=0.0)
    assert np.isnan(kitti.parse_label_line(gt)["score"])


def test_box_nuscenes_to_kitti_canonical_frame():
    """Hand-computed chain with the canonical KITTI velo->cam rotation
    [[0,-1,0],[0,0,-1],[1,0,0]] (the reference asserts this exact matrix,
    export_kitti.py:148)."""
    vc_rot = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    vc_rot_q = quat.from_rotation_matrix(vc_rot)
    vc_trans = np.zeros(3)
    # nuScenes lidar: x forward, y left -> a box 10 m ahead, 2 m left, 1 m up
    center_nl = np.array([10.0, 2.0, 1.0])
    wlh = np.array([1.9, 4.5, 1.6])
    q = quat.from_axis_angle([0, 0, 1], 0.0)

    c_cam, wlh_out, q_cam = kitti.box_nuscenes_to_kitti(
        center_nl, wlh, q, vc_rot_q, vc_trans)
    # KITTI lidar = Rz(-90): (10,2,1) -> (2,-10,1); cam = (-y,-z,x) =
    # (10,-1,2); then bottom-center shift +h/2 on camera Y
    assert np.allclose(c_cam, [10.0, -1.0 + 0.8, 2.0], atol=1e-9)
    assert np.allclose(wlh_out, wlh)

    # full inverse roundtrip
    c_back, _, q_back = kitti.box_kitti_to_nuscenes_lidar(
        c_cam, wlh, q_cam, vc_rot_q, vc_trans)
    assert np.allclose(c_back, center_nl, atol=1e-9)
    assert min(np.abs(q_back - q).max(), np.abs(q_back + q).max()) < 1e-9


def test_yaw_quat_roundtrip_nonzero():
    """Ry(yaw) must invert yaw_camera_from_quat for upright boxes — a sign
    flip here points every reimported box backwards (caught at runtime)."""
    for yaw in (-2.5, -0.7, 0.0, 0.4, 1.9):
        q = quat.from_axis_angle([0.0, 1.0, 0.0], yaw)
        assert abs(kitti.yaw_camera_from_quat(q) - yaw) < 1e-12


def test_project_kitti_box_to_image():
    p2 = np.zeros((3, 4))
    p2[:3, :3] = [[400.0, 0, 200.0], [0, 400.0, 150.0], [0, 0, 1.0]]
    wlh = (2.0, 4.0, 1.5)
    q = quat.from_axis_angle([0, 1, 0], 0.0)
    # bottom-face center 10 m in front of the camera on the optical axis
    bbox = kitti.project_kitti_box_to_image((0.0, 0.75, 10.0), wlh, q, p2,
                                            imsize=(400, 300))
    assert bbox is not None
    x1, y1, x2, y2 = bbox
    # corners at x = +-l/2 -> 200 +- 400*2/10.x (depth varies +-w/2)
    assert x1 < 200 < x2 and y1 < 150 < y2
    assert 0 <= x1 and x2 <= 400 and 0 <= y1 and y2 <= 300

    # behind the camera -> None
    assert kitti.project_kitti_box_to_image((0.0, 0.75, -10.0), wlh, q, p2,
                                            imsize=(400, 300)) is None


def test_calib_file_roundtrip(tmp_path):
    p2 = np.arange(12, dtype=np.float64).reshape(3, 4)
    vc = np.eye(4)[:3]
    path = str(tmp_path / "calib.txt")
    kitti.write_calib_file(path, p2, vc)
    calib = kitti.read_calib_file(path)
    assert np.allclose(calib["P2"], p2)
    assert np.allclose(calib["Tr_velo_to_cam"], vc)
    assert np.allclose(calib["R0_rect"], np.eye(3))


def test_gt_export_and_submission_roundtrip(raw_root, tmp_path):  # noqa: F811
    out = str(tmp_path / "kitti")
    tokens = kitti.nuscenes_gt_to_kitti(raw_root, "v1.0-mini", "mini_train",
                                        out, cam_channel="CAM_FRONT",
                                        lidar_channel="LIDAR_TOP",
                                        imsize=(400, 300))
    assert tokens == ["sa0", "sa1"]
    import os

    # ImageSets + calib + velodyne written
    assert os.path.exists(os.path.join(out, "ImageSets", "mini_train.txt"))
    calib = kitti.read_calib_file(
        os.path.join(out, "mini_train", "calib", "sa0.txt"))
    assert calib["P2"][0, 0] == pytest.approx(400.0)
    assert os.path.exists(os.path.join(out, "mini_train", "velodyne", "sa0.bin"))

    with open(os.path.join(out, "mini_train", "label_2", "sa0.txt")) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(lines) == 1
    # GT files are strict 15-column KITTI (no score column; the reference's
    # box_to_string omits it for NaN scores, utils_kitti.py:412-414)
    assert len(lines[0].split(" ")) == 15
    b = kitti.parse_label_line(lines[0])
    assert np.isnan(b["score"])
    assert b["name"] == "car"
    # identity sensors: camera frame == nuScenes global here; the fixture
    # annotation sits at (0.5, 0.2, 10.0) with h=1.6 -> bottom center y+0.8
    assert np.allclose(b["xyz_camera"], [0.5, 1.0, 10.0], atol=0.02)
    assert np.allclose(b["wlh"], [1.9, 4.5, 1.6], atol=0.01)
    assert b["bbox_camera"][2] > b["bbox_camera"][0]

    sub = kitti.kitti_results_to_nuscenes(out, "mini_train", raw_root,
                                          "v1.0-mini",
                                          out_path=str(tmp_path / "sub.json"))
    assert set(sub["results"]) == {"sa0", "sa1"}
    item = sub["results"]["sa0"][0]
    # back in the GLOBAL frame (label file rounds to 2 decimals)
    assert np.allclose(item["translation"], [0.5, 0.2, 10.0], atol=0.03)
    assert np.allclose(item["size"], [1.9, 4.5, 1.6], atol=0.02)
    qg = np.asarray(item["rotation"])
    assert min(np.abs(qg - [1, 0, 0, 0]).max(),
               np.abs(qg + [1, 0, 0, 0]).max()) < 0.02
    assert (tmp_path / "sub.json").exists()


def test_render_kitti(raw_root, tmp_path):  # noqa: F811
    out = str(tmp_path / "kitti")
    kitti.nuscenes_gt_to_kitti(raw_root, "v1.0-mini", "mini_train", out,
                               imsize=(400, 300))
    paths = kitti.render_kitti(out, "mini_train", image_count=1,
                               imsize=(400, 300))
    import os

    import cv2

    assert [os.path.basename(p) for p in paths] == [
        "sa0_lidar.png", "sa0_camera.png"]
    bev = cv2.imread(paths[0])
    assert bev.shape == (900, 900, 3)
    # the box footprint and lidar points leave non-background pixels
    assert (bev != 24).any()
    cam = cv2.imread(paths[1])
    assert cam.shape == (300, 400, 3)
    assert (cam != 40).any()
    # 2D mode draws the label's bbox rectangle on a fresh canvas
    paths2d = kitti.render_kitti(out, "mini_train", out_dir=str(tmp_path / "r2"),
                                 render_2d=True, image_count=1,
                                 imsize=(400, 300))
    cam2d = cv2.imread(paths2d[1])
    assert (cam2d != 40).any()
