"""nuScenes scene demo: 6-camera tiled visualization + BEV canvas.

Re-design of the reference demo (/root/reference/src/demo.py:15-83,
datasets/nuscenes.py:633-1067): walks a converter-format split grouped by
sample (6 cameras), runs the batched Detector, draws 2D/3D boxes per camera
tile (3x2 mosaic) and a bird's-eye-view canvas with radar points and
detections, with per-stage FPS stats. Saves frames or a video.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict
from typing import Dict, List

import numpy as np

from .geometry import get_3d_box, project_3d_points

BEV_SIZE = 500
BEV_RANGE = 60.0


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CenterFusionDetect3D-TPU demo")
    p.add_argument("--cfg", default=None)
    p.add_argument("--split", default="mini_val")
    p.add_argument("--load", default="",
                   help="orbax checkpoint dir or reference torch .pt")
    p.add_argument("--save-dir", default="", help="save mosaic frames")
    p.add_argument("--save-video", default="", help="write the mosaic stream to an mp4")
    p.add_argument("--max-samples", type=int, default=0, help="0 = all")
    p.add_argument("--show-attention", action="store_true",
                   help="save per-head depth/attention overlays (single-cam "
                        "only, like the reference showAttention, "
                        "generic_dataset.py:1208-1237)")
    p.add_argument("--conf-thresh", type=float, default=0.3)
    p.add_argument("opts", nargs="*", default=[])
    return p.parse_args(argv)


def draw_box_3d(img, corners_2d, color=(0, 255, 0)):
    from .utils.visualize import draw_box_3d as _draw

    return _draw(img, corners_2d, color=color)


def render_camera(img, items, calib, conf_thresh: float):
    import cv2

    out = img.copy()
    for it in items:
        if it["score"] < conf_thresh:
            continue
        corners = get_3d_box(
            np.asarray(it["dimension"]).reshape(1, 1, 3),
            np.asarray(it["location"]).reshape(1, 1, 3),
            np.asarray(it["yaw"]).reshape(1, 1),
        )  # (1, 1, 8, 3)
        if corners[..., 2].min() > 0:
            pts = project_3d_points(
                corners.astype(np.float32),
                calib.reshape(1, 1, 3, 4).astype(np.float32),
            )[0, 0]
            draw_box_3d(out, pts)
    return out


def render_bev(items_by_cam: Dict[int, List[dict]], radar_pcs, conf_thresh: float,
               infos: List[dict] = None):
    """BEV canvas: ego at center, radar dots, detection rectangles.

    Detections arrive in each CAMERA's own frame; with ``infos`` carrying the
    converter's per-image ``trans_matrix`` (cam->global), every camera's
    boxes and radar points are transformed into the FRONT camera's frame so
    the shared canvas is geometrically consistent (the reference converts to
    global before its devkit BEV render, nuscenes.py:420-430). Without
    matrices (plain image folders) the front camera is drawn as before and
    other cameras fall back to their own frames.
    """
    import cv2

    canvas = np.full((BEV_SIZE, BEV_SIZE, 3), 30, np.uint8)
    scale = BEV_SIZE / (2 * BEV_RANGE)

    def to_px(x, z):
        # ego at center: rear cameras produce negative z in the front frame
        return int(BEV_SIZE / 2 + x * scale), int(BEV_SIZE / 2 - z * scale)

    def cam_to_front(ci: int):
        if (not infos or ci >= len(infos)
                or "trans_matrix" not in infos[0]
                or "trans_matrix" not in infos[ci]):
            return None
        t0 = np.array(infos[0]["trans_matrix"], np.float64)
        tc = np.array(infos[ci]["trans_matrix"], np.float64)
        return np.linalg.inv(t0) @ tc

    # range rulers around the ego
    for r in (10, 30, 50):
        cv2.circle(canvas, to_px(0, 0), int(r * scale), (60, 60, 60), 1)

    for ci, pc in enumerate(radar_pcs or []):
        if pc is None:
            continue
        m = cam_to_front(ci)
        xyz = pc[:3].astype(np.float64)
        if m is not None and ci > 0:
            xyz = m[:3, :3] @ xyz + m[:3, 3:4]
        for i in range(xyz.shape[1]):
            x, z = xyz[0, i], xyz[2, i]
            if abs(x) < BEV_RANGE and abs(z) < BEV_RANGE:
                cv2.circle(canvas, to_px(x, z), 2, (255, 180, 60), -1)

    for ci, items in items_by_cam.items():
        m = cam_to_front(int(ci))
        for it in items:
            if it["score"] < conf_thresh:
                continue
            loc = np.asarray(it["location"], np.float64)
            yaw = float(it["yaw"])
            if m is not None and int(ci) > 0:
                loc = m[:3, :3] @ loc + m[:3, 3]
                # heading vector (cos yaw, 0, -sin yaw) through the rotation
                v = m[:3, :3] @ np.array([np.cos(yaw), 0.0, -np.sin(yaw)])
                yaw = float(-np.arctan2(v[2], v[0]))
            x, z = float(loc[0]), float(loc[2])
            if abs(x) > BEV_RANGE or abs(z) > BEV_RANGE:
                continue
            h, w, l = it["dimension"]
            c = to_px(x, z)
            box = cv2.boxPoints((c, (l * scale, w * scale), -np.degrees(yaw)))
            cv2.polylines(canvas, [box.astype(np.int32)], True, (80, 220, 80), 1)
    return canvas


def main(argv=None):
    args = parse_args(argv)

    from .config import default_config, finalize_config, update_config
    from .data.dataset import NuScenesDataset
    from .runtime.detector import Detector

    config = default_config()
    update_config(config, args.cfg, args.opts)
    if config.TPU.PLATFORM:
        import jax

        jax.config.update("jax_platforms", config.TPU.PLATFORM)
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = finalize_config(config, NuScenesDataset.num_categories,
                             NuScenesDataset.default_resolution)
    config.defrost()
    config.DATASET.VAL_SPLIT = args.split
    config.freeze()

    ds = NuScenesDataset(config, args.split)
    variables = None
    if args.load and not args.load.endswith((".pt", ".pth")):
        from .training import load_checkpoint

        payload = load_checkpoint(args.load)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}

    # group images by sample_token
    groups: Dict[str, List[int]] = defaultdict(list)
    for img_id in ds.images:
        info = ds.coco.load_imgs(img_id)[0]
        groups[info["sample_token"]].append(img_id)
    n_cams = max(len(v) for v in groups.values())
    detector = Detector(config, variables=variables, batch_size=n_cams)
    if args.load and variables is None:
        # reference torch checkpoint: import into the initialized trees
        from .training import load_weights

        p, s, _ = load_weights(
            args.load, detector.variables["params"],
            detector.variables["batch_stats"], dict(config.head_conv),
        )
        detector.variables = {"params": p, "batch_stats": s}

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    import cv2

    for si, (token, img_ids) in enumerate(groups.items()):
        if args.max_samples and si >= args.max_samples:
            break
        infos = [ds.coco.load_imgs(i)[0] for i in img_ids]
        frames = [ds.load_image(info) for info in infos]
        radars = [ds.load_radar(info) for info in infos] if config.DATASET.RADAR_PC else None
        while len(frames) < n_cams:  # pad to the compiled batch size
            frames.append(np.zeros_like(frames[0]))
            infos.append(infos[0])
            if radars is not None:
                radars.append(np.zeros((18, 0), np.float32))
        ret = detector.run(frames, infos, radars)

        pc_hm = ret["extras"].get("pc_hm")
        if pc_hm is not None:
            pc_hm = np.asarray(pc_hm)  # extras arrive as device arrays
        tiles = []
        for ci in range(min(6, len(frames))):
            calib = np.array(infos[ci]["calib"], np.float32)
            vis = render_camera(frames[ci], ret["results"].get(ci, []), calib,
                                args.conf_thresh)
            if pc_hm is not None:
                # radar heatmap overlay (drawPcHeatmap analogue,
                # logger.py:140-310)
                hm = pc_hm[ci, ..., 0]
                hm = (hm / max(hm.max(), 1e-6) * 255).astype(np.uint8)
                hm = cv2.applyColorMap(
                    cv2.resize(hm, (vis.shape[1], vis.shape[0])), cv2.COLORMAP_JET
                )
                vis = cv2.addWeighted(vis, 0.8, hm, 0.2, 0)
            tiles.append(cv2.resize(vis, (400, 224)))
        while len(tiles) < 6:
            tiles.append(np.zeros((224, 400, 3), np.uint8))
        mosaic = np.vstack([np.hstack(tiles[:3]), np.hstack(tiles[3:6])])
        bev = render_bev(ret["results"], radars, args.conf_thresh, infos)
        frame = np.hstack([mosaic, cv2.resize(bev, (448, 448))])

        if args.save_dir:
            cv2.imwrite(os.path.join(args.save_dir, f"{token}.jpg"), frame)
            if args.show_attention:
                # reference warns + skips for multi-camera samples
                # (generic_dataset.py:1222-1226)
                if n_cams > 1:
                    if si == 0:
                        import warnings

                        warnings.warn(
                            "Visualization of attention map currently not "
                            "supported for multiple camera images."
                        )
                else:
                    from .utils.visualize import (
                        attention_overlay, normalize_depthmaps)

                    maps = normalize_depthmaps(ret["extras"] or {})
                    for key, m in maps.items():
                        cv2.imwrite(
                            os.path.join(args.save_dir,
                                         f"{token}_att_{key}.jpg"),
                            attention_overlay(frames[0], m[0]),
                        )
        if args.save_video:
            if "writer" not in locals():
                writer = cv2.VideoWriter(
                    args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), 2.0,
                    (frame.shape[1], frame.shape[0]),
                )
            writer.write(frame)
        print(f"[{si}] {token}: "
              + " | ".join(f"{k} {len(v)}" for k, v in ret["results"].items())
              + " | " + detector.timer.report())
    if args.save_video and "writer" in locals():
        writer.release()


if __name__ == "__main__":
    main()
