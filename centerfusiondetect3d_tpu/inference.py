"""Single-camera inference CLI: image / folder / video input.

Mirrors the reference inference entry (/root/reference/src/inference.py:21-157):
runs the Detector over the input source, prints per-stage timing stats, and
optionally saves annotated frames + a JSON of detections.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

IMAGE_EXT = {".jpg", ".jpeg", ".png", ".webp"}
VIDEO_EXT = {".mp4", ".mov", ".avi", ".mkv"}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CenterFusionDetect3D-TPU inference")
    p.add_argument("--cfg", default=None, help="yaml config file")
    p.add_argument("--input", required=True,
                   help="image file, folder of images, video file, or 'webcam'")
    p.add_argument("--load", default="",
                   help="checkpoint to load (orbax dir or reference torch .pt)")
    p.add_argument("--save-dir", default="", help="save annotated frames + json")
    p.add_argument("--show-attention", action="store_true",
                   help="save depth/attention-map overlays next to the frames "
                        "(showAttention analogue, generic_dataset.py:1208-1237)")
    p.add_argument("--conf-thresh", type=float, default=0.3)
    p.add_argument("--stream", action="store_true",
                   help="pipeline folder/video input through "
                        "Detector.run_stream (decode/compute/fetch overlap; "
                        "measured ~1.5x the serial per-frame path on a "
                        "1-core host). Incompatible with --save-dir, which "
                        "needs the decoded frames per result.")
    p.add_argument("opts", nargs="*", default=[])
    return p.parse_args(argv)


def iter_frames(source: str):
    import cv2

    if source == "webcam":
        cap = cv2.VideoCapture(0)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield "webcam", frame
        return
    ext = os.path.splitext(source)[1].lower()
    if os.path.isdir(source):
        for name in sorted(os.listdir(source)):
            if os.path.splitext(name)[1].lower() in IMAGE_EXT:
                yield name, os.path.join(source, name)
    elif ext in VIDEO_EXT:
        cap = cv2.VideoCapture(source)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"frame{i:06d}", frame
            i += 1
    else:
        yield os.path.basename(source), source


def draw_detections(img, items, class_names, conf_thresh: float,
                    scale: float = 1.0):
    """``scale``: factor by which ``img`` was downscaled at decode time
    (TEST.FAST_DECODE) — detections are in original-image coordinates, so
    boxes are divided by it before drawing."""
    import cv2

    out = img.copy()
    for it in items:
        if it["score"] < conf_thresh or "bbox" not in it:
            continue
        x1, y1, x2, y2 = [int(v / scale) for v in it["bbox"]]
        cls = class_names[int(it["class"] - 1)]
        cv2.rectangle(out, (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.putText(out, f"{cls} {it['score']:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    return out


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

    variables = None
    if args.load and not args.load.endswith((".pt", ".pth")):
        from .training import load_checkpoint

        payload = load_checkpoint(args.load)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}

    detector = Detector(config, variables=variables)
    if args.load and variables is None:
        # reference torch checkpoint: import into the initialized trees
        from .training import load_weights

        p, s, meta = load_weights(
            args.load, detector.variables["params"],
            detector.variables["batch_stats"], dict(config.head_conv),
        )
        detector.variables = {"params": p, "batch_stats": s}
        rep = meta.get("report", {})
        print(f"imported torch checkpoint: {len(rep.get('loaded', []))} keys "
              f"loaded, {len(rep.get('missing', []))} missing")
    all_results = {}
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    if args.stream and args.save_dir:
        print("--stream is incompatible with --save-dir (streaming results "
              "carry no decoded frames); falling back to the serial path")
        args.stream = False

    if args.stream:
        # pipelined path: decode/warp in a producer thread, device programs
        # in flight, fetches on side threads (Detector.run_stream)
        names = []

        def frames():
            for name, frame in iter_frames(args.input):
                names.append(name)
                yield ([frame], None, None)

        n = 0
        for ret in detector.run_stream(frames()):
            items = ret["results"][0]
            all_results[names[n]] = [
                {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                 for k, v in it.items()}
                for it in items
            ]
            n += 1
        stats = detector.stage_stats()
        print(f"processed {n} frames (streamed) | "
              + " ".join(f"{k} {v:.1f}ms" for k, v in sorted(stats.items())))
        return all_results

    n = 0
    for name, frame in iter_frames(args.input):
        ret = detector.run(frame)
        items = ret["results"][0]
        all_results[name] = [
            {k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in it.items()}
            for it in items
        ]
        n += 1
        if args.save_dir:
            import cv2

            # reuse the frames run() already decoded (decode dominates the
            # host budget; a second load_data would also double-count the
            # 'decode' stage stats)
            img = ret["images"][0]
            vis = draw_detections(img, items, NuScenesDataset.class_name,
                                  args.conf_thresh,
                                  scale=ret["decode_scales"][0])
            stem = os.path.splitext(name)[0]
            cv2.imwrite(os.path.join(args.save_dir, f"{stem}_det.jpg"), vis)
            if args.show_attention:
                from .utils.visualize import attention_overlay, normalize_depthmaps

                maps = normalize_depthmaps(ret.get("extras") or {})
                for key, m in maps.items():
                    overlay = attention_overlay(img, m[0])
                    cv2.imwrite(
                        os.path.join(args.save_dir, f"{stem}_att_{key}.jpg"),
                        overlay,
                    )

    print(f"processed {n} frames | " + detector.timer.report())
    if args.save_dir:
        with open(os.path.join(args.save_dir, "results.json"), "w") as f:
            json.dump(all_results, f)
    return all_results


if __name__ == "__main__":
    main()
