"""Standalone inference engine with per-stage timing.

Re-design of the reference Detector (/root/reference/src/lib/detector.py:21-645):
``run(images, img_infos, radar_pc)`` drives load -> pre-process (host affine
warp + radar rasterize) -> process (jit model forward + decode, one compiled
program reused across frames) -> post-process -> merge, with device-synced
per-stage timers. Accepts single images, lists (multi-camera), file paths, or
ndarrays; batch shape is fixed at construction so the TPU program compiles
once.
"""

from __future__ import annotations

import os
import time as _time

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ConfigNode
from ..geometry import get_affine_transform, stack_inverse_transforms
from ..models import build_model
from ..ops import fusion_decode, post_process
from ..data.radar import prepare_radar_points
from ..data.dataset import NuScenesDataset
from ..data.nuscenes_eval import detections_to_results
from ..utils.observability import StageTimer

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _cross_scale_nms(items: List[dict], dist_thresh: float = 0.4) -> List[dict]:
    """Greedy BEV center-distance NMS over score-sorted detection items.

    Two detections of the same class whose ground-plane (x, z) centers lie
    within ``dist_thresh`` meters are duplicates of one object — the lower
    scoring one is dropped. 0.4 m stays below the tightest nuScenes
    matching threshold (0.5 m), so two true objects the scorer could
    distinguish are never merged, while multi-scale self-duplicates
    (typically within ~0.2 m) are still caught.
    """
    kept: List[dict] = []
    for it in items:
        loc = np.asarray(it["location"], np.float32)
        dup = False
        for kt in kept:
            if kt["class"] != it["class"]:
                continue
            kloc = np.asarray(kt["location"], np.float32)
            if (loc[0] - kloc[0]) ** 2 + (loc[2] - kloc[2]) ** 2 < dist_thresh**2:
                dup = True
                break
        if not dup:
            kept.append(it)
    return kept


def _warp_or_crop(img: np.ndarray, trans: np.ndarray, in_h: int, in_w: int):
    """Apply a 2x3 affine; when it is an integer translation (the standard
    nuScenes serving geometry once FAST_DECODE's 2x downscale is composed:
    1600x900 -> 800x450 decode leaves a pure 1-px vertical crop), replace
    cv2.warpAffine with a zero-copy-ish slice — bilinear at integer offsets
    is an exact copy, and the crop is ~5x cheaper on the host."""
    a = np.asarray(trans, np.float64)
    tx, ty = a[0, 2], a[1, 2]
    if (abs(a[0, 0] - 1) < 1e-9 and abs(a[1, 1] - 1) < 1e-9
            and abs(a[0, 1]) < 1e-12 and abs(a[1, 0]) < 1e-12
            and abs(tx - round(tx)) < 1e-9 and abs(ty - round(ty)) < 1e-9):
        txi, tyi = int(round(tx)), int(round(ty))
        sh, sw = img.shape[:2]
        # dst[y, x] = src[y - ty, x - tx]; valid dst rows: ty <= y < sh + ty
        y0, y1 = max(0, tyi), min(in_h, sh + tyi)
        x0, x1 = max(0, txi), min(in_w, sw + txi)
        if y1 <= y0 or x1 <= x0:
            return np.zeros((in_h, in_w, 3), img.dtype)
        if (y0, y1, x0, x1) == (0, in_h, 0, in_w):
            return np.ascontiguousarray(
                img[-tyi:in_h - tyi, -txi:in_w - txi]
            )
        out = np.zeros((in_h, in_w, 3), img.dtype)
        out[y0:y1, x0:x1] = img[y0 - tyi:y1 - tyi, x0 - txi:x1 - txi]
        return out
    return cv2.warpAffine(img, a[:2], (in_w, in_h), flags=cv2.INTER_LINEAR)


def _pack_detections(processed: Dict[str, Any]):
    """Concatenate the (B, K, ...) detection tensors into ONE device array.

    Over the axon tunnel every ``np.asarray`` is a separate round trip
    (~25 ms); fetching the ~10 postprocessed detection tensors one by one
    costs more than the whole network forward. Returns
    ``((flat, packable, widths, shapes), rest)`` where ``flat`` is the
    single (B, K, D) float32 device array, or ``(None, processed)`` when
    nothing packs. The pack is split from the fetch so streaming callers
    can start the device->host copy ASYNCHRONOUSLY at dispatch time
    (``copy_to_host_async``) — on a high-latency tunnel the program's
    host-visible completion lags chip compute by hundreds of ms, and the
    prefetched copy turns the later blocking fetch into a local read.
    """
    keys = sorted(processed)
    shapes = {k: tuple(processed[k].shape) for k in keys}
    # key the pack shape off 'scores' — always (B, K) in the decode output —
    # never off whatever key happens to sort first (a future (B,)-shaped
    # entry would silently push everything to the unpacked slow path)
    anchor = "scores" if "scores" in shapes else keys[0]
    if len(shapes[anchor]) < 2:
        return None, processed
    b, kk = shapes[anchor][0], shapes[anchor][1]
    packable = [
        k for k in keys
        if len(shapes[k]) >= 2 and shapes[k][0] == b and shapes[k][1] == kk
    ]
    rest = {k: processed[k] for k in keys if k not in packable}
    if len(packable) < 2:
        return None, processed
    parts = [
        jnp.reshape(processed[k].astype(jnp.float32), (b, kk, -1))
        for k in packable
    ]
    widths = [int(np.prod(shapes[k][2:], dtype=np.int64)) or 1
              for k in packable]
    flat = jnp.concatenate(parts, axis=-1)
    return (flat, packable, widths, shapes), rest


def _start_host_copy(tree) -> None:
    """Kick off async device->host copies (no-op where unsupported)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        fn = getattr(leaf, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:  # pragma: no cover - backend-dependent
                return


def _unpack_detections(packed, rest_host) -> Dict[str, np.ndarray]:
    flat_dev, packable, widths, shapes = packed
    flat = np.asarray(flat_dev)
    out: Dict[str, np.ndarray] = {}
    off = 0
    for k, w in zip(packable, widths):
        out[k] = flat[..., off:off + w].reshape(shapes[k])
        off += w
    out.update(rest_host)
    return out


def _fetch_packed(processed: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Fetch a dict of (B, K, ...) device arrays in ONE host transfer."""
    packed, rest = _pack_detections(processed)
    if packed is None:
        return {k: np.asarray(v) for k, v in rest.items()}
    return _unpack_detections(packed, {k: np.asarray(v)
                                       for k, v in rest.items()})


def derive_stream_defaults(cpu_count: Optional[int] = None) -> Dict[str, int]:
    """run_stream worker/prefetch defaults keyed off the host core count.

    The shipped floor (1/2/2) is the swept winner on the 1-core bench hosts
    (ROADMAP round-3 overlap session: every wider setting lost to GIL
    contention there). With more cores, decode/warp parallelize across
    ``workers`` (cv2 releases the GIL) and one extra core is left for the
    consumer thread; fetch threads are tunnel/PCIe WAITERS (GIL released),
    so they scale gently and cap early. These multi-core values are
    core-count extrapolations, not sweeps — ``python bench.py --sweep-e2e``
    measures the actual winner for the current host and prints the table.
    """
    n = cpu_count if cpu_count is not None else (os.cpu_count() or 1)
    workers = max(1, min(n - 1, 6))
    return {
        "workers": workers,
        "fetch_workers": 2 if n <= 2 else 3,
        # one prepared batch per decode worker, +1 so the consumer never
        # starves while a new batch is being assembled
        "prefetch": max(2, workers + 1),
    }


class Detector:
    STAGES = ("load", "preprocess", "net", "merge", "total")

    def __init__(self, config: ConfigNode, variables=None, batch_size: int = 1):
        import collections
        import threading

        self.config = config
        self.model = build_model(config)
        self.batch_size = batch_size
        self.timer = StageTimer()
        self.mean = NuScenesDataset.mean
        self.std = NuScenesDataset.std
        self.variables = variables or self._init_variables()
        self._infer = jax.jit(self._forward)
        self._infer_map = {}  # n_sub -> jitted lax.map program
        # thread-safe per-stage accumulators for the streaming pipeline
        # (worker threads time their own decode/warp/rasterize work; the
        # reference's per-stage AverageMeter surface, detector.py:44-155)
        self._stage_sec = collections.defaultdict(float)
        self._stage_n = collections.defaultdict(int)
        self._stage_lock = threading.Lock()

    def _acc_stage(self, name: str, dt: float, n: int = 1):
        with self._stage_lock:
            self._stage_sec[name] += dt
            self._stage_n[name] += n

    def stage_stats(self, reset: bool = False) -> Dict[str, float]:
        """Accumulated host-pipeline stage cost, ms per CALL (decode/warp
        are per-image; fetch_merge per-batch). Sums across worker threads,
        so on multi-core hosts totals can exceed wall time."""
        with self._stage_lock:
            out = {
                k: 1e3 * self._stage_sec[k] / max(1, self._stage_n[k])
                for k in self._stage_sec
            }
            if reset:
                self._stage_sec.clear()
                self._stage_n.clear()
        return out

    def _init_variables(self):
        cfg = self.config
        h, w = cfg.MODEL.INPUT_SIZE
        oh, ow = cfg.MODEL.OUTPUT_SIZE
        img = jnp.zeros((self.batch_size, h, w, 3), jnp.float32)
        # channel count must match empty_depth_map: 3*MAX_PC_DIST one-hot
        ch = 3 * int(cfg.DATASET.MAX_PC_DIST) if cfg.DATASET.ONE_HOT_PC else 3
        pc = (
            jnp.zeros((self.batch_size, oh, ow, ch), jnp.float32)
            if cfg.DATASET.RADAR_PC
            else None
        )
        calib = jnp.tile(
            jnp.asarray([[1200.0, 0, ow * 2, 0], [0, 1200.0, oh * 2, 0], [0, 0, 1, 0]]),
            (self.batch_size, 1, 1),
        )
        return jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), img, pc, pc, calib, train=False
        )

    # ---------------------------------------------------------------- stages
    def load_data(self, images, return_scales: bool = False):
        """str path / ndarray / list thereof -> list of BGR images.

        With ``TEST.FAST_DECODE`` (default on), JPEG paths decode at half
        resolution via ``IMREAD_REDUCED_COLOR_2`` when the source stays at
        least as large as the network input (nuScenes 1600x900 -> 800x450 vs
        the 800x448 input) — ~3x cheaper host decode; the affine warp is
        composed with the decode scale so detections stay in original-image
        coordinates. Set ``TEST.FAST_DECODE=False`` for the reference's
        full-resolution decode (`detector.py` reads full frames).
        ``return_scales`` additionally returns the per-image decode scale.
        """
        t0 = _time.perf_counter()
        if isinstance(images, (str, np.ndarray)):
            images = [images]
        in_h, in_w = self.config.MODEL.INPUT_SIZE
        fast = bool(self.config.TEST.get("FAST_DECODE", True))
        out, scales = [], []
        for im in images:
            if isinstance(im, str):
                img, s = None, 1.0
                if fast and im.lower().endswith((".jpg", ".jpeg")):
                    img = cv2.imread(im, cv2.IMREAD_REDUCED_COLOR_2)
                    s = 2.0
                    if img is not None and (
                        img.shape[0] < in_h or img.shape[1] < in_w
                    ):
                        img, s = None, 1.0  # too small reduced: decode full
                if img is None:
                    img = cv2.imread(im)
                    s = 1.0
                if img is None:
                    raise FileNotFoundError(im)
                out.append(img)
                scales.append(s)
            else:
                out.append(np.asarray(im))
                scales.append(1.0)
        self._acc_stage("decode", _time.perf_counter() - t0, len(out))
        return (out, scales) if return_scales else out

    def pre_process(self, images: List[np.ndarray], img_infos=None,
                    radar_pcs=None, decode_scales=None):
        """Warp to input size on the host; images stay uint8 (normalization
        is fused into the jit program, so the host->device transfer is 4x
        smaller than the reference's float pipeline).

        decode_scales: per-image factor by which ``images`` were downscaled
        at decode time (load_data FAST_DECODE); geometry (center/scale/calib,
        metas) always refers to original-image coordinates.
        """
        cfg = self.config
        in_h, in_w = cfg.MODEL.INPUT_SIZE
        out_h, out_w = cfg.MODEL.OUTPUT_SIZE
        batch_imgs, batch_pc, calibs, metas = [], [], [], []
        for i, img in enumerate(images):
            ds = float(decode_scales[i]) if decode_scales is not None else 1.0
            info = (img_infos[i] if img_infos else {}) or {}
            # exact source dims from img_info when given; the reconstruction
            # from the decoded shape is off by up to ds-1 px for odd source
            # dimensions (IMREAD_REDUCED_COLOR_2 rounds up)
            h = float(info.get("height", img.shape[0] * ds))
            w = float(info.get("width", img.shape[1] * ds))
            center = np.array([w / 2.0, h / 2.0], np.float32)
            scale = max(h, w) * 1.0
            trans_in = get_affine_transform(center, scale, 0, (in_w, in_h))
            trans_out = get_affine_transform(center, scale, 0, (out_w, out_h))
            # compose the decode downscale into the warp: points in the
            # reduced frame map through p_orig = ds * p_reduced
            trans_warp = trans_in.copy()
            trans_warp[:, :2] *= ds
            tw = _time.perf_counter()
            warped = _warp_or_crop(img, trans_warp, in_h, in_w)
            self._acc_stage("warp", _time.perf_counter() - tw)
            batch_imgs.append(warped)
            calib = np.array(
                info.get(
                    "calib",
                    [[1200.0, 0, w / 2, 0], [0, 1200.0, h / 2, 0], [0, 0, 1, 0]],
                ),
                np.float32,
            )
            calibs.append(calib)
            metas.append({"center": center, "scale": scale,
                          "width": int(round(w)), "height": int(round(h))})

            if cfg.DATASET.RADAR_PC:
                radar = None if radar_pcs is None else radar_pcs[i]
                if radar is None:
                    radar = np.zeros((18, 0), np.float32)
                info_full = dict(info)
                info_full.setdefault("width", int(round(w)))
                info_full.setdefault("height", int(round(h)))
                info_full.setdefault("calib", calib.tolist())
                info_full.setdefault(
                    "camera_intrinsic", calib[:3, :3].tolist()
                )
                # device-rasterize fast path: ship compact (box, value) rows
                # and paint the depth map on-chip (ops/rasterize.py) — ~10x
                # fewer bytes per camera, bit-identical map. Host raster for
                # one-hot layouts and on MAX_PC row overflow (the host paint
                # covers ALL points, the fixed-shape rows only MAX_PC).
                use_rows = (bool(cfg.TEST.get("DEVICE_RASTERIZE", True))
                            and not cfg.DATASET.ONE_HOT_PC)
                tr = _time.perf_counter()
                _, pc_n, payload, _ = prepare_radar_points(
                    radar, info_full, cfg, trans_out, False, w, h,
                    return_paint=use_rows,
                )
                if use_rows and int(pc_n) > int(cfg.DATASET.MAX_PC):
                    _, _, payload, _ = prepare_radar_points(
                        radar, info_full, cfg, trans_out, False, w, h
                    )
                self._acc_stage("rasterize", _time.perf_counter() - tr)
                batch_pc.append(payload)

        batch = {
            "image": np.stack(batch_imgs),
            "calib": np.stack(calibs),
        }
        if batch_pc:
            if any(isinstance(p, tuple) for p in batch_pc):
                if all(isinstance(p, tuple) for p in batch_pc):
                    batch["pc_boxes"] = np.stack([p[0] for p in batch_pc])
                    batch["pc_values"] = np.stack([p[1] for p in batch_pc])
                else:  # rare mixed batch (some images overflowed MAX_PC)
                    from ..data.radar import paint_rows_host

                    out_size = cfg.MODEL.OUTPUT_SIZE
                    batch["pc_dep"] = np.stack([
                        p if not isinstance(p, tuple)
                        else paint_rows_host(p[0], p[1], out_size)
                        for p in batch_pc
                    ])
            else:
                batch["pc_dep"] = np.stack(batch_pc)
        return batch, metas

    def _forward(self, variables, image, pc_dep, calib, trans_inv):
        """Model forward + decode + postprocess as ONE compiled program.

        ``image`` arrives as raw [0, 255] pixels (uint8 on the serving path,
        any float dtype from ndarray callers): the /255 + mean/std
        normalization always runs on-device, fused by XLA into the first
        conv, so the host ships 4x fewer bytes and does no float math per
        pixel — and float-dtype frames get the identical treatment the old
        host-side pre_process applied unconditionally.
        """
        cfg = self.config
        if isinstance(pc_dep, tuple):
            # compact paint rows -> on-device raster (ops/rasterize.py):
            # bit-identical to the host paint, fused into the same program
            from ..ops.rasterize import paint_rects_device_batch

            pc_dep = paint_rects_device_batch(
                pc_dep[0], pc_dep[1], cfg.MODEL.OUTPUT_SIZE
            )
        image = (image.astype(jnp.float32) / 255.0
                 - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        if cfg.TEST.FLIP_TEST:
            from ..ops import flip_forward

            outputs = flip_forward(
                lambda v, im, hm, dep, cal: self.model.apply(
                    v, im, hm, dep, cal, train=False
                ),
                variables, image, None, pc_dep, calib,
            )
        else:
            outputs = self.model.apply(
                variables, image, None, pc_dep, calib, train=False
            )
        dets = fusion_decode(
            outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
            norm2d=cfg.MODEL.NORM_2D,
            approx_topk=bool(cfg.MODEL.get("APPROX_TOPK", False)),
        )
        processed = post_process(dets, trans_inv, cfg.MODEL.OUTPUT_SIZE, calib)
        extras = {
            "depthMap": outputs[0].get("depthMap"),
            "pc_hm": outputs[0].get("pc_hm"),
        }
        return processed, {k: v for k, v in extras.items() if v is not None}

    def _mapped_infer(self, n_sub: int):
        """jitted program: lax.map the bs<=MAX_DEVICE_BATCH forward over
        ``n_sub`` stacked sub-batches, then flatten results back to the
        full batch (see the measured table at the call site)."""
        if n_sub not in self._infer_map:
            forward = self._forward

            def fn(variables, image, pc_dep, calib, trans_inv):
                def split(x):
                    return x.reshape((n_sub, x.shape[0] // n_sub)
                                     + x.shape[1:])

                xs = (jax.tree.map(split, image),
                      jax.tree.map(split, pc_dep),
                      split(calib), split(trans_inv))

                def one(args):
                    im, pc, cal, ti = args
                    return forward(variables, im, pc, cal, ti)

                out = jax.lax.map(one, xs)
                return jax.tree.map(
                    lambda x: x.reshape((-1,) + x.shape[2:]), out)

            self._infer_map[n_sub] = jax.jit(fn)
        return self._infer_map[n_sub]

    def process(self, batch, metas):
        t0 = _time.perf_counter()
        out = self._process_inner(batch, metas)
        # dispatch = host time to assemble/ship the batch and enqueue the
        # device program (the H2D transfer + trace-cache lookup), NOT device
        # execution — the program completes asynchronously
        self._acc_stage("dispatch", _time.perf_counter() - t0)
        return out

    def _process_inner(self, batch, metas):
        oh, ow = self.config.MODEL.OUTPUT_SIZE
        # per-image inverse matrices: folders/videos may mix frame sizes
        trans_inv = stack_inverse_transforms(
            [m["center"] for m in metas], [m["scale"] for m in metas], (ow, oh)
        )
        image = np.asarray(batch["image"])
        if "pc_boxes" in batch:
            pc_dep = (np.asarray(batch["pc_boxes"]),
                      np.asarray(batch["pc_values"]))
        elif "pc_dep" in batch:
            pc_dep = np.asarray(batch["pc_dep"])
        else:
            pc_dep = None
        calib = np.asarray(batch["calib"])
        trans_inv = np.asarray(trans_inv)
        nimg = image.shape[0]
        max_db = int(self.config.TEST.get("MAX_DEVICE_BATCH", 6))
        if (max_db > 0 and nimg > max_db and nimg % max_db == 0
                and bool(self.config.TEST.get("DEVICE_BATCH_MAP", True))):
            # ONE device program that lax.maps the bs<=max_db forward over
            # sub-batches: per-iteration footprint stays at the fusion
            # sweet spot while dispatch/launch overhead is paid once.
            # Measured on v5e 448x800 (scripts/probe_batch_cliff.py,
            # same-process): bs6 monolithic 213.3 fps / bs12 monolithic
            # 191.1 (temp 1432 MiB, the cliff) / bs12 map 2x6 221.1 (temp
            # 370 MiB) / bs24 map 4x6 **228.2** (temp 397 MiB) — the map
            # split both defeats the cliff and beats bs6 by ~7%.
            k = nimg // max_db
            if isinstance(pc_dep, tuple):
                pc_dep = (jnp.asarray(pc_dep[0]), jnp.asarray(pc_dep[1]))
            elif pc_dep is not None:
                pc_dep = jnp.asarray(pc_dep)
            return self._mapped_infer(k)(
                self.variables, jnp.asarray(image), pc_dep,
                jnp.asarray(calib), jnp.asarray(trans_inv),
            )
        if max_db > 0 and nimg > max_db:
            # bs>MAX_DEVICE_BATCH falls off an XLA fusion cliff (measured
            # on v5e: bs12 = 39.7 fps vs bs6 = 111.9 with the reshaping DCN
            # dot, +2.7 GiB temp memory; still bs12 = 87.6 vs bs6 = 131.5
            # after the channel-axis dot removed most of the relayout churn)
            # — run sequential sub-batch programs and concatenate on device
            if not getattr(self, "_warned_split", False):
                self._warned_split = True
                import logging

                logging.getLogger("cfd3d.detector").warning(
                    "batch %d > TEST.MAX_DEVICE_BATCH=%d: splitting into "
                    "sequential device programs (larger single programs "
                    "regress ~1.5-3x on v5e via an XLA fusion cliff)",
                    nimg, max_db,
                )
            def _slice_pc(s, e):
                if pc_dep is None:
                    return None
                if isinstance(pc_dep, tuple):
                    return (jnp.asarray(pc_dep[0][s:e]),
                            jnp.asarray(pc_dep[1][s:e]))
                return jnp.asarray(pc_dep[s:e])

            chunks = []
            for s in range(0, nimg, max_db):
                e = min(s + max_db, nimg)
                chunks.append(self._infer(
                    self.variables,
                    jnp.asarray(image[s:e]),
                    _slice_pc(s, e),
                    jnp.asarray(calib[s:e]),
                    jnp.asarray(trans_inv[s:e]),
                ))
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
        if isinstance(pc_dep, tuple):
            pc_dep = (jnp.asarray(pc_dep[0]), jnp.asarray(pc_dep[1]))
        elif pc_dep is not None:
            pc_dep = jnp.asarray(pc_dep)
        return self._infer(
            self.variables,
            jnp.asarray(image),
            pc_dep,
            jnp.asarray(calib),
            jnp.asarray(trans_inv),
        )

    def merge_outputs(self, processed) -> Dict[int, List[dict]]:
        t0 = _time.perf_counter()
        npx = _fetch_packed(processed)  # blocks on the device program
        return self._merge_fetched(npx, _time.perf_counter() - t0)

    def _merge_fetched(self, npx, fetch_s: float) -> Dict[int, List[dict]]:
        """Shared run()/run_stream() tail: host detections -> result dicts
        plus fetch/merge stage accounting."""
        t1 = _time.perf_counter()
        out = detections_to_results(
            npx, list(range(len(npx["scores"]))), conf_thresh=-1.0
        )
        self._acc_stage("fetch", fetch_s)
        self._acc_stage("merge", _time.perf_counter() - t1)
        return out

    # ------------------------------------------------------- multi-scale TTA
    def _scaled_detector(self, scale: float) -> "Detector":
        """A Detector compiled for a scaled input resolution (cached)."""
        if not hasattr(self, "_scaled"):
            self._scaled: Dict[float, Detector] = {}
        if scale not in self._scaled:
            h, w = self.config.MODEL.INPUT_SIZE
            cfg = self.config.clone()
            cfg.defrost()
            cfg.MODEL.INPUT_SIZE = (
                max(32, int(round(h * scale / 32)) * 32),
                max(32, int(round(w * scale / 32)) * 32),
            )
            cfg.MODEL.OUTPUT_SIZE = (
                cfg.MODEL.INPUT_SIZE[0] // 4, cfg.MODEL.INPUT_SIZE[1] // 4
            )
            cfg.MODEL.PYRAMID_OUT_SIZE = (tuple(cfg.MODEL.OUTPUT_SIZE),)
            cfg.TEST.MULTI_SCALE = ()
            cfg.freeze()
            self._scaled[scale] = Detector(
                cfg, variables=self.variables, batch_size=self.batch_size
            )
        return self._scaled[scale]

    def _merge_scales(self, per_scale_results) -> Dict[int, List[dict]]:
        """Concatenate per-scale detections (already in original-image/camera
        coordinates), suppress cross-scale duplicates, and keep the top-K by
        score per image.

        The same object detected at several scales yields near-coincident
        boxes that would otherwise all survive and score as false positives
        under the nuScenes greedy matcher; greedy center-distance NMS (the
        same association metric the nuScenes eval uses) keeps one."""
        k = int(self.config.MODEL.K)
        merged: Dict[int, List[dict]] = {}
        for results in per_scale_results:
            for img_id, items in results.items():
                merged.setdefault(img_id, []).extend(items)
        for img_id in merged:
            merged[img_id].sort(key=lambda it: -it["score"])
            merged[img_id] = _cross_scale_nms(merged[img_id])[:k]
        return merged

    # ------------------------------------------------------------- streaming
    def run_stream(self, frames, prefetch: Optional[int] = None,
                   depth: int = 8, workers: Optional[int] = None,
                   fetch_workers: Optional[int] = None):
        """Pipelined inference over an iterable of frames.

        ``workers`` / ``fetch_workers`` / ``prefetch`` default to
        ``derive_stream_defaults()`` — keyed off ``os.cpu_count()`` with the
        swept 1-core values (1/2/2) as the floor, so a multi-core host is
        not pinned to the 1-core tuning (VERDICT r4 next #5). Run
        ``python bench.py --sweep-e2e`` on a new host to measure its
        same-process sweep winner and override explicitly if it differs.

        ``frames`` yields (images, img_infos, radar_pcs) tuples (same
        arguments as ``run``). Host work (decode + affine warp + radar
        rasterize) runs ``prefetch`` batches ahead across ``workers``
        threads (cv2 releases the GIL, so decode/warp parallelize on
        multi-core hosts; order is preserved), and up to ``depth`` device
        programs stay in flight, so JPEG decode and TPU compute overlap
        instead of serializing — the reference's DataLoader-with-workers
        arrangement (detector.py:44-155 + main.py:98-122) re-designed for a
        single streaming process. ``depth`` defaults to 8: on a low-latency
        link depth 2 already hides the round trip (measured 33.5/33.6/32.8
        fps at depth 2/4/6 on such a host), but over a high-latency tunnel
        the program's host-visible completion lags chip compute by hundreds
        of ms and shallow pipelines stall on it (measured on such a host:
        16.9/23.3/25.3/24.3 fps at depth 2/4/8/12). Extra in-flight batches
        only cost device memory (~10 MB each).

        The blocking device->host result fetch runs on ``fetch_workers``
        side threads rather than in this generator: the fetch is mostly
        tunnel/PCIe WAIT with the GIL released, so moving it off the
        consumer guarantees the producer's JPEG decode always has the core
        during that wait — measured on the 1-core host, in-line fetches
        showed ~zero realized overlap (wall = sum of stages) while decoupled
        fetches hide the entire ~16 ms/batch behind decode. Results still
        yield strictly in input order.

        Yields the same result dict as ``run`` per input batch. Abandoning
        the generator early (``break`` / ``close()``) unblocks and reaps the
        producer thread instead of leaking it on the bounded queue.
        """
        import queue as _queue
        import threading as _threading
        from concurrent.futures import ThreadPoolExecutor as _Pool

        d = derive_stream_defaults()
        workers = d["workers"] if workers is None else workers
        fetch_workers = (d["fetch_workers"] if fetch_workers is None
                         else fetch_workers)
        prefetch = d["prefetch"] if prefetch is None else prefetch

        pre_q: _queue.Queue = _queue.Queue(maxsize=max(1, prefetch))
        _END = object()
        err: List[BaseException] = []
        stop = _threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            t0 = _time.perf_counter()
            while not stop.is_set():
                try:
                    pre_q.put(item, timeout=0.1)
                    self._acc_stage("put_wait", _time.perf_counter() - t0)
                    return True
                except _queue.Full:
                    continue
            return False

        def prep(item):
            images, img_infos, radar_pcs = item
            imgs, dscales = self.load_data(images, return_scales=True)
            return self.pre_process(
                imgs, img_infos, radar_pcs, decode_scales=dscales
            )

        def producer():
            try:
                if workers <= 1:
                    for item in frames:
                        if not put(prep(item)):
                            return
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=workers) as pool:
                        pending = []
                        for item in frames:
                            if stop.is_set():
                                return
                            pending.append(pool.submit(prep, item))
                            while len(pending) > workers:
                                if not put(pending.pop(0).result()):
                                    return
                        for fut in pending:
                            if not put(fut.result()):
                                return
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                put(_END)

        t = _threading.Thread(target=producer, daemon=True)
        t.start()

        inflight: List = []
        fetchers = _Pool(max_workers=max(1, fetch_workers),
                         thread_name_prefix="cfd3d-fetch")
        try:
            while True:
                tg = _time.perf_counter()
                item = pre_q.get()
                # consumer idle waiting on host preprocessing — on a 1-core
                # host this is where most of the wall time shows up (the
                # producer owns the core for decode)
                self._acc_stage("get_wait", _time.perf_counter() - tg)
                if item is _END:
                    break
                batch, metas = item
                processed, extras = self.process(batch, metas)
                # pack at dispatch time and start the device->host copy NOW
                # so it streams while later batches compute; the fetch thread
                # then blocks on an already-moving (or local) buffer
                tp = _time.perf_counter()
                packed, rest = _pack_detections(processed)
                _start_host_copy(packed[0] if packed is not None else rest)
                inflight.append(fetchers.submit(
                    self._finalize_stream, packed, rest, extras, metas))
                self._acc_stage("pack", _time.perf_counter() - tp)
                if len(inflight) >= depth:
                    # consumer-side stall on the oldest in-flight fetch; with
                    # get_wait/dispatch/pack this makes the consumer-thread
                    # wall fully attributable (bench reconciles them)
                    tr = _time.perf_counter()
                    res = inflight.pop(0).result()
                    self._acc_stage("result_wait", _time.perf_counter() - tr)
                    yield res
            for fut in inflight:
                tr = _time.perf_counter()
                res = fut.result()
                self._acc_stage("result_wait", _time.perf_counter() - tr)
                yield res
            if err:
                raise err[0]
        finally:
            # consumer abandoned (or finished): release the producer
            stop.set()
            while True:  # drain so a blocked put() returns immediately
                try:
                    pre_q.get_nowait()
                except _queue.Empty:
                    break
            t.join(timeout=5.0)
            # don't wait on in-flight fetches: a wedged tunnel fetch should
            # not block generator close; pool threads are reaped at exit
            fetchers.shutdown(wait=False, cancel_futures=True)

    def _finalize_stream(self, packed, rest, extras, metas) -> Dict:
        t0 = _time.perf_counter()
        if packed is None:
            npx = {k: np.asarray(v) for k, v in rest.items()}
        else:
            npx = _unpack_detections(packed, {k: np.asarray(v)
                                              for k, v in rest.items()})
        results = self._merge_fetched(npx, _time.perf_counter() - t0)
        return {"results": results, "metas": metas, "extras": extras}

    # ------------------------------------------------------------------ run
    def run(self, images, img_infos=None, radar_pcs=None) -> Dict:
        scales = tuple(self.config.TEST.MULTI_SCALE or ())
        self.timer.start("load")
        imgs, dscales = self.load_data(images, return_scales=True)
        self.timer.stop("load")
        if scales:
            per_scale, base_ret = [], None
            for s in scales:
                det = self if abs(s - 1.0) < 1e-6 else self._scaled_detector(s)
                ret = det._run_single(imgs, img_infos, radar_pcs, dscales)
                per_scale.append(ret["results"])
                if abs(s - 1.0) < 1e-6 or base_ret is None:
                    base_ret = ret
            base_ret["results"] = self._merge_scales(per_scale)
        else:
            base_ret = self._run_single(imgs, img_infos, radar_pcs, dscales)
        # expose the decoded frames so callers (e.g. inference --save-dir
        # overlays) don't JPEG-decode a second time — decode is the dominant
        # host stage and a re-decode would double-count its stage stats
        base_ret["images"] = imgs
        base_ret["decode_scales"] = dscales
        return base_ret

    def _run_single(self, imgs: List[np.ndarray], img_infos=None,
                    radar_pcs=None, decode_scales=None) -> Dict:
        t = self.timer
        t.start("total")

        t.start("preprocess")
        batch, metas = self.pre_process(imgs, img_infos, radar_pcs,
                                        decode_scales=decode_scales)
        t.stop("preprocess")

        t.start("net")
        processed, extras = self.process(batch, metas)
        t.stop("net", processed)

        t.start("merge")
        results = self.merge_outputs(processed)
        t.stop("merge")

        t.stop("total")
        # extras (depthMap / pc_hm feature maps) stay as DEVICE arrays:
        # fetching them eagerly costs 1-2 extra device->host transfers per
        # frame (~MBs; hundreds of ms on a high-latency link) that only the
        # visualization consumers need — they np.asarray on use
        return {
            "results": results,
            "metas": metas,
            "extras": extras,
            "times": t.summary(),
        }
