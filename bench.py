"""Benchmark: flagship CenterFusion inference throughput on one TPU chip.

Measures steady-state frames/sec of the full eval pipeline - DLA-34 (DCN
nodes) forward, frustum radar association, CenterNet decode - at the
reference resolution 448x800 on a 6-camera batch, bfloat16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to REFERENCE_FPS, an estimate of the PyTorch
reference's single-GPU throughput (the reference publishes no throughput
numbers - SURVEY.md section 6; 25 fps is a representative DLA-34 CenterFusion
rate on a contemporary discrete GPU). BASELINE.json's north star is >5x.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_FPS = 25.0
BATCH = 6  # one nuScenes sample = 6 cameras
WARMUP = 3
ITERS = 12
E2E_BATCHES = 10
# v5e peak dense bf16 matmul throughput (per chip); the MFU denominator
V5E_BF16_PEAK_FLOPS = 197e12


def bench_e2e(sweep: bool = False):
    """End-to-end pipeline fps: JPEG decode -> affine warp -> radar
    rasterize -> jit forward+decode+postprocess -> merge, with host work
    overlapped via Detector.run_stream. Synthetic 1600x900 frames at the
    nuScenes camera resolution.

    ``sweep=True`` (bench.py --sweep-e2e): instead of the timed passes,
    grid-sweep (workers, fetch_workers, prefetch) same-process on THIS host
    and print the table + winner — the measurement the derived
    multi-core defaults (runtime/detector.derive_stream_defaults)
    extrapolate toward (VERDICT r4 next #5)."""
    import tempfile

    import cv2
    import numpy as np

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.runtime.detector import Detector

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(448, 800)", "MODEL.DLA.NODE", "DeformConv"],
        num_classes=10,
    )
    det = Detector(cfg, batch_size=BATCH)
    rng = np.random.RandomState(0)

    def synth_frame(i: int) -> np.ndarray:
        """Naturalistic 1600x900 synthetic road scene.

        Pure random noise is the JPEG worst case (measured: 1.7 MB files,
        18-26 ms reduced-2 decode vs 2.8 ms for a smooth frame on this
        host); real nuScenes camera JPEGs are ~100-250 KB. Gradient sky/
        road + blurred texture + rectangle 'objects' lands in that real
        file-size band so the decode stage measures a representative cost,
        not the adversarial ceiling."""
        yy, xx = np.mgrid[0:900, 0:1600].astype(np.float32)
        base = np.stack(
            [120 + 60 * yy / 900, 130 + 40 * xx / 1600,
             110 + 50 * (1 - yy / 900)], -1)
        tex = cv2.GaussianBlur(
            (rng.rand(900, 1600, 3) * 255).astype(np.float32), (0, 0), 3)
        img = np.clip(base * 0.55 + tex * 0.45, 0, 255).astype(np.uint8)
        for _ in range(12):  # boxy structures: cars, buildings, signs
            x0, y0 = rng.randint(0, 1400), rng.randint(300, 800)
            w0, h0 = rng.randint(60, 220), rng.randint(40, 140)
            color = tuple(int(c) for c in rng.randint(30, 225, 3))
            cv2.rectangle(img, (x0, y0), (x0 + w0, y0 + h0), color, -1)
        return img

    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(BATCH):
            p = f"{d}/cam{i}.jpg"
            cv2.imwrite(p, synth_frame(i))
            paths.append(p)
        radar = np.zeros((18, 60), np.float32)
        radar[0] = rng.randn(60) * 20
        radar[1] = rng.rand(60) * 2 - 1
        radar[2] = rng.rand(60) * 60 + 2
        radars = [radar] * BATCH
        calib = [[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0], [0, 0, 1, 0]]
        infos = [{"calib": calib, "width": 1600, "height": 900}] * BATCH

        def frames(n):
            for _ in range(n):
                yield (list(paths), infos, radars)

        # warmup (compile) pass — SHIPPED stream defaults
        # (derive_stream_defaults), so the recorded number reflects what a
        # user gets on this host out of the box
        for _ in det.run_stream(frames(2)):
            pass

        if sweep:
            import os as _os

            from centerfusiondetect3d_tpu.runtime.detector import (
                derive_stream_defaults,
            )

            ncpu = _os.cpu_count() or 1
            derived = derive_stream_defaults()
            grid = sorted({(1, 2, 2), (2, 2, 3), (2, 3, 3), (4, 3, 5),
                           (6, 3, 7),
                           tuple(derived[k] for k in
                                 ("workers", "fetch_workers", "prefetch"))})
            grid = [g for g in grid if g[0] <= max(1, ncpu)]
            rows = []
            for wk, fw, pf in grid:
                t0 = time.perf_counter()
                n = sum(1 for _ in det.run_stream(
                    frames(E2E_BATCHES), workers=wk, fetch_workers=fw,
                    prefetch=pf))
                fps = BATCH * n / (time.perf_counter() - t0)
                rows.append({"workers": wk, "fetch_workers": fw,
                             "prefetch": pf, "fps": round(fps, 2)})
                print(f"  workers={wk} fetch={fw} prefetch={pf}: "
                      f"{fps:.2f} fps", flush=True)
            winner = max(rows, key=lambda r: r["fps"])
            print(json.dumps({"metric": "e2e_sweep", "cpu_count": ncpu,
                              "derived_defaults": derived, "rows": rows,
                              "winner": winner}))
            return winner["fps"], {"sweep": rows}
        # best + median of 3 timed passes: a fresh compile or a transient
        # tunnel stall otherwise poisons the steady-state number (observed:
        # 5.3 fps right after a cold compile vs 28 warm); the median guards
        # the best-pass claim against a single lucky window (VERDICT r3 #4)
        best_fps, stages, all_fps = 0.0, {}, []
        for _ in range(3):
            det.stage_stats(reset=True)
            t0 = time.perf_counter()
            n = 0
            for _ in det.run_stream(frames(E2E_BATCHES)):
                n += 1
            dt = time.perf_counter() - t0
            fps = BATCH * n / dt
            all_fps.append(fps)
            if fps > best_fps:
                # per-stage host cost (ms/call: decode+warp per image,
                # rasterize per camera, fetch+merge per batch) — proves
                # where the host budget goes
                best_fps = fps
                stages = {k: round(v, 2)
                          for k, v in det.stage_stats().items()}
                # wall reconciliation: the consumer thread's per-batch wall
                # must be explained by its own stages (get_wait = waiting on
                # producer decode/warp/rasterize, dispatch = batch assembly +
                # program enqueue, pack = detection pack + copy kickoff,
                # result_wait = stall on the oldest in-flight fetch).
                # Producer/fetcher-thread stages (decode, warp, rasterize,
                # fetch, merge) overlap this wall and explain get_wait.
                wall = 1e3 * dt / max(1, n)
                consumer = sum(stages.get(k, 0.0) for k in
                               ("get_wait", "dispatch", "pack",
                                "result_wait"))
                stages["wall_per_batch"] = round(wall, 2)
                stages["consumer_attributed"] = round(consumer, 2)
                stages["unattributed"] = round(wall - consumer, 2)
        stages["median_fps"] = round(sorted(all_fps)[len(all_fps) // 2], 2)
    return best_fps, stages


def bench_cpu_ratio():
    """Like-for-like CPU anchor for REFERENCE_FPS: run the reference torch
    DLASeg forward and this framework's forward on the SAME host CPU at
    identical shapes and report the throughput ratio. This cannot reproduce
    the reference's GPU number (no GPU in this image), but it grounds the
    model-efficiency claim: if the two forwards are comparable on one CPU,
    the 25-fps GPU estimate and the measured TPU fps compare the same
    network. Reference model: dla.py:571-635 via scripts/make_goldens'
    import path (grid_sample DCN shim, identical math to torchvision)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    from make_goldens import install_stubs

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    install_stubs()
    sys.path.insert(0, "/root/reference/src/lib")
    sys.path.insert(0, "/root/reference/src")
    from config import config as ref_cfg, updateDatasetAndModelConfig
    from model.model import getModel

    h, w = 448, 800
    ref_cfg.defrost()
    ref_cfg.DATASET.DATASET = "nuscenes"
    ref_cfg.DATASET.RADAR_PC = True
    ref_cfg.MODEL.FUSION_STRATEGY = "middle"
    ref_cfg.MODEL.FRUSTUM = False
    ref_cfg.MODEL.DLA.NODE = "DeformConv"
    ref_cfg.MODEL.INPUT_SIZE = (h, w)
    ref_cfg.MODEL.LOAD_DIR = "skip-imagenet-download"
    ref_cfg.TRAIN.UNCERTAINTY_LOSS = False
    ref_cfg.DEBUG = 0

    class _DS:
        num_categories = 10
        default_resolution = (h, w)

    updateDatasetAndModelConfig(ref_cfg, _DS)
    torch.manual_seed(0)
    ref_model = getModel(ref_cfg)
    ref_model.eval()

    rng = np.random.RandomState(0)
    b = 1
    oh, ow = h // 4, w // 4
    img = rng.randn(b, 3, h, w).astype(np.float32)
    pc_dep = np.abs(rng.randn(b, 3, oh, ow)).astype(np.float32) * 30
    calib = np.tile(
        np.array([[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0], [0, 0, 1, 0]],
                 np.float32), (b, 1, 1))

    t = torch.from_numpy
    iters = 3
    with torch.no_grad():
        ref_model(t(img), pc_hm=None, pc_dep=t(pc_dep.copy()), calib=t(calib))
        t0 = time.perf_counter()
        for _ in range(iters):
            ref_model(t(img), pc_hm=None, pc_dep=t(pc_dep.copy()),
                      calib=t(calib))
        ref_s = (time.perf_counter() - t0) / iters

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.models import build_model

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", f"({h}, {w})", "MODEL.DLA.NODE",
              "DeformConv", "MODEL.DLA.DCN_IMPL", "'xla'",
              "MIXED_PRECISION", "False"],
        num_classes=10,
    )
    model = build_model(cfg)
    image_j = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    pc_dep_j = jnp.asarray(np.transpose(pc_dep, (0, 2, 3, 1)))
    calib_j = jnp.asarray(calib)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), image_j, None, pc_dep_j, calib_j, train=False)
    fwd = jax.jit(lambda v: model.apply(v, image_j, None, pc_dep_j, calib_j,
                                        train=False)[-1]["heatmap"])
    np.asarray(fwd(variables))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fwd(variables))
    ours_s = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "cpu_forward_ratio_ours_over_torch",
        "value": round(ref_s / ours_s, 3),
        "unit": "x (same host CPU, bs1 448x800, fp32, exact DCN)",
        "torch_ms": round(ref_s * 1e3, 1),
        "ours_ms": round(ours_s * 1e3, 1),
    }))


def bench_train_steps():
    """Train-side throughput at the flagship shape (bs8 448x800), frozen +
    unfrozen, so the driver-visible history can catch train regressions
    (VERDICT r4 weak #3). Uses synthetic targets (same shapes as the
    loader's) and the same phase routing as Trainer. Records XLA
    cost_analysis flops/bytes for the roofline bookkeeping. Set
    BENCH_SKIP_TRAIN=1 to skip (e.g. cold compile cache on a slow link:
    first unfrozen-step compile is minutes over the tunnel)."""
    if os.environ.get("BENCH_SKIP_TRAIN"):
        return {"skipped": "BENCH_SKIP_TRAIN=1"}
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.losses import GenericLoss
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.training import (
        create_train_state,
        make_train_step,
    )

    b, m = 8, 128
    cfg = load_config(opts=["MODEL.INPUT_SIZE", "(448, 800)",
                            "MODEL.DLA.NODE", "DeformConv",
                            "TRAIN.BATCH_SIZE", str(b)], num_classes=10)
    model = build_model(cfg)
    if jax.default_backend() == "tpu":
        model = model.clone(dcn_impl="shift")  # Trainer._phase_model routing
    loss_fn = GenericLoss(cfg)
    rng = np.random.RandomState(0)
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    batch = {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "pc_hm": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "pc_dep": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
        "calib": np.tile(np.array(
            [[1266.4, 0, ow * 2, 0], [0, 1266.4, oh * 2, 0], [0, 0, 1, 0]],
            np.float32), (b, 1, 1)),
        "heatmap0": np.zeros((b, oh, ow, 10), np.float32),
        "classIds": rng.randint(0, 10, (b, m)),
        "mask": np.ones((b, m), np.float32),
        "truncMask": np.zeros((b, m), np.float32),
        "widthHeight": rng.rand(b, m, 2).astype(np.float32) * 30,
        "reg": rng.rand(b, m, 2).astype(np.float32),
        "depth": rng.rand(b, m, 1).astype(np.float32) * 50,
        "dimension": rng.rand(b, m, 3).astype(np.float32) * 3,
        "amodal_offset": rng.randn(b, m, 2).astype(np.float32),
        "nuscenes_att": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "nuscenes_att_mask": rng.randint(0, 2, (b, m, 8)).astype(np.float32),
        "velocity": rng.randn(b, m, 3).astype(np.float32),
        "rotbin": rng.randint(0, 2, (b, m, 2)),
        "rotres": rng.randn(b, m, 2).astype(np.float32) * 0.2,
        "target": {
            "heatCenters": np.stack(
                [rng.rand(b, m) * (ow - 1), rng.rand(b, m) * (oh - 1)],
                -1).astype(np.float32),
            "bboxes": rng.rand(b, m, 4).astype(np.float32) * 30,
            "bboxes3d": rng.randn(b, m, 8, 3).astype(np.float32),
        },
    }
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["image"], batch["pc_hm"],
        batch["pc_dep"], batch["calib"], train=True)
    out = {"batch": b, "input": [h, w]}
    state = create_train_state(cfg, model, variables)
    for label, kw in (("unfrozen", {}), ("frozen", {"freeze_backbone": True})):
        step = jax.jit(make_train_step(model, loss_fn, **kw),
                       donate_argnums=(0,))
        try:
            analysis = step.lower(state, batch, 1e-4).compile().cost_analysis()
            out[f"{label}_gflops_per_step"] = round(
                float(analysis["flops"]) / 1e9, 1)
            out[f"{label}_gbytes_per_step"] = round(
                float(analysis["bytes accessed"]) / 2 ** 30, 2)
        except Exception:
            pass
        # donation invalidates the input state's buffers each call, so the
        # state is threaded through every step and across phases
        t0 = time.perf_counter()
        state, metrics = step(state, batch, 1e-4)
        float(metrics["total"])  # fetch = real completion on axon
        out[f"{label}_first_step_s"] = round(time.perf_counter() - t0, 1)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, 1e-4)
        float(metrics["total"])
        dt = (time.perf_counter() - t0) / n
        out[f"{label}_ms_per_step"] = round(dt * 1e3, 1)
        out[f"{label}_img_per_s"] = round(b / dt, 1)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from centerfusiondetect3d_tpu.config import load_config
    from centerfusiondetect3d_tpu.models import build_model
    from centerfusiondetect3d_tpu.ops import fusion_decode

    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(448, 800)", "MODEL.DLA.NODE", "DeformConv"],
        num_classes=10,
    )
    model = build_model(cfg)  # bf16 via MIXED_PRECISION default

    rng = np.random.RandomState(0)
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(BATCH, h, w, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(BATCH, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(
        np.tile(
            np.array(
                [[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0], [0, 0, 1, 0]],
                np.float32,
            ),
            (BATCH, 1, 1),
        )
    )

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), image, None, pc_dep, calib, train=False
    )

    @jax.jit
    def infer(variables, image, pc_dep, calib):
        outputs = model.apply(variables, image, None, pc_dep, calib, train=False)
        return fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                             approx_topk=bool(cfg.MODEL.get("APPROX_TOPK",
                                                            False)))

    # warmup / compile. NOTE: fetch a real output every iteration - on the
    # axon backend block_until_ready alone returns before execution finishes,
    # yielding fictitious throughput numbers.
    for _ in range(WARMUP):
        np.asarray(infer(variables, image, pc_dep, calib)["scores"])

    # measure the tunnel round-trip so a wedged link is visible in the
    # recorded JSON (observed: the same code measures 133 fps device / 25+
    # fps e2e on a healthy link and a fraction of that when the tunnel
    # degrades mid-run)
    tiny = jax.jit(lambda a: a + 1.0)
    x1 = jnp.ones((8,))
    np.asarray(tiny(x1))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(x1))
        rtts.append((time.perf_counter() - t0) * 1e3)
    link_rtt_ms = round(sorted(rtts)[len(rtts) // 2], 1)

    # pipelined throughput: keep several steps in flight so the host-side
    # result fetch overlaps device compute (profiling shows the transfer
    # latency otherwise serializes after each step); every result is still
    # fetched. Best of 2 timed passes, like the e2e metric: a single pass is
    # at the mercy of transient tunnel latency / host-load spikes on this
    # 1-core host (observed 133->87 fps under a concurrent pytest run).
    depth = 4
    fps = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        inflight = []
        for _ in range(ITERS):
            inflight.append(infer(variables, image, pc_dep, calib)["scores"])
            if len(inflight) > depth:
                np.asarray(inflight.pop(0))
        for r in inflight:
            np.asarray(r)
        fps = max(fps, BATCH * ITERS / (time.perf_counter() - t0))

    # FLOPs / MFU of the serving program (VERDICT r4 next #3; reference
    # reports MACs via thop at every val, trainer.py:112-117). XLA
    # cost_analysis counts the shift-DCN 9-term accumulations as useful
    # work, so this is the NOMINAL number; bilinear-DCN-equivalent MFU is
    # lower (see PARITY.md).
    gflops_per_frame = tflops_per_sec = mfu = None
    try:
        analysis = (infer.lower(variables, image, pc_dep, calib)
                    .compile().cost_analysis())
        gflops_per_frame = round(float(analysis["flops"]) / BATCH / 1e9, 2)
        tflops_per_sec = round(fps * gflops_per_frame / 1e3, 2)
        mfu = round(tflops_per_sec * 1e12 / V5E_BF16_PEAK_FLOPS, 4)
    except Exception:
        pass

    # batch serving via the shipped lax.map sub-batch split
    # (TEST.DEVICE_BATCH_MAP; PARITY "Batch cliff attacked"): bs24 as ONE
    # program of 4x bs6 iterations, same pipelined-fetch methodology as
    # the primary metric so the numbers compare directly
    batch_map_fps_bs24 = None
    try:
        B24 = 4 * BATCH

        def _tile(x):
            return jnp.concatenate([x] * 4, axis=0)

        image24, pc24, calib24 = _tile(image), _tile(pc_dep), _tile(calib)

        @jax.jit
        def infer24(variables, image, pc_dep, calib):
            def one(args):
                im, pc, cal = args
                outputs = model.apply(variables, im, None, pc, cal,
                                      train=False)
                return fusion_decode(
                    outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                    approx_topk=bool(cfg.MODEL.get("APPROX_TOPK", False)),
                )["scores"]
            split = lambda x: x.reshape((4, BATCH) + x.shape[1:])
            s = jax.lax.map(one, (split(image), split(pc_dep), split(calib)))
            return s.reshape((B24,) + s.shape[2:])

        for _ in range(WARMUP):
            np.asarray(infer24(variables, image24, pc24, calib24))
        t0 = time.perf_counter()
        inflight = []
        for _ in range(ITERS):
            inflight.append(infer24(variables, image24, pc24, calib24))
            if len(inflight) > 2:
                np.asarray(inflight.pop(0))
        for r in inflight:
            np.asarray(r)
        batch_map_fps_bs24 = round(
            B24 * ITERS / (time.perf_counter() - t0), 2)
    except Exception:
        pass

    # flip-TTA serving cost (BASELINE configs[3] names flip test a
    # first-class config; VERDICT r4 next #7): same process, same batch
    flip_tta_fps = None
    try:
        from centerfusiondetect3d_tpu.ops import flip_forward

        @jax.jit
        def infer_tta(variables, image, pc_dep, calib):
            outputs = flip_forward(
                lambda v, im, hm, dep, cal: model.apply(
                    v, im, hm, dep, cal, train=False),
                variables, image, None, pc_dep, calib)
            return fusion_decode(
                outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                approx_topk=bool(cfg.MODEL.get("APPROX_TOPK", False)))

        for _ in range(WARMUP):
            np.asarray(infer_tta(variables, image, pc_dep, calib)["scores"])
        t0 = time.perf_counter()
        inflight = []
        for _ in range(ITERS):
            inflight.append(infer_tta(variables, image, pc_dep, calib)["scores"])
            if len(inflight) > 4:
                np.asarray(inflight.pop(0))
        for r in inflight:
            np.asarray(r)
        flip_tta_fps = round(BATCH * ITERS / (time.perf_counter() - t0), 2)
    except Exception:
        pass

    try:
        e2e_fps, e2e_stage_ms = bench_e2e()
        e2e_fps = round(e2e_fps, 2)
    except Exception as e:  # keep the primary metric robust
        e2e_fps, e2e_stage_ms = f"error: {type(e).__name__}", {}

    try:
        train = bench_train_steps()
    except Exception as e:  # train micro-bench must not sink the metric
        train = {"error": f"{type(e).__name__}: {e}"}

    print(
        json.dumps(
            {
                "metric": "eval_fps_per_chip_6cam_fusion",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 3),
                "gflops_per_frame": gflops_per_frame,
                "tflops_per_sec": tflops_per_sec,
                "mfu_vs_bf16_peak": mfu,
                "batch_map_fps_bs24": batch_map_fps_bs24,
                "flip_tta_fps": flip_tta_fps,
                "train": train,
                "eval_fps_e2e_pipeline": e2e_fps,
                "e2e_stage_ms": e2e_stage_ms,
                "link_rtt_ms": link_rtt_ms,
            }
        )
    )


if __name__ == "__main__":
    import sys as _sys

    if "--cpu-ratio" in _sys.argv:
        bench_cpu_ratio()
        _sys.exit(0)
    if "--sweep-e2e" in _sys.argv:
        bench_e2e(sweep=True)
        _sys.exit(0)
    try:
        main()
    except Exception as first_error:  # tunnel hiccups: retry once, then record
        import traceback

        traceback.print_exc()
        try:
            main()
        except Exception:
            print(
                json.dumps(
                    {
                        "metric": "eval_fps_per_chip_6cam_fusion",
                        "value": 0.0,
                        "unit": "frames/sec",
                        "vs_baseline": 0.0,
                        "error": f"{type(first_error).__name__}: {first_error}",
                    }
                )
            )
