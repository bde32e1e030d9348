"""Time the full-res (448x800) bs8 train step on the real TPU.

Measures both the full backward and the frozen-backbone phase (the
reference trains 170 of 200 epochs frozen). Source of the PARITY.md
training-throughput numbers.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train.py
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.losses import GenericLoss
from centerfusiondetect3d_tpu.training import create_train_state, make_train_step

# --flags k=v,k=v -> per-step jit compiler_options (XLA flag probes);
# remaining argv words are dotted config overrides as before
_opts, COMPILER_OPTIONS = [], {}
_argv = sys.argv[1:]
while _argv:
    if _argv[0] == "--flags":
        for kv in _argv[1].split(","):
            k, _, v = kv.partition("=")
            COMPILER_OPTIONS[k] = v if v else "true"
        _argv = _argv[2:]
    elif _argv[0] == "--skip-frozen":
        COMPILER_OPTIONS.setdefault("__skip_frozen__", "1")
        _argv = _argv[1:]
    else:
        _opts.append(_argv[0])
        _argv = _argv[1:]
SKIP_FROZEN = COMPILER_OPTIONS.pop("__skip_frozen__", None) is not None

cfg = load_config(opts=["MODEL.INPUT_SIZE", "(448, 800)",
                        "MODEL.DLA.NODE", "DeformConv",
                        "TRAIN.BATCH_SIZE", "8"] + _opts,
                  num_classes=10)
model = build_model(cfg)
loss_fn = GenericLoss(cfg)
rng = np.random.RandomState(0)
b, m = int(cfg.TRAIN.BATCH_SIZE), 128
ACCUM = int(cfg.TRAIN.get("GRAD_ACCUM", 1))
h, w = cfg.MODEL.INPUT_SIZE
oh, ow = cfg.MODEL.OUTPUT_SIZE
batch = {
    "image": rng.randn(b, h, w, 3).astype(np.float32),
    "pc_hm": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
    "pc_dep": np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32),
    "calib": np.tile(np.array([[1266.4, 0, ow * 2, 0], [0, 1266.4, oh * 2, 0],
                               [0, 0, 1, 0]], np.float32), (b, 1, 1)),
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
        "heatCenters": np.stack([rng.rand(b, m) * (ow - 1),
                                 rng.rand(b, m) * (oh - 1)], -1).astype(np.float32),
        "bboxes": rng.rand(b, m, 4).astype(np.float32) * 30,
        "bboxes3d": rng.randn(b, m, 8, 3).astype(np.float32),
    },
}
batch = jax.tree.map(jnp.asarray, batch)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), batch["image"], batch["pc_hm"], batch["pc_dep"],
    batch["calib"], train=True)
state = create_train_state(cfg, model, variables)

_phases = [("full", {})] if SKIP_FROZEN else [
    ("full", {}), ("frozen", {"freeze_backbone": True})]
_jit_kw = {"donate_argnums": (0,)}
if COMPILER_OPTIONS:
    _jit_kw["compiler_options"] = COMPILER_OPTIONS
    print("compiler_options:", COMPILER_OPTIONS, flush=True)
for label, kw in _phases:
    try:
        step = jax.jit(make_train_step(model, loss_fn, accum_steps=ACCUM,
                                       **kw), **_jit_kw)
    except TypeError:
        if label == "frozen":
            print("frozen: make_train_step has no freeze_backbone kw; skipping")
            continue
        # signature drift (no accum_steps kw): fall back to the bare form
        step = jax.jit(make_train_step(model, loss_fn), **_jit_kw)
    s = state
    t0 = time.perf_counter()
    s, metrics = step(s, batch, 1e-4)
    tot = float(metrics["total"])
    print(f"{label}: first step (incl compile) {time.perf_counter()-t0:.1f}s loss={tot:.3f}", flush=True)
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        s, metrics = step(s, batch, 1e-4)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms/step = {b/dt:.1f} img/s/chip", flush=True)
    state = s if label == "full" else state
