"""Device eval fps (6-cam 448x800 bf16 fusion + decode) with config opts.

Same measurement as bench.py's device number, parameterized so impl
variants can be compared:

    PYTHONPATH=/root/repo python scripts/bench_eval_fps.py \
        MODEL.DLA.DCN_IMPL "'select'"
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.ops import fusion_decode

import os
BATCH = int(os.environ.get("BENCH_BATCH", "6"))
WARMUP, ITERS = 3, 12
cfg = load_config(
    opts=["MODEL.INPUT_SIZE", "(448, 800)",
          "MODEL.DLA.NODE", "DeformConv"] + sys.argv[1:],
    num_classes=10)
model = build_model(cfg)
rng = np.random.RandomState(0)
h, w = cfg.MODEL.INPUT_SIZE
oh, ow = cfg.MODEL.OUTPUT_SIZE
image = jnp.asarray(rng.randn(BATCH, h, w, 3).astype(np.float32))
pc_dep = jnp.asarray(np.abs(rng.randn(BATCH, oh, ow, 3)).astype(np.float32))
calib = jnp.asarray(np.tile(np.array(
    [[1266.4, 0, ow * 2, 0], [0, 1266.4, oh * 2, 0], [0, 0, 1, 0]],
    np.float32), (BATCH, 1, 1)))
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), image, None, pc_dep, calib, train=False)

@jax.jit
def step(variables, image, pc_dep, calib):
    outputs = model.apply(variables, image, None, pc_dep, calib, train=False)
    return fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                         approx_topk=bool(cfg.MODEL.get("APPROX_TOPK", False)))

t0 = time.perf_counter()
out = step(variables, image, pc_dep, calib)
np.asarray(out["scores"])
print(f"first call (incl compile): {time.perf_counter() - t0:.1f}s",
      flush=True)
for _ in range(WARMUP):
    out = step(variables, image, pc_dep, calib)
np.asarray(out["scores"])
# pipeline fetches 2 deep: axon block_until_ready returns early
t0 = time.perf_counter()
prev = None
for _ in range(ITERS):
    out = step(variables, image, pc_dep, calib)
    if prev is not None:
        np.asarray(prev["scores"])
    prev = out
np.asarray(prev["scores"])
dt = (time.perf_counter() - t0) / ITERS
print(f"eval: {dt * 1e3:.2f} ms/batch = {BATCH / dt:.1f} fps "
      f"(opts={sys.argv[1:]})")
