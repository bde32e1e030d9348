"""Attack the bs12 XLA fusion cliff (VERDICT r4 next #2).

Round-3 root cause: past bs6 XLA stops fusing the shift-DCN tap
accumulations on the flagship eval program — temp memory jumps 400 MiB
(bs6) -> ~3.1 GiB (bs12) and the extra HBM traffic wins (112 -> 40 fps/
per-sample). Known levers, all measured here same-process:

  A  bs6 monolithic           — the shipped sweet spot (baseline)
  B  bs12 monolithic          — the cliff itself (re-measured)
  C  bs12 = lax.map over 2 bs6 sub-batches INSIDE one program — keeps the
     per-iteration footprint at the bs6 sweet spot while halving per-batch
     dispatch/launch overhead (ONE device program per 12 frames)
  D  bs24 = lax.map over 4 bs6 sub-batches
  E  bs12 monolithic + XLA flag candidates (scoped-vmem budget etc.)
  F  bs12 monolithic + optimization_barrier after each DCN tap
     accumulation (bounds the accumulation live range so the scheduler
     cannot materialize all taps at once) — via ops.dcn.TAP_BARRIERS

Each variant reports fps and compiled temp-memory (memory_analysis).
Timing per the axon rules: scalar on-device consumer, enqueue all iters,
fetch the last scalar (in-order execution ⇒ all finished).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_batch_cliff.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.config import load_config
from centerfusiondetect3d_tpu.models import build_model
from centerfusiondetect3d_tpu.ops import fusion_decode

ITERS = 10


def make_inputs(b, cfg, rng):
    h, w = cfg.MODEL.INPUT_SIZE
    oh, ow = cfg.MODEL.OUTPUT_SIZE
    image = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    pc_dep = jnp.asarray(np.abs(rng.randn(b, oh, ow, 3)).astype(np.float32))
    calib = jnp.asarray(np.tile(np.array(
        [[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0], [0, 0, 1, 0]],
        np.float32), (b, 1, 1)))
    return image, pc_dep, calib


def measure(fn, variables, inputs, batch, label, compiler_options=None):
    jit_kw = {}
    if compiler_options:
        jit_kw["compiler_options"] = compiler_options
    jfn = jax.jit(fn, **jit_kw)
    image, pc_dep, calib = inputs
    try:
        t0 = time.perf_counter()
        compiled = jfn.lower(variables, image, pc_dep, calib).compile()
        compile_s = time.perf_counter() - t0
        mem = compiled.memory_analysis()
        temp_mib = getattr(mem, "temp_size_in_bytes", 0) / 2 ** 20
    except Exception as e:
        print(f"{label}: COMPILE FAILED {type(e).__name__}: {e}")
        return None
    # warmup + timed: enqueue all, fetch the last scalar
    for _ in range(2):
        out = jfn(variables, image, pc_dep, calib)
    float(out)
    t0 = time.perf_counter()
    outs = [jfn(variables, image, pc_dep, calib) for _ in range(ITERS)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    fps = batch / dt
    print(f"{label}: {fps:7.1f} fps  ({dt*1e3:6.1f} ms/batch of {batch}, "
          f"temp {temp_mib:7.1f} MiB, compile {compile_s:.0f}s)", flush=True)
    return {"label": label, "fps": round(fps, 1), "ms": round(dt * 1e3, 1),
            "temp_mib": round(temp_mib, 1)}


def main():
    if os.environ.get("DCN_TAP_BARRIERS"):
        # must precede any model trace (see note at the F variant below)
        from centerfusiondetect3d_tpu.ops import dcn as dcn_mod

        dcn_mod.TAP_BARRIERS = True
        print("TAP_BARRIERS armed for every variant in this process")
    cfg = load_config(
        opts=["MODEL.INPUT_SIZE", "(448, 800)", "MODEL.DLA.NODE",
              "DeformConv"], num_classes=10)
    model = build_model(cfg)
    rng = np.random.RandomState(0)

    def infer_scalar(variables, image, pc_dep, calib):
        outputs = model.apply(variables, image, None, pc_dep, calib,
                              train=False)
        dets = fusion_decode(outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                             approx_topk=bool(cfg.MODEL.APPROX_TOPK))
        return jnp.sum(dets["scores"].astype(jnp.float32))

    def infer_map(n_sub):
        def fn(variables, image, pc_dep, calib):
            def one(args):
                im, pc, cal = args
                outputs = model.apply(variables, im, None, pc, cal,
                                      train=False)
                dets = fusion_decode(
                    outputs, cfg.MODEL.OUTPUT_SIZE, k=cfg.MODEL.K,
                    approx_topk=bool(cfg.MODEL.APPROX_TOPK))
                return jnp.sum(dets["scores"].astype(jnp.float32))
            b6 = image.shape[0] // n_sub
            split = lambda x: x.reshape((n_sub, b6) + x.shape[1:])
            return jnp.sum(jax.lax.map(
                one, (split(image), split(pc_dep), split(calib))))
        return fn

    i6 = make_inputs(6, cfg, rng)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), i6[0], None, i6[1], i6[2], train=False)

    results = []
    results.append(measure(infer_scalar, variables, i6, 6, "A bs6 monolithic"))
    i12 = make_inputs(12, cfg, rng)
    results.append(measure(infer_scalar, variables, i12, 12,
                           "B bs12 monolithic"))
    if os.environ.get("DCN_TAP_BARRIERS"):
        print("barrier mode: A/B measured with barriers; done")
        for r in results:
            if r:
                print(f"  {r['label']}: {r['fps']} fps, temp "
                      f"{r['temp_mib']} MiB")
        return
    results.append(measure(infer_map(2), variables, i12, 12,
                           "C bs12 lax.map 2x6"))
    i24 = make_inputs(24, cfg, rng)
    results.append(measure(infer_map(4), variables, i24, 24,
                           "D bs24 lax.map 4x6"))

    for flags in (
        {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    ):
        results.append(measure(
            infer_scalar, variables, i12, 12,
            f"E bs12 flags {flags}", compiler_options=flags))

    # F (tap barriers) must run in its OWN process with DCN_TAP_BARRIERS=1:
    # toggling ops.dcn.TAP_BARRIERS after the model's first trace in a
    # process does not reach new traces (measured: barrier count 0 in the
    # jaxpr when toggled late, 144 when set before model build), so an
    # in-process F silently re-measures B.
    if not os.environ.get("DCN_TAP_BARRIERS"):
        print("F: rerun with DCN_TAP_BARRIERS=1 for the barrier variant "
              "(own process)")

    print("\nsummary:")
    for r in results:
        if r:
            print(f"  {r['label']}: {r['fps']} fps, temp {r['temp_mib']} MiB")


if __name__ == "__main__":
    main()
