"""Benchmark the DCN implementations on the real TPU.

Compares ops/dcn.py (XLA gather path) vs ops/pallas_dcn.py (shifted-window
kernel) at the flagship DLA-34 layer shapes, with near-init offset
magnitudes (trained DCN offsets are small) and with adversarial ±R offsets.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dcn.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d
from centerfusiondetect3d_tpu.ops.pallas_dcn import deform_conv2d_pallas

B = 6
SHAPES = [  # (H, W, C, O) — DLA-34 DLASeg node shapes at 448x800 input
    (112, 200, 64, 64),
    (56, 100, 128, 128),
    (28, 50, 256, 256),
    (14, 25, 512, 512),
]


def timeit(fn, *args, iters=10):
    # fetch a scalar reduction, not the full map: the tunnel transfer of a
    # (6, H, W, O) tensor (~35 MB) would dominate and mask the kernel time
    out = fn(*args)
    np.asarray(out)  # axon: must fetch real bytes
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    for h, w, c, o in SHAPES:
        x = jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(
            jnp.bfloat16
        )
        mask = jnp.asarray(rng.rand(B, h, w, 9).astype(np.float32))
        weight = jnp.asarray(
            (rng.randn(3, 3, c, o) * 0.05).astype(np.float32)
        ).astype(jnp.bfloat16)
        for label, scale in [("tiny-off", 0.3), ("wide-off", 8.0)]:
            offset = jnp.asarray(
                (rng.randn(B, h, w, 18) * scale).astype(np.float32)
            )
            # amortize the ~30 ms tunnel dispatch: apply the op REP times
            # serially inside one program (output feeds input, so XLA can't
            # CSE the chain), fetch one scalar. NOTE: unrolled in Python, not
            # lax.fori_loop — Mosaic crashes on pallas_call under fori_loop
            # (remote_compile HTTP 500), while the same kernel compiles fine
            # as a plain call sequence.
            REP = 10

            def chain(op):
                def fn(x, off, m, wt):
                    acc = x
                    for _ in range(REP):
                        acc = op(acc, off, m, wt).astype(x.dtype) * 0.5
                    return jnp.sum(acc.astype(jnp.float32))
                return jax.jit(fn)

            xla_fn = chain(deform_conv2d)
            pls_fn = chain(
                lambda x, off, m, wt: deform_conv2d_pallas(
                    x, off, m, wt, max_offset=8.0
                )
            )
            try:
                t_p = timeit(pls_fn, x, offset, mask, weight)
            except Exception as e:
                t_p = None
                print(f"  pallas FAIL {type(e).__name__}: {str(e)[:200]}")
            t_x = timeit(xla_fn, x, offset, mask, weight)
            msg = (f"{h}x{w}x{c}->{o} {label}: xla {t_x*1e3/REP:7.2f} ms"
                   + (f"  pallas {t_p*1e3/REP:7.2f} ms  ({t_x/t_p:4.1f}x)"
                      if t_p else "  pallas FAILED"))
            print(msg, flush=True)
            if t_p is not None:
                got = np.asarray(
                    jax.jit(
                        lambda *a: deform_conv2d_pallas(*a, max_offset=8.0)
                    )(x, offset, mask, weight),
                    np.float32,
                )
                ref = np.asarray(
                    jax.jit(deform_conv2d)(
                        x, jnp.clip(offset, -8, 8), mask, weight
                    ),
                    np.float32,
                )
                err = np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-6)
                print(f"    max rel err vs clamped-xla: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
