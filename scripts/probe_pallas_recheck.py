"""5-minute scripted Pallas re-probe (VERDICT r3 next #8).

Each new axon/Mosaic toolchain, run this once: it compiles the best-known
Pallas DCN formulation (4-corner select, value accumulation —
scripts/probe_dcn_select.py) at the dominant DLA node and times it against
the shipped XLA shift path, then prints ONE verdict line. The blocker it
watches: Mosaic assigning every unrolled term its own scoped-VMEM stack
slot (br=8 measured 4.52 ms vs 2.20 XLA in round 3; br=16 errors). If the
slot-reuse unlock lands, this prints PALLAS-UNLOCKED the same session —
update ROADMAP.md and re-evaluate MODEL.DLA.DCN_IMPL=pallas.

Run on TPU: timeout 600 python scripts/probe_pallas_recheck.py
Exit codes: 0 = still parked / unlocked (see line), 2 = probe error.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from probe_dcn_select import _kernel_select, run_kernel  # noqa: E402
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_shift

    backend = jax.default_backend()
    b, h, w, c = 6, 112, 200, 64  # dominant DLA node at serving shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    offset = jnp.asarray((rng.randn(b, h, w, 18) * 0.6).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, c) * 0.05).astype(np.float32)).astype(jnp.bfloat16)

    def timed(fn, iters=30):
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(red(x, offset, mask, wgt))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            r = red(x, offset, mask, wgt)
        np.asarray(r)  # ONE scalar fetch amortized over all iters
        return (time.perf_counter() - t0) / iters * 1e3

    try:
        pallas_fn = jax.jit(functools.partial(
            run_kernel, _kernel_select, max_offset=1.0, block_rows=8,
            interpret=(backend != "tpu")))
        ref = np.asarray(deform_conv2d_shift(x, offset, mask, wgt,
                                             max_offset=1.0)).astype(np.float32)
        out = np.asarray(pallas_fn(x, offset, mask, wgt)).astype(np.float32)
        err = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))
        if err > 0.05:
            print(f"VERDICT: PALLAS-BROKEN rel_err={err:.2e} on {backend} — "
                  "kernel no longer validates; keep parked, investigate")
            return 0
        if backend != "tpu":
            print(f"VERDICT: PALLAS-PARKED (cpu interpret only; rel_err="
                  f"{err:.2e} ok). Run on TPU for the timing verdict.")
            return 0
        t_pallas = timed(pallas_fn)
        t_xla = timed(functools.partial(deform_conv2d_shift, max_offset=1.0))
        if t_pallas < t_xla * 0.95:
            print(f"VERDICT: PALLAS-UNLOCKED {t_pallas:.2f} ms vs XLA shift "
                  f"{t_xla:.2f} ms at ({b},{h},{w},{c}) — Mosaic stack-slot "
                  "reuse likely landed; update ROADMAP + consider "
                  "MODEL.DLA.DCN_IMPL=pallas")
        else:
            print(f"VERDICT: PALLAS-PARKED {t_pallas:.2f} ms vs XLA shift "
                  f"{t_xla:.2f} ms at ({b},{h},{w},{c}) — still "
                  f"{t_pallas / t_xla:.2f}x; keep DCN_IMPL=auto")
        return 0
    except Exception as e:  # compile crash = toolchain still blocked
        print(f"VERDICT: PALLAS-PARKED (probe error: {type(e).__name__}: "
              f"{str(e)[:200]}) — toolchain still rejects the kernel")
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
