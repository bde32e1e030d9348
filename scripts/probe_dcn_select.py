"""Probe: select-based 4-corner Pallas DCN vs the unrolled-hat static kernel.

Two untested routes past the Mosaic stack-slot wall documented in
ops/pallas_dcn.py (each of the 144 unrolled hat-FMA terms gets its own
scoped-VMEM slot; br=8 measures 13.0 ms vs 4.45 ms XLA shift at the
(6,112,200,64) DLA node):

1. value-accumulation: accumulate taps in an SSA value (``acc = acc + t``)
   instead of a scratch ref — gives Mosaic's allocator a dead-after-use
   temp per term instead of a live ref round-trip.
2. select formulation: the bilinear tent is nonzero at exactly the two
   integers straddling the sample, so 12 of the 16 hat terms per tap are
   zero at every pixel. Select the 4 straddling corners with predicated
   3-way ``jnp.where`` chains over static windows (R=1: 24 selects +
   ~8 FMAs per tap ≈ 5x less VPU work than 16 hat FMAs... if Mosaic
   vectorizes the selects as lane-broadcast compares).

Run on TPU:   python scripts/probe_dcn_select.py
Numerics-only (CPU interpret): python scripts/probe_dcn_select.py --interp
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(v):
    return jnp.maximum(0.0, 1.0 - jnp.abs(v))


# ---------------------------------------------------------------------------
# kernel A: unrolled hat terms, VALUE accumulation (no scratch refs)
# ---------------------------------------------------------------------------

def _kernel_value_acc(off_ref, mask_ref, x_ref, w_ref, out_ref, *,
                      br, w, c, o, pad, r):
    r_lo, r_hi = math.ceil(r), math.floor(r) + 1
    out = None
    for k in range(9):
        i, j = divmod(k, 3)
        ty = jnp.clip(off_ref[0, :, :, 2 * k:2 * k + 1], -r, r) + (i - 1)
        tx = jnp.clip(off_ref[0, :, :, 2 * k + 1:2 * k + 2], -r, r) + (j - 1)
        tap = None
        for gy in range(i - 1 - r_lo, i - 1 + r_hi + 1):
            wy = _hat(float(gy) - ty)
            for gx in range(j - 1 - r_lo, j - 1 + r_hi + 1):
                wx = _hat(float(gx) - tx)
                win = x_ref[0, gy + pad:gy + pad + br,
                            gx + pad:gx + pad + w, :]
                term = (wy * wx) * win.astype(jnp.float32)
                tap = term if tap is None else tap + term
        tap = tap * mask_ref[0, :, :, k:k + 1]
        t = jax.lax.dot_general(
            tap.reshape(br * w, c).astype(jnp.bfloat16), w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
    out_ref[0] = out.reshape(br, w, o).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# kernel B: 4-corner select formulation (R=1 only)
#
# fy = floor(ty) in {i-2, i-1, i}; corners (fy, fx), (fy, fx+1),
# (fy+1, fx), (fy+1, fx+1). Two-stage select: first resolve y (3-way per
# static column shift), then x (3-way over the y-resolved tensors).
# ---------------------------------------------------------------------------

def _kernel_select(off_ref, mask_ref, x_ref, w_ref, out_ref, *,
                   br, w, c, o, pad, r):
    assert r == 1.0
    out = None
    for k in range(9):
        i, j = divmod(k, 3)
        ty = jnp.clip(off_ref[0, :, :, 2 * k:2 * k + 1], -1.0, 1.0) + (i - 1)
        tx = jnp.clip(off_ref[0, :, :, 2 * k + 1:2 * k + 2], -1.0, 1.0) + (j - 1)
        fy = jnp.floor(ty)
        fx = jnp.floor(tx)
        ay = (ty - fy).astype(jnp.float32)
        ax = (tx - fx).astype(jnp.float32)

        def win(gy, gx):
            return x_ref[0, gy + pad:gy + pad + br,
                         gx + pad:gx + pad + w, :].astype(jnp.float32)

        # stage 1: resolve y per static column gx in [j-2, j+1]
        # fy in {i-2, i-1, i}; fy+1 in {i-1, i, i+1}
        ylo, yhi = {}, {}
        for gx in range(j - 2, j + 2):
            v = win(i - 2, gx)
            v = jnp.where(fy == (i - 1), win(i - 1, gx), v)
            ylo[gx] = jnp.where(fy == float(i), win(i, gx), v)
            v2 = win(i - 1, gx)
            v2 = jnp.where(fy == (i - 1), win(i, gx), v2)
            yhi[gx] = jnp.where(fy == float(i), win(i + 1, gx), v2)

        # stage 2: resolve x; fx in {j-2, j-1, j}
        def selx(tbl, plus):
            v = tbl[j - 2 + plus]
            v = jnp.where(fx == (j - 1), tbl[j - 1 + plus], v)
            return jnp.where(fx == float(j), tbl[j + plus], v)

        v00 = selx(ylo, 0)
        v01 = selx(ylo, 1)
        v10 = selx(yhi, 0)
        v11 = selx(yhi, 1)
        tap = ((1 - ay) * ((1 - ax) * v00 + ax * v01)
               + ay * ((1 - ax) * v10 + ax * v11))
        tap = tap * mask_ref[0, :, :, k:k + 1]
        t = jax.lax.dot_general(
            tap.reshape(br * w, c).astype(jnp.bfloat16), w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
    out_ref[0] = out.reshape(br, w, o).astype(out_ref.dtype)


def run_kernel(kernel_fn, x, offset, mask, weight, *, max_offset, block_rows,
               vmem_mb=100, interpret=False):
    b, h, w, c = x.shape
    o = weight.shape[-1]
    r = float(max_offset)
    pad = math.ceil(r) + 2
    br = h if h <= 2 * block_rows else block_rows
    nrb = -(-h // br)
    hb = nrb * br
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (pad, pad + (hb - h)), (pad, pad), (0, 0)))
    wp = w + 2 * pad
    off_p = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    mask_p = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    w_taps = weight.reshape(9, c, o).astype(jnp.bfloat16)

    from jax._src.pallas.core import Element as _El

    kern = functools.partial(kernel_fn, br=br, w=w, c=c, o=o, pad=pad, r=r)
    out = pl.pallas_call(
        kern,
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((1, br, w, 18), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, br, w, 9), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((_El(1), _El(br + 2 * pad), _El(wp), _El(c)),
                         lambda bi, ri: (bi, ri * br, 0, 0)),
            pl.BlockSpec((9, c, o), lambda bi, ri: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, w, o), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hb, w, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(off_p, mask_p, xp, w_taps)
    return out[:, :h]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interp", action="store_true")
    ap.add_argument("--br", type=int, default=8)
    ap.add_argument("--shape", default="6,112,200,64")
    ap.add_argument("--kernel", default="both", choices=["value", "select", "both"])
    args = ap.parse_args()

    if args.interp:
        jax.config.update("jax_platforms", "cpu")

    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d_shift

    b, h, w, c = [int(v) for v in args.shape.split(",")]
    o = c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.randn(b, h, w, 18) * 0.6).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    weight = jnp.asarray((rng.randn(3, 3, c, o) * 0.05).astype(np.float32))

    ref = np.asarray(deform_conv2d_shift(
        x.astype(jnp.bfloat16), offset, mask, weight.astype(jnp.bfloat16),
        max_offset=1.0)).astype(np.float32)

    kernels = {"value": _kernel_value_acc, "select": _kernel_select}
    todo = list(kernels) if args.kernel == "both" else [args.kernel]
    for name in todo:
        fn = jax.jit(functools.partial(
            run_kernel, kernels[name], max_offset=1.0, block_rows=args.br,
            interpret=args.interp))
        t0 = time.perf_counter()
        out = np.asarray(fn(x.astype(jnp.bfloat16), offset, mask,
                            weight.astype(jnp.bfloat16))).astype(np.float32)
        compile_s = time.perf_counter() - t0
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"[{name}] br={args.br} rel_err={err:.2e} "
              f"(first call {compile_s:.1f}s)")
        if not args.interp:
            # timed: reduce on device so only a scalar crosses the tunnel
            # (fetching the (6,112,200,64) output costs ~42 ms/iter and
            # swamps the op)
            red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
            iters = 50
            np.asarray(red(x.astype(jnp.bfloat16), offset, mask,
                           weight.astype(jnp.bfloat16)))
            t0 = time.perf_counter()
            for _ in range(iters):
                r_ = red(x.astype(jnp.bfloat16), offset, mask,
                         weight.astype(jnp.bfloat16))
            np.asarray(r_)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"[{name}] {dt:.2f} ms/op")

    if not args.interp:
        shift = functools.partial(deform_conv2d_shift, max_offset=1.0)
        red = jax.jit(lambda *a: jnp.sum(shift(*a).astype(jnp.float32)))
        xb = x.astype(jnp.bfloat16)
        wb = weight.astype(jnp.bfloat16)
        np.asarray(red(xb, offset, mask, wb))
        t0 = time.perf_counter()
        for _ in range(50):
            r_ = red(xb, offset, mask, wb)
        np.asarray(r_)
        print(f"[xla-shift] {(time.perf_counter() - t0) / 50 * 1e3:.2f} ms/op")


if __name__ == "__main__":
    main()
