"""Bisect which construct in the shifted-window DCN kernel kills Mosaic.

Small shapes; each probe adds one ingredient of _dcn_shift_kernel.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dcn_bisect.py
"""

from __future__ import annotations

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BR, W, C, O = 8, 24, 16, 16
HP, WP = 2 * BR + 20, W + 20
RESULTS = {}


def run(name, fn):
    try:
        fn()
        RESULTS[name] = "PASS"
        print(f"[bisect] {name}: PASS", flush=True)
    except Exception as e:
        RESULTS[name] = f"FAIL {type(e).__name__}"
        print(f"[bisect] {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def call(kernel, extra_scratch=()):
    x = jnp.ones((2, HP, WP, C), jnp.bfloat16)
    off = jnp.zeros((2, 18, 2 * BR, W), jnp.float32)
    msk = jnp.ones((2, 9, 2 * BR, W), jnp.float32)
    wts = jnp.ones((9, C, O), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(2, 2),
        in_specs=[
            pl.BlockSpec((1, 18, BR, W), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, 9, BR, W), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, HP, WP, C), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((9, C, O), lambda bi, ri: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BR, W, O), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 2 * BR, W, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BR, W, C), jnp.float32),
                        pltpu.VMEM((BR * W, O), jnp.float32)] + list(extra_scratch),
    )(off, msk, x, wts)
    return np.asarray(out)


# 1: 4D ref indexing with leading int + two dynamic slices
def k1(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    rb = pl.program_id(1)
    xs = x_ref[0, pl.ds(rb * BR + 3, BR), pl.ds(2, W), :]
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(xs, axis=-1, keepdims=True), (BR, W, O)
    ).astype(out_ref.dtype)


# 2: slice a 2D field out of the (1, 18, BR, W) block
def k2(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    dy = off_ref[0, 4]  # (BR, W)
    out_ref[0] = jnp.broadcast_to(dy[..., None], (BR, W, O)).astype(out_ref.dtype)


# 3: scalar min/max reduction -> floor -> int32 loop bounds, static slice body
def k3(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    dy = jnp.clip(off_ref[0, 4], -8.0, 8.0)
    lo = jnp.floor(jnp.min(dy)).astype(jnp.int32)
    hi = jnp.floor(jnp.max(dy)).astype(jnp.int32) + 1
    tap[:] = jnp.zeros_like(tap)

    def body(g, _):
        xs = x_ref[0, pl.ds(g + 10, BR), pl.ds(10, W), :]
        tap[:] += xs.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(lo, hi + 1, body, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# 4: nested dynamic fori loops with hat-weighted MAC
def k4(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    rb = pl.program_id(1)
    dy = jnp.clip(off_ref[0, 4], -8.0, 8.0)
    dx = jnp.clip(off_ref[0, 5], -8.0, 8.0)
    ylo = jnp.floor(jnp.min(dy)).astype(jnp.int32)
    yhi = jnp.floor(jnp.max(dy)).astype(jnp.int32) + 1
    xlo = jnp.floor(jnp.min(dx)).astype(jnp.int32)
    xhi = jnp.floor(jnp.max(dx)).astype(jnp.int32) + 1
    tap[:] = jnp.zeros_like(tap)

    def body_y(gy, _):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy.astype(jnp.float32) - dy))

        def body_x(gx, _):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx.astype(jnp.float32) - dx))
            xs = x_ref[0, pl.ds(rb * BR + gy + 10, BR), pl.ds(gx + 10, W), :]
            tap[:] += (wy * wx)[..., None] * xs.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(xlo, xhi + 1, body_x, 0)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body_y, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# 5: k4 + reshape to (BR*W, C) + MXU matmul into acc
def k5(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    k4(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc)
    t = tap[:] * mask_ref[0, 3][..., None]
    acc[:] = jax.lax.dot_general(
        t.reshape(BR * W, C).astype(jnp.bfloat16), w_ref[3],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = acc[:].reshape(BR, W, O).astype(out_ref.dtype)


# 6: the real kernel body (9 taps) at small shape
def k6(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc):
    from centerfusiondetect3d_tpu.ops.pallas_dcn import _dcn_shift_kernel

    functools.partial(
        _dcn_shift_kernel, br=BR, w=W, c=C, o=O, pad=10, r=8.0
    )(off_ref, mask_ref, x_ref, w_ref, out_ref, tap, acc)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, kern in [("k1_4d_dyn_slice", k1), ("k2_field_slice", k2),
                       ("k3_dyn_fori_1d", k3), ("k4_nested_fori", k4),
                       ("k5_matmul_reshape", k5), ("k6_full_kernel", k6)]:
        run(name, functools.partial(call, kern))
    print("SUMMARY:", RESULTS, flush=True)
