"""Second-stage bisect: what inside k4 (nested dynamic fori) kills Mosaic.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dcn_bisect2.py
"""

from __future__ import annotations

import functools

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
        print(f"[bisect2] {name}: PASS", flush=True)
    except Exception as e:
        RESULTS[name] = f"FAIL {type(e).__name__}"
        print(f"[bisect2] {name}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def call(kernel):
    x = jnp.ones((2, HP, WP, C), jnp.bfloat16)
    off = jnp.zeros((2, 18, 2 * BR, W), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(2, 2),
        in_specs=[
            pl.BlockSpec((1, 18, BR, W), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, HP, WP, C), lambda bi, ri: (bi, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BR, W, O), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 2 * BR, W, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BR, W, C), jnp.float32)],
    )(off, x)
    return np.asarray(out)


def bounds(off_ref):
    dy = jnp.clip(off_ref[0, 4], -8.0, 8.0)
    dx = jnp.clip(off_ref[0, 5], -8.0, 8.0)
    ylo = jnp.floor(jnp.min(dy)).astype(jnp.int32)
    yhi = jnp.floor(jnp.max(dy)).astype(jnp.int32) + 1
    xlo = jnp.floor(jnp.min(dx)).astype(jnp.int32)
    xhi = jnp.floor(jnp.max(dx)).astype(jnp.int32) + 1
    return dy, dx, ylo, yhi, xlo, xhi


# a: nested dynamic fori, trivial body (no slice, no weights)
def ka(off_ref, x_ref, out_ref, tap):
    _, _, ylo, yhi, xlo, xhi = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    def body_y(gy, _):
        def body_x(gx, _):
            tap[:] += 1.0
            return 0
        jax.lax.fori_loop(xlo, xhi + 1, body_x, 0)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body_y, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# b: single dynamic fori + hat weights + slice (k3 plus weights)
def kb(off_ref, x_ref, out_ref, tap):
    dy, dx, ylo, yhi, _, _ = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    def body(gy, _):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy.astype(jnp.float32) - dy))
        xs = x_ref[0, pl.ds(gy + 10, BR), pl.ds(10, W), :]
        tap[:] += wy[..., None] * xs.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# c: single fori with program-id-dependent dynamic slice start
def kc(off_ref, x_ref, out_ref, tap):
    rb = pl.program_id(1)
    _, _, ylo, yhi, _, _ = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    def body(gy, _):
        xs = x_ref[0, pl.ds(rb * BR + gy + 10, BR), pl.ds(10, W), :]
        tap[:] += xs.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# d: LINEARIZED single fori over the (gy, gx) box via div/mod
def kd(off_ref, x_ref, out_ref, tap):
    rb = pl.program_id(1)
    dy, dx, ylo, yhi, xlo, xhi = bounds(off_ref)
    ny = yhi - ylo + 1
    nx = xhi - xlo + 1
    tap[:] = jnp.zeros_like(tap)

    def body(i, _):
        gy = ylo + i // nx
        gx = xlo + i % nx
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy.astype(jnp.float32) - dy))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx.astype(jnp.float32) - dx))
        xs = x_ref[0, pl.ds(rb * BR + gy + 10, BR), pl.ds(gx + 10, W), :]
        tap[:] += (wy * wx)[..., None] * xs.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, ny * nx, body, 0)
    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


# e: static outer python loop + @pl.when + inner dynamic fori
def ke(off_ref, x_ref, out_ref, tap):
    rb = pl.program_id(1)
    dy, dx, ylo, yhi, xlo, xhi = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    for gy in range(-2, 3):
        @pl.when((gy >= ylo) & (gy <= yhi))
        def _(gy=gy):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(float(gy) - dy))

            def body_x(gx, _):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx.astype(jnp.float32) - dx))
                xs = x_ref[0, pl.ds(rb * BR + gy + 10, BR), pl.ds(gx + 10, W), :]
                tap[:] += (wy * wx)[..., None] * xs.astype(jnp.float32)
                return 0

            jax.lax.fori_loop(xlo, xhi + 1, body_x, 0)

    out_ref[0] = jnp.broadcast_to(tap[:, :, :1], (BR, W, O)).astype(out_ref.dtype)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, k in [("ka_nested_trivial", ka), ("kb_hat_slice_1d", kb),
                    ("kc_pid_slice_1d", kc), ("kd_linearized", kd),
                    ("ke_static_when_inner_fori", ke)]:
        run(name, functools.partial(call, k))
    print("SUMMARY:", RESULTS, flush=True)
