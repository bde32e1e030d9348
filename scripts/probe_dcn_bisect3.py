"""Third-stage bisect: workarounds for dynamic sublane-start slices in loops.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dcn_bisect3.py
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
        got, want = fn()
        ok = np.allclose(got, want, atol=1e-3)
        RESULTS[name] = "PASS" if ok else "WRONG"
        print(f"[bisect3] {name}: {'PASS' if ok else 'WRONG RESULT'}",
              flush=True)
    except Exception as e:
        RESULTS[name] = f"FAIL {type(e).__name__}"
        print(f"[bisect3] {name}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def call(kernel):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, HP, WP, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    # offsets chosen so xlo..xhi spans [-2, 1]
    off = jnp.asarray(
        (rng.rand(2, 18, 2 * BR, W) * 3 - 1.5).astype(np.float32)
    )
    out = pl.pallas_call(
        kernel,
        grid=(2, 2),
        in_specs=[
            pl.BlockSpec((1, 18, BR, W), lambda bi, ri: (bi, 0, ri, 0)),
            pl.BlockSpec((1, HP, WP, C), lambda bi, ri: (bi, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BR, W, C), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 2 * BR, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BR, W, C), jnp.float32)],
    )(off, x)
    return np.asarray(out), _oracle(np.asarray(x, np.float32), np.asarray(off))


def _oracle(x, off):
    """Bilinear sample x at (p + d) for the dy=off[4], dx=off[5] field."""
    b = x.shape[0]
    outs = np.zeros((b, 2 * BR, W, C), np.float32)
    for bi in range(b):
        for r in range(2 * BR):
            for cl in range(W):
                dy = np.clip(off[bi, 4, r, cl], -8, 8)
                dx = np.clip(off[bi, 5, r, cl], -8, 8)
                py, px = r + dy + 10, cl + dx + 10
                y0, x0 = int(np.floor(py)), int(np.floor(px))
                fy, fx = py - y0, px - x0
                v = (
                    x[bi, y0, x0] * (1 - fy) * (1 - fx)
                    + x[bi, y0, x0 + 1] * (1 - fy) * fx
                    + x[bi, y0 + 1, x0] * fy * (1 - fx)
                    + x[bi, y0 + 1, x0 + 1] * fy * fx
                )
                outs[bi, r, cl] = v
    return outs


def bounds(off_ref):
    dy = jnp.clip(off_ref[0, 4], -8.0, 8.0)
    dx = jnp.clip(off_ref[0, 5], -8.0, 8.0)
    ylo = jnp.floor(jnp.min(dy)).astype(jnp.int32)
    yhi = jnp.floor(jnp.max(dy)).astype(jnp.int32) + 1
    xlo = jnp.floor(jnp.min(dx)).astype(jnp.int32)
    xhi = jnp.floor(jnp.max(dx)).astype(jnp.int32) + 1
    return dy, dx, ylo, yhi, xlo, xhi


GX_RANGE = range(-9, 11)  # [-(R+1), R+2] for R=8


# f: dynamic gy fori + static-unrolled gx with @pl.when predication
def kf(off_ref, x_ref, out_ref, tap):
    rb = pl.program_id(1)
    dy, dx, ylo, yhi, xlo, xhi = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    def body_y(gy, _):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy.astype(jnp.float32) - dy))
        for gx in GX_RANGE:
            @pl.when((gx >= xlo) & (gx <= xhi))
            def _(gx=gx):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(float(gx) - dx))
                xs = x_ref[0, pl.ds(rb * BR + gy + 10, BR), gx + 10:gx + 10 + W, :]
                tap[:] += (wy * wx)[..., None] * xs.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body_y, 0)
    out_ref[0] = tap[:].astype(out_ref.dtype)


# g: dynamic gy fori; columns via full-width row load + dynamic roll
def kg(off_ref, x_ref, out_ref, tap):
    rb = pl.program_id(1)
    dy, dx, ylo, yhi, xlo, xhi = bounds(off_ref)
    tap[:] = jnp.zeros_like(tap)

    def body_y(gy, _):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy.astype(jnp.float32) - dy))
        xs_wide = x_ref[0, pl.ds(rb * BR + gy + 10, BR), :, :]  # (BR, WP, C)

        def body_x(gx, _):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx.astype(jnp.float32) - dx))
            rolled = pltpu.roll(xs_wide, -gx, 1)  # shift columns by gx
            xs = rolled[:, 10:10 + W, :]
            tap[:] += (wy * wx)[..., None] * xs.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(xlo, xhi + 1, body_x, 0)
        return 0

    jax.lax.fori_loop(ylo, yhi + 1, body_y, 0)
    out_ref[0] = tap[:].astype(out_ref.dtype)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, k in [("kf_static_gx_when", kf), ("kg_dynamic_roll", kg)]:
        run(name, functools.partial(call, k))
    print("SUMMARY:", RESULTS, flush=True)
