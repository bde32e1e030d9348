"""Probe the image's Mosaic toolchain for kernel constructs (run on TPU).

Each probe compiles+runs a tiny Pallas kernel exercising one construct the
shifted-window DCN kernel needs. Prints PASS/FAIL per probe. Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mosaic.py
"""

from __future__ import annotations

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

RESULTS = {}


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS[name] = "PASS"
                print(f"[probe] {name}: PASS", flush=True)
            except Exception as e:
                RESULTS[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
                print(f"[probe] {name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
                traceback.print_exc(limit=3)
        return run
    return deco


@probe("dyn_start_sublane_slice")
def p1():
    # dynamic-start slice on sublane-ish dims of a 3D VMEM ref
    def kern(s_ref, x_ref, o_ref):
        g = s_ref[0]
        o_ref[:] = x_ref[pl.ds(g, 8), pl.ds(g + 1, 16), :]

    x = jnp.arange(24 * 32 * 128, dtype=jnp.float32).reshape(24, 32, 128)
    s = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((24, 32, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 16, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
    )(s, x)
    ref = np.asarray(x)[3:11, 4:20, :]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("dyn_bound_fori_loop")
def p2():
    # fori_loop with traced (runtime) bounds accumulating into VMEM scratch
    def kern(s_ref, x_ref, o_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        lo, hi = s_ref[0], s_ref[1]

        def body(i, _):
            acc[:] += x_ref[pl.ds(i, 8), :]
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)
        o_ref[:] = acc[:]

    x = jnp.ones((32, 128), jnp.float32)
    s = jnp.array([2, 6], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((32, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(s, x)
    np.testing.assert_allclose(np.asarray(out), 4.0 * np.ones((8, 128)))


@probe("scalar_reduce_plwhen")
def p3():
    # full reduction of a VMEM block to a scalar driving @pl.when
    def kern(x_ref, o_ref):
        m = jnp.max(x_ref[:])
        lo = jnp.min(x_ref[:]).astype(jnp.int32)

        o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(m > 0.5)
        def _():
            o_ref[:] = x_ref[:] + jnp.float32(1.0) * lo.astype(jnp.float32)

    x = jnp.ones((16, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((16, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.ones((16, 128)))


@probe("bf16_slice_mac_matmul")
def p4():
    # bf16 shifted slice + broadcast-weight MAC + (rows,C)@(C,O) matmul
    def kern(x_ref, w_ref, o_ref):
        xs = x_ref[pl.ds(2, 8), pl.ds(1, 16), :]  # (8,16,64) bf16
        wfield = (xs[..., 0] * 0 + 2).astype(jnp.bfloat16)  # (8,16)
        tap = xs * wfield[..., None]
        o_ref[:] = jax.lax.dot_general(
            tap.reshape(8 * 16, 64), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(8, 16, 128).astype(o_ref.dtype)

    x = jnp.ones((16, 32, 64), jnp.bfloat16)
    w = jnp.ones((64, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((16, 32, 64), lambda i: (0, 0, 0)),
            pl.BlockSpec((64, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 16, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
    )(x, w)
    np.testing.assert_allclose(np.asarray(out), 256.0 * np.ones((8, 16, 128)))


@probe("old_gather_kernel_interpret_false")
def p5():
    from centerfusiondetect3d_tpu.ops.pallas_dcn import deform_conv2d_pallas

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 24, 64).astype(np.float32))
    off = jnp.asarray(0.3 * rng.randn(1, 16, 24, 18).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, 16, 24, 9).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, 64, 64).astype(np.float32))
    out = deform_conv2d_pallas(x, off, mask, w, interpret=False)
    from centerfusiondetect3d_tpu.ops.dcn import deform_conv2d

    ref = deform_conv2d(x, off, mask, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, fn in list(globals().items()):
        if name.startswith("p") and name[1:].isdigit():
            fn()
    print("SUMMARY:", RESULTS)
