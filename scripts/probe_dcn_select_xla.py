"""Probe: pure-XLA 4-corner select DCN vs the shifted-window hat sum.

Same idea as the Pallas select kernel (scripts/probe_dcn_select.py) but as
plain jnp under jit: the bilinear tent is nonzero at exactly the 2x2
integers straddling the sample, so instead of summing 16 hat-weighted
static windows per tap (deform_conv2d_shift), select the 4 straddling
corners with 3-way ``jnp.where`` chains over static slices and combine with
the bilinear weights. Forward does ~32 wide VPU ops/tap vs ~47; backward
avoids differentiating 16 tent products per tap (the unfrozen train step is
bounded by the shift-DCN backward, ~375 ms of its 517 ms at bs8).

Gradients are mathematically identical to bilinear sampling: d/d ty =
(V10-V00)(1-ax) + (V11-V01)ax (floor is piecewise-constant), the same
value the tent-derivative sum produces away from kinks.

Usage: python scripts/probe_dcn_select_xla.py [--interp] [--shape B,H,W,C]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _st_clip(v, lo, hi):
    return v + jax.lax.stop_gradient(jnp.clip(v, lo, hi) - v)


def deform_conv2d_select(x, offset, mask, weight, bias=None, *,
                         max_offset: float = 1.0):
    """4-corner select DCNv2 (R=1), NHWC, torchvision layouts."""
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3)
    r = float(max_offset)
    assert r == 1.0, "select probe is specialized to R=1"
    pad = 3
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    out = None
    for k in range(9):
        i, j = divmod(k, 3)
        ty = _st_clip(offset[..., 2 * k:2 * k + 1], -r, r) + (i - 1)
        tx = _st_clip(offset[..., 2 * k + 1:2 * k + 2], -r, r) + (j - 1)
        fy = jnp.floor(jax.lax.stop_gradient(ty))
        fx = jnp.floor(jax.lax.stop_gradient(tx))
        ay = (ty - fy).astype(dtype)
        ax = (tx - fx).astype(dtype)

        def win(gy, gx):
            rows = jax.lax.slice_in_dim(xp, pad + gy, pad + gy + h, axis=1)
            return jax.lax.slice_in_dim(rows, pad + gx, pad + gx + w, axis=2)

        ylo, yhi = {}, {}
        for gx in range(j - 2, j + 2):
            v = win(i - 2, gx)
            v = jnp.where(fy == (i - 1), win(i - 1, gx), v)
            ylo[gx] = jnp.where(fy == float(i), win(i, gx), v)
            v2 = win(i - 1, gx)
            v2 = jnp.where(fy == (i - 1), win(i, gx), v2)
            yhi[gx] = jnp.where(fy == float(i), win(i + 1, gx), v2)

        def selx(tbl, plus):
            v = tbl[j - 2 + plus]
            v = jnp.where(fx == (j - 1), tbl[j - 1 + plus], v)
            return jnp.where(fx == float(j), tbl[j + plus], v)

        v00, v01 = selx(ylo, 0), selx(ylo, 1)
        v10, v11 = selx(yhi, 0), selx(yhi, 1)
        tap = ((1 - ay) * ((1 - ax) * v00 + ax * v01)
               + ay * ((1 - ax) * v10 + ax * v11))
        tap = tap * mask[..., k:k + 1].astype(dtype)
        term = jax.lax.dot_general(
            tap, weight[i, j].astype(dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias
    return out.astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interp", action="store_true", help="CPU numerics only")
    ap.add_argument("--shape", default="6,112,200,64")
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

    # numerics (f32)
    ref = np.asarray(deform_conv2d_shift(x, offset, mask, weight,
                                         max_offset=1.0))
    got = np.asarray(deform_conv2d_select(x, offset, mask, weight,
                                          max_offset=1.0))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"[select-xla] fwd rel_err={err:.2e}")

    # gradient parity (small shape, f32); offsets kept strictly inside the
    # clamp window — AT the ±R boundary the two formulations use different
    # subgradient conventions (tent-max tie-split vs one-sided
    # floor-bilinear; the torch oracle uses the latter)
    xs = x[:1, :16, :24, :8]
    offs = offset[:1, :16, :24] * 0.45
    ms = mask[:1, :16, :24]
    ws = weight[:, :, :8, :8]

    def loss(fn, x_, o_, m_, w_):
        return jnp.sum(fn(x_, o_, m_, w_, max_offset=1.0) ** 2)

    ga = jax.grad(functools.partial(loss, deform_conv2d_shift),
                  argnums=(0, 1, 2, 3))(xs, offs, ms, ws)
    gb = jax.grad(functools.partial(loss, deform_conv2d_select),
                  argnums=(0, 1, 2, 3))(xs, offs, ms, ws)
    for name, a_, b_ in zip(("dx", "doff", "dmask", "dw"), ga, gb):
        e = np.abs(np.asarray(a_) - np.asarray(b_)).max() / (
            np.abs(np.asarray(a_)).max() + 1e-9)
        print(f"[select-xla] grad {name} rel_err={e:.2e}")

    if args.interp:
        return

    # timing, bf16 fwd and f32 fwd+bwd, scalar consumer
    xb = x.astype(jnp.bfloat16)
    wb = weight.astype(jnp.bfloat16)
    for name, fn in (("shift", deform_conv2d_shift),
                     ("select", deform_conv2d_select)):
        red = jax.jit(lambda x_, o_, m_, w_, fn=fn: jnp.sum(
            fn(x_, o_, m_, w_, max_offset=1.0).astype(jnp.float32)))
        np.asarray(red(xb, offset, mask, wb))
        t0 = time.perf_counter()
        for _ in range(50):
            r_ = red(xb, offset, mask, wb)
        np.asarray(r_)
        print(f"[{name}] fwd {(time.perf_counter() - t0) / 50 * 1e3:.2f} ms")

        gr = jax.jit(jax.grad(
            lambda x_, o_, m_, w_, fn=fn: jnp.sum(
                fn(x_, o_, m_, w_, max_offset=1.0).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3)))
        np.asarray(gr(x, offset, mask, weight)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            g_ = gr(x, offset, mask, weight)
        np.asarray(g_[0][0, 0, 0, 0])
        print(f"[{name}] fwd+bwd {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
