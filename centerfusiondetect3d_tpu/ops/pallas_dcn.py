"""Pallas DCNv2 kernel (experimental).

The designed fast path for the deformable convolution: the padded feature map
stays resident in VMEM across all 9 taps x 4 bilinear corners (it fits - the
largest DLA map is (114, 203, 64) ~ 5.9 MB f32), gathers read VMEM instead of
HBM, and each tap contracts on the MXU, removing the ~30 GB/s effective
ceiling of XLA's HBM row-gather lowering (see ops/dcn.py).

STATUS: this image's Mosaic toolchain cannot compile the gather
(take_along_axis along sublanes / wide lanes crash the remote compiler with
HTTP 500 - probed 2026-08-16, see ROADMAP.md), so the kernel is validated in
interpreter mode and gated behind ``interpret=True`` / future toolchains.
``deform_conv2d_pallas(..., interpret=False)`` is the switch to flip when a
newer Mosaic lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_kernel(x_ref, offset_ref, mask_ref, weight_ref, out_ref, *, h, w, o):
    """One batch image per program: x_ref (Hp*Wp, C) resident in VMEM."""
    hp, wp = h + 2, w + 2
    hw = h * w
    c = x_ref.shape[-1]

    tab = x_ref[0]  # (Hp*Wp, C) in VMEM (leading block dim of 1)
    offsets = offset_ref[0]
    masks = mask_ref[0]
    base_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(hw)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(hw)

    acc_out = jnp.zeros((hw, o), jnp.float32)
    for k in range(9):
        i, j = divmod(k, 3)
        py = base_y + (i - 1) + offsets[:, 2 * k] + 1.0
        px = base_x + (j - 1) + offsets[:, 2 * k + 1] + 1.0
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy1 = (py - y0)[:, None]
        wx1 = (px - x0)[:, None]

        acc = jnp.zeros((hw, c), jnp.float32)
        for dy in (0.0, 1.0):
            for dx in (0.0, 1.0):
                yy = y0 + dy
                xx = x0 + dx
                valid = (yy >= 0) & (yy < hp) & (xx >= 0) & (xx < wp)
                idx = (
                    jnp.clip(yy, 0, hp - 1).astype(jnp.int32) * wp
                    + jnp.clip(xx, 0, wp - 1).astype(jnp.int32)
                )
                vals = jnp.take(tab, idx, axis=0)  # VMEM gather
                wgt = (wy1 if dy else 1 - wy1) * (wx1 if dx else 1 - wx1)
                wgt = jnp.where(valid[:, None], wgt, 0.0)
                acc = acc + vals * wgt
        tap = acc * masks[:, k][:, None]
        acc_out = acc_out + jax.lax.dot_general(
            tap.astype(weight_ref.dtype),
            weight_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc_out.astype(out_ref.dtype)


def deform_conv2d_pallas(x, offset, mask, weight, bias=None, interpret=True):
    """Pallas DCNv2, same contract as ops.dcn.deform_conv2d.

    Args:
        x: (B, H, W, C); offset: (B, H, W, 18); mask: (B, H, W, 9);
        weight: (3, 3, C, O); interpret: run the kernel in interpreter mode
        (required on this image's toolchain - see module docstring).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3)
    hp, wp = h + 2, w + 2
    hw = h * w

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(b, hp * wp, c)
    offset_f = offset.reshape(b, hw, 18)
    mask_f = mask.reshape(b, hw, 9)
    w_taps = weight.reshape(9, c, o)

    kernel = functools.partial(_dcn_kernel, h=h, w=w, o=o)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp * wp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 18), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, o), x.dtype),
        interpret=interpret,
    )(xp, offset_f, mask_f, w_taps)
    out = out.reshape(b, h, w, o)
    if bias is not None:
        out = out + bias
    return out
