"""Deformable convolution v2 (modulated) for TPU.

Replaces the reference's one real CUDA dependency,
``torchvision.ops.deform_conv2d`` used by every DLA aggregation node
(/root/reference/src/lib/model/networks/dla.py:385-472), with an XLA-native
formulation: per-tap bilinear gathers + one fused (9*C, O) matmul that lands
on the MXU. Offsets follow the torchvision channel convention —
``offset[..., 2k] = dy_k``, ``offset[..., 2k+1] = dx_k`` for tap ``k`` in
row-major kernel order — so reference checkpoints import bit-compatibly.

The gather step is O(9 * B*H*W*C) HBM traffic; a Pallas kernel that keeps the
input tile in VMEM across the 9 taps is the planned fast path (see
ops/pallas/dcn.py), with this implementation as the correctness baseline and
CPU/interpret fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(x_flat, py, px, height, width):
    """Bilinear sample of (B, H*W, C) values at float coords (B, HW).

    Out-of-range samples contribute zero (zero padding semantics).
    Returns (B, HW, C).
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    out = None
    for yi, wy in ((y0, wy0), (y0 + 1.0, wy1)):
        for xi, wx in ((x0, wx0), (x0 + 1.0, wx1)):
            valid = (yi >= 0) & (yi < height) & (xi >= 0) & (xi < width)
            yc = jnp.clip(yi, 0, height - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, width - 1).astype(jnp.int32)
            idx = yc * width + xc  # (B, HW)
            vals = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
            w = jnp.where(valid, wy * wx, 0.0)
            term = vals * w[..., None]
            out = term if out is None else out + term
    return out


def deform_conv2d(x, offset, mask, weight, bias=None):
    """Modulated 3x3 stride-1 deformable convolution (DCNv2), NHWC.

    Args:
        x: (B, H, W, C) input features.
        offset: (B, H, W, 18) interleaved (dy, dx) per tap, torchvision layout.
        mask: (B, H, W, 9) modulation scalars (already sigmoided).
        weight: (3, 3, C, O) HWIO kernel.
        bias: optional (O,).

    Returns:
        (B, H, W, O).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3), "DLA nodes only use 3x3 DCN"
    hw = h * w
    x_flat = x.reshape(b, hw, c)

    base_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw)

    offset = offset.reshape(b, hw, 2 * kh * kw)
    mask = mask.reshape(b, hw, kh * kw)

    samples = []
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = base_y + (i - 1) + offset[..., 2 * k]
        px = base_x + (j - 1) + offset[..., 2 * k + 1]
        s = _bilinear_gather(x_flat, py, px, h, w)  # (B, HW, C)
        samples.append(s * mask[..., k : k + 1])

    stacked = jnp.concatenate(samples, axis=-1)  # (B, HW, 9*C)
    w_mat = weight.transpose(0, 1, 2, 3).reshape(kh * kw * c, o)
    out = jax.lax.dot_general(
        stacked,
        w_mat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.reshape(b, h, w, o).astype(x.dtype)
