"""Deformable convolution v2 (modulated) for TPU.

Replaces the reference's one real CUDA dependency,
``torchvision.ops.deform_conv2d`` used by every DLA aggregation node
(/root/reference/src/lib/model/networks/dla.py:385-472), with an XLA-native
formulation tuned for the TPU gather path: the input is padded by the 3x3
ring and flattened to a single (B*Hp*Wp, C) row table, every bilinear corner
of every tap becomes one axis-0 ``jnp.take`` (rows are lane-contiguous, which
XLA lowers ~6x faster on TPU than the equivalent per-batch
``take_along_axis``), and the 9 masked taps contract with the kernel as one
(9C, O) MXU matmul. Offsets follow the torchvision channel convention -
``offset[..., 2k] = dy_k``, ``offset[..., 2k+1] = dx_k`` in row-major tap
order - so reference checkpoints import bit-compatibly. Zero-padding
sampling semantics (out-of-image taps contribute zero) are preserved via the
pad ring + a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# probe hook: insert an optimization_barrier after each shift-DCN tap
# accumulation (scripts/probe_batch_cliff.py measures whether bounding the
# accumulation live range defeats the bs>6 fusion cliff). Ships OFF.
TAP_BARRIERS = False


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
    hp, wp = h + 2, w + 2  # one-pixel zero ring

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(b * hp * wp, c)
    batch_off = (jnp.arange(b, dtype=jnp.int32) * (hp * wp))[:, None]

    base_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw)
    offset = offset.reshape(b, hw, 2 * kh * kw)
    mask = mask.reshape(b, hw, kh * kw).astype(x.dtype)

    out = None
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        # +1: coordinates in the padded frame
        py = base_y + (i - 1) + offset[..., 2 * k] + 1.0
        px = base_x + (j - 1) + offset[..., 2 * k + 1] + 1.0
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy1 = (py - y0)[..., None].astype(x.dtype)
        wx1 = (px - x0)[..., None].astype(x.dtype)

        acc = None
        for dy in (0.0, 1.0):
            for dx in (0.0, 1.0):
                yy = y0 + dy
                xx = x0 + dx
                valid = (yy >= 0) & (yy < hp) & (xx >= 0) & (xx < wp)
                idx = (
                    batch_off
                    + jnp.clip(yy, 0, hp - 1).astype(jnp.int32) * wp
                    + jnp.clip(xx, 0, wp - 1).astype(jnp.int32)
                )
                vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(b, hw, c)
                wgt = (wy1 if dy else 1 - wy1) * (wx1 if dx else 1 - wx1)
                wgt = jnp.where(valid[..., None], wgt, 0)
                term = vals * wgt
                acc = term if acc is None else acc + term
        tap = acc * mask[..., k : k + 1]

        # accumulate per-tap (C, O) matmuls instead of materializing the
        # (B, HW, 9C) concat - same MXU FLOPs, 9x smaller intermediate, and
        # batch-24 memory scaling stays linear
        term = jax.lax.dot_general(
            tap,
            weight[i, j].astype(x.dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        out = term if out is None else out + term

    if bias is not None:
        out = out + bias
    return out.reshape(b, h, w, o).astype(x.dtype)


def _exact_rows(x, offset, mask, weight, bias, idx):
    """Exact DCNv2 output for ``m`` selected output pixels.

    ``idx``: (m,) flat indices into (B*H*W). Returns (m, O). Same bilinear
    zero-padding semantics as ``deform_conv2d`` but gathers only the selected
    rows — 36 gathers of (m, C) instead of (B*H*W, C).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    hp, wp = h + 2, w + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(b * hp * wp, c)

    bi = idx // (h * w)
    yi = (idx % (h * w)) // w
    xi = idx % w
    off_m = offset.reshape(b * h * w, 18)[idx]  # (m, 18)
    msk_m = mask.reshape(b * h * w, 9)[idx].astype(x.dtype)  # (m, 9)
    base_off = bi * (hp * wp)

    out = bias[None, :].astype(jnp.float32) if bias is not None else 0.0
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = yi.astype(jnp.float32) + (i - 1) + off_m[:, 2 * k] + 1.0
        px = xi.astype(jnp.float32) + (j - 1) + off_m[:, 2 * k + 1] + 1.0
        y0, x0 = jnp.floor(py), jnp.floor(px)
        wy1 = (py - y0)[:, None].astype(x.dtype)
        wx1 = (px - x0)[:, None].astype(x.dtype)
        acc = None
        for dy in (0.0, 1.0):
            for dx in (0.0, 1.0):
                yy, xx = y0 + dy, x0 + dx
                valid = (yy >= 0) & (yy < hp) & (xx >= 0) & (xx < wp)
                rows = (
                    base_off
                    + jnp.clip(yy, 0, hp - 1).astype(jnp.int32) * wp
                    + jnp.clip(xx, 0, wp - 1).astype(jnp.int32)
                )
                vals = jnp.take(flat, rows, axis=0)  # (m, C)
                wgt = (wy1 if dy else 1 - wy1) * (wx1 if dx else 1 - wx1)
                wgt = jnp.where(valid[:, None], wgt, 0)
                term = vals * wgt
                acc = term if acc is None else acc + term
        tap = acc * msk_m[:, k : k + 1]
        out = out + jax.lax.dot_general(
            tap, weight[i, j].astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
    return out


def deform_conv2d_shift_hybrid(x, offset, mask, weight, bias=None, *,
                               max_offset: float = 1.0,
                               correct_frac: float = 0.03,
                               approx: bool = True,
                               base: str = "shift",
                               tight: bool = False):
    """Shift-window DCN with exact sparse correction of clamped pixels.

    The shift fast path is exact whenever every offset is within
    ``±max_offset``; its only error is at clamped pixels. This hybrid keeps
    the gather-free bulk path and re-computes the top ``correct_frac`` of
    output pixels by largest |offset| with the exact 36-gather formulation,
    scattering them back — so a trained model whose offsets occasionally
    exceed R pays ~nothing instead of a silent accuracy loss. Residual error
    only remains if MORE than ``correct_frac`` of pixels overflow R (then
    raise DCN_MAX_OFFSET / DCN_CORRECT_FRAC; the checkpoint loader logs
    trained offset-weight magnitudes).

    ``approx`` selects ``jax.lax.approx_max_k`` for the candidate selection
    (faster on TPU; recall ~0.95 — missed pixels stay at shift accuracy).
    """
    if base == "select":
        import functools

        base_fn = functools.partial(deform_conv2d_select, tight=tight)
    else:
        base_fn = deform_conv2d_shift
    base = base_fn(x, offset, mask, weight, bias, max_offset=max_offset)
    b, h, w, c = x.shape
    o = weight.shape[-1]
    n = b * h * w
    m = max(1, min(n, int(round(n * float(correct_frac)))))
    overflow = jnp.max(jnp.abs(offset.reshape(n, 18)), axis=-1)
    if approx:
        vals, idx = jax.lax.approx_max_k(overflow, m)
    else:
        vals, idx = jax.lax.top_k(overflow, m)
    corrected = _exact_rows(x, offset, mask, weight, bias, idx)  # (m, O)
    flat_out = base.reshape(n, o)
    need = (vals > float(max_offset))[:, None]
    patch = jnp.where(need, corrected.astype(flat_out.dtype), flat_out[idx])
    return flat_out.at[idx].set(patch).reshape(b, h, w, o)


def _hat(v):
    """Bilinear tent: nonzero exactly for the two integers straddling v."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(v))


def deform_conv2d_select(x, offset, mask, weight, bias=None, *,
                         max_offset: float = 1.0, remat: bool = True,
                         tight: bool = False):
    """Modulated 3x3 stride-1 DCNv2 via 4-corner selects — no gathers.

    ``remat=True`` (default) wraps the op in ``jax.checkpoint`` so the
    backward recomputes the corner-select tables instead of saving them:
    without it the select autodiff residuals OOM HBM at bs8 448x800
    (15.78/15.75 GB measured), and the recompute is one cheap forward.

    Same contract, clamp semantics (straight-through ±``max_offset``), and
    static-slice structure as :func:`deform_conv2d_shift`, but exploits that
    the bilinear tent is nonzero at exactly the 2x2 integers straddling each
    sample: instead of summing ``(2R+1)^2`` hat-weighted windows per tap, it
    resolves the 4 straddling corners with ``(2R+1)``-way predicated
    ``jnp.where`` chains over the same static windows and combines them with
    the bilinear weights — ~2x fewer wide VPU ops at every R, and the
    backward differentiates 4 corner terms instead of every tent product.

    Gradient convention: d/d(offset) is the one-sided floor-bilinear
    derivative ``(V10-V00)(1-ax) + (V11-V01)ax`` — identical to the tent
    derivative at non-integer sampling points and matching torch's
    ``deform_conv2d`` convention AT integer points (where the tent-max
    formulation tie-splits 0.5). ``max_offset`` must be a positive integer
    (the select chains are sized ``2R+1``).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3), "DLA nodes only use 3x3 DCN"
    r = int(max_offset)
    assert r >= 1 and float(r) == float(max_offset), (
        "deform_conv2d_select needs integer max_offset >= 1")
    if remat:
        import functools

        inner = functools.partial(deform_conv2d_select,
                                  max_offset=max_offset, remat=False,
                                  tight=tight)
        return jax.checkpoint(inner)(x, offset, mask, weight, bias)
    rf = float(r)
    pad = r + 2  # tap ring (1) + offset reach + bilinear ceil
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    out = None
    for k in range(9):
        i, j = divmod(k, 3)
        ty = _st_clip(offset[..., 2 * k:2 * k + 1], -rf, rf) + (i - 1)
        tx = _st_clip(offset[..., 2 * k + 1:2 * k + 2], -rf, rf) + (j - 1)
        fy = jnp.floor(jax.lax.stop_gradient(ty))
        fx = jnp.floor(jax.lax.stop_gradient(tx))
        ay = (ty - fy).astype(dtype)
        ax = (tx - fx).astype(dtype)

        def win(gy, gx):
            rows = jax.lax.slice_in_dim(xp, pad + gy, pad + gy + h, axis=1)
            return jax.lax.slice_in_dim(rows, pad + gx, pad + gx + w, axis=2)

        # stage 1: resolve y per static column shift; fy in
        # [i-1-r, i-1+r] (fy = i-1+r only when ty sits exactly at +r).
        # NOTE the +1 corner windows at the clamp boundary have zero
        # bilinear WEIGHT but a nonzero one-sided DERIVATIVE — they are what
        # keeps d/d(offset) = V_right - V_left at exactly-clamped points,
        # the STE escape path. ``tight=True`` caps them in-range —
        # (2r+1)^2 windows per tap instead of (2r+2)^2, value-identical
        # since the capped entries only ever carry weight 0 — and is
        # therefore FORWARD-ONLY: under a gradient it zeroes d/d(offset) at
        # exactly-clamped points
        # (test_select_offset_gradients_nonzero_outside_clamp). The
        # DeformConvNode passes tight = not train.
        cap = (i - 1 + r) if tight else (i + r)
        ylo, yhi = {}, {}
        for gx in range(j - 1 - r, (j + r) if tight else (j + r + 1)):
            v = win(i - 1 - r, gx)
            v2 = win(i - r, gx)
            for fyv in range(i - r, i + r):
                v = jnp.where(fy == float(fyv), win(fyv, gx), v)
                v2 = jnp.where(fy == float(fyv),
                               win(min(fyv + 1, cap), gx), v2)
            ylo[gx], yhi[gx] = v, v2

        # stage 2: resolve x; fx in [j-1-r, j-1+r]
        xcap = (j - 1 + r) if tight else (j + r)
        def selx(tbl, plus):
            v = tbl[min(j - 1 - r + plus, xcap)]
            for fxv in range(j - r, j + r):
                v = jnp.where(fx == float(fxv), tbl[min(fxv + plus, xcap)], v)
            return v

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


def _st_clip(v, lo, hi):
    """Clip with a straight-through gradient.

    Forward: jnp.clip. Backward: identity. A hard clip has zero gradient
    outside [lo, hi], so a TPU-trained model could never learn offsets past
    the shift window even when the loss wants them there (the reference's
    deform_conv2d never clamps, dla.py:461-472); the straight-through
    estimator keeps the forward approximation while letting gradient signal
    push offsets back in range (or tell the user to raise DCN_MAX_OFFSET —
    checkpoint loading logs when trained offsets exceed the window).
    """
    return v + jax.lax.stop_gradient(jnp.clip(v, lo, hi) - v)


def deform_conv2d_shift(x, offset, mask, weight, bias=None, *,
                        max_offset: float = 2.0):
    """Modulated 3x3 stride-1 DCNv2 via static shifted windows — no gathers.

    The TPU fast path. XLA lowers gathers at ~40 GB/s effective on TPU
    (measured: ``deform_conv2d`` spends 10.5 ms on the 6x112x200x64 DLA
    layer); this formulation replaces all 36 bilinear gathers with a
    *static* sum over integer shifts of the padded feature map,

        sample(p + t_k + d_k(p)) = sum_g hat(g_y - t_ky - dy_k(p))
                                       * hat(g_x - t_kx - dx_k(p)) * x[p + g]

    where ``g`` ranges over the static box ``t_k + [-R-? .. R+1]^2`` and
    ``hat`` is the bilinear tent (exact: only the two straddling integers
    get nonzero weight). Every term is a statically-shifted slice fused into
    a masked FMA on the VPU; the 9 modulated taps then contract with the
    kernel on the MXU exactly like ``deform_conv2d``.

    Offsets are clamped to ``±max_offset`` output-stride pixels (the
    reference's torchvision op does not clamp — semantics are exact whenever
    every offset is in range; trained DLA node offsets are small). Cost
    scales as ``9 * (2ceil(R)+1)^2`` fused multiply-adds over (B, H, W, C),
    so keep R small (R=1 -> 81 terms, R=2 -> 225). Fully differentiable (plain jnp ops;
    the clamp is straight-through, so offset gradients stay nonzero even
    outside ±R), chains safely under jit on any backend. Same torchvision layouts as ``deform_conv2d``
    (reference dla.py:461-472).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3), "DLA nodes only use 3x3 DCN"
    import math

    r = float(max_offset)
    # integer shifts straddling clamped positions t in [i-1-r, i-1+r]:
    # lo = i-1-ceil(r), hi = i-1+floor(r)+1; fractional r shrinks the
    # window (r=0.5 -> 3x3=9 terms/tap vs 4x4=16 at r=1)
    # integer shifts straddling clamped positions t in [i-1-r, i-1+r]:
    # lo = i-1-ceil(r), hi = i-1+ceil(r). The upper straddle of the extreme
    # t = i-1+r is ceil(i-1+r) = i-1+ceil(r) for EVERY r — at integer r the
    # boundary t lands exactly on that corner with bilinear weight 1 and
    # the next corner's weight identically 0, so the previous floor(r)+1
    # bound carried a whole zero-weight row+column per tap (R=1: 16 terms
    # where 9 suffice — measured 524.4 -> 343 ms/step bs8 unfrozen on the
    # v5e, bit-identical forward). Gradient note: at exactly-clamped
    # offsets this path's d/d(offset) is NOT torch's one-sided
    # floor-bilinear convention — the boundary sampling point sits on the
    # tent kinks, where jax gives d|u|/du = 1 at u=0 on the center term
    # plus a 0.5 tie-split on the remaining straddle term, so the measured
    # clamped-point gradient is value-proportional (+1.5*V on a constant
    # field V; the old 16-term window was +3*V). Training-irrelevant in
    # practice: the clamp's STE (_st_clip) already stops offsets at the
    # boundary, and the interior gradient matches torch bilinear exactly
    # (gradient suite). deform_conv2d_select keeps the one-sided
    # floor-bilinear convention where exact torch backward semantics at
    # integer points matter.
    r_lo = r_hi = math.ceil(r)
    pad = r_lo + 2  # tap ring (1) + offset reach + bilinear ceil
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    out = None
    for k in range(9):
        i, j = divmod(k, 3)
        ty = _st_clip(offset[..., 2 * k:2 * k + 1], -r, r) + (i - 1)
        tx = _st_clip(offset[..., 2 * k + 1:2 * k + 2], -r, r) + (j - 1)
        tap = None
        for gy in range(i - 1 - r_lo, i - 1 + r_hi + 1):
            wy = _hat(gy - ty).astype(dtype)  # (B, H, W, 1)
            rows = jax.lax.slice_in_dim(xp, pad + gy, pad + gy + h, axis=1)
            for gx in range(j - 1 - r_lo, j - 1 + r_hi + 1):
                wx = _hat(gx - tx).astype(dtype)
                win = jax.lax.slice_in_dim(rows, pad + gx, pad + gx + w,
                                           axis=2)
                term = (wy * wx) * win
                tap = term if tap is None else tap + term
        tap = tap * mask[..., k:k + 1].astype(dtype)
        # contract directly on the channel axis: reshaping (B,H,W,C) ->
        # (BHW,C) before the dot forces an XLA relayout copy per tap
        # (measured 3.91 vs 4.98 ms/op at the 6x112x200x64 DLA node, and
        # ~15 ms/step of reshape+copy fusions in the model trace)
        term = jax.lax.dot_general(
            tap,
            weight[i, j].astype(dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        out = term if out is None else out + term
        if TAP_BARRIERS:
            # probe hook (scripts/probe_batch_cliff.py): pin the running
            # accumulation after every tap so the scheduler cannot widen
            # the live range across taps — tests whether bounding live
            # ranges defeats the bs>6 fusion cliff. Default OFF.
            out = jax.lax.optimization_barrier(out)

    if bias is not None:
        out = out + bias
    return out.astype(dtype)
