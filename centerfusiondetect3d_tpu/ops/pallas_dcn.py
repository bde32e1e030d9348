"""Pallas DCNv2 kernel: gather-free shifted-window formulation.

The TPU fast path for the deformable convolution (the reference's one CUDA
kernel, ``torchvision.ops.deform_conv2d``,
/root/reference/src/lib/model/networks/dla.py:385-472). The obvious
formulation — bilinear *gathers* from a flattened row table (ops/dcn.py) —
is the XLA local optimum but runs at ~30 GB/s effective on TPU, and this
image's Mosaic toolchain cannot compile in-kernel gathers at all. This
kernel removes the gather entirely:

    sample(p + t_k + d_k(p))  ==  sum_g  hat(g_y - t_ky - dy_k(p))
                                       * hat(g_x - t_kx - dx_k(p))
                                       * x[p + g]

where ``g`` ranges over *integer* shifts, ``hat(v) = max(0, 1 - |v|)`` is
the bilinear tent (nonzero for exactly the two integers straddling the
sampling point, so the sum is exact), and ``x[p + g]`` is a statically
shaped *slice* of the padded feature map — a construct Mosaic compiles
happily. Per tap the kernel reduces the shift range to the actual
``[floor(min d), floor(max d) + 1]`` box via scalar min/max reductions, so
the cost adapts to the real offset magnitudes: near-init offsets cost ~25
shifts/tap; the worst case is bounded by clamping offsets to
``[-max_offset, +max_offset]``.

Layout notes (hard-won, see scripts/probe_dcn_bisect*.py):
- row shifts (gy) use a dynamic-bound ``fori_loop`` with dynamic-start
  slices on the outer spatial dim (compiles); column shifts (gx) are a
  static unrolled loop with ``@pl.when`` range predication, because Mosaic
  crashes on dynamic-start slices along the sublane dim inside a loop;
- offsets/masks stay in native NHWC blocks and per-tap fields are taken as
  single-lane slices ``off[..., 2k:2k+1]`` so the hat-weight multiply is a
  free lane-broadcast against the (BR, W, C) slice — a transposed
  ``(18, BR, W)`` layout forces a lane<->sublane relayout on every pass
  (~10x slower).

Semantics vs the reference: exact (zero-padding sampling included) whenever
every offset lies within ``max_offset``; offsets beyond that are clamped
(torchvision does not clamp). Trained DLA DCN offsets are small — choose
``max_offset`` generously (default 8 output-stride pixels) and the paths
agree. The whole feature map stays VMEM-resident across one batch image;
taps contract on the MXU in bf16 with f32 accumulation.

Gradients: ``deform_conv2d_fast`` wraps the kernel in a ``custom_vjp``
whose backward pass is the VJP of the XLA formulation (ops/dcn.py), so the
op is trainable everywhere the slow path is.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dcn import _hat, deform_conv2d as _deform_conv2d_xla


# --------------------------------------------------------------------------
# per-signature warm-up
#
# This image's remote-compile helper crashes (HTTP 500, subprocess exit 1)
# whenever an XLA module contains >= ~3 Mosaic kernels that are not already
# in its kernel cache: the per-kernel compiles run concurrently inside the
# helper and take it down. Single-kernel modules always compile, and once a
# signature is cached, larger modules reuse it (measured: a 3-kernel module
# fails cold but compiles in 43s after warming each kernel alone — probe9;
# scaled to a 14-kernel module in probe10). So before a kernel signature is
# first traced into a caller's program, compile it once in its own tiny jit.
# One serial compile per (shape, dtype, max_offset, block_rows) per process;
# the local persistent .jax_cache makes re-warms in later processes ~instant.
#
# NOTE: keyed on the *traced* shapes — under multi-chip pjit the global batch
# would be warmed rather than the per-device shard. Irrelevant on the 1-chip
# topology this targets; revisit if sharded pallas DCN is ever enabled.
# --------------------------------------------------------------------------

_WARMED: set = set()
_WARMING = False


def _ensure_warm(x_shape, x_dtype, o: int, max_offset: float,
                 block_rows: int) -> None:
    global _WARMING
    key = (tuple(x_shape), str(x_dtype), o, float(max_offset), int(block_rows))
    if _WARMING or key in _WARMED:
        return
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return
    _WARMING = True
    try:
        # AOT lower+compile on ShapeDtypeStructs: compiles the kernel alone
        # without executing anything, and is safe to run from inside an
        # active outer trace (an inner jit *call* would get staged into the
        # caller's jaxpr instead of compiling separately).
        b, h, w, c = x_shape
        jax.jit(
            functools.partial(
                deform_conv2d_pallas,
                max_offset=max_offset, block_rows=block_rows, interpret=False,
            )
        ).lower(
            jax.ShapeDtypeStruct((b, h, w, c), x_dtype),
            jax.ShapeDtypeStruct((b, h, w, 18), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, 9), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, c, o), jnp.bfloat16),
        ).compile()
        _WARMED.add(key)
    finally:
        _WARMING = False


def _dcn_shift_kernel(off_ref, mask_ref, x_ref, w_ref, out_ref,
                      tap_acc, out_acc, *, br, w, c, o, pad, r):
    """One (batch, row-block) program.

    Refs:
        off_ref:  (1, BR, W, 18) f32 — NHWC offsets, (dy, dx) interleaved.
        mask_ref: (1, BR, W, 9) f32 — sigmoided modulation.
        x_ref:    (1, Hp, Wp, C) bf16 — whole padded image, VMEM-resident.
        w_ref:    (9, C, O) bf16 — kernel taps.
        out_ref:  (1, BR, W, O).
        tap_acc:  (BR, W, C) f32 scratch.
        out_acc:  (BR * W, O) f32 scratch.
    """
    import math

    rb = pl.program_id(1)
    row0 = rb * br
    # ceil, not truncation: offsets in [-r, -floor(r)) need the shift at
    # j-1-ceil(r) (the y direction gets this for free from its dynamic
    # fori_loop bounds)
    ri = int(math.ceil(r))

    out_acc[:] = jnp.zeros_like(out_acc)
    for k in range(9):
        i, j = divmod(k, 3)
        dy = jnp.clip(off_ref[0, :, :, 2 * k:2 * k + 1], -r, r)  # (BR, W, 1)
        dx = jnp.clip(off_ref[0, :, :, 2 * k + 1:2 * k + 2], -r, r)
        # active integer-shift box for this tap (relative to the tap center)
        ylo = (i - 1) + jnp.floor(jnp.min(dy)).astype(jnp.int32)
        yhi = (i - 1) + jnp.floor(jnp.max(dy)).astype(jnp.int32) + 1
        xlo = (j - 1) + jnp.floor(jnp.min(dx)).astype(jnp.int32)
        xhi = (j - 1) + jnp.floor(jnp.max(dx)).astype(jnp.int32) + 1

        tap_acc[:] = jnp.zeros_like(tap_acc)
        ty = dy + (i - 1)  # sampling position relative to p, y component
        tx = dx + (j - 1)

        def body_y(gy, _, ty=ty, tx=tx, xlo=xlo, xhi=xhi):
            wy = _hat(gy.astype(jnp.float32) - ty)  # (BR, W, 1)
            # needed gx span: [(j-1)+floor(dx), (j-1)+floor(dx)+1],
            # floor(dx) in [-R, R]
            for gx in range(j - 1 - ri, j - 1 + ri + 2):
                @pl.when((gx >= xlo) & (gx <= xhi))
                def _(gx=gx):
                    wx = _hat(float(gx) - tx)
                    xs = x_ref[0, pl.ds(row0 + gy + pad, br),
                               gx + pad:gx + pad + w, :]
                    tap_acc[:] += (wy * wx) * xs.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(ylo, yhi + 1, body_y, 0)

        tap = tap_acc[:] * mask_ref[0, :, :, k:k + 1]
        out_acc[:] += jax.lax.dot_general(
            tap.reshape(br * w, c).astype(jnp.bfloat16),
            w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out_acc[:].reshape(br, w, o).astype(out_ref.dtype)


def deform_conv2d_pallas(x, offset, mask, weight, bias=None, *,
                         max_offset: float = 8.0, block_rows: int = 16,
                         interpret: bool = False):
    """Modulated 3x3 stride-1 DCNv2, NHWC — shifted-window Pallas kernel.

    Same contract as ``ops.dcn.deform_conv2d`` (torchvision layouts:
    offset (B,H,W,18) interleaved (dy,dx); mask (B,H,W,9) sigmoided;
    weight (3,3,C,O) HWIO). Offsets are clamped to ±``max_offset``; compute
    is bf16 with f32 accumulation.
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3), "DLA nodes only use 3x3 DCN"
    if not interpret:
        _ensure_warm(x.shape, x.dtype, o, max_offset, block_rows)
    r = float(max_offset)
    # ceil: the kernel's column-shift bound is ceil(r), so padding must
    # cover it for fractional max_offset too
    pad = math.ceil(max_offset) + 2

    br = h if h <= 2 * block_rows else block_rows
    nrb = -(-h // br)
    hb = nrb * br

    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad, pad + (hb - h)), (pad, pad), (0, 0)),
    )
    hp, wp = hb + 2 * pad, w + 2 * pad
    off_p = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    mask_p = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    w_taps = weight.reshape(9, c, o).astype(jnp.bfloat16)

    kernel = functools.partial(
        _dcn_shift_kernel, br=br, w=w, c=c, o=o, pad=pad, r=r
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((1, br, w, 18), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, br, w, 9), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, hp, wp, c), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec((9, c, o), lambda bi, ri: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, w, o), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hb, w, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((br, w, c), jnp.float32),
            pltpu.VMEM((br * w, o), jnp.float32),
        ],
        interpret=interpret,
    )(off_p, mask_p, xp, w_taps)
    out = out[:, :h]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _dcn_static_kernel(off_ref, mask_ref, x_ref, w_ref, out_ref, out_acc,
                       tap_acc, *, br, w, c, o, pad, r):
    """One (batch, row-block) program — FULLY STATIC shift window.

    The round-3 toolchain compiles chained Mosaic kernels, which unblocks
    using Pallas for all 16 DLA DCN nodes; this kernel drops the round-2
    design's dynamic ``fori_loop`` + ``pl.when`` predication (which defeated
    vectorization) for the same static shifted-window sum the XLA fast path
    uses (ops/dcn.py:deform_conv2d_shift): offsets clamp to ±r, so per tap
    the bilinear straddle range is the static box ``[-ceil(r)..floor(r)+1]``
    and every term is a statically-shifted VMEM slice in a plain unrolled
    FMA — Mosaic vectorizes it like any elementwise op. The whole padded
    image block stays VMEM-resident, so each term costs VMEM reads, not HBM
    (the XLA formulation re-reads HBM per term — measured 5.18 ms at the
    stride-4 DLA node vs ~sub-ms VMEM speed-of-light).

    The x block is an overlapping *element window* (``pl.BlockSpec`` dims of
    type ``Element``, lowered to ``#tpu.element_window``): each (batch,
    row-block) program receives rows ``[rb*br, rb*br + br + 2*pad)`` of the
    padded image, so every shifted read inside the kernel is a STATIC slice.
    With the earlier whole-image block + ``pl.ds(row0 + gy + pad, br)``
    dynamic-start rows, Mosaic materialized each of the 144 windows into its
    own stack buffer (measured 59.2 MiB scoped-vmem demand at br=8 on the
    (112,200,64) DLA node, and 2x the XLA shift path's runtime once the
    budget was raised); static slices are views.

    Refs: off (1,BR,W,18) f32; mask (1,BR,W,9) f32;
    x (1,BR+2*pad,W+2*pad,C) bf16 element window; w (9,C,O) bf16;
    out (1,BR,W,O); out_acc (BR*W, O) f32 scratch;
    tap_acc (BR, W, C) f32 scratch.
    """
    import math as _math

    r_lo, r_hi = _math.ceil(r), _math.floor(r) + 1

    out_acc[:] = jnp.zeros_like(out_acc)
    for k in range(9):
        i, j = divmod(k, 3)
        ty = jnp.clip(off_ref[0, :, :, 2 * k:2 * k + 1], -r, r) + (i - 1)
        tx = jnp.clip(off_ref[0, :, :, 2 * k + 1:2 * k + 2], -r, r) + (j - 1)
        first = True
        for gy in range(i - 1 - r_lo, i - 1 + r_hi + 1):
            wy = _hat(float(gy) - ty)  # (BR, W, 1) f32
            for gx in range(j - 1 - r_lo, j - 1 + r_hi + 1):
                wx = _hat(float(gx) - tx)
                win = x_ref[0, gy + pad:gy + pad + br,
                            gx + pad:gx + pad + w, :]
                term = (wy * wx) * win.astype(jnp.float32)
                if first:
                    tap_acc[:] = term
                    first = False
                else:
                    tap_acc[:] += term
        tap = tap_acc[:] * mask_ref[0, :, :, k:k + 1]
        out_acc[:] += jax.lax.dot_general(
            tap.reshape(br * w, c).astype(jnp.bfloat16),
            w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out_acc[:].reshape(br, w, o).astype(out_ref.dtype)


def deform_conv2d_pallas_static(x, offset, mask, weight, bias=None, *,
                                max_offset: float = 1.0, block_rows: int = 16,
                                vmem_limit_mb: int = 100,
                                interpret: bool = False):
    """Static shifted-window Pallas DCNv2 (see ``_dcn_static_kernel``).

    Same contract and clamping semantics as ``ops.dcn.deform_conv2d_shift``
    (torchvision layouts; offsets clamped to ±``max_offset``). Cost scales
    with ``(2 + ceil(r) + floor(r))^2`` terms per tap — keep r small (r=1:
    16 terms/tap; r=2: 25).

    ``vmem_limit_mb`` raises Mosaic's scoped-VMEM budget above the 16 MiB
    default: the unrolled straight-line kernel gets NO stack-slot reuse from
    Mosaic (each of the 144 (BR,W,C) f32 terms is assigned its own spill
    slot — measured 118.7 MiB demand at br=16 on the (112,200,64) DLA node),
    so the budget must cover ``9*(2+ceil(r)+floor(r))^2 * BR*W*C*4`` bytes.
    The v5e has 128 MiB of physical VMEM per core; shrink ``block_rows`` if
    the kernel still does not fit.
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    assert (kh, kw) == (3, 3), "DLA nodes only use 3x3 DCN"
    r = float(max_offset)
    pad = math.ceil(r) + 2

    br = h if h <= 2 * block_rows else block_rows
    nrb = -(-h // br)
    hb = nrb * br

    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad, pad + (hb - h)), (pad, pad), (0, 0)),
    )
    hp, wp = hb + 2 * pad, w + 2 * pad
    off_p = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    mask_p = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    w_taps = weight.reshape(9, c, o).astype(jnp.bfloat16)

    kernel = functools.partial(
        _dcn_static_kernel, br=br, w=w, c=c, o=o, pad=pad, r=r
    )
    # overlapping halo window on x: Element block dims take ELEMENT offsets
    # from the index_map (no public alias for Element as of jax 0.9; the
    # private path carries no stability guarantee, so fail with a pointer to
    # the supported impls instead of a bare ImportError on a jax upgrade)
    try:
        from jax._src.pallas.core import Element as _Element
    except ImportError as e:  # pragma: no cover - jax-version dependent
        raise NotImplementedError(
            "deform_conv2d_pallas_static needs jax._src.pallas.core.Element "
            "(moved/renamed in this jax version); use DCN_IMPL=shift or xla"
        ) from e

    out = pl.pallas_call(
        kernel,
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((1, br, w, 18), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, br, w, 9), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec(
                (_Element(1), _Element(br + 2 * pad), _Element(wp),
                 _Element(c)),
                lambda bi, ri: (bi, ri * br, 0, 0),
            ),
            pl.BlockSpec((9, c, o), lambda bi, ri: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, w, o), lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hb, w, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((br * w, o), jnp.float32),
            pltpu.VMEM((br, w, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=interpret,
    )(off_p, mask_p, xp, w_taps)
    out = out[:, :h]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_fast(x, offset, mask, weight, bias,
                       max_offset: float = 8.0, interpret: bool = False):
    """Trainable DCNv2: Pallas shifted-window forward, XLA-formulation VJP.

    Forward clamps offsets to ±max_offset (see module docstring); the
    backward pass differentiates the unclamped XLA path — identical
    gradients whenever offsets are in range.
    """
    return deform_conv2d_pallas(
        x, offset, mask, weight, bias,
        max_offset=max_offset, interpret=interpret,
    )


def _fast_fwd(x, offset, mask, weight, bias, max_offset, interpret):
    out = deform_conv2d_fast(x, offset, mask, weight, bias,
                             max_offset, interpret)
    return out, (x, offset, mask, weight, bias)


def _fast_bwd(max_offset, interpret, res, g):
    x, offset, mask, weight, bias = res
    has_bias = bias is not None

    def f(x, offset, mask, weight, bias):
        # clamp INSIDE the differentiated function so out-of-range offsets
        # get zero gradient (consistent with the clamped forward) instead of
        # the gradient of sampling at the unclamped position
        offset = jnp.clip(offset, -max_offset, max_offset)
        return _deform_conv2d_xla(
            x, offset, mask, weight, bias if has_bias else None
        )

    _, vjp = jax.vjp(f, x, offset, mask, weight,
                     bias if has_bias else jnp.zeros((weight.shape[-1],),
                                                     weight.dtype))
    # g already carries the primal output dtype; casting it (e.g. to f32)
    # makes jax.vjp reject the cotangent under bf16 mixed precision
    dx, doff, dmask, dw, db = vjp(g)
    return dx, doff, dmask, dw, (db if has_bias else None)


deform_conv2d_fast.defvjp(_fast_fwd, _fast_bwd)
