"""Shared flax building blocks: conv-BN-ReLU, aggregation node variants,
depthwise bilinear upsampling.

Re-designs the reference node zoo — Conv / GlobalConv / DeformConv and the
ConvTranspose2d bilinear upsampler (/root/reference/src/lib/model/networks/
dla.py:315-524, model/utils.py:90-109) — as NHWC flax modules. BatchNorm uses
flax running stats (momentum 0.9 == torch momentum 0.1).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dcn import deform_conv2d

BN_MOMENTUM = 0.9  # torch momentum 0.1

# torch Conv2d's default kernel init, kaiming_uniform(a=sqrt(5)) ==
# uniform(+-1/sqrt(fan_in)), variance (1/3)/fan_in — flax's lecun_normal
# default has 3x the variance, a silent from-scratch training divergence
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-stat semantics.

    flax's ``nn.BatchNorm`` stores the *biased* batch variance in its
    running stats; torch normalizes with the biased variance but stores the
    *unbiased* one (Bessel-corrected) — a ~N/(N-1) drift that breaks
    bit-parity of imported/exported checkpoints (verified against a torch
    golden, tests/test_golden_parity.py::test_conv_bn_matches_torch).
    Variable names match flax ('scale'/'bias' params, 'mean'/'var' stats) so
    the torch checkpoint mapping is unchanged. Statistics are computed in
    f32 regardless of compute dtype.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Any = None):
        if use_running_average is None:
            use_running_average = self.use_running_average
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (feat,),
            jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (feat,),
            jnp.float32,
        )
        # statistics in at least f32 (bf16 inputs upcast); f64 inputs keep
        # full precision — pinning to f32 here would truncate every layer of
        # an x64 run, which matters for golden-parity anchors
        ctype = jnp.promote_types(x.dtype, jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value.astype(ctype), ra_var.value.astype(ctype)
        else:
            n = x.size // feat
            xf = x.astype(ctype).reshape(-1, feat)
            mean = jnp.mean(xf, axis=0)
            # two-pass E[(x-mean)^2] like torch: the one-pass
            # E[x^2]-E[x]^2 form can cancel to a negative variance for
            # high-mean/low-variance channels and NaN the rsqrt
            var = jnp.mean(jnp.square(xf - mean), axis=0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean).astype(jnp.float32)
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * unbiased).astype(jnp.float32)
        import jax

        y = (x.astype(ctype) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class ConvBnAct(nn.Module):
    """Conv -> BatchNorm -> optional ReLU."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    dilation: int = 1
    use_bias: bool = False
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        pad = ((self.kernel_size[0] - 1) // 2 * d, (self.kernel_size[1] - 1) // 2 * d)
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            kernel_dilation=(d, d),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class ConvNode(nn.Module):
    """1x1 conv-BN-ReLU aggregation node (reference ``Conv``, dla.py:315-325)."""

    features: int
    activation: bool = True  # kept for node-factory signature parity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBnAct(
            self.features, kernel_size=(1, 1), dtype=self.dtype, name="conv"
        )(x, train)


class GlobalConvNode(nn.Module):
    """GCN-style separable kx1 + 1xk pair, summed (reference dla.py:328-382)."""

    features: int
    kernel_size: int = 7
    dilation: int = 1
    activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, d = self.kernel_size, self.dilation
        pad = d * (k // 2)

        def conv(name, ks, padding, inp):
            return nn.Conv(
                self.features,
                ks,
                padding=padding,
                kernel_dilation=(d, d),
                use_bias=False,
                kernel_init=torch_conv_kernel_init,
                dtype=self.dtype,
                name=name,
            )(inp)

        left = conv("left1", (k, 1), [(pad, pad), (0, 0)], x)
        left = conv("left2", (1, k), [(0, 0), (pad, pad)], left)
        right = conv("right1", (1, k), [(0, 0), (pad, pad)], x)
        right = conv("right2", (k, 1), [(pad, pad), (0, 0)], right)
        x = left + right
        x = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


class DeformConvNode(nn.Module):
    """DCNv2 node: zero-init offset/mask conv + deformable 3x3 + BN/ReLU.

    Reference ``DeformConv`` (dla.py:385-472): the offset conv starts at zero
    so the node begins as a plain conv; mask is sigmoided.

    ``dcn_impl`` selects the deformable-sampling implementation:
    ``"shift"`` — static shifted-window XLA formulation (gather-free VPU
    FMAs, offsets clamped to ±``dcn_max_offset``; the TPU fast path);
    ``"xla"`` — the flattened-row-gather formulation (exact, any backend);
    ``"pallas"`` — the Pallas kernel (ops/pallas_dcn.py; compiles only in
    single-kernel programs on this image's toolchain, and measures slower
    than "shift" — kept for comparison); ``"auto"`` — shift on TPU, xla
    elsewhere.
    """

    features: int
    activation: bool = True
    dcn_impl: str = "auto"
    dcn_max_offset: float = 1.0
    dcn_correct_frac: float = 0.03
    dcn_correct_approx: bool = True
    # deep-node override: trained offsets stay within ~1.5 px (p99) at the
    # shallow high-resolution nodes but reach p99 ~8 / max ~48 px at the
    # deep ones (measured on the TPU overfit run, scripts/overfit_tpu.py).
    # Nodes with in_ch >= dcn_deep_min_ch use dcn_deep_impl: shift_hybrid
    # exactly recomputes the largest-offset pixels for ~3 fps model-wide
    # (full exact gathers there would cost 25 fps — one 256-ch node sits at
    # stride-4 resolution).
    dcn_deep_impl: str = "shift_hybrid"
    dcn_deep_min_ch: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        offset_mask = nn.Conv(
            27,
            (3, 3),
            padding=1,
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        # sampling coordinates in at least f32 (f64 inputs keep precision)
        offset_mask = offset_mask.astype(
            jnp.promote_types(offset_mask.dtype, jnp.float32))
        offset = offset_mask[..., :18]
        mask = nn.sigmoid(offset_mask[..., 18:])

        stdv = 1.0 / np.sqrt(in_ch * 9)

        def weight_init(key, shape, dtype=jnp.float32):
            import jax.random as jrandom

            return jrandom.uniform(key, shape, dtype, -stdv, stdv)

        weight = self.param("weight", weight_init, (3, 3, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        impl = self.dcn_impl
        if impl == "auto":
            import jax

            # tight-window shift wins everywhere on TPU since the round-4
            # window fix — same-process model-level A/B on the v5e
            # (448x800 bs6 eval): shift 176.1 fps vs select-tight 166.7 vs
            # select-full 144.9 (earlier cross-session numbers that showed
            # select ahead were host drift); train: unfrozen 340.4 ms/step
            # bs8 vs select's 547.3, frozen 116.7 vs 135.7. select remains
            # available explicitly (DCN_IMPL=select resolves tight windows
            # for eval traces, full windows under training for the
            # boundary-gradient STE path).
            impl = "shift" if jax.default_backend() == "tpu" else "xla"
        if (impl in ("shift", "shift_hybrid", "select", "select_hybrid")
                and self.dcn_deep_impl
                and in_ch >= self.dcn_deep_min_ch):
            # clamped fast paths only where trained offsets stay in range;
            # a select-family shallow impl keeps its base through the deep
            # override (same hybrid correction, select windows)
            deep = self.dcn_deep_impl
            if impl.startswith("select") and deep == "shift_hybrid":
                deep = "select_hybrid"
            impl = deep
        if impl == "shift":
            from ..ops.dcn import deform_conv2d_shift

            x = deform_conv2d_shift(
                x.astype(self.dtype), offset, mask,
                weight.astype(self.dtype), bias.astype(self.dtype),
                max_offset=self.dcn_max_offset,
            )
        elif impl == "select":
            from ..ops.dcn import deform_conv2d_select

            x = deform_conv2d_select(
                x.astype(self.dtype), offset, mask,
                weight.astype(self.dtype), bias.astype(self.dtype),
                max_offset=self.dcn_max_offset,
                # tight window is forward-only (it zeroes the boundary
                # offset gradient); eval traces get the smaller window
                tight=not train,
            )
        elif impl in ("shift_hybrid", "select_hybrid"):
            from ..ops.dcn import deform_conv2d_shift_hybrid

            x = deform_conv2d_shift_hybrid(
                x.astype(self.dtype), offset, mask,
                weight.astype(self.dtype), bias.astype(self.dtype),
                max_offset=self.dcn_max_offset,
                correct_frac=self.dcn_correct_frac,
                approx=self.dcn_correct_approx,
                base="select" if impl == "select_hybrid" else "shift",
                tight=not train,
            )
        elif impl == "pallas":
            from ..ops.pallas_dcn import deform_conv2d_fast

            x = deform_conv2d_fast(
                x.astype(self.dtype), offset, mask,
                weight.astype(self.dtype), bias.astype(self.dtype),
                max(self.dcn_max_offset, 8.0), False,
            )
        else:
            x = deform_conv2d(
                x.astype(self.dtype), offset, mask,
                weight.astype(self.dtype), bias.astype(self.dtype),
            )
        if self.activation:
            x = TorchBatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                dtype=self.dtype,
                name="bn",
            )(x)
            x = nn.relu(x)
        return x


NODE_TYPES = {
    "DeformConv": (DeformConvNode, DeformConvNode),
    "GlobalConv": (ConvNode, GlobalConvNode),
    "Conv": (ConvNode, ConvNode),
}


def bilinear_kernel(factor: int) -> np.ndarray:
    """Depthwise transposed-conv bilinear kernel of size 2f x 2f.

    Matches the reference's initUpModuleWeights (model/utils.py:90-109).
    """
    size = 2 * factor
    f = int(np.ceil(size / 2))
    center = (2 * f - 1 - f % 2) / (2.0 * f)
    og = np.arange(size)
    k1d = 1 - np.abs(og / f - center)
    return np.outer(k1d, k1d).astype(np.float32)


class BilinearUp(nn.Module):
    """Depthwise 2x/4x upsampling as a grouped transposed conv, bilinear init.

    Kept as a learnable parameter for checkpoint parity with the reference's
    ConvTranspose2d(groups=out_channels) (dla.py:502-512).
    """

    features: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        size = 2 * f
        init = bilinear_kernel(f)

        def kernel_init(key, shape, dtype=jnp.float32):
            # (size, size, 1, features): same bilinear kernel per channel
            k = jnp.asarray(init)[..., None, None]
            return jnp.broadcast_to(k, shape).astype(dtype)

        kernel = self.param("kernel", kernel_init, (size, size, 1, self.features))
        return _depthwise_conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype), f
        )


def _depthwise_conv_transpose(x, kernel, factor: int):
    """Depthwise stride-f transposed conv with kernel 2f and padding f//2.

    Implemented channel-grouped via lax.conv_general_dilated with lhs
    dilation (the standard transposed-conv formulation).
    """
    import jax.lax as lax

    size = 2 * factor
    pad = factor // 2
    # transposed conv: lhs_dilation=f, padding = size - 1 - pad on both sides
    eff_pad = size - 1 - pad
    c = x.shape[-1]
    # kernel (size, size, 1, C) -> spatially flipped for transpose semantics
    k = kernel[::-1, ::-1]
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(eff_pad, eff_pad), (eff_pad, eff_pad)],
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
