"""DLA-34 backbone in flax (NHWC).

Re-design of the reference DLA implementation
(/root/reference/src/lib/model/networks/dla.py:18-312): hierarchical deep
aggregation with recursive Trees, Root 1x1 merges, and BasicBlock residual
units. Structural notes preserved from the reference:

- Sub-trees always recompute their own residual, so the outer ``project`` of
  multi-level trees is dead weight; the reference deletes it on levels 3/4
  (dla.py:220-223). Here multi-level trees simply never create a projection.
- Root residual is off for dla34.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBnAct, BN_MOMENTUM, TorchBatchNorm,
                     torch_conv_kernel_init)

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


def _space_to_depth(x, f: int = 2):
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C), phase-major channels (ry rx c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _depth_to_space(x, f: int = 2):
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, c)


def _s2d_conv_kernel(w, stride: int, f: int = 2):
    """Reparameterize a full-res (k, k, Ci, Co) conv into s2d(f) space.

    Exact linear reindexing of the weights: for output coordinate
    ``u = f*y + a`` (stride 1; phase ``a``) or ``u = f*y'`` (stride f), each
    full-res tap ``i`` reads input cell ``q = (e - r) // f`` at phase ``r``
    where ``e = a + i - p`` (or ``i - p``). Returns ``(k2, pads)`` with
    ``k2``: (K2, K2, f*f*Ci, Fo*Fo*Co) HWIO kernel (Fo = f for stride 1 —
    phased output, channel order (a b co) — and 1 for stride f), and
    ``pads``: per-axis (lo, hi) padding so a stride-1 s2d-space conv equals
    the original. Used by the eval-time S2D stem (see ``DLA``): the stem's
    full-resolution 3/16-channel convs are MXU-hostile and force XLA into
    layout-copy chains (~4.4 ms of a 42 ms step at 448x800 bs6); the same
    math at half resolution with 12..64-channel kernels runs dense.
    """
    import numpy as np

    k = int(w.shape[0])
    p = (k - 1) // 2
    fo = 1 if stride == f else f
    assert stride in (1, f), "stem convs are stride 1 or f only"

    qs = [
        (e - r) // f
        for a in range(fo)
        for r in range(f)
        for i in range(k)
        for e in [(a + i - p) if fo > 1 else (i - p)]
        if (e - r) % f == 0
    ]
    qmin, qmax = min(qs), max(qs)
    k2 = qmax - qmin + 1
    # tap-index map with sentinel k -> zero row (invalid combination)
    idx = np.full((k2, f, fo), k, np.int32)
    for a in range(fo):
        for r in range(f):
            for qi in range(k2):
                i = f * (qmin + qi) + r - (a if fo > 1 else 0) + p
                if 0 <= i < k:
                    idx[qi, r, a] = i
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel
    idxj = jnp.asarray(idx)
    g = jnp.take(wp, idxj, axis=0)          # (K2, f, Fo, k+1, Ci, Co)
    g = jnp.take(g, idxj, axis=3)           # (K2, f, Fo, K2, f, Fo, Ci, Co)
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)  # (K2y, K2x, ry, rx, Ci, a, b, Co)
    ci, co = int(w.shape[2]), int(w.shape[3])
    k2w = g.reshape(k2, k2, f * f * ci, fo * fo * co)
    return k2w, (-qmin, qmax)


def _s2d_conv_bn_relu(x2, kernel, bn, stats, pads, phases: int, dtype,
                      epsilon: float = 1e-5):
    """s2d-space conv + eval BatchNorm (phase-tiled) + ReLU.

    Matches ConvBnAct's eval semantics exactly: bf16 conv, f32 BN affine
    with running stats, ReLU, cast back to ``dtype``.
    """
    import jax

    y = jax.lax.conv_general_dilated(
        x2.astype(dtype), kernel.astype(dtype), (1, 1),
        padding=[pads, pads],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    tile = lambda v: jnp.tile(v, phases)  # phase-major (a b co) order
    mean, var = tile(stats["mean"]), tile(stats["var"])
    scale, bias = tile(bn["scale"]), tile(bn["bias"])
    y = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * scale + bias
    return nn.relu(y).astype(dtype)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block with externally supplied residual."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBnAct(
            self.features,
            strides=(self.strides, self.strides),
            dilation=self.dilation,
            dtype=self.dtype,
            name="block1",
        )(x, train)
        out = ConvBnAct(
            self.features, dilation=self.dilation, act=False, dtype=self.dtype, name="block2"
        )(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 merge of tree children; optional residual from the first child."""

    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init, dtype=self.dtype,
                    name="conv")(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive hierarchical aggregation tree (HDA)."""

    levels: int
    in_features: int
    features: int
    strides: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        root_dim = self.root_dim if self.root_dim else 2 * self.features
        if self.level_root:
            root_dim += self.in_features
        self._root_dim = root_dim

        if self.levels == 1:
            self.tree1 = BasicBlock(self.features, self.strides, dtype=self.dtype)
            self.tree2 = BasicBlock(self.features, 1, dtype=self.dtype)
            self.root = Root(self.features, self.root_residual, dtype=self.dtype)
            if self.in_features != self.features:
                self.project = ConvBnAct(
                    self.features, kernel_size=(1, 1), act=False, dtype=self.dtype
                )
        else:
            self.tree1 = Tree(
                self.levels - 1,
                self.in_features,
                self.features,
                self.strides,
                root_residual=self.root_residual,
                dtype=self.dtype,
            )
            self.tree2 = Tree(
                self.levels - 1,
                self.features,
                self.features,
                root_dim=root_dim + self.features,
                root_residual=self.root_residual,
                dtype=self.dtype,
            )

    def __call__(self, x, children=None, train: bool = False):
        children = [] if children is None else list(children)
        if self.strides > 1:
            bottom = nn.max_pool(
                x, (self.strides, self.strides), strides=(self.strides, self.strides)
            )
        else:
            bottom = x
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            residual = (
                self.project(bottom, train)
                if self.in_features != self.features
                else bottom
            )
            x1 = self.tree1(x, residual, train=train)
            x2 = self.tree2(x1, train=train)
            return self.root([x2, x1, *children], train=train)

        x1 = self.tree1(x, train=train)
        children.append(x1)
        return self.tree2(x1, children=children, train=train)


class DLA(nn.Module):
    """DLA backbone: 7x7 stem, 2 conv levels, 4 aggregation trees.

    Returns the 6 per-stride features (s1..s32).
    """

    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    s2d_stem: bool = True
    dtype: Any = jnp.float32

    def _stem_s2d(self, x, f: int = 2):
        """Eval-time space-to-depth stem (exact reparameterization).

        The base/level0/level1 convs run at full and half resolution with
        3..32 channels — HBM-bound shapes that XLA tiles into exotic
        layouts, spending ~4.4 ms of a 42 ms eval step (bs6 448x800) on the
        convs plus layout copies around them. Running the SAME math in
        s2d(2) space halves the spatial extent and widens channels 4x
        (12->64 phased), which the MXU tiles densely with standard layouts.
        Weight/BN reparameterization happens per call on (7,7,Ci,Co)-sized
        tensors (negligible); the stem modules are still instantiated on
        tiny dummies so the parameter tree is IDENTICAL to the plain path
        (checkpoints interchange freely; BN eval mode mutates nothing).
        """
        ch = self.channels
        specs = [("base_layer", ConvBnAct(ch[0], kernel_size=(7, 7),
                                          dtype=self.dtype,
                                          name="base_layer"))]
        for i in range(self.levels[0]):
            specs.append((f"level0_{i}",
                          ConvBnAct(ch[0], dtype=self.dtype,
                                    name=f"level0_{i}")))
        specs.append(("level1_0",
                      ConvBnAct(ch[1], strides=(2, 2), dtype=self.dtype,
                                name="level1_0")))
        cin = x.shape[-1]
        for name, mod in specs:
            # create/bind the exact ConvBnAct parameter tree without paying
            # for a full-res call (output unused -> DCE'd by XLA)
            mod(jnp.zeros((1, 8, 8, cin), x.dtype), False)
            cin = mod.features

        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        x2 = _space_to_depth(x, f)
        feats = []
        for name, mod in specs:
            stride = 2 if name == "level1_0" else 1
            k2, pads = _s2d_conv_kernel(params[name]["conv"]["kernel"],
                                        stride, f)
            phases = 1 if stride == f else f * f
            x2 = _s2d_conv_bn_relu(x2, k2, params[name]["bn"],
                                   stats[name]["bn"], pads, phases,
                                   self.dtype)
            if name == f"level0_{self.levels[0] - 1}":
                # feats[0] in the plain path; lazy full-res view (DCE'd
                # unless a consumer actually reads it)
                feats.append(_depth_to_space(x2, f))
        x = x2  # level1_0 collapsed the phases: (B, H/2, W/2, ch[1])
        for i in range(1, self.levels[1]):
            x = ConvBnAct(ch[1], dtype=self.dtype, name=f"level1_{i}")(
                x, False)
        feats.append(x)
        return x, feats

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        if (self.s2d_stem and not train
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x, feats = self._stem_s2d(x)
        else:
            x = ConvBnAct(ch[0], kernel_size=(7, 7), dtype=self.dtype, name="base_layer")(x, train)

            feats = []
            # level0: conv level, stride 1
            for i in range(self.levels[0]):
                x = ConvBnAct(ch[0], dtype=self.dtype, name=f"level0_{i}")(x, train)
            feats.append(x)
            # level1: conv level, stride 2
            for i in range(self.levels[1]):
                s = 2 if i == 0 else 1
                x = ConvBnAct(ch[1], strides=(s, s), dtype=self.dtype, name=f"level1_{i}")(x, train)
            feats.append(x)
        # levels 2..5: aggregation trees
        x = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False, dtype=self.dtype, name="level2")(x, train=train)
        feats.append(x)
        x = Tree(self.levels[3], ch[2], ch[3], 2, level_root=True, dtype=self.dtype, name="level3")(x, train=train)
        feats.append(x)
        x = Tree(self.levels[4], ch[3], ch[4], 2, level_root=True, dtype=self.dtype, name="level4")(x, train=train)
        feats.append(x)
        x = Tree(self.levels[5], ch[4], ch[5], 2, level_root=True, dtype=self.dtype, name="level5")(x, train=train)
        feats.append(x)
        return feats
