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

from .layers import ConvBnAct, BN_MOMENTUM, TorchBatchNorm

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


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
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
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
