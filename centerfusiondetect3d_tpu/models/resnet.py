"""ResNet backbone family (18/34) as an alternative to DLA-34.

Extension over the reference, whose model factory supports only DLA
(/root/reference/src/lib/model/model.py:12-14 raises for other archs) while
upstream CenterNet shipped resdcn backbones. Produces the same 6-level
feature pyramid contract as ``models.dla.DLA`` (strides 1..32, channels
16/32/64/128/256/512-compatible tail), so DLAUp/IDAUp and every head reuse
unchanged: ``MODEL.ARCH: resnet_18`` or ``resnet_34``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnAct, BN_MOMENTUM

RESNET_SPECS = {
    "18": (2, 2, 2, 2),
    "34": (3, 4, 6, 3),
}


class ResBlock(nn.Module):
    """Standard ResNet basic block (projection shortcut on stride/width change)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBnAct(
            self.features, strides=(self.strides, self.strides), dtype=self.dtype,
            name="conv1",
        )(x, train)
        out = ConvBnAct(self.features, act=False, dtype=self.dtype, name="conv2")(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = ConvBnAct(
                self.features, kernel_size=(1, 1),
                strides=(self.strides, self.strides), act=False, dtype=self.dtype,
                name="downsample",
            )(x, train)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """6-level pyramid: [s1/16, s2/32, s4/64, s8/128, s16/256, s32/512]."""

    depth: str = "18"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = RESNET_SPECS[self.depth]
        feats = []
        # lightweight stem mirrors the DLA channel ladder at strides 1 and 2
        x = ConvBnAct(16, kernel_size=(7, 7), dtype=self.dtype, name="stem")(x, train)
        feats.append(x)
        x = ConvBnAct(32, strides=(2, 2), dtype=self.dtype, name="level1")(x, train)
        feats.append(x)
        for stage, (n_blocks, ch) in enumerate(zip(blocks, (64, 128, 256, 512))):
            for b in range(n_blocks):
                x = ResBlock(
                    ch, strides=2 if b == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
            feats.append(x)
        return feats
