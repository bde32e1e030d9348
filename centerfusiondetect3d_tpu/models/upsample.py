"""Iterative / hierarchical deep aggregation upsampling (IDAUp, DLAUp).

Re-design of the reference aggregation-upsampling stack
(/root/reference/src/lib/model/networks/dla.py:492-559): per-level projection
node -> depthwise bilinear transposed-conv upsample -> merge node after skip
add. Node types (DeformConv / GlobalConv / Conv) are injected from
``layers.NODE_TYPES``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Type

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BilinearUp, DeformConvNode


class IDAUp(nn.Module):
    """Iterative deep aggregation across a list of feature levels."""

    features: int
    in_features: Sequence[int]
    up_factors: Sequence[int]
    node_type: Tuple[Type, Type] = (DeformConvNode, DeformConvNode)
    dtype: Any = jnp.float32

    def setup(self):
        projs, ups, nodes = [], [], []
        for i in range(1, len(self.in_features)):
            projs.append(
                self.node_type[0](self.features, activation=True, dtype=self.dtype, name=f"proj_{i}")
            )
            ups.append(
                BilinearUp(self.features, int(self.up_factors[i]), dtype=self.dtype, name=f"up_{i}")
            )
            nodes.append(
                self.node_type[1](self.features, activation=True, dtype=self.dtype, name=f"node_{i}")
            )
        self.projs, self.ups, self.nodes = projs, ups, nodes

    def __call__(self, layers, startp: int, endp: int, train: bool = False):
        """Aggregate layers[startp:endp] in place (returns the new list)."""
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp - 1
            x = self.projs[j](layers[i], train=train)
            x = self.ups[j](x)
            layers[i] = self.nodes[j](x + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Hierarchical aggregation over strides, composed of IDAUp stages."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    node_type: Tuple[Type, Type] = (DeformConvNode, DeformConvNode)
    dtype: Any = jnp.float32

    def setup(self):
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = np.array(self.scales, int)
        idas = []
        for i in range(len(channels) - 1):
            j = -i - 2
            idas.append(
                IDAUp(
                    channels[j],
                    in_channels[j:],
                    (scales[j:] // scales[j]).tolist(),
                    node_type=self.node_type,
                    dtype=self.dtype,
                    name=f"ida_{i}",
                )
            )
            scales[j + 1 :] = scales[j]
            in_channels[j + 1 :] = [channels[j] for _ in channels[j + 1 :]]
        self.idas = idas

    def __call__(self, layers, train: bool = False):
        """layers: the backbone's per-level features. Returns the aggregated
        pyramid, finest-first."""
        layers = list(layers)
        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            layers = self.idas[i](layers, len(layers) - i - 2, len(layers), train=train)
            out.insert(0, layers[-1])
        return out
