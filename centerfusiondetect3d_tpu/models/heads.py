"""CenterNet detection heads and the CenterFusion secondary (radar) heads.

Re-design of the reference head stack
(/root/reference/src/lib/model/networks/detectHeads.py:16-191): per-head conv
towers (3x3 -> [1x1]* -> 1x1), sigmoid-clamped heatmap with -4.6 bias init,
``1/sigmoid - 1`` depth transform, and the middle-fusion secondary heads
(velocity, nuscenes_att, depth2, rotation2) fed by image features concatenated
with the radar heatmap. NHWC flax; head outputs are cast to float32.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

SECONDARY_HEADS = ("velocity", "nuscenes_att", "depth2", "rotation2")


def sigmoid_depth(x):
    """Depth activation 1/sigmoid(x) - 1 (model/utils.py:131-141)."""
    return 1.0 / (jax.nn.sigmoid(x) + 1e-6) - 1.0


def clamp_sigmoid(x):
    """Sigmoid clamped to [1e-4, 1 - 1e-4] (detectHeads.py:21-23)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


class HeadTower(nn.Module):
    """One prediction tower: 3x3 conv -> ReLU -> [1x1 conv -> ReLU]* -> 1x1."""

    out_features: int
    hidden: Sequence[int]
    is_heatmap: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.hidden:
            x = nn.Conv(
                self.hidden[0], (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                bias_init=nn.initializers.zeros, name="tower_0",
            )(x)
            x = nn.relu(x)
            for i, h in enumerate(self.hidden[1:], start=1):
                x = nn.Conv(
                    h, (1, 1), use_bias=True, dtype=self.dtype,
                    bias_init=nn.initializers.zeros, name=f"tower_{i}",
                )(x)
                x = nn.relu(x)
        bias_init = (
            nn.initializers.constant(-4.6)
            if self.is_heatmap
            else nn.initializers.zeros
        )
        x = nn.Conv(
            self.out_features, (1, 1), use_bias=True, dtype=self.dtype,
            bias_init=bias_init, name="out",
        )(x)
        return x.astype(jnp.float32)


def resize_nearest(x, size_hw):
    """Nearest-neighbor resize of an NHWC map to (H, W)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size_hw[0], size_hw[1], c), method="nearest")


class DetectHeadSet(nn.Module):
    """All first-stage + (optionally) secondary towers for one pyramid level.

    heads/head_conv: static mappings from the derived config.
    """

    heads: Mapping[str, int]
    head_conv: Mapping[str, Sequence[int]]
    secondary: Sequence[str] = ()
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # head towers at stride 4 x 256ch dominate training memory; remat
        # them when requested (nn.remat preserves names/params)
        tower_cls = nn.remat(HeadTower) if self.remat else HeadTower
        towers = {}
        for name, nout in self.heads.items():
            towers[name] = tower_cls(
                nout,
                tuple(self.head_conv.get(name, ())),
                is_heatmap="heatmap" in name,
                dtype=self.dtype,
                name=name,
            )
        self.towers = towers

    def first_stage(self, feats):
        """Run every non-secondary tower; apply heatmap/depth transforms."""
        y = {}
        for name in self.heads:
            if name in self.secondary:
                continue
            out = self.towers[name](feats)
            if "heatmap" in name:
                out = clamp_sigmoid(out)
            y[name] = out
        if "depth" in y:
            y["depthMap"] = y["depth"]
            y["depth"] = sigmoid_depth(y["depth"])
        return y

    def second_stage(self, feats, pc_hm):
        """Run secondary towers on image features + resized radar heatmap."""
        pc_resized = resize_nearest(pc_hm, feats.shape[1:3]).astype(feats.dtype)
        sec_feats = jnp.concatenate([feats, pc_resized], axis=-1)
        y = {}
        for name in self.secondary:
            if name in self.heads:
                y[name] = self.towers[name](sec_feats)
        if "depth2" in y:
            y["depthMap"] = y["depth2"]
            y["depth2"] = sigmoid_depth(y["depth2"])
        y["pc_hm_out"] = pc_resized.astype(jnp.float32)
        return y
