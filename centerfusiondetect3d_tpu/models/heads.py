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

from .layers import torch_conv_kernel_init

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
                kernel_init=torch_conv_kernel_init,
                bias_init=nn.initializers.zeros, name="tower_0",
            )(x)
            x = nn.relu(x)
            for i, h in enumerate(self.hidden[1:], start=1):
                x = nn.Conv(
                    h, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=torch_conv_kernel_init,
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
            kernel_init=torch_conv_kernel_init,
            bias_init=bias_init, name="out",
        )(x)
        return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def resize_nearest(x, size_hw):
    """Nearest-neighbor resize of an NHWC map to (H, W)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size_hw[0], size_hw[1], c), method="nearest")


class DetectHeadSet(nn.Module):
    """All first-stage + (optionally) secondary towers for one pyramid level.

    heads/head_conv: static mappings from the derived config.

    ``fuse_towers`` (opt-in) executes each stage's towers through ONE
    wide 3x3 conv: the per-head ``tower_0`` kernels are concatenated along
    the output-channel axis at apply time, so the stride-4 feature map is
    read once and the MXU runs a single large contraction instead of ~7-10
    small ones. Mathematically identical to per-tower execution (the tails
    consume disjoint channel slices); parameters keep their per-head names,
    so checkpoints are unaffected. Disabled under remat (the per-tower
    remat boundary is the point there) and during init (params must be
    created through the canonical module path).
    """

    heads: Mapping[str, int]
    head_conv: Mapping[str, Sequence[int]]
    secondary: Sequence[str] = ()
    remat: bool = False
    fuse_towers: bool = False
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

    # ------------------------------------------------------------- fusion
    def _can_fuse(self, names) -> bool:
        return (
            self.fuse_towers
            and not self.remat
            and not self.is_initializing()
            and all(len(self.head_conv.get(n, ())) >= 1 for n in names)
        )

    def _tower_params(self, name):
        return self.towers[name].variables["params"]

    def _fused_towers(self, feats, names):
        """One wide tower_0 conv + per-head 1x1 tails (identical math)."""
        kernels, biases, widths = [], [], []
        for n in names:
            p = self._tower_params(n)["tower_0"]
            kernels.append(p["kernel"])
            biases.append(p["bias"])
            widths.append(p["kernel"].shape[-1])
        k = jnp.concatenate(kernels, axis=-1).astype(self.dtype)
        b = jnp.concatenate(biases, axis=-1).astype(self.dtype)
        h = jax.lax.conv_general_dilated(
            feats.astype(self.dtype), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        h = nn.relu(h)

        y, off = {}, 0
        for n, width in zip(names, widths):
            params = self._tower_params(n)
            hn = h[..., off:off + width]
            off += width
            hidden = tuple(self.head_conv.get(n, ()))
            for i in range(1, len(hidden)):
                p = params[f"tower_{i}"]
                hn = jax.lax.conv_general_dilated(
                    hn, p["kernel"].astype(self.dtype), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + p["bias"].astype(self.dtype)
                hn = nn.relu(hn)
            p = params["out"]
            out = jax.lax.conv_general_dilated(
                hn, p["kernel"].astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"].astype(self.dtype)
            y[n] = out.astype(jnp.promote_types(out.dtype, jnp.float32))
        return y

    def _run_towers(self, feats, names):
        if self._can_fuse(names):
            return self._fused_towers(feats, names)
        return {n: self.towers[n](feats) for n in names}

    # -------------------------------------------------------------- stages
    def first_stage(self, feats):
        """Run every non-secondary tower; apply heatmap/depth transforms."""
        names = [n for n in self.heads if n not in self.secondary]
        y = self._run_towers(feats, names)
        for name in list(y):
            if "heatmap" in name:
                y[name] = clamp_sigmoid(y[name])
        if "depth" in y:
            y["depthMap"] = y["depth"]
            y["depth"] = sigmoid_depth(y["depth"])
        return y

    def second_stage(self, feats, pc_hm, pc_slice: int = 1):
        """Run secondary towers on image features + resized radar heatmap.

        pc_slice: number of depth channels; pc_hm_out exposes only that
        slice like the reference (detectHeads.py:185).
        """
        pc_resized = resize_nearest(pc_hm, feats.shape[1:3]).astype(feats.dtype)
        sec_feats = jnp.concatenate([feats, pc_resized], axis=-1)
        names = [n for n in self.secondary if n in self.heads]
        y = self._run_towers(sec_feats, names)
        if "depth2" in y:
            y["depthMap"] = y["depth2"]
            y["depth2"] = sigmoid_depth(y["depth2"])
        y["pc_hm_out"] = pc_resized[..., :pc_slice].astype(
            jnp.promote_types(pc_resized.dtype, jnp.float32))
        return y
