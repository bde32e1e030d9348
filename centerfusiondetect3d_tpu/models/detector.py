"""The flagship model: DLA-34 + DLAUp/IDAUp + CenterFusion heads.

Re-design of the reference composition DLASeg/BaseModel
(/root/reference/src/lib/model/networks/dla.py:571-635, base_model.py:30-106):
backbone -> hierarchical upsampling to stride 4 -> first-stage CenterNet heads
-> (middle fusion) frustum radar association -> secondary heads. One flax
module, NHWC, bf16-capable, single jit-compiled forward for train and eval.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .dla import DLA, DLA34_CHANNELS
from .upsample import DLAUp, IDAUp
from .layers import NODE_TYPES
from .heads import DetectHeadSet, SECONDARY_HEADS, resize_nearest
from ..ops.frustum import get_pc_frustum_heatmap

FIRST_LEVEL = 2  # log2(down_ratio=4)
LAST_LEVEL = 5


class CenterFusionDLA(nn.Module):
    """DLA-34 CenterFusion detector.

    Static fields mirror the derived config; ``heads``/``head_conv`` are
    tuple-of-pairs so the module is hashable for jit.
    """

    heads: Tuple[Tuple[str, int], ...]
    head_conv: Tuple[Tuple[str, Tuple[int, ...]], ...]
    arch: str = "dla_34"
    node: str = "DeformConv"
    fusion_strategy: Any = "middle"  # 'early' | 'middle' | None
    radar_pc: bool = True
    frustum: bool = True
    one_hot_pc: bool = False
    max_pc_dist: float = 60.0
    top_k: int = 100
    norm_eval: bool = False  # freeze backbone BN stats during training
    remat: bool = False  # rematerialize the backbone (memory for FLOPs)
    dcn_impl: str = "auto"  # shift|select|*_hybrid|xla|pallas|auto (select on TPU)
    dcn_max_offset: float = 1.0  # shift-impl offset clamp (output px)
    dcn_correct_frac: float = 0.03  # shift_hybrid: exact-corrected pixel frac
    dcn_correct_approx: bool = True  # shift_hybrid selection: approx_max_k
    fused_heads: bool = False  # opt-in: head towers through one wide conv
    approx_topk: bool = False  # TPU bucketed top-k in the frustum stage
    s2d_stem: bool = True  # eval-time space-to-depth stem (exact; DLA only)
    dcn_deep_impl: str = "shift_hybrid"  # deep nodes: large trained offsets
    dcn_deep_min_ch: int = 256  # in_ch threshold for the deep-node override
    dtype: Any = jnp.float32

    def setup(self):
        node_type = NODE_TYPES[self.node]
        if self.node == "DeformConv":
            import functools

            from .layers import DeformConvNode

            cfg_node = functools.partial(
                DeformConvNode, dcn_impl=self.dcn_impl,
                dcn_max_offset=self.dcn_max_offset,
                dcn_correct_frac=self.dcn_correct_frac,
                dcn_correct_approx=self.dcn_correct_approx,
                dcn_deep_impl=self.dcn_deep_impl,
                dcn_deep_min_ch=self.dcn_deep_min_ch,
            )
            node_type = (cfg_node, cfg_node)
        channels = DLA34_CHANNELS  # resnet backbones share the channel ladder
        dla_up_cls, ida_up_cls = DLAUp, IDAUp
        if self.remat:
            # neck stages at stride 4 hold the largest activations; remat
            # them alongside backbone and head towers
            dla_up_cls = nn.remat(DLAUp, static_argnums=(2,))
            ida_up_cls = nn.remat(IDAUp, static_argnums=(2, 3, 4))
        family, _, depth = self.arch.partition("_")
        if family == "dla":
            base_cls = DLA
            base_kwargs = {"s2d_stem": self.s2d_stem}
        elif family == "resnet":
            from .resnet import ResNetBackbone

            base_cls = ResNetBackbone
            base_kwargs = {"depth": depth or "18"}
        else:
            raise NotImplementedError(f"architecture {self.arch!r} not implemented")
        if self.remat:
            # trade backbone activation memory for recompute (jax.checkpoint);
            # the `train` kwarg must stay static through the lift
            base_cls = nn.remat(base_cls, static_argnums=(2,))
        self.base = base_cls(dtype=self.dtype, name="base", **base_kwargs)
        scales = [2 ** i for i in range(len(channels[FIRST_LEVEL:]))]
        self.dla_up = dla_up_cls(
            FIRST_LEVEL, channels[FIRST_LEVEL:], scales, node_type=node_type,
            dtype=self.dtype, name="dla_up",
        )
        self.ida_up = ida_up_cls(
            channels[FIRST_LEVEL],
            channels[FIRST_LEVEL:LAST_LEVEL],
            [2 ** i for i in range(LAST_LEVEL - FIRST_LEVEL)],
            node_type=node_type,
            dtype=self.dtype,
            name="ida_up",
        )
        # match __call__'s second-stage gate (radar_pc AND middle): without
        # radar the secondary towers would exist as parameters but never run
        secondary = (
            tuple(h for h, _ in self.heads if h in SECONDARY_HEADS)
            if self.fusion_strategy == "middle" and self.radar_pc
            else ()
        )
        self.head_set = DetectHeadSet(
            heads=dict(self.heads),
            head_conv={k: tuple(v) for k, v in self.head_conv},
            secondary=secondary,
            remat=self.remat,
            fuse_towers=self.fused_heads,
            dtype=self.dtype,
            name="detect_head_0",
        )

    @property
    def pc_slice(self) -> int:
        return int(self.max_pc_dist) if self.one_hot_pc else 1

    def img2feats(self, x, train: bool = False):
        # NORM_EVAL (tune-mode ConvBN, base_model.py:55-62): the backbone's
        # BN keeps using (and not updating) running stats while heads train.
        # XLA folds eval-mode BN into the convs, so the memory/compute win of
        # the reference's fx graph rewrite falls out of jit for free.
        bn_train = train and not self.norm_eval
        if self.remat:
            # remat lifts require the static `train` flag positionally
            feats = self.base(x, bn_train)
            pyramid = self.dla_up(feats, bn_train)
            y = list(pyramid[: LAST_LEVEL - FIRST_LEVEL])
            y = self.ida_up(y, 0, len(y), bn_train)
        else:
            feats = self.base(x, train=bn_train)
            pyramid = self.dla_up(feats, train=bn_train)
            y = list(pyramid[: LAST_LEVEL - FIRST_LEVEL])
            y = self.ida_up(y, 0, len(y), train=bn_train)
        return y[-1]

    def __call__(self, image, pc_hm=None, pc_dep=None, calib=None, train: bool = False):
        """Forward pass.

        Args:
            image: (B, H, W, 3) normalized input.
            pc_hm: (B, Ho, Wo, C_pc) radar heatmap (training: GT-frustum or
                pre-normalized; eval non-frustum: ignored and recomputed).
            pc_dep: (B, Ho, Wo, C_pc) raw radar depth map [d, vx, vz].
            calib: (B, 3, 4).
            train: enables BN batch stats updates.

        Returns:
            list with one per-pyramid-level dict of NHWC float32 outputs.
        """
        x = image.astype(self.dtype)

        if self.radar_pc and not train and not (self.frustum and self.fusion_strategy == "middle"):
            # eval-time radar normalization (base_model.py:67-79):
            # depth channels -> 1 - d / max_dist
            s = self.pc_slice
            d = pc_dep[..., :s]
            pc_hm = jnp.concatenate(
                [1.0 - d / self.max_pc_dist, pc_dep[..., s:]], axis=-1
            )

        if self.radar_pc and self.fusion_strategy == "early":
            pc_in = resize_nearest(pc_hm, x.shape[1:3]).astype(x.dtype)
            x = jnp.concatenate([x, pc_in], axis=-1)

        feats = self.img2feats(x, train=train)

        y = self.head_set.first_stage(feats)
        y["calib"] = calib

        if self.radar_pc and self.fusion_strategy == "middle":
            # pc_hm_in mirrors what the reference ends up storing: its
            # eval-time normalization mutates pc_dep IN PLACE
            # (base_model.py:74-78), so outside the frustum path the stored
            # slice is the normalized map; train/frustum keep the raw slice
            pc_in_src = pc_hm if (not train and not self.frustum) else pc_dep
            y["pc_hm_in"] = pc_in_src[..., : self.pc_slice]
            if not train and self.frustum:
                # frustum association needs first-stage 2D boxes
                pc_hm = get_pc_frustum_heatmap(
                    y, pc_dep, calib, self.top_k, self.max_pc_dist,
                    approx_topk=self.approx_topk,
                )
            y["pc_hm"] = pc_hm[..., 0:1]
            y.update(
                self.head_set.second_stage(feats, pc_hm, self.pc_slice)
            )

        return [y]


def build_model(config, dtype=None) -> CenterFusionDLA:
    """Model factory from a finalized config (model/model.py:18-44)."""
    if dtype is None:
        dtype = jnp.bfloat16 if config.MIXED_PRECISION else jnp.float32
    arch = config.MODEL.ARCH
    if not (arch.startswith("dla") or arch.startswith("resnet")):
        raise NotImplementedError(f"architecture {arch!r} not implemented")
    return CenterFusionDLA(
        heads=tuple((k, int(v)) for k, v in config.heads.items()),
        head_conv=tuple((k, tuple(v)) for k, v in config.head_conv.items()),
        arch=arch,
        node=config.MODEL.DLA.NODE,
        fusion_strategy=config.MODEL.FUSION_STRATEGY,
        radar_pc=config.DATASET.RADAR_PC,
        frustum=config.MODEL.FRUSTUM,
        one_hot_pc=bool(config.DATASET.ONE_HOT_PC),
        max_pc_dist=float(config.DATASET.MAX_PC_DIST),
        top_k=int(config.MODEL.K),
        norm_eval=bool(config.MODEL.NORM_EVAL),
        remat=bool(config.TPU.get("REMAT", False)),
        dcn_impl=str(config.MODEL.DLA.get("DCN_IMPL", "auto")),
        dcn_max_offset=float(config.MODEL.DLA.get("DCN_MAX_OFFSET", 1.0)),
        dcn_correct_frac=float(config.MODEL.DLA.get("DCN_CORRECT_FRAC", 0.03)),
        dcn_correct_approx=bool(config.MODEL.DLA.get("DCN_CORRECT_APPROX",
                                                     True)),
        fused_heads=bool(config.MODEL.get("FUSED_HEAD_TOWERS", False)),
        approx_topk=bool(config.MODEL.get("APPROX_TOPK", False)),
        s2d_stem=bool(config.MODEL.DLA.get("S2D_STEM", True)),
        dcn_deep_impl=str(config.MODEL.DLA.get("DCN_DEEP_IMPL", "shift_hybrid")),
        dcn_deep_min_ch=int(config.MODEL.DLA.get("DCN_DEEP_MIN_CH", 256)),
        dtype=dtype,
    )
