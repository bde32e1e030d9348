"""GenericLoss: the full multi-head training objective.

Re-design of the reference orchestrator
(/root/reference/src/lib/model/genericLoss.py:18-337): per-pyramid-layer
target assignment by bbox-area thresholds, focal heatmap loss, (uncertainty)
depth losses, auxiliary lidar/radar depth-map losses, masked L1 regressions
(with MonoFlex decoupled amodal offset), 2-bin rotation losses, attribute BCE,
and optional GIoU-2D / corner-3D decode losses. Pure function of
(outputs, batch) given a static config snapshot — jit-compiles into the train
step.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from .primitives import (
    fast_focal_loss,
    reg_weighted_l1,
    weighted_bce,
    bin_rot_loss,
    uncertainty_depth_loss,
    decoupled_loss,
    bbox2d_loss,
    bbox3d_loss,
)
from ..models.heads import sigmoid_depth

# bbox-area fractions separating pyramid layers (generic_dataset.py:106-109)
SIZE_THRESH = (0.0, 0.0018, 0.0085)

_REGRESSION_HEADS = ("reg", "widthHeight", "dimension", "amodal_offset", "velocity")


def build_layer_masks(width_height, output_size, n_layers: int):
    """(B, M, 2) box sizes -> (B, L, M) layer membership (genericLoss.py:304-336)."""
    area = width_height[..., 0] * width_height[..., 1]
    frac = area / float(output_size[0] * output_size[1])
    masks = []
    for i in range(n_layers):
        lo = SIZE_THRESH[i]
        if i + 1 < len(SIZE_THRESH) and i + 1 < n_layers:
            hi = SIZE_THRESH[i + 1]
            masks.append((frac > lo) & (frac < hi))
        else:
            masks.append(frac > lo)
    return jnp.stack(masks, axis=1)


class GenericLoss:
    """Callable loss. Static config is captured at construction."""

    def __init__(self, config):
        self.heads = dict(config.heads)
        self.weights = dict(config.weights)
        self.norm2d = bool(config.MODEL.NORM_2D)
        self.output_size = tuple(config.MODEL.OUTPUT_SIZE)
        self.decouple = bool(config.DATASET.DECOUPLE_REP)
        self.uncertainty = bool(config.TRAIN.UNCERTAINTY_LOSS)

    def __call__(self, outputs: List[Dict[str, Any]], batch: Dict[str, Any],
                 train: bool = True):
        """Returns (total, dict of per-head scalars)."""
        losses: Dict[str, jnp.ndarray] = {h: jnp.float32(0.0) for h in self.heads}
        losses["total"] = jnp.float32(0.0)
        for aux in ("lidar_depth", "radar_depth", "bbox2d", "bbox3d"):
            if self.weights.get(aux, 0) > 0:
                losses[aux] = jnp.float32(0.0)

        n_layers = len(outputs)
        layer_masks = build_layer_masks(
            batch["widthHeight"], self.output_size, n_layers
        )  # (B, L, M)
        out_size = jnp.array(self.output_size, jnp.float32)

        def lay(data, lm):
            """Zero out entries not belonging to this layer."""
            m = lm
            while m.ndim < data.ndim:
                m = m[..., None]
            return jnp.where(m, data, jnp.zeros_like(data))

        for i, output in enumerate(outputs):
            lm = layer_masks[:, i]  # (B, M)
            class_ids = lay(batch["classIds"], lm).astype(jnp.int32)

            layer_hw = jnp.array(output["heatmap"].shape[1:3], jnp.float32)
            scale = layer_hw / out_size  # (2,) [h, w] scale
            centers = lay(batch["target"]["heatCenters"], lm)  # (B, M, 2) [x, y]
            centers_layer = (centers * scale[::-1]).astype(jnp.int32)
            ind = centers_layer[..., 1] * output["heatmap"].shape[2] + centers_layer[..., 0]

            mask = lay(batch["mask"], lm)  # (B, M)

            # ---- heatmap focal loss
            hm_loss = fast_focal_loss(
                output["heatmap"], batch[f"heatmap{i}"], ind, mask, class_ids
            )
            losses["heatmap"] = losses["heatmap"] + hm_loss
            losses["total"] = losses["total"] + hm_loss * self.weights["heatmap"]

            # ---- object depth losses (depth / depth2, optional uncertainty)
            for dh in ("depth", "depth2"):
                if dh not in output:
                    continue
                if dh not in losses:
                    losses[dh] = jnp.float32(0.0)
                dmask = lay(
                    jnp.broadcast_to(batch["mask"][..., None], batch["depth"].shape), lm
                )
                dtarget = lay(batch["depth"], lm)
                if train and self.uncertainty and "uncertainty" in output:
                    unc = jnp.clip(output["uncertainty"], -10, 10)
                    d_loss, u_loss = uncertainty_depth_loss(
                        output[dh], dmask, ind, dtarget, unc
                    )
                    losses["total"] = losses["total"] + u_loss * self.weights["depth"]
                else:
                    d_loss = reg_weighted_l1(output[dh], dmask, ind, dtarget)
                    losses["total"] = losses["total"] + d_loss * self.weights["depth"]
                losses[dh] = losses[dh] + d_loss

            # ---- auxiliary point-cloud depth-map losses
            if self.weights.get("lidar_depth", 0) > 0 or self.weights.get("radar_depth", 0) > 0:
                depth_map = (
                    sigmoid_depth(output["depthMap"])
                    if "depthMap" in output
                    else output["depth2" if "depth2" in output else "depth"]
                )
                for aux, key in (("lidar_depth", "pc_lidar"), ("radar_depth", "pc_2d")):
                    if self.weights.get(aux, 0) <= 0 or key not in batch:
                        continue
                    pc = batch[key][..., :3]  # (B, N, 3) [x, y, d]
                    pc_mask = pc > 0
                    pts = (pc[..., :2] * scale[::-1]).astype(jnp.int32)
                    pc_ind = pts[..., 1] * output["heatmap"].shape[2] + pts[..., 0]
                    aux_loss = reg_weighted_l1(depth_map, pc_mask, pc_ind, pc[..., 2:])
                    losses[aux] = losses[aux] + aux_loss
                    losses["total"] = losses["total"] + aux_loss * self.weights[aux]

            # ---- plain L1 regressions (+ decoupled amodal offset)
            reg_heads = list(_REGRESSION_HEADS)
            if self.decouple and "amodal_offset" in output:
                reg_heads.remove("amodal_offset")
                amask = lay(
                    jnp.broadcast_to(
                        batch["mask"][..., None], batch["amodal_offset"].shape
                    ),
                    lm,
                )
                trunc = lay(
                    jnp.broadcast_to(
                        batch["truncMask"][..., None], batch["amodal_offset"].shape
                    ),
                    lm,
                )
                dec = decoupled_loss(
                    output["amodal_offset"], amask, ind,
                    lay(batch["amodal_offset"], lm), trunc,
                )
                losses["amodal_offset"] = losses["amodal_offset"] + dec
                losses["total"] = losses["total"] + dec * self.weights["amodal_offset"]

            for head in reg_heads:
                if head not in output or head not in batch:
                    continue
                hmask = lay(
                    jnp.broadcast_to(batch["mask"][..., None], batch[head].shape), lm
                )
                r_loss = reg_weighted_l1(output[head], hmask, ind, lay(batch[head], lm))
                losses[head] = losses[head] + r_loss
                losses["total"] = losses["total"] + r_loss * self.weights[head]

            # ---- rotation bins
            for rh in ("rotation", "rotation2"):
                if rh not in output:
                    continue
                r_loss = bin_rot_loss(
                    output[rh], mask, ind,
                    lay(batch["rotbin"], lm), lay(batch["rotres"], lm),
                )
                losses[rh] = losses[rh] + r_loss
                losses["total"] = losses["total"] + r_loss * self.weights[rh]

            # ---- nuscenes attributes
            if "nuscenes_att" in output and "nuscenes_att" in batch:
                att_loss = weighted_bce(
                    output["nuscenes_att"],
                    lay(batch["nuscenes_att_mask"], lm),
                    ind,
                    lay(batch["nuscenes_att"], lm),
                )
                losses["nuscenes_att"] = losses["nuscenes_att"] + att_loss
                losses["total"] = losses["total"] + att_loss * self.weights["nuscenes_att"]

            # ---- decode losses
            if "bbox2d" in losses and "reg" in output and "widthHeight" in output:
                wh = output["widthHeight"]
                if self.norm2d:
                    wh = jax.nn.sigmoid(wh)
                    wh = wh * jnp.array(
                        [self.output_size[1], self.output_size[0]], jnp.float32
                    )
                b2 = bbox2d_loss(
                    output["reg"], wh, centers_layer.astype(jnp.float32),
                    lay(batch["target"]["bboxes"], lm), ind, lm,
                )
                losses["bbox2d"] = losses["bbox2d"] + b2
                losses["total"] = losses["total"] + b2 * self.weights["bbox2d"]

            if "bbox3d" in losses:
                depth_head = "depth2" if "depth2" in output else "depth"
                needed = {"rotation", depth_head, "dimension", "amodal_offset"}
                if needed <= set(output) and "trans_mat" in batch:
                    # trans_mat_valid masks hflipped samples (see
                    # data/dataset.py: their corner targets are unflipped)
                    m3 = lm
                    if "trans_mat_valid" in batch:
                        m3 = lm * batch["trans_mat_valid"][:, None]
                    b3 = bbox3d_loss(
                        output, centers_layer.astype(jnp.float32),
                        batch["trans_mat"], batch["calib"],
                        lay(batch["target"]["bboxes3d"], lm), ind, m3, depth_head,
                    )
                    losses["bbox3d"] = losses["bbox3d"] + b3
                    losses["total"] = losses["total"] + b3 * self.weights["bbox3d"]

        losses["total"] = losses["total"] / n_layers
        return losses["total"], losses
