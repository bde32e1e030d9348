from .primitives import (
    fast_focal_loss,
    reg_weighted_l1,
    weighted_bce,
    bin_rot_loss,
    uncertainty_depth_loss,
    decoupled_loss,
    giou_2d,
    bbox2d_loss,
    bbox3d_loss,
)
from .generic import GenericLoss, build_layer_masks, SIZE_THRESH

__all__ = [
    "fast_focal_loss",
    "reg_weighted_l1",
    "weighted_bce",
    "bin_rot_loss",
    "uncertainty_depth_loss",
    "decoupled_loss",
    "giou_2d",
    "bbox2d_loss",
    "bbox3d_loss",
    "GenericLoss",
    "build_layer_masks",
    "SIZE_THRESH",
]
