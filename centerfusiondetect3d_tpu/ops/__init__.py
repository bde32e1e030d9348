from .decode import heat_nms, topk_peaks, gather_feature, fusion_decode
from .frustum import frustum_association, get_pc_frustum_heatmap
from .postprocess import post_process

__all__ = [
    "heat_nms",
    "topk_peaks",
    "gather_feature",
    "fusion_decode",
    "frustum_association",
    "get_pc_frustum_heatmap",
    "post_process",
]
from .tta import flip_forward, SYMMETRIC_HEADS

__all__ += ["flip_forward", "SYMMETRIC_HEADS"]
from .rasterize import paint_rects_device, paint_rects_device_batch

__all__ += ["paint_rects_device", "paint_rects_device_batch"]
