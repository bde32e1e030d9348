from .coco import CocoReader
from .targets import TargetBuilder, cvt_pc_depth_to_heatmap
from .dataset import GenericDataset, NuScenesDataset, get_dataset, DATASETS
from .pipeline import Loader, stack_items, device_prefetch
from .synthetic import make_synthetic_nuscenes, make_synthetic_raw_tables
from . import radar, transforms

__all__ = [
    "CocoReader",
    "TargetBuilder",
    "cvt_pc_depth_to_heatmap",
    "GenericDataset",
    "NuScenesDataset",
    "get_dataset",
    "DATASETS",
    "Loader",
    "stack_items",
    "device_prefetch",
    "make_synthetic_nuscenes",
    "make_synthetic_raw_tables",
    "radar",
    "transforms",
]
