from .mesh import (
    make_mesh,
    batch_sharding,
    spatial_sharding,
    replicated,
    shard_batch,
    replicate,
    gather_detections,
    DATA_AXIS,
    SPATIAL_AXIS,
    MODEL_AXIS,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "spatial_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "gather_detections",
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "MODEL_AXIS",
]
from .distributed import initialize, is_main_process, all_gather_detections

__all__ += ["initialize", "is_main_process", "all_gather_detections"]
from .mesh import tp_param_shardings, shard_params_tp

__all__ += ["tp_param_shardings", "shard_params_tp"]
