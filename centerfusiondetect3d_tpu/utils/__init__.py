from . import quaternion
from .observability import (
    create_logger,
    AverageMeter,
    StageTimer,
    ToleranceCounter,
    DeviceHealthMonitor,
    estimate_cost,
    plot_history,
)

__all__ = [
    "quaternion",
    "create_logger",
    "AverageMeter",
    "StageTimer",
    "ToleranceCounter",
    "DeviceHealthMonitor",
    "estimate_cost",
    "plot_history",
]
