from . import quaternion
from .observability import (
    trace_profile,
    plot_lr_schedule,
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
