from .losses import cascade_depth_loss, smooth_l1
from .metrics import (
    abs_depth_error,
    interval_accuracy,
    normal_angle_error,
    threshold_accuracy,
)

__all__ = [
    "cascade_depth_loss",
    "smooth_l1",
    "abs_depth_error",
    "interval_accuracy",
    "normal_angle_error",
    "threshold_accuracy",
]
