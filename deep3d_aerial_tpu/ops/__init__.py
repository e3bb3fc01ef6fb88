from .warp import (
    bilinear_sample,
    plane_sweep_warp,
    relative_projection,
)
from .depth_samplers import (
    uniform_depth_samples,
    window_depth_samples,
)

__all__ = [
    "bilinear_sample",
    "plane_sweep_warp",
    "relative_projection",
    "uniform_depth_samples",
    "window_depth_samples",
]
