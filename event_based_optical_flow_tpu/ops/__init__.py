"""L1 kernel layer: warp, IWE rasterization, blur, sobel, interpolation."""

from .blur import gaussian_blur3, gaussian_filter
from .iwe import (
    EventImageConverter,
    bilinear_vote,
    count_vote,
    event_mask,
)
from .interp import (
    pyramid_expand,
    pyramid_reduce,
    resize_flow,
    tile_to_dense_flow,
)
from .sobel import sobel_flow, sobel_xy
from .warp import (
    Warp,
    calculate_dt,
    calculate_reftime,
    flow_from_2d_translation,
    warp_2dof,
    warp_dense_flow,
    warp_voxel_flow,
)

__all__ = [
    "EventImageConverter",
    "Warp",
    "bilinear_vote",
    "count_vote",
    "event_mask",
    "gaussian_blur3",
    "gaussian_filter",
    "pyramid_expand",
    "pyramid_reduce",
    "resize_flow",
    "sobel_flow",
    "sobel_xy",
    "tile_to_dense_flow",
    "calculate_dt",
    "calculate_reftime",
    "flow_from_2d_translation",
    "warp_2dof",
    "warp_dense_flow",
    "warp_voxel_flow",
]
