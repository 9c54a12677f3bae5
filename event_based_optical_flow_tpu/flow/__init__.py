"""Flow-field utilities: time-aware PDE propagation, metrics, GT handling."""

from .voxel import (
    burgers_step,
    construct_dense_flow_voxel,
    propagate_flow_to_voxel,
    upwind_step,
)
from .metrics import calculate_flow_error, calculate_flow_error_numpy
from .gt import estimate_corresponding_gt_flow, generate_dense_optical_flow

__all__ = [
    "upwind_step",
    "burgers_step",
    "construct_dense_flow_voxel",
    "propagate_flow_to_voxel",
    "calculate_flow_error",
    "calculate_flow_error_numpy",
    "estimate_corresponding_gt_flow",
    "generate_dense_optical_flow",
]
