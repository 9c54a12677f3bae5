"""L3 solver layer and registry.

Registry names match the reference (ref src/solver/__init__.py:14-19).
"""

from .base import SolverBase, TORCH_OPTIMIZERS
from .mixed import MixedPatchContrastMaximization
from .objective import ObjectiveSpec, build_objective, build_value_grad_hvp
from .patch_base import PatchContrastMaximization, prepare_patch
from .pyramid import PyramidalPatchContrastMaximization
from .scipy_bridge import SCIPY_OPTIMIZERS, minimize
from .time_aware import TimeAwarePatchContrastMaximization
from .fleet import FleetPyramidalSolver
from .global_motion import GlobalMotionContrastMaximization

collections = {
    "pyramidal_patch_contrast_maximization": PyramidalPatchContrastMaximization,
    "time_aware_mixed_patch_contrast_maximization": TimeAwarePatchContrastMaximization,
    "mixed_patch_contrast_maximization": MixedPatchContrastMaximization,
    "fleet_pyramidal_patch_contrast_maximization": FleetPyramidalSolver,
    # new capability: whole-frame motion-model solve (no reference
    # counterpart; its rotational models were stripped)
    "global_contrast_maximization": GlobalMotionContrastMaximization,
}

__all__ = [
    "SolverBase",
    "FleetPyramidalSolver",
    "GlobalMotionContrastMaximization",
    "PatchContrastMaximization",
    "MixedPatchContrastMaximization",
    "TimeAwarePatchContrastMaximization",
    "PyramidalPatchContrastMaximization",
    "ObjectiveSpec",
    "build_objective",
    "build_value_grad_hvp",
    "prepare_patch",
    "minimize",
    "collections",
    "SCIPY_OPTIMIZERS",
    "TORCH_OPTIMIZERS",
]
