"""Time-aware single-scale tile solver (registry name
``time_aware_mixed_patch_contrast_maximization``).

Mirrors reference ``TimeAwarePatchContrastMaximization``
(src/solver/time_aware_patch_contrast.py): a MixedPatch solver whose
dense flow is propagated into a [time_bin, 2, H, W] voxel (upwind /
Burgers / direct schemes) before warping.  The voxelization happens
inside the jitted objective (ObjectiveSpec.time_aware=True), so this
subclass only overrides the host-side ``motion_to_dense_flow`` used by
metrics and visualization.
"""

import jax.numpy as jnp
import numpy as np

from ..flow.voxel import construct_dense_flow_voxel
from .mixed import MixedPatchContrastMaximization


class TimeAwarePatchContrastMaximization(MixedPatchContrastMaximization):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert self.is_time_aware

    def motion_to_dense_flow(self, motion_array):
        """[2, h_p, w_p] tiles -> [time_bin, 2, H, W] voxel
        (ref time_aware_patch_contrast.py:41-79)."""
        motion_array = np.asarray(motion_array, dtype=np.float64)
        scale = motion_array.max() if self.scale_later else 1.0
        dense_t0 = self.interpolate_dense_flow_from_patch(motion_array / scale)
        voxel = construct_dense_flow_voxel(
            jnp.asarray(dense_t0),
            self.time_bin,
            self.flow_interpolation,
            t0_location=self.t0_flow_location,
        )
        return np.asarray(voxel) * scale
