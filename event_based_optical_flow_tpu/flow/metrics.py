"""Flow accuracy metrics: EPE/AEE, N-pixel outlier rates, angular error.

Parity target: reference ``src/utils/flow_utils.py:643-758``
(``calculate_flow_error_tensor`` / ``_numpy``): errors are computed over
pixels where the GT is finite and nonzero in *both* components, optionally
intersected with the event mask; counts are normalized per batch item.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PE_THRESHOLDS = (1, 2, 3, 5, 10, 20)


@partial(jax.jit, static_argnames=())
def calculate_flow_error(
    flow_gt: Array,
    flow_pred: Array,
    event_mask: Optional[Array] = None,
    time_scale: Optional[Array] = None,
) -> dict:
    """flow_gt, flow_pred: [B, 2, H, W]; event_mask: [B, 1, H, W] or None.

    Returns {'EPE', '1PE', ..., '20PE', 'AE'} scalars.
    """
    gt_u = flow_gt[:, 0:1]
    gt_v = flow_gt[:, 1:2]
    flow_mask = (
        (~jnp.isinf(gt_u)) & (~jnp.isinf(gt_v)) & (jnp.abs(gt_u) > 0) & (jnp.abs(gt_v) > 0)
    )
    total_mask = flow_mask if event_mask is None else (event_mask & flow_mask)
    gt_masked = jnp.where(jnp.isinf(flow_gt), 0.0, flow_gt) * total_mask
    pred_masked = flow_pred * total_mask
    n_points = jnp.sum(total_mask, axis=(1, 2, 3)) + 1e-5

    if time_scale is not None:
        ts = time_scale.reshape(-1, 1, 1, 1)
        gt_masked = gt_masked * ts
        pred_masked = pred_masked * ts

    diff = gt_masked - pred_masked
    epe = jnp.sqrt(jnp.sum(jnp.square(diff), axis=1))  # [B, H, W]
    errors = {"EPE": jnp.mean(jnp.sum(epe, axis=(1, 2)) / n_points)}
    for thr in _PE_THRESHOLDS:
        errors[f"{thr}PE"] = jnp.mean(jnp.sum(epe > thr, axis=(1, 2)) / n_points)

    u, v = pred_masked[:, 0], pred_masked[:, 1]
    u_gt, v_gt = gt_masked[:, 0], gt_masked[:, 1]
    cosang = (1.0 + u * u_gt + v * v_gt) / (
        jnp.sqrt(1 + u * u + v * v) * jnp.sqrt(1 + u_gt * u_gt + v_gt * v_gt)
    )
    ae = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    errors["AE"] = jnp.mean(jnp.sum(ae, axis=(1, 2)) / n_points)
    return errors


def calculate_flow_error_numpy(
    flow_gt: np.ndarray,
    flow_pred: np.ndarray,
    event_mask: Optional[np.ndarray] = None,
) -> dict:
    """Host convenience wrapper returning python floats."""
    out = calculate_flow_error(
        jnp.asarray(flow_gt),
        jnp.asarray(flow_pred),
        None if event_mask is None else jnp.asarray(event_mask),
    )
    return {k: float(v) for k, v in out.items()}
