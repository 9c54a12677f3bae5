"""Pure-function cost kernels.

All functions return the 'natural' (unsigned) value; direction handling
(minimize flips sign, ratios invert) lives in the registry wrappers to
keep these jit-friendly primitives simple.

Variance uses ddof=1 (torch.var default) to match the reference torch
optimization path; the FWL *metric* in flow/metrics.py uses ddof=0 to
match the reference numpy evaluation path (the ratio is insensitive to
ddof except for the boundary-crop size mismatch the reference carries).
"""

import jax
import jax.numpy as jnp

from ..ops.sobel import sobel_flow, sobel_xy

Array = jax.Array


def nan_to_penalty(loss: Array, penalty: float = 1e10) -> Array:
    """Guard a cost against NaN.

    The reference returns 0 on NaN (patch_contrast_base.py:283-287), which
    makes NaN basins — e.g. a Burgers voxel blown up by an absurd candidate
    motion — look OPTIMAL (0 < any real loss) to every descent method and
    to argmin candidate sweeps.  We return a large finite penalty instead,
    so line searches and samplers reject those regions; at every finite
    point the value is identical to the reference."""
    return jnp.where(jnp.isnan(loss), jnp.asarray(penalty, loss.dtype), loss)


def variance(x: Array, ddof: int = 1) -> Array:
    n = x.size
    mean = jnp.mean(x)
    return jnp.sum(jnp.square(x - mean)) / jnp.maximum(n - ddof, 1)


def image_variance(iwe: Array, omit_boundary: bool = True, ddof: int = 1) -> Array:
    """Var(IWE), Gallego CVPR'18 (ref costs/image_variance.py:28-71)."""
    if omit_boundary:
        iwe = iwe[..., 1:-1, 1:-1]
    return variance(iwe, ddof)


def gradient_magnitude(iwe: Array, omit_boundary: bool = True) -> Array:
    """mean(||Sobel(IWE)/8||^2), Gallego CVPR'19
    (ref costs/gradient_magnitude.py:59-78, torch path)."""
    gx, gy = sobel_xy(iwe)
    gx = gx / 8.0
    gy = gy / 8.0
    if omit_boundary:
        gx = gx[..., 1:-1, 1:-1]
        gy = gy[..., 1:-1, 1:-1]
    return jnp.mean(jnp.square(gx) + jnp.square(gy))


def normalized_image_variance(iwe: Array, orig_iwe: Array, omit_boundary: bool = True, ddof: int = 1) -> Array:
    """Var(IWE)/Var(orig) in 'natural'/'maximize' orientation; the
    minimize wrapper inverts (FWL, Stoffregen ECCV'20;
    ref costs/normalized_image_variance.py:29-79 — note the reference
    crops only `iwe`, not `orig_iwe`; kept)."""
    if omit_boundary:
        iwe = iwe[..., 1:-1, 1:-1]
    return variance(iwe, ddof) / variance(orig_iwe, ddof)


def normalized_gradient_magnitude(iwe: Array, orig_iwe: Array, omit_boundary: bool = True) -> Array:
    """GradMag(IWE)/GradMag(orig) in natural orientation
    (ref costs/normalized_gradient_magnitude.py:62-94)."""
    return gradient_magnitude(iwe, omit_boundary) / gradient_magnitude(orig_iwe, omit_boundary)


def multi_focal_normalized_image_variance(
    orig_iwe: Array,
    forward_iwe: Array,
    backward_iwe: Array,
    middle_iwe=None,
    omit_boundary: bool = True,
    ddof: int = 1,
) -> Array:
    """Multi-reference focal loss (Shiba ECCV'22), minimize orientation:
    Var(orig)/Var(fwd) + Var(orig)/Var(bwd) [+ 2*Var(orig)/Var(mid)]
    (ref costs/multi_focal_normalized_image_variance.py:30-95; the
    reference crops boundaries *before* the ratio for this cost)."""
    if omit_boundary:
        forward_iwe = forward_iwe[..., 1:-1, 1:-1]
        backward_iwe = backward_iwe[..., 1:-1, 1:-1]
        if middle_iwe is not None:
            middle_iwe = middle_iwe[..., 1:-1, 1:-1]
    var_orig = variance(orig_iwe, ddof)
    loss = var_orig / variance(forward_iwe, ddof) + var_orig / variance(backward_iwe, ddof)
    if middle_iwe is not None:
        loss = loss + 2.0 * var_orig / variance(middle_iwe, ddof)
    return loss


def multi_focal_normalized_gradient_magnitude(
    orig_iwe: Array,
    forward_iwe: Array,
    backward_iwe: Array,
    middle_iwe=None,
    omit_boundary: bool = True,
) -> Array:
    """Multi-reference focal loss, gradient-magnitude flavor — the cost of
    both shipped reference configs
    (ref costs/multi_focal_normalized_gradient_magnitude.py:75-104)."""
    g_orig = gradient_magnitude(orig_iwe, omit_boundary)
    loss = g_orig / gradient_magnitude(forward_iwe, omit_boundary)
    loss = loss + g_orig / gradient_magnitude(backward_iwe, omit_boundary)
    if middle_iwe is not None:
        loss = loss + 2.0 * g_orig / gradient_magnitude(middle_iwe, omit_boundary)
    return loss


def total_variation(flow: Array, omit_boundary: bool = True) -> Array:
    """mean |Sobel(flow)/8| over the 4 (dxx,dyy,dyx,dxy) channels — L1 TV
    regularizer (ref costs/total_variation.py:62-115).  The reference only
    crops the ring when the spatial dims exceed 2, kept for tiny tile
    grids."""
    sob = sobel_flow(flow) / 8.0
    if omit_boundary and sob.shape[-2] > 2 and sob.shape[-1] > 2:
        sob = sob[..., 1:-1, 1:-1]
    return jnp.mean(jnp.abs(sob))


def hybrid_loss(values: dict, weights: dict) -> Array:
    """Weighted sum with the reference 'inv' convention: weight value
    "inv" contributes 1/loss (ref costs/hybrid.py:48-57)."""
    total = 0.0
    for name, value in values.items():
        w = weights[name]
        if w == "inv":
            total = total + 1.0 / value
        else:
            total = total + w * value
    return total
