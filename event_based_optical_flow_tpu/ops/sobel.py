"""3x3 Sobel stencils matching the reference ``SobelTorch`` module
(ref src/utils/stat_utils.py:13-83): zero-padded correlation with

    Gx = [[-1,-2,-1],[0,0,0],[1,2,1]]   (gradient along the height axis)
    Gy = [[-1,0,1],[-2,0,2],[-1,0,1]]   (gradient along the width axis)

Implemented as shift-and-add so XLA fuses them with the surrounding
square/abs/mean reductions of the cost functions.
"""

import jax
import jax.numpy as jnp

Array = jax.Array

_GX = ((-1.0, -2.0, -1.0), (0.0, 0.0, 0.0), (1.0, 2.0, 1.0))
_GY = ((-1.0, 0.0, 1.0), (-2.0, 0.0, 2.0), (-1.0, 0.0, 1.0))


def _correlate3(image: Array, kernel) -> Array:
    h, w = image.shape[-2], image.shape[-1]
    pad_cfg = [(0, 0)] * (image.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(image, pad_cfg)
    out = None
    for i in range(3):
        for j in range(3):
            c = kernel[i][j]
            if c == 0.0:
                continue
            term = c * p[..., i : i + h, j : j + w]
            out = term if out is None else out + term
    return out


def sobel_xy(image: Array):
    """Return (gx, gy) for a [..., H, W] image (SobelTorch 1-channel mode)."""
    return _correlate3(image, _GX), _correlate3(image, _GY)


def sobel_flow(flow: Array) -> Array:
    """SobelTorch 2-channel mode on a [..., 2, H, W] flow: returns
    [..., 4, H, W] channels (dxx, dyy, dyx, dxy) — Sobel_x on the
    u-component, Sobel_y on v, Sobel_x on v, Sobel_y on u
    (ref stat_utils.py:70-78)."""
    u = flow[..., 0, :, :]
    v = flow[..., 1, :, :]
    dxx = _correlate3(u, _GX)
    dyy = _correlate3(v, _GY)
    dyx = _correlate3(v, _GX)
    dxy = _correlate3(u, _GY)
    return jnp.stack([dxx, dyy, dyx, dxy], axis=-3)
