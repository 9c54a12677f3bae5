"""Gaussian blurs, implemented as separable shift-and-add stencils so XLA
fuses them into neighboring elementwise work (no conv dispatch needed for
3- to 9-tap kernels).

Two variants mirror the two blur flavors in the reference:

* ``gaussian_blur3`` — torchvision ``gaussian_blur(kernel_size=3, sigma)``
  with *reflect* (mirror, edge not repeated) padding; this is the blur on
  the reference torch optimization path (ref event_image_converter.py:158).
* ``gaussian_filter`` — scipy ``ndimage.gaussian_filter`` semantics:
  truncate=4.0 (radius = round(4*sigma)), *symmetric* ("reflect" in scipy
  terms) padding; the reference numpy/metrics path (ref :122-123).
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _separable_blur(image: Array, kernel: Sequence[float], pad_mode: str) -> Array:
    """Apply a 1-D kernel along the last two axes with the given padding."""
    k = len(kernel)
    r = k // 2
    h, w = image.shape[-2], image.shape[-1]
    pad_cfg = [(0, 0)] * (image.ndim - 2)

    padded = jnp.pad(image, pad_cfg + [(r, r), (0, 0)], mode=pad_mode)
    out = sum(kernel[i] * padded[..., i : i + h, :] for i in range(k))
    padded = jnp.pad(out, pad_cfg + [(0, 0), (r, r)], mode=pad_mode)
    out = sum(kernel[i] * padded[..., :, i : i + w] for i in range(k))
    return out


def _gaussian_kernel1d(sigma: float, radius: int) -> list:
    xs = [math.exp(-0.5 * ((i - radius) / sigma) ** 2) for i in range(2 * radius + 1)]
    s = sum(xs)
    return [x / s for x in xs]


def gaussian_blur3(image: Array, sigma: float) -> Array:
    """3-tap separable gaussian, reflect padding (torchvision parity)."""
    kernel = _gaussian_kernel1d(float(sigma), 1)
    return _separable_blur(image, kernel, "reflect")


def gaussian_filter(image: Array, sigma: float, truncate: float = 4.0) -> Array:
    """scipy.ndimage.gaussian_filter parity (symmetric boundary)."""
    radius = int(truncate * float(sigma) + 0.5)
    if radius < 1:
        return image
    kernel = _gaussian_kernel1d(float(sigma), radius)
    return _separable_blur(image, kernel, "symmetric")
