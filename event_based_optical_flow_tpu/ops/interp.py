"""Tile-grid -> dense-flow interpolation and pyramid resampling.

Parity targets:

* ``tile_to_dense_flow`` — reference
  ``interpolate_dense_flow_from_patch_tensor`` (patch_contrast_base.py:462-506):
  negate the per-tile motion, replicate-pad by a patch-geometry-derived
  margin, upscale by the sliding-window factor (bilinear, half-pixel
  convention = torchvision ``align_corners=False``), then center-crop to
  the sensor size.  ``jax.image.resize(method="linear")`` uses the same
  half-pixel convention.
* ``pyramid_expand`` / ``pyramid_reduce`` — used only for coarse<->fine
  initialization feedback (reference uses skimage.transform.pyramid_*,
  patch_contrast_pyramid.py:220-223,265-267): factor-2 bilinear resize
  combined with a sigma = 2*factor/6 gaussian smooth.  These run host-side
  on tiny arrays (at most 16x16 tiles), so they are plain numpy.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def resize_flow(flow: Array, out_hw: Tuple[int, int], method: str = "bilinear") -> Array:
    """Resize a [..., H, W] array. 'bilinear' matches torch align_corners=False;
    'nearest' matches torch F.interpolate nearest (src = floor(dst * in/out))."""
    out_shape = flow.shape[:-2] + tuple(out_hw)
    if method == "bilinear":
        return jax.image.resize(flow, out_shape, method="linear")
    if method == "nearest":
        in_h, in_w = flow.shape[-2], flow.shape[-1]
        ih = (jnp.arange(out_hw[0]) * in_h // out_hw[0]).astype(jnp.int32)
        iw = (jnp.arange(out_hw[1]) * in_w // out_hw[1]).astype(jnp.int32)
        return flow[..., ih[:, None], iw[None, :]]
    raise ValueError(f"Unknown filter type {method!r}")


def tile_to_dense_flow(
    motion: Array,
    patch_image_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    patch_size: Tuple[int, int],
    sliding_window: Tuple[int, int],
    patch_shift: Tuple[int, int] = (0, 0),
    filter_type: str = "bilinear",
) -> Array:
    """[2 * h_p * w_p] tile motions -> [2, H, W] dense flow (negated)."""
    pad_h = int(patch_size[0] / 2 // sliding_window[0]) + patch_shift[0] // sliding_window[0] + 1
    pad_w = int(patch_size[1] / 2 // sliding_window[1]) + patch_shift[1] // sliding_window[1] + 1
    arr = -motion.reshape((2,) + tuple(patch_image_size))
    arr = jnp.pad(arr, ((0, 0), (pad_h, pad_h), (pad_w, pad_w)), mode="edge")
    out_hw = (arr.shape[1] * sliding_window[0], arr.shape[2] * sliding_window[1])
    dense = resize_flow(arr, out_hw, filter_type)
    cx, cy = dense.shape[1] // 2, dense.shape[2] // 2
    h1 = cx - image_shape[0] // 2
    w1 = cy - image_shape[1] // 2
    return dense[..., h1 : h1 + image_shape[0], w1 : w1 + image_shape[1]]


# ---------------------------------------------------------------------------
# Host-side pyramid resampling (numpy): only used for initialization
# feedback on tiny tile grids.


def _np_gaussian1d(sigma: float) -> np.ndarray:
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _np_smooth(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian along the last two axes, symmetric boundary."""
    k = _np_gaussian1d(sigma)
    r = len(k) // 2
    out = img.astype(np.float64)
    for axis in (-2, -1):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (r, r)
        padded = np.pad(out, pad, mode="symmetric")
        acc = np.zeros_like(out)
        n = out.shape[axis]
        for i, c in enumerate(k):
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(i, i + n)
            acc += c * padded[tuple(sl)]
        out = acc
    return out


def _np_resize_bilinear(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Half-pixel bilinear resize with edge clamping, numpy, last two axes."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    ys = (np.arange(oh) + 0.5) * in_h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * in_w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    a = img[..., y0[:, None], x0[None, :]]
    b = img[..., y0[:, None], x1[None, :]]
    c = img[..., y1[:, None], x0[None, :]]
    d = img[..., y1[:, None], x1[None, :]]
    top = a * (1 - wx)[None, :] + b * wx[None, :]
    bot = c * (1 - wx)[None, :] + d * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def _resize_bilinear_jax(img: Array, out_hw: Tuple[int, int]) -> Array:
    """jnp twin of _np_resize_bilinear: half-pixel bilinear with edge
    clamping along the last two axes.  Index/weight tables are computed in
    numpy at trace time (static shapes), so the compiled program is four
    static gathers + a lerp."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    ys = (np.arange(oh) + 0.5) * in_h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * in_w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = jnp.asarray(np.clip(ys - y0, 0.0, 1.0), img.dtype)
    wx = jnp.asarray(np.clip(xs - x0, 0.0, 1.0), img.dtype)
    a = img[..., y0[:, None], x0[None, :]]
    b = img[..., y0[:, None], x1[None, :]]
    c = img[..., y1[:, None], x0[None, :]]
    d = img[..., y1[:, None], x1[None, :]]
    top = a * (1 - wx)[None, :] + b * wx[None, :]
    bot = c * (1 - wx)[None, :] + d * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def _smooth_jax(img: Array, sigma: float) -> Array:
    """jnp twin of _np_smooth: separable gaussian, symmetric boundary,
    last two axes; tap loop unrolled at trace time."""
    k = _np_gaussian1d(sigma)
    r = len(k) // 2
    out = img
    for axis in (-2, -1):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (r, r)
        padded = jnp.pad(out, pad, mode="symmetric")
        n = out.shape[axis]
        acc = jnp.zeros_like(out)
        for i, c in enumerate(k):
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(i, i + n)
            acc = acc + jnp.asarray(c, img.dtype) * padded[tuple(sl)]
        out = acc
    return out


def pyramid_expand_jax(motion: Array, upscale: int = 2) -> Array:
    """Device-side pyramid_expand (same math as the numpy version below):
    used by the fused whole-frame solve chain so the coarse->fine
    initialization never leaves the device."""
    out_hw = (motion.shape[-2] * upscale, motion.shape[-1] * upscale)
    up = _resize_bilinear_jax(motion, out_hw)
    return _smooth_jax(up, 2.0 * upscale / 6.0)


def pyramid_expand(motion: np.ndarray, upscale: int = 2) -> np.ndarray:
    """[c, h, w] -> [c, h*2, w*2]: bilinear upsample then smooth
    (skimage pyramid_expand equivalent, sigma = 2*upscale/6)."""
    motion = np.asarray(motion, dtype=np.float64)
    out_hw = (motion.shape[-2] * upscale, motion.shape[-1] * upscale)
    up = _np_resize_bilinear(motion, out_hw)
    return _np_smooth(up, 2.0 * upscale / 6.0)


def pyramid_reduce(motion: np.ndarray, downscale: int = 2) -> np.ndarray:
    """[c, h, w] -> [c, ceil(h/2), ceil(w/2)]: smooth then downsample
    (skimage pyramid_reduce equivalent)."""
    motion = np.asarray(motion, dtype=np.float64)
    smoothed = _np_smooth(motion, 2.0 * downscale / 6.0)
    out_hw = (
        int(math.ceil(motion.shape[-2] / downscale)),
        int(math.ceil(motion.shape[-1] / downscale)),
    )
    return _np_resize_bilinear(smoothed, out_hw)
