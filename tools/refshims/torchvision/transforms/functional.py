"""Minimal torchvision shim reproducing the exact ops the reference uses:
gaussian_blur(kernel_size=3, sigma) and resize (bilinear/nearest)."""
import enum
import torch
from torch.nn import functional as Fnn


class InterpolationMode(enum.Enum):
    BILINEAR = "bilinear"
    NEAREST = "nearest"


def _kernel1d(ksize, sigma, dtype, device):
    half = (ksize - 1) * 0.5
    x = torch.linspace(-half, half, steps=ksize, dtype=dtype, device=device)
    pdf = torch.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def gaussian_blur(img, kernel_size, sigma):
    if isinstance(kernel_size, int):
        kernel_size = [kernel_size, kernel_size]
    if isinstance(sigma, (int, float)):
        sigma = [float(sigma), float(sigma)]
    dtype = img.dtype if torch.is_floating_point(img) else torch.float32
    kx = _kernel1d(kernel_size[0], sigma[0], dtype, img.device)
    ky = _kernel1d(kernel_size[1], sigma[1], dtype, img.device)
    kernel = torch.mm(ky[:, None], kx[None, :])
    b, c, h, w = img.shape
    kernel = kernel.expand(c, 1, kernel.shape[0], kernel.shape[1])
    pad = [kernel_size[0] // 2, kernel_size[0] // 2, kernel_size[1] // 2, kernel_size[1] // 2]
    out = Fnn.pad(img, pad, mode="reflect")
    return Fnn.conv2d(out, kernel, groups=c)


def resize(img, size, interpolation=InterpolationMode.BILINEAR, antialias=None):
    mode = interpolation.value if isinstance(interpolation, InterpolationMode) else str(interpolation)
    need_squeeze = img.ndim == 3
    if need_squeeze:
        img = img[None]
    if mode == "bilinear":
        out = Fnn.interpolate(img, size=list(size), mode="bilinear", align_corners=False, antialias=False)
    else:
        out = Fnn.interpolate(img, size=list(size), mode="nearest")
    return out[0] if need_squeeze else out
