"""Flow-map file IO — DSEC-benchmark submission format.

The DSEC optical-flow benchmark exchanges flow as 16-bit 3-channel
PNGs: R = u * 128 + 2^15 (width-direction displacement), G = v * 128 +
2^15 (height-direction), B = valid mask (> 0).  The reference has no
writer (it only evaluates against MVSEC GT); production users
submitting to the benchmark need one, and it must be the exact inverse
of the loader's decode (data/dsec.py:103-105).

PIL cannot write 48-bit RGB PNGs and cv2 is not a framework dependency,
so the encoder is self-contained (zlib, filter-0 scanlines, 16-bit
big-endian samples per the PNG spec).
"""

import struct
import zlib

import numpy as np


def encode_png16(img: np.ndarray) -> bytes:
    """[H, W, 3] uint16 -> 16-bit RGB PNG bytes (filter 0 scanlines)."""
    img = np.ascontiguousarray(img, np.uint16)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"expected [H, W, 3], got {img.shape}")
    raw = b"".join(b"\x00" + img[i].astype(">u2").tobytes() for i in range(h))

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def write_flow_dsec_png(path, flow: np.ndarray, valid: np.ndarray = None) -> None:
    """Write a [2, H, W] displacement field (framework convention:
    flow[0] = height direction, flow[1] = width direction; PIXELS over
    the window) as a DSEC submission PNG.  ``valid`` ([H, W] bool-like)
    defaults to all-valid.  Values are clipped to the representable
    ±255.99 px range and quantized to 1/128 px — the loader's decode
    recovers them to that precision."""
    flow = np.asarray(flow, np.float64)
    if flow.ndim != 3 or flow.shape[0] != 2:
        raise ValueError(f"expected [2, H, W] flow, got {flow.shape}")
    _, h, w = flow.shape
    u = flow[1]  # width direction -> R channel
    v = flow[0]  # height direction -> G channel
    img = np.zeros((h, w, 3), np.uint16)
    img[..., 0] = np.clip(np.rint(u * 128.0 + 2**15), 0, 65535).astype(np.uint16)
    img[..., 1] = np.clip(np.rint(v * 128.0 + 2**15), 0, 65535).astype(np.uint16)
    img[..., 2] = (
        np.ones((h, w), np.uint16)
        if valid is None
        else (np.asarray(valid) > 0).astype(np.uint16)
    )
    with open(path, "wb") as f:
        f.write(encode_png16(img))


def save_flow_frame(out_dir, frame_index: int, flow: np.ndarray, fmt: str) -> None:
    """Per-frame flow dump for the eval loops (``output.save_flow``):
    ``dsec_png`` -> <out_dir>/flow_submission/<NNNNNN>.png (benchmark
    layout), ``npz`` -> flow_submission/<NNNNNN>.npz with key ``flow``
    [2, H, W] float32."""
    import os

    sub = os.path.join(out_dir, "flow_submission")
    os.makedirs(sub, exist_ok=True)
    if fmt == "dsec_png":
        write_flow_dsec_png(os.path.join(sub, f"{frame_index:06d}.png"), flow)
    elif fmt == "npz":
        np.savez_compressed(
            os.path.join(sub, f"{frame_index:06d}.npz"),
            flow=np.asarray(flow, np.float32),
        )
    else:
        raise ValueError(f"unknown save_flow format {fmt!r} (dsec_png | npz)")
