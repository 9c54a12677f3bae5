"""First-party native (C++) host-runtime components.

The TPU compute path is jax/XLA/Pallas; the host data path around it —
packing event streams into the chunked layouts the fused rasterizers
consume — is native C++ (``packer.cpp``), built lazily with the system
``g++`` and loaded through ctypes.  Everything degrades gracefully: when
the toolchain or a prebuilt ``.so`` is unavailable, callers fall back to
the vectorized-Python packers (``pack_chunks`` returns ``None``).

Build artifacts are content-addressed in ``~/.cache/evflow_jax/native``
so rebuilds happen only when the C++ source changes.
"""

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "packer.cpp")
_SRC_EVT2 = os.path.join(os.path.dirname(__file__), "evt2.cpp")
_SRC_EVT3 = os.path.join(os.path.dirname(__file__), "evt3.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("EVFLOW_CACHE_DIR", os.path.expanduser("~/.cache/evflow_jax")),
    "native",
)

_lib = None  # None = not tried, False = unavailable, else the CDLL
_lib_evt2 = None
_lib_evt3 = None


def _build(src: str, name: str) -> str:
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)  # atomic: concurrent builders converge
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return so_path


def _get_lib():
    global _lib
    if _lib is None:
        if os.environ.get("EVFLOW_DISABLE_NATIVE"):
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(_build(_SRC, "packer"))
            lib.evf_pack_events.restype = ctypes.c_int64
            lib.evf_pack_events.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # events [n, stride]
                ctypes.c_int64,                   # n
                ctypes.c_int64,                   # stride (doubles per row)
                ctypes.POINTER(ctypes.c_double),  # weights
                ctypes.POINTER(ctypes.c_double),  # dtf
                ctypes.c_int32,                   # band_px
                ctypes.c_int32,                   # n_rows
                ctypes.c_int32,                   # colband_px
                ctypes.c_int32,                   # n_cols
                ctypes.c_int32,                   # n_bins
                ctypes.c_int32,                   # chunk
                ctypes.c_int64,                   # g_max
                ctypes.c_double,                  # sentinel
                ctypes.POINTER(ctypes.c_double),  # x_out
                ctypes.POINTER(ctypes.c_double),  # y_out
                ctypes.POINTER(ctypes.c_double),  # d_out
                ctypes.POINTER(ctypes.c_double),  # w_out
                ctypes.POINTER(ctypes.c_int32),   # chunk_group
            ]
            _lib = lib
        except Exception as e:  # toolchain/build/load failure -> fallback
            logger.info("native packer unavailable (%s); using Python packers", e)
            _lib = False
    return _lib or None


def available() -> bool:
    return _get_lib() is not None


def pack_events(events, weights, dtf, band_px: int, n_rows: int,
                colband_px: int, n_cols: int, n_bins: int, chunk: int,
                g_max: int, sentinel: float = -10.0):
    """Grouped chunk packing with inline group-id computation (see
    packer.cpp): group = (bin * n_rows + row) * n_cols + col.  Returns
    (x, y, d, w [g_max, chunk] float64, chunk_group [g_max] int32,
    n_chunks_used) or ``None`` when the native library is unavailable
    (callers fall back to the Python packers)."""
    lib = _get_lib()
    if lib is None:
        return None
    events = np.ascontiguousarray(events, np.float64)
    n, stride = events.shape
    weights = np.ascontiguousarray(weights, np.float64)
    dtf = np.ascontiguousarray(dtf, np.float64)
    x_out = np.empty((g_max, chunk), np.float64)
    y_out = np.empty((g_max, chunk), np.float64)
    d_out = np.empty((g_max, chunk), np.float64)
    w_out = np.empty((g_max, chunk), np.float64)
    chunk_group = np.empty(g_max, np.int32)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    used = lib.evf_pack_events(
        p(events), n, stride, p(weights), p(dtf),
        band_px, n_rows, colband_px, n_cols, n_bins,
        chunk, g_max, sentinel,
        p(x_out), p(y_out), p(d_out), p(w_out),
        chunk_group.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if used < 0:
        raise RuntimeError(
            f"evf_pack_events: bad arguments or chunk bound overflow "
            f"(g_max={g_max}, rows={n_rows}, cols={n_cols}, bins={n_bins})"
        )
    return x_out, y_out, d_out, w_out, chunk_group, int(used)


def _get_evt2_lib():
    global _lib_evt2
    if _lib_evt2 is None:
        if os.environ.get("EVFLOW_DISABLE_NATIVE"):
            _lib_evt2 = False
            return None
        try:
            lib = ctypes.CDLL(_build(_SRC_EVT2, "evt2"))
            lib.evf_decode_evt2.restype = ctypes.c_int64
            lib.evf_decode_evt2.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),  # words
                ctypes.c_int64,                   # n_words
                ctypes.POINTER(ctypes.c_double),  # x (sensor column)
                ctypes.POINTER(ctypes.c_double),  # y (sensor row)
                ctypes.POINTER(ctypes.c_double),  # t (µs)
                ctypes.POINTER(ctypes.c_double),  # polarity {0, 1}
            ]
            _lib_evt2 = lib
        except Exception as e:
            logger.info("native EVT2 decoder unavailable (%s); using Python", e)
            _lib_evt2 = False
    return _lib_evt2 or None


def decode_evt2(words: np.ndarray):
    """Decode an EVT2.0 word stream (uint32 array) into
    (x_col, y_row, t_us, polarity) float64 arrays (see evt2.cpp for the
    layout), or ``None`` when the native library is unavailable (callers
    fall back to the vectorized Python decoder in data/evt2.py)."""
    lib = _get_evt2_lib()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    n = len(words)
    x = np.empty(n, np.float64)
    y = np.empty(n, np.float64)
    t = np.empty(n, np.float64)
    p = np.empty(n, np.float64)

    def d(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    n_out = lib.evf_decode_evt2(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n,
        d(x), d(y), d(t), d(p),
    )
    if n_out < 0:
        raise RuntimeError("evf_decode_evt2: bad arguments")
    return x[:n_out], y[:n_out], t[:n_out], p[:n_out]


def _get_evt3_lib():
    global _lib_evt3
    if _lib_evt3 is None:
        if os.environ.get("EVFLOW_DISABLE_NATIVE"):
            _lib_evt3 = False
            return None
        try:
            lib = ctypes.CDLL(_build(_SRC_EVT3, "evt3"))
            lib.evf_decode_evt3.restype = ctypes.c_int64
            lib.evf_decode_evt3.argtypes = [
                ctypes.POINTER(ctypes.c_uint16),  # words
                ctypes.c_int64,                   # n_words
                ctypes.POINTER(ctypes.c_double),  # x (sensor column)
                ctypes.POINTER(ctypes.c_double),  # y (sensor row)
                ctypes.POINTER(ctypes.c_double),  # t (µs)
                ctypes.POINTER(ctypes.c_double),  # polarity {0, 1}
            ]
            _lib_evt3 = lib
        except Exception as e:
            logger.info("native EVT3 decoder unavailable (%s); using Python", e)
            _lib_evt3 = False
    return _lib_evt3 or None


def decode_evt3(words: np.ndarray):
    """Decode an EVT3 word stream (uint16 array) into
    (x_col, y_row, t_us, polarity) float64 arrays (see evt3.cpp for the
    stateful layout), or ``None`` when the native library is unavailable
    (callers fall back to the vectorized Python decoder in
    data/evt3.py)."""
    lib = _get_evt3_lib()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint16)
    n = len(words)
    # tight event bound via a cheap typed pre-pass (a blanket 12*n would
    # allocate ~192x the payload and OOM on real recordings)
    types = words >> 12
    cap = int(
        np.count_nonzero(types == 0x2)
        + 12 * np.count_nonzero(types == 0x4)
        + 8 * np.count_nonzero(types == 0x5)
    )
    cap = max(cap, 1)
    x = np.empty(cap, np.float64)
    y = np.empty(cap, np.float64)
    t = np.empty(cap, np.float64)
    p = np.empty(cap, np.float64)

    def d(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    n_out = lib.evf_decode_evt3(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n,
        d(x), d(y), d(t), d(p),
    )
    if n_out < 0:
        raise RuntimeError("evf_decode_evt3: bad arguments")
    return x[:n_out].copy(), y[:n_out].copy(), t[:n_out].copy(), p[:n_out].copy()


_SRC_PNG16 = os.path.join(os.path.dirname(__file__), "png16.cpp")
_lib_png16 = None


def _get_png16_lib():
    global _lib_png16
    if _lib_png16 is None:
        if os.environ.get("EVFLOW_DISABLE_NATIVE"):
            _lib_png16 = False
            return None
        try:
            lib = ctypes.CDLL(_build(_SRC_PNG16, "png16"))
            lib.evf_png_defilter.restype = ctypes.c_int64
            lib.evf_png_defilter.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # raw (inflated IDAT)
                ctypes.c_int64,                  # raw_len
                ctypes.c_int64,                  # h
                ctypes.c_int64,                  # stride
                ctypes.c_int64,                  # bpp
                ctypes.POINTER(ctypes.c_uint8),  # out [h * stride]
            ]
            _lib_png16 = lib
        except Exception as e:
            logger.info("native PNG defilter unavailable (%s); using Python", e)
            _lib_png16 = False
    return _lib_png16 or None


def png_defilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reconstruct PNG scanlines from the inflated IDAT payload (see
    png16.cpp): returns [h, stride] uint8, or ``None`` when the native
    library is unavailable (flow/io.py falls back to its byte-identical
    Python defilter).  Raises on malformed payloads (bad filter type or
    size mismatch)."""
    lib = _get_png16_lib()
    if lib is None:
        return None
    raw_arr = np.frombuffer(raw, np.uint8)
    out = np.empty((h, stride), np.uint8)
    rc = lib.evf_png_defilter(
        raw_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw_arr),
        h, stride, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc < 0:
        raise ValueError("evf_png_defilter: malformed PNG payload")
    return out
