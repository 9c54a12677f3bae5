"""Prophesee RAW (EVT2.0) loader — live-camera data ingestion.

The reference only reads pre-converted research datasets (MVSEC hdf5;
ref src/data_loader/mvsec.py); production event cameras emit Prophesee
RAW streams, so the framework ships a first-party decoder: native C++
(``native/evt2.cpp``, ctypes, lazy build) with a byte-identical
vectorized-numpy fallback (``decode_evt2_numpy``, forced with
``EVFLOW_DISABLE_NATIVE=1``).

File layout: an ASCII header of lines starting with ``%`` (e.g.
``% format EVT2;height=480;width=640``), then little-endian 32-bit
words.  Word layout documented in ``native/evt2.cpp``: CD events carry
a 6-bit µs timestamp remainder + 11-bit sensor column (x) + 11-bit
sensor row (y); EVT_TIME_HIGH words carry the upper 28 timestamp bits.

Framework convention: events are (x=height coord, y=width coord,
t seconds, polarity ±1) — the sensor (column, row) pair swaps, exactly
like the MVSEC loader's column swap.  No dense flow GT exists for raw
streams: ``gt_flow_available`` is False and evaluation uses FWL only
(the ECD eval path).
"""

import logging
import os

import numpy as np

from .base import DataLoaderBase

logger = logging.getLogger(__name__)


def decode_evt2_numpy(words: np.ndarray):
    """Vectorized EVT2.0 decode, byte-identical to the native decoder:
    the sequential TIME_HIGH state becomes a forward-fill — each CD word
    takes the most recent preceding EVT_TIME_HIGH (0 before the first).
    Returns (x_col, y_row, t_us, polarity) float64 arrays."""
    words = np.ascontiguousarray(words, np.uint32)
    types = words >> 28
    is_cd = types <= 1
    is_th = types == 8

    th_idx = np.flatnonzero(is_th)
    th_vals = (words[th_idx] & np.uint32(0x0FFFFFFF)).astype(np.uint64)
    cd_idx = np.flatnonzero(is_cd)
    if len(th_idx):
        # index of the latest TIME_HIGH before each CD word (-1 = none yet)
        pos = np.searchsorted(th_idx, cd_idx) - 1
        time_high = np.where(pos >= 0, th_vals[np.maximum(pos, 0)], np.uint64(0))
    else:  # no TIME_HIGH at all: initial-zero register (native parity)
        time_high = np.zeros(len(cd_idx), np.uint64)

    cd = words[cd_idx]
    ts6 = ((cd >> 22) & np.uint32(0x3F)).astype(np.uint64)
    t_us = ((time_high << np.uint64(6)) | ts6).astype(np.float64)
    x_col = ((cd >> 11) & np.uint32(0x7FF)).astype(np.float64)
    y_row = (cd & np.uint32(0x7FF)).astype(np.float64)
    pol = types[cd_idx].astype(np.float64)
    return x_col, y_row, t_us, pol


def read_raw_header(path: str, fmt_tag: str):
    """Skip a Prophesee .raw file's ``%`` ASCII header (warning when the
    ``format`` line disagrees with ``fmt_tag``); returns the binary
    payload bytes."""
    with open(path, "rb") as f:
        data = f.read()
    offset = 0
    while offset < len(data) and data[offset : offset + 1] == b"%":
        nl = data.find(b"\n", offset)
        if nl < 0:
            raise ValueError(f"{path}: unterminated header line")
        line = data[offset:nl].decode("latin-1")
        if "format" in line and fmt_tag not in line.upper().replace(" ", ""):
            logger.warning(
                f"{path}: header says {line.strip()!r}; this loader decodes {fmt_tag}"
            )
        offset = nl + 1
    return data[offset:]


def read_raw_evt2(path: str):
    """Read a Prophesee .raw file: skip the ``%`` ASCII header, decode
    the EVT2 payload (native decoder when available)."""
    payload = read_raw_header(path, "EVT2")
    if len(payload) % 4:
        payload = payload[: len(payload) - len(payload) % 4]
    words = np.frombuffer(payload, dtype="<u4")

    from .. import native

    out = native.decode_evt2(words)
    if out is None:
        out = decode_evt2_numpy(words)
    return out


class Evt2DataLoader(DataLoaderBase):
    """Sequence = one ``<root>/<sequence>.raw`` file (or
    ``<root>/<sequence>/events.raw``)."""

    NAME = "EVT2"

    def set_sequence(self, sequence_name: str, undistort: bool = False) -> None:
        logger.info(f"Use EVT2 raw sequence {sequence_name}")
        self.sequence_name = sequence_name
        self.dataset_files = self.get_sequence(sequence_name)
        x_col, y_row, t_us, pol = read_raw_evt2(self.dataset_files["event"])
        # sensor (column, row) -> framework (x=height, y=width); µs -> s
        self.events = np.stack(
            [y_row, x_col, t_us * 1e-6, np.where(pol > 0, 1.0, -1.0)], axis=1
        )
        from ..ops.filters import apply_config_filters

        self.events = apply_config_filters(
            self.events, (self._HEIGHT, self._WIDTH), self.config
        )
        self.left_ts = self.events[:, 2]
        self.gt_flow_available = False

    def get_sequence(self, sequence_name: str) -> dict:
        flat = os.path.join(self.root_dir, sequence_name + ".raw")
        nested = os.path.join(self.root_dir, sequence_name, "events.raw")
        return {
            "event": flat if os.path.exists(flat) else nested,
            # ECD-style calibration: fx fy cx cy k1 k2 p1 p2 k3
            "calib": (
                os.path.join(self.root_dir, sequence_name + "_calib.txt")
                if os.path.exists(flat)
                else os.path.join(self.root_dir, sequence_name, "calib.txt")
            ),
        }

    def __len__(self):
        return len(self.events)

    def load_event(self, start_index: int, end_index: int, cam: str = "left") -> np.ndarray:
        return np.copy(self.events[start_index:end_index])

    def index_to_time(self, index: int) -> float:
        return float(self.left_ts[min(index, len(self.left_ts) - 1)])

    def time_to_index(self, time: float) -> int:
        return max(int(np.searchsorted(self.left_ts, time)) - 1, 0)

    def eval_frame_time_list(self):
        """Fixed-rate FWL evaluation clock (no GT frames to anchor on);
        ``data.eval_n_frames`` windows (default 200) — the ECD contract."""
        n = int(self.config.get("eval_n_frames", 200))
        return np.linspace(self.left_ts[0], self.left_ts[-1], n)

    def load_calib(self) -> dict:
        """Optional ECD-style calibration file next to the recording
        (fx fy cx cy k1 k2 p1 p2 k3) — enables undistortion and the
        calibrated motion models (3-rotation) on raw-camera streams."""
        path = self.dataset_files.get("calib", "")
        if not path or not os.path.exists(path):
            return {}
        from .calib import load_ecd_calib_file

        return load_ecd_calib_file(path)
