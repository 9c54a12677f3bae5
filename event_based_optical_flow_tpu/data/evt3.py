"""Prophesee RAW (EVT3, Gen4 / IMX636) loader — current-generation
live-camera ingestion alongside the EVT2 loader (see data/evt2.py for
the design notes; the reference reads no camera formats at all).

EVT3 is a STATEFUL 16-bit word stream (row / time / vector-base
registers persist across words; see ``native/evt3.cpp`` for the word
layout).  The native decoder is a single sequential pass; the numpy
fallback here reconstructs the same register state with vectorized
forward-fills (searchsorted) and SEGMENTED cumulative sums for the
vector-base register (each VECT_BASE_X starts a new segment; every
VECT_12/VECT_8 word advances the base by 12/8 within its segment) —
byte-identical to the native decoder, tested.
"""

import logging
import os

import numpy as np

from .base import DataLoaderBase
from .evt2 import read_raw_header

logger = logging.getLogger(__name__)


def _ffill(marker_idx, marker_vals, query_idx, default):
    """Value of the latest marker at or before each query word index
    (``default`` before the first marker)."""
    pos = np.searchsorted(marker_idx, query_idx, side="right") - 1
    if len(marker_idx) == 0:
        return np.full(len(query_idx), default, dtype=np.uint64)
    vals = marker_vals[np.maximum(pos, 0)]
    return np.where(pos >= 0, vals, np.uint64(default))


def decode_evt3_numpy(words: np.ndarray):
    """Vectorized EVT3 decode, byte-identical to ``native/evt3.cpp``.
    Returns (x_col, y_row, t_us, polarity) float64 arrays in stream
    order."""
    words = np.ascontiguousarray(words, np.uint16)
    types = words >> 12

    # --- register forward-fills ------------------------------------
    y_idx = np.flatnonzero(types == 0x0)
    y_vals = (words[y_idx] & np.uint16(0x7FF)).astype(np.uint64)
    tl_idx = np.flatnonzero(types == 0x6)
    tl_vals = (words[tl_idx] & np.uint16(0xFFF)).astype(np.uint64)
    th_idx = np.flatnonzero(types == 0x8)
    th_vals = (words[th_idx] & np.uint16(0xFFF)).astype(np.uint64)
    # a TIME_HIGH that goes backward signals a 24-bit rollover
    wraps = np.zeros(len(th_idx), np.uint64)
    if len(th_idx) > 1:
        wraps[1:] = (th_vals[1:] < th_vals[:-1]).astype(np.uint64)
    epoch_vals = np.cumsum(wraps)

    def time_at(query_idx):
        tl = _ffill(tl_idx, tl_vals, query_idx, 0)
        th = _ffill(th_idx, th_vals, query_idx, 0)
        ep = _ffill(th_idx, epoch_vals, query_idx, 0)
        return (ep << np.uint64(24)) | (th << np.uint64(12)) | tl

    # --- single events (EVT_ADDR_X, type 0x2) ------------------------
    sg_idx = np.flatnonzero(types == 0x2)
    sg_x = (words[sg_idx] & np.uint16(0x7FF)).astype(np.float64)
    sg_p = ((words[sg_idx] >> 11) & np.uint16(1)).astype(np.float64)
    sg_y = _ffill(y_idx, y_vals, sg_idx, 0).astype(np.float64)
    sg_t = time_at(sg_idx).astype(np.float64)

    # --- vector events (VECT_BASE_X 0x3; VECT_12 0x4 / VECT_8 0x5) ---
    vb_idx = np.flatnonzero(types == 0x3)
    vb_vals = (words[vb_idx] & np.uint16(0x7FF)).astype(np.int64)
    vb_pol = ((words[vb_idx] >> 11) & np.uint16(1)).astype(np.float64)
    vc_idx = np.flatnonzero((types == 0x4) | (types == 0x5))
    is12 = types[vc_idx] == 0x4
    incr = np.where(is12, 12, 8).astype(np.int64)
    # segmented base: base(j) = base0(segment) + sum of increments of
    # vector words after the segment's VECT_BASE_X and before j
    cum = np.concatenate([[0], np.cumsum(incr)])  # cum[j] = incr before j
    seg = np.searchsorted(vb_idx, vc_idx, side="right") - 1  # governing base
    first_vc = np.searchsorted(vc_idx, vb_idx, side="left")  # per base: its first vector word
    if len(vb_idx):
        base0 = np.where(seg >= 0, vb_vals[np.maximum(seg, 0)], 0)
        cum_at_seg = np.where(seg >= 0, cum[first_vc[np.maximum(seg, 0)]], 0)
    else:  # vector words before any VECT_BASE_X: initial-zero registers
        base0 = np.zeros(len(vc_idx), np.int64)
        cum_at_seg = np.zeros(len(vc_idx), np.int64)
    base_j = base0 + (cum[:-1] - cum_at_seg)

    masks = np.where(
        is12, words[vc_idx] & np.uint16(0xFFF), words[vc_idx] & np.uint16(0xFF)
    ).astype(np.uint16)
    lanes = np.arange(12)
    bits = ((masks[:, None] >> lanes[None, :]) & 1).astype(bool)  # [n_vc, 12]
    vj, lane = np.nonzero(bits)
    vc_x = (base_j[vj] + lane).astype(np.float64)
    if len(vb_idx):
        vc_p = np.where(seg[vj] >= 0, vb_pol[np.maximum(seg[vj], 0)], 0.0)
    else:
        vc_p = np.zeros(len(vj), np.float64)
    vc_y = _ffill(y_idx, y_vals, vc_idx, 0)[vj].astype(np.float64)
    vc_t = time_at(vc_idx)[vj].astype(np.float64)
    vc_word = vc_idx[vj]

    # --- merge in stream order (word index, then lane within a word) --
    key_sg = sg_idx.astype(np.int64) * 16
    key_vc = vc_word.astype(np.int64) * 16 + (lane + 1)
    x = np.concatenate([sg_x, vc_x])
    y = np.concatenate([sg_y, vc_y])
    t = np.concatenate([sg_t, vc_t])
    p = np.concatenate([sg_p, vc_p])
    order = np.argsort(np.concatenate([key_sg, key_vc]), kind="stable")
    return x[order], y[order], t[order], p[order]


def read_raw_evt3(path: str):
    """Read a Prophesee EVT3 .raw file (native decoder when available)."""
    payload = read_raw_header(path, "EVT3")
    if len(payload) % 2:
        payload = payload[:-1]
    words = np.frombuffer(payload, dtype="<u2")

    from .. import native

    out = native.decode_evt3(words)
    if out is None:
        out = decode_evt3_numpy(words)
    return out


class Evt3DataLoader(DataLoaderBase):
    """Sequence = one ``<root>/<sequence>.raw`` file (or
    ``<root>/<sequence>/events.raw``); same contract as the EVT2 loader
    (FWL-only evaluation, MVSEC-style column swap)."""

    NAME = "EVT3"

    def set_sequence(self, sequence_name: str, undistort: bool = False) -> None:
        logger.info(f"Use EVT3 raw sequence {sequence_name}")
        self.sequence_name = sequence_name
        self.dataset_files = self.get_sequence(sequence_name)
        x_col, y_row, t_us, pol = read_raw_evt3(self.dataset_files["event"])
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
        n = int(self.config.get("eval_n_frames", 200))
        return np.linspace(self.left_ts[0], self.left_ts[-1], n)

    def load_calib(self) -> dict:
        """Optional ECD-style calibration file (see Evt2DataLoader)."""
        path = self.dataset_files.get("calib", "")
        if not path or not os.path.exists(path):
            return {}
        from .calib import load_ecd_calib_file

        return load_ecd_calib_file(path)
