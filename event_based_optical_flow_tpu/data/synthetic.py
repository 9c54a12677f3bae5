"""Synthetic sequence loader: dataset-free end-to-end runs and tests.

Generates a deterministic event stream from a moving sparse-edge scene
with piecewise-constant (per-quadrant) optical flow, and provides exact
GT displacement — exercising the full DataLoaderBase contract
(load_event / load_optical_flow / time_to_index / eval_frame_time_list)
without any files on disk.  No reference counterpart (the reference
requires a downloaded MVSEC hdf5); this makes the eval pipeline
self-contained.
"""

import logging
import zlib

import numpy as np

from .base import DataLoaderBase

logger = logging.getLogger(__name__)


class SyntheticDataLoader(DataLoaderBase):
    NAME = "synthetic"

    def __init__(self, config: dict = {}):
        self._HEIGHT = config["height"]
        self._WIDTH = config["width"]
        self.config = config
        self.gt_flow_available = True
        self.auto_undistort = False
        self.duration = float(config.get("duration", 2.0))
        self.event_rate = float(config.get("event_rate", 200_000.0))
        self.flow_max = float(config.get("flow_max", 15.0))
        self.n_frames = int(config.get("n_frames", 20))
        self.seed = int(config.get("seed", 7))

    def set_sequence(self, sequence_name: str, undistort: bool = False) -> None:
        self.sequence_name = sequence_name
        # deterministic name hash: Python's str hash is salted per process
        # (PYTHONHASHSEED), which silently made every run a different scene
        name_hash = zlib.crc32(sequence_name.encode()) % 1000
        rng = np.random.default_rng(self.seed + name_hash)
        H, W = self._HEIGHT, self._WIDTH
        n = int(self.duration * self.event_rate)

        # per-quadrant constant flow field (px/s), pattern velocity = flow
        self.flow_quadrants = rng.uniform(-self.flow_max, self.flow_max, (2, 2, 2))
        t = np.sort(rng.uniform(0, self.duration, n))
        # sparse edge scene: positions snapped to a jittered lattice
        x0 = np.round(rng.uniform(2, H - 2, n) / 6) * 6 + rng.normal(0, 0.3, n)
        y0 = np.round(rng.uniform(2, W - 2, n) / 8) * 8 + rng.normal(0, 0.3, n)
        qx = (x0 > H / 2).astype(int)
        qy = (y0 > W / 2).astype(int)
        u = self.flow_quadrants[qx, qy, 0]
        v = self.flow_quadrants[qx, qy, 1]
        x = x0 + t * u
        y = y0 + t * v
        ok = (x >= 0) & (x < H - 1) & (y >= 0) & (y < W - 1)
        ev = np.stack([np.round(x), np.round(y), t, rng.integers(0, 2, n)], axis=1)[ok]
        self.events = ev[np.argsort(ev[:, 2], kind="stable")]
        self.left_ts = self.events[:, 2]
        self.min_ts = 0.0
        self.max_ts = self.duration
        self.data_duration = self.duration
        self.gray_ts = np.linspace(0.02, self.duration - 0.02, self.n_frames)

    def __len__(self):
        return len(self.events)

    def load_event(self, start_index: int, end_index: int, cam: str = "left") -> np.ndarray:
        return np.copy(self.events[start_index:end_index])

    def index_to_time(self, index: int) -> float:
        return float(self.left_ts[min(index, len(self.left_ts) - 1)])

    def time_to_index(self, time: float) -> int:
        return int(np.searchsorted(self.left_ts, time)) - 1

    def eval_frame_time_list(self):
        return self.gray_ts

    def gt_time_list(self):
        return self.gray_ts

    def load_optical_flow(self, t1: float, t2: float) -> np.ndarray:
        """Exact GT displacement over [t1, t2]: [H, W, 2] (height, width)."""
        H, W = self._HEIGHT, self._WIDTH
        dt = t2 - t1
        flow = np.zeros((H, W, 2))
        for qx in (0, 1):
            for qy in (0, 1):
                sx = slice(0, H // 2) if qx == 0 else slice(H // 2, H)
                sy = slice(0, W // 2) if qy == 0 else slice(W // 2, W)
                flow[sx, sy, 0] = self.flow_quadrants[qx, qy, 0] * dt
                flow[sx, sy, 1] = self.flow_quadrants[qx, qy, 1] * dt
        return flow

    def load_calib(self) -> dict:
        return {}
