"""ECD (Event Camera Dataset, Mueggler et al.) text-format loader
(stretch capability; listed by the reference as future dataset support).

Expected layout:
    <root>/<sequence>/events.txt      "t x y p" per line (t seconds,
                                      x = width coord, y = height coord)
    <root>/<sequence>/calib.txt       fx fy cx cy k1 k2 p1 p2 k3 (optional)

No dense flow GT exists for ECD, so ``gt_flow_available`` is False and
evaluation uses FWL only.  240x180 DAVIS sensor.
"""

import logging
import os

import numpy as np

from .base import DataLoaderBase

logger = logging.getLogger(__name__)


class EcdDataLoader(DataLoaderBase):
    NAME = "ECD"

    def set_sequence(self, sequence_name: str, undistort: bool = False) -> None:
        logger.info(f"Use ECD sequence {sequence_name}")
        self.sequence_name = sequence_name
        self.dataset_files = self.get_sequence(sequence_name)
        raw = np.loadtxt(self.dataset_files["event"])
        # file columns: t, x(width), y(height), p -> framework convention
        self.events = np.stack(
            [raw[:, 2], raw[:, 1], raw[:, 0], np.where(raw[:, 3] > 0, 1.0, -1.0)], axis=1
        )
        self.left_ts = self.events[:, 2]
        self.gt_flow_available = False

    def get_sequence(self, sequence_name: str) -> dict:
        seq = os.path.join(self.root_dir, sequence_name)
        return {"event": os.path.join(seq, "events.txt"), "calib": os.path.join(seq, "calib.txt")}

    def __len__(self):
        return len(self.events)

    def load_event(self, start_index: int, end_index: int, cam: str = "left") -> np.ndarray:
        return np.copy(self.events[start_index:end_index])

    def index_to_time(self, index: int) -> float:
        return float(self.left_ts[min(index, len(self.left_ts) - 1)])

    def time_to_index(self, time: float) -> int:
        # searchsorted-1 (MVSEC parity, ref mvsec.py:220-226), clamped at 0:
        # the FWL eval clock starts exactly at the first event's timestamp
        return max(int(np.searchsorted(self.left_ts, time)) - 1, 0)

    def eval_frame_time_list(self):
        """Fixed-rate evaluation clock over the sequence (ECD has no GT
        frame timestamps to anchor on): ``data.eval_n_frames`` windows
        (default 200)."""
        n = int(self.config.get("eval_n_frames", 200))
        return np.linspace(self.left_ts[0], self.left_ts[-1], n)

    def load_calib(self) -> dict:
        path = self.dataset_files["calib"]
        if not os.path.exists(path):
            return {}
        from .calib import load_ecd_calib_file

        return load_ecd_calib_file(path)
