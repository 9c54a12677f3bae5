"""Event-array utilities (host numpy and jax variants).

Parity target: reference ``src/utils/event_utils.py``.
"""


import jax.numpy as jnp
import numpy as np


def generate_events(
    n_events: int,
    height: int,
    width: int,
    tmin: float = 0.0,
    tmax: float = 0.5,
    dist: str = "uniform",
) -> np.ndarray:
    """Random synthetic events [n, 4] = (x, y, t, p); x is the height
    coordinate, t sorted (ref event_utils.py:18-47)."""
    x = np.random.randint(0, height, n_events)
    y = np.random.randint(0, width, n_events)
    t = np.sort(np.random.uniform(tmin, tmax, n_events))
    p = np.random.randint(0, 2, n_events)
    return np.stack([x, y, t, p], axis=1).astype(np.float64)


def crop_event(events, x0, x1, y0, y1):
    """Boolean-filter events to [x0,x1) x [y0,y1) (ref event_utils.py:50-88).
    Host-side (dynamic shape); inside jit use crop_event_mask instead."""
    mask = (
        (x0 <= events[..., 0])
        & (events[..., 0] < x1)
        & (y0 <= events[..., 1])
        & (events[..., 1] < y1)
    )
    return events[mask]


def crop_event_mask(events, x0, x1, y0, y1):
    """Static-shape variant: returns the {0,1} weight mask instead of
    filtering — feeds the IWE weight path (jit-friendly)."""
    return (
        (x0 <= events[..., 0])
        & (events[..., 0] < x1)
        & (y0 <= events[..., 1])
        & (events[..., 1] < y1)
    )


def set_event_origin_to_zero(events, x0, y0, t0: float = 0.0):
    """Shift event origins (ref event_utils.py:74-88)."""
    basis = np.array([x0, y0, t0, 0.0])
    if isinstance(events, np.ndarray):
        return events - basis
    return events - jnp.asarray(basis, dtype=events.dtype)


def undistort_events(events: np.ndarray, map_x: np.ndarray, map_y: np.ndarray, h: int, w: int) -> np.ndarray:
    """Rectify events through precomputed maps (ref event_utils.py:91-121)."""
    k = np.int32(map_y[events[:, 0].astype(np.int32), events[:, 1].astype(np.int32)])
    l = np.int32(map_x[events[:, 0].astype(np.int32), events[:, 1].astype(np.int32)])
    out = np.copy(events)
    out[:, 0] = k
    out[:, 1] = l
    return out[((0 <= k) & (k < h)) & ((0 <= l) & (l < w))]
