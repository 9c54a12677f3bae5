"""Event utilities: generation ranges, crop bounds, padding masks
(mirrors reference tests/utils/test_event_utils.py)."""

import numpy as np
import pytest

from event_based_optical_flow_tpu.types import pad_events
from event_based_optical_flow_tpu.utils import (
    crop_event,
    crop_event_mask,
    generate_events,
    set_event_origin_to_zero,
)


def test_generate_events_ranges():
    ev = generate_events(500, 30, 40, tmin=0.1, tmax=0.9)
    assert ev.shape == (500, 4)
    assert ev[:, 0].min() >= 0 and ev[:, 0].max() < 30
    assert ev[:, 1].min() >= 0 and ev[:, 1].max() < 40
    assert (np.diff(ev[:, 2]) >= 0).all()
    assert set(np.unique(ev[:, 3])) <= {0.0, 1.0}


def test_crop_event_bounds():
    ev = generate_events(1000, 30, 40)
    cropped = crop_event(ev, 5, 15, 10, 20)
    assert (cropped[:, 0] >= 5).all() and (cropped[:, 0] < 15).all()
    assert (cropped[:, 1] >= 10).all() and (cropped[:, 1] < 20).all()
    mask = crop_event_mask(ev, 5, 15, 10, 20)
    assert mask.sum() == len(cropped)


def test_set_event_origin():
    ev = generate_events(10, 30, 40)
    out = set_event_origin_to_zero(ev, 5, 10, 0.0)
    np.testing.assert_allclose(out[:, 0], ev[:, 0] - 5)
    np.testing.assert_allclose(out[:, 1], ev[:, 1] - 10)
    np.testing.assert_allclose(out[:, 3], ev[:, 3])


def test_pad_events_static_shape_and_stats():
    ev = generate_events(100, 30, 40, tmin=0.2, tmax=0.7)
    padded, w = pad_events(ev, target_n=128)
    assert padded.shape == (128, 4) and w.shape == (128,)
    assert w.sum() == 100
    # padding must not perturb the time range
    assert padded[:, 2].min() == ev[:, 2].min()
    assert padded[:, 2].max() == ev[:, 2].max()
    with pytest.raises(ValueError):
        pad_events(ev, target_n=50)
