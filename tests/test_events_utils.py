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


def test_event_noise_filters():
    """Hot-pixel removal (robust per-pixel count outliers) and the
    per-pixel refractory filter (timer resets on every raw event) —
    raw-camera ingestion preprocessing (ops/filters.py)."""
    import numpy as np

    from event_based_optical_flow_tpu.ops.filters import (
        hot_pixel_mask,
        refractory_filter,
        remove_hot_pixels,
    )

    rng = np.random.default_rng(0)
    H, W = 20, 30
    n = 4000
    ev = np.stack([
        rng.integers(0, H, n).astype(float), rng.integers(0, W, n).astype(float),
        np.sort(rng.uniform(0, 1.0, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    # one hot pixel firing 1000 extra times
    hot = np.stack([
        np.full(1000, 7.0), np.full(1000, 11.0),
        np.sort(rng.uniform(0, 1.0, 1000)), np.ones(1000),
    ], 1)
    both = np.concatenate([ev, hot])
    both = both[np.argsort(both[:, 2], kind="stable")]
    mask = hot_pixel_mask(both, (H, W), sigma=5.0)
    assert mask[7, 11] and mask.sum() == 1
    filtered, _ = remove_hot_pixels(both, (H, W), sigma=5.0)
    assert not ((filtered[:, 0] == 7) & (filtered[:, 1] == 11)).any()
    assert len(filtered) >= n - 30  # ~only the hot pixel's events dropped

    # refractory: same pixel at t = 0, 1us, 2us, 10us; 5us dead time ->
    # the 1us and 2us events drop (timer reset on EVERY event: 10us is
    # 8us after the 2us event, kept)
    evr = np.asarray([
        [3.0, 4.0, 0.0e-6, 1.0],
        [5.0, 5.0, 0.5e-6, 1.0],   # different pixel: kept
        [3.0, 4.0, 1.0e-6, 0.0],
        [3.0, 4.0, 2.0e-6, 1.0],
        [3.0, 4.0, 10.0e-6, 1.0],
    ])
    out = refractory_filter(evr, (H, W), 5e-6)
    np.testing.assert_array_equal(out[:, 2], [0.0, 0.5e-6, 10.0e-6])
    # order preserved, zero refractory = no-op
    np.testing.assert_array_equal(refractory_filter(evr, (H, W), 0.0), evr)
