"""Event-stream noise filters — raw-camera preprocessing.

Real sensors ship defects the research datasets were curated to avoid:
hot pixels (stuck/leaky pixels firing at kHz regardless of scene) and
shot noise bursts.  CMax is contrast-seeking, so a hot pixel is a
perfect false feature — filtering belongs in the ingestion path (the
EVT2/EVT3 loaders wire these behind ``data.hot_pixel_sigma`` /
``data.refractory_us``).  Host-side numpy on purpose: filtering happens
once per recording at load time, next to the decoders.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def hot_pixel_mask(events: np.ndarray, image_shape, sigma: float = 5.0,
                   min_rate_hz: float = 500.0) -> np.ndarray:
    """[H, W] bool mask of hot pixels: per-pixel event counts more than
    ``sigma`` robust standard deviations (MAD * 1.4826) above the median
    count of ACTIVE pixels, AND a sustained rate above ``min_rate_hz``
    over the stream's duration.  Robust statistics because a mean/std
    over mostly-idle pixels would flag every active pixel of a sparse
    scene; the ABSOLUTE rate guard because on noise-dominated streams
    (median active count ~1-2) the robust threshold collapses and would
    flag genuine edge pixels — a hot pixel is defined by a SUSTAINED
    kHz-order rate over the whole recording, which moving edges never
    hold."""
    h, w = image_shape
    xs = np.clip(events[:, 0].astype(np.int64), 0, h - 1)
    ys = np.clip(events[:, 1].astype(np.int64), 0, w - 1)
    counts = np.bincount(xs * w + ys, minlength=h * w).reshape(h, w)
    active = counts[counts > 0]
    if len(active) == 0:
        return np.zeros((h, w), bool)
    med = np.median(active)
    mad = np.median(np.abs(active - med)) * 1.4826
    thresh = med + sigma * max(mad, 1.0)
    t = events[:, 2]
    duration = max(float(t.max() - t.min()), 1e-9)
    return (counts > thresh) & (counts > min_rate_hz * duration)


def remove_hot_pixels(events: np.ndarray, image_shape, sigma: float = 5.0,
                      min_rate_hz: float = 500.0):
    """Drop every event on a hot pixel (see hot_pixel_mask).  Returns
    (filtered events, [H, W] hot mask)."""
    mask = hot_pixel_mask(events, image_shape, sigma, min_rate_hz)
    if not mask.any():
        return events, mask
    h, w = image_shape
    xs = np.clip(events[:, 0].astype(np.int64), 0, h - 1)
    ys = np.clip(events[:, 1].astype(np.int64), 0, w - 1)
    keep = ~mask[xs, ys]
    logger.info(
        f"hot-pixel filter: {int(mask.sum())} pixels, "
        f"{len(events) - int(keep.sum())} / {len(events)} events dropped"
    )
    return events[keep], mask


def refractory_filter(events: np.ndarray, image_shape, refractory_s: float):
    """Per-pixel refractory period: drop an event when the SAME pixel
    fired less than ``refractory_s`` seconds earlier (polarity-blind,
    like the sensor's own dead time).  Events must be time-sorted (the
    loader convention); order is preserved."""
    if refractory_s <= 0 or len(events) == 0:
        return events
    h, w = image_shape
    xs = np.clip(events[:, 0].astype(np.int64), 0, h - 1)
    ys = np.clip(events[:, 1].astype(np.int64), 0, w - 1)
    pix = xs * w + ys
    t = events[:, 2]
    # stable sort by pixel keeps the per-pixel time order
    order = np.argsort(pix, kind="stable")
    pix_s, t_s = pix[order], t[order]
    same = np.concatenate([[False], pix_s[1:] == pix_s[:-1]])
    dt = np.concatenate([[np.inf], np.diff(t_s)])
    drop_sorted = same & (dt < refractory_s)
    # dt is measured to the previous RAW event (the timer resets on
    # every event, dropped or not — the common streaming-implementation
    # semantics): a sub-refractory burst keeps only its first event
    # until a gap >= refractory_s occurs
    keep = np.ones(len(events), bool)
    keep[order[drop_sorted]] = False
    n_drop = int((~keep).sum())
    if n_drop:
        logger.info(f"refractory filter ({refractory_s * 1e6:.0f} us): "
                    f"{n_drop} / {len(events)} events dropped")
    return events[keep]


def apply_config_filters(events: np.ndarray, image_shape, config: dict) -> np.ndarray:
    """The loaders' ingestion hook: ``hot_pixel_sigma`` (0/absent = off)
    then ``refractory_us``."""
    sigma = float(config.get("hot_pixel_sigma", 0) or 0)
    if sigma > 0:
        rate = float(config.get("hot_pixel_min_rate_hz", 500.0))
        events, _ = remove_hot_pixels(events, image_shape, sigma, rate)
    refr_us = float(config.get("refractory_us", 0) or 0)
    if refr_us > 0:
        events = refractory_filter(events, image_shape, refr_us * 1e-6)
    return events
