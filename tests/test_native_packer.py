"""Native C++ chunk packer (native/packer.cpp): byte-identical layout to
the Python fallback packers for every grouping (band / tile / bin-band).

The native path is the default host data path feeding the fused Pallas
rasterizers; the tests force the Python fallback via monkeypatching and
compare exactly (same chunk order, same in-chunk event order, same
sentinel padding), so either implementation can serve any consumer.
"""

import numpy as np
import pytest

from event_based_optical_flow_tpu import native
from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB


def _events(n=3000, h=130, w=200, seed=0):
    rng = np.random.default_rng(seed)
    ev = np.stack([
        rng.uniform(-1, h + 1, n),
        rng.uniform(-1, w + 1, n),
        np.sort(rng.uniform(0, 1, n)),
        rng.integers(0, 2, n).astype(float),
    ], 1)
    wgt = (rng.uniform(0, 1, n) > 0.1).astype(np.float64)  # some invalid
    dtf = (ev[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    return ev, wgt, dtf


requires_native = pytest.mark.skipif(
    not native.available(), reason="native packer not built (no g++?)"
)


def _both(monkeypatch, pack):
    got_native = pack()
    monkeypatch.setattr(native, "pack_events", lambda *a, **k: None)
    got_py = pack()
    return got_native, got_py


@requires_native
@pytest.mark.parametrize("height", [64, 130])
def test_band_packing_parity(monkeypatch, height):
    ev, wgt, dtf = _events(h=height, seed=1)
    nat, py = _both(monkeypatch, lambda: PB.pack_events_by_band(ev, wgt, dtf, height))
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_native
def test_tile_packing_parity(monkeypatch):
    ev, wgt, dtf = _events(h=130, w=200, seed=2)
    nat, py = _both(monkeypatch, lambda: PB.pack_events_by_tile(ev, wgt, dtf, 130, 200))
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_native
@pytest.mark.parametrize("n_bin", [1, 4])
def test_band_bin_packing_parity(monkeypatch, n_bin):
    ev, wgt, dtf = _events(h=130, seed=3)
    nat, py = _both(
        monkeypatch, lambda: PB.pack_events_by_band_bin(ev, wgt, dtf, 130, n_bin)
    )
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_native
def test_empty_and_all_invalid(monkeypatch):
    ev, wgt, dtf = _events(n=50, seed=4)
    wgt[:] = 0.0  # nothing valid: all chunks inert sentinels
    nat, py = _both(monkeypatch, lambda: PB.pack_events_by_band(ev, wgt, dtf, 130))
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(np.asarray(nat[3]).sum()) == 0.0  # weights all zero


@requires_native
def test_overflow_guard():
    ev, wgt, dtf = _events(n=100, seed=5)
    wgt[:] = 1.0
    with pytest.raises(RuntimeError):
        # 100 events in one 1024-row band, chunk 16 -> needs 7 chunks, g_max 2
        native.pack_events(ev, wgt, dtf, band_px=1024, n_rows=1,
                           colband_px=0, n_cols=1, n_bins=1, chunk=16, g_max=2)
