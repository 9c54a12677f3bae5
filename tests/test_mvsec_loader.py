"""MVSEC loader on a synthetic on-disk fixture (no dataset download):
h5 layout, the column swap to (x=height, y=width), valid-frame slicing,
searchsorted indexing, GT displacement convention, rectify-map loading.

Cites the reference semantics it replicates: column swap
(ref mvsec.py:196-198), valid ranges (ref mvsec.py:127-173), GT channel
stacking (V, U) (ref mvsec.py:245-265)."""

import numpy as np
import pytest

from event_based_optical_flow_tpu import data

H_, W_ = 260, 346
T_GT = 80  # GT frames; indoor_flying1 valid range 60:1340 keeps 60..79


@pytest.fixture()
def mvsec_root(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    n = 4000
    t = np.sort(rng.uniform(100.0, 101.0, n))
    width_coord = rng.integers(0, W_, n).astype(np.float64)
    height_coord = rng.integers(0, H_, n).astype(np.float64)
    pol = rng.choice([-1.0, 1.0], n)
    # file layout: columns (x=width, y=height, t, p) — the loader swaps
    file_events = np.stack([width_coord, height_coord, t, pol], 1)
    gray_ts = np.linspace(100.05, 100.95, 30)
    with h5py.File(tmp_path / "indoor_flying1_data.hdf5", "w") as f:
        f.create_dataset("davis/left/events", data=file_events)
        f.create_dataset("davis/left/image_raw_ts", data=gray_ts)
        f.create_dataset("davis/right/events", data=file_events[:16])

    gt_ts = np.linspace(100.0, 101.0, T_GT)
    # per-GT-interval displacement: width (U/x_flow_dist) +2, height -1
    U = np.full((T_GT, H_, W_), 2.0)
    V = np.full((T_GT, H_, W_), -1.0)
    np.savez(
        tmp_path / "indoor_flying1_gt_flow_dist.npz",
        timestamps=gt_ts, x_flow_dist=U, y_flow_dist=V,
    )
    # identity rectify maps (row -> height index, col -> width index)
    ii, jj = np.meshgrid(np.arange(H_), np.arange(W_), indexing="ij")
    np.savetxt(tmp_path / "indoor_flying_left_x_map.txt", jj, fmt="%d")
    np.savetxt(tmp_path / "indoor_flying_left_y_map.txt", ii, fmt="%d")
    return tmp_path, file_events, gt_ts


def _loader(root, load_gt=True):
    cfg = {
        "height": H_, "width": W_, "root": str(root), "dataset": "MVSEC",
        "load_gt_flow": load_gt, "gt": str(root),
    }
    return data.collections["MVSEC"](config=cfg)


def test_column_swap_and_valid_range(mvsec_root):
    root, file_events, gt_ts = mvsec_root
    loader = _loader(root)
    loader.set_sequence("indoor_flying1")

    # valid-frame slicing: only GT frames 60.. survive, and events are
    # cut to the surviving GT time span
    assert len(loader.gt_time_list()) == T_GT - 60
    t_lo = gt_ts[60]
    # events cut at time_to_index(t_lo) = searchsorted - 1: the slice
    # starts ONE event before the GT start (reference convention)
    assert loader.min_ts <= t_lo and t_lo - loader.min_ts < 0.01
    assert (loader.eval_frame_time_list() > t_lo).all()

    ev = loader.load_event(0, 50)
    assert ev.shape == (50, 4)
    # the loader swaps columns: ev[:, 0] is the HEIGHT coordinate
    kept = file_events[file_events[:, 2] >= loader.min_ts]
    np.testing.assert_array_equal(ev[:, 0], kept[:50, 1])
    np.testing.assert_array_equal(ev[:, 1], kept[:50, 0])
    assert (np.diff(ev[:, 2]) >= 0).all()

    i = loader.time_to_index(loader.index_to_time(25))
    assert abs(i - 25) <= 1  # searchsorted-1 convention


def test_gt_displacement_convention(mvsec_root):
    root, _, gt_ts = mvsec_root
    loader = _loader(root)
    loader.set_sequence("indoor_flying1")
    dt_gt = gt_ts[1] - gt_ts[0]
    t1 = loader.gt_time_list()[2]
    flow = loader.load_optical_flow(t1, t1 + 0.5 * dt_gt)
    assert flow.shape == (H_, W_, 2)
    # channel 0 = height displacement (V), channel 1 = width (U),
    # linearly scaled for sub-GT-frame windows
    np.testing.assert_allclose(flow[5:-5, 5:-5, 0], -0.5, atol=1e-6)
    np.testing.assert_allclose(flow[5:-5, 5:-5, 1], 1.0, atol=1e-6)


def test_rectify_map_identity(mvsec_root):
    root, _, _ = mvsec_root
    loader = _loader(root)
    loader.set_sequence("indoor_flying1", undistort=True)
    assert loader.calib_map_x.shape == (H_, W_)
    ev = loader.load_event(0, 40)
    # identity maps: coordinates unchanged vs the non-undistorted loader
    loader2 = _loader(root)
    loader2.set_sequence("indoor_flying1")
    np.testing.assert_array_equal(ev, loader2.load_event(0, 40))
