"""Visualizer colorization semantics (host-side): HSV flow coloring
(direction -> hue, |flow|^ord -> value, ref visualizer.py:336-380),
shared pred/GT magnitude normalization, sampling-history plot (the
reference's visualize_optuna_history is undefined — latent bug,
ref base.py:701-702; visualize_sampling_history is the fixed
equivalent)."""

import os

import numpy as np
import pytest

from event_based_optical_flow_tpu.visualizer import Visualizer

H, W = 16, 20


@pytest.fixture()
def viz(tmp_path):
    return Visualizer((H, W), show=False, save=True, save_dir=str(tmp_path))


def test_color_optical_flow_direction_and_magnitude(viz):
    fx = np.zeros((H, W))
    fy = np.zeros((H, W))
    fx[:, : W // 2] = 3.0   # left half: +x motion
    fx[:, W // 2:] = -3.0   # right half: -x motion
    rgb, wheel, max_mag = viz.color_optical_flow(fx, fy, ord=0.5)
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
    assert wheel.shape == (H, H, 3)
    assert max_mag == pytest.approx(np.sqrt(3.0), rel=1e-6)  # |flow|^0.5
    # opposite directions -> different hues, uniform within each half
    left, right = rgb[:, : W // 2], rgb[:, W // 2:]
    assert not np.array_equal(left[0, 0], right[0, 0])
    assert (left == left[0, 0]).all() and (right == right[0, 0]).all()

    # zero flow -> zero value channel -> black
    rgb0, _, _ = viz.color_optical_flow(np.zeros((H, W)), np.zeros((H, W)))
    assert (rgb0 == 0).all()

    # NaN/inf flow is sanitized, not propagated
    fx_bad = fx.copy(); fx_bad[0, 0] = np.nan; fx_bad[1, 1] = np.inf
    rgb_bad, _, _ = viz.color_optical_flow(fx_bad, fy)
    assert np.isfinite(rgb_bad).all()


def test_shared_magnitude_scale(viz):
    pred = np.zeros((2, H, W))
    pred[0] = 1.0  # weak flow
    # shared (larger) max magnitude renders the weak flow DARKER than
    # solo normalization — the pred-vs-GT composite relies on this
    rgb_shared, _, _ = viz.color_optical_flow(pred[0], pred[1], max_magnitude=10.0)
    rgb_solo, _, _ = viz.color_optical_flow(pred[0], pred[1])
    assert rgb_shared.astype(int).sum() < rgb_solo.astype(int).sum()


def test_pred_and_gt_composite_saves(viz, tmp_path):
    pred = np.random.default_rng(0).normal(0, 2, (2, H, W))
    gt = np.random.default_rng(1).normal(0, 2, (2, H, W))
    viz.visualize_optical_flow_pred_and_gt(pred, gt, visualize_color_wheel=False,
                                           pred_file_prefix="pg_pred",
                                           gt_file_prefix="pg_gt")
    viz.flush()
    names = os.listdir(tmp_path)
    assert any(f.startswith("pg_pred") for f in names)
    assert any(f.startswith("pg_gt") for f in names)


def test_sampling_history_plot(viz, tmp_path):
    viz.visualize_sampling_history([5.0, 3.0, 2.5, 2.6, 2.2])
    viz.flush()
    assert len(os.listdir(tmp_path)) > 0


@pytest.mark.slow
def test_time_aware_solver_viz_paths(tmp_path):
    """The jitted viz fast path (_warped_viz_iwe + jitted
    motion_to_dense_flow) through the TIME-AWARE pyramid: voxel flows
    thread the dense-flow-voxel warp and produce files for pred/gt/batch
    visualizations."""
    from event_based_optical_flow_tpu import solver, visualizer
    from tests.test_solver import _synthetic_events

    Hs, Ws = 24, 32
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": True, "time_bin": 3, "flow_interpolation": "burgers",
        "t0_flow_location": "middle",
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20,
                  "crop_width": 28, "filter_type": "bilinear"},
        "motion_model": "2d-translation", "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"], "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0,
                             "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1}, "precision": "64",
    }
    opt_cfg = {"n_iter": 4, "method": "Newton-CG", "max_iter": 2,
               "parameters": {"trans_x": {"min": -25, "max": 25},
                              "trans_y": {"min": -25, "max": 25}}}
    vz = visualizer.Visualizer((Hs, Ws), show=False, save=True, save_dir=str(tmp_path))
    solv = solver.collections["pyramidal_patch_contrast_maximization"](
        (Hs, Ws), {}, slv_cfg, opt_cfg, {}, vz
    )
    ev = _synthetic_events(np.asarray([6.0, -4.0]), n=800, seed=5, h=Hs, w=Ws)
    best = solv.optimize(ev)
    solv.visualize_pred_sequential(ev, best)
    solv.visualize_gt_sequential(ev, np.random.default_rng(0).normal(0, 2, (Hs, Ws, 2)))
    solv.visualize_one_batch_warp(ev, best)
    vz.flush()
    names = os.listdir(tmp_path)
    assert any(n.startswith("pred_warp") for n in names)
    assert any(n.startswith("pred_masked") for n in names)
    assert any(n.startswith("gt_warp") for n in names)
