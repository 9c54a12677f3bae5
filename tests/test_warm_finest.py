"""optimizer.warm_finest_only — the warm tracking fast path.

Warm-started frames skip the coarse pyramid scales and the init sweeps
and run ONE finest-scale Newton solve from the previous frame's finest
motion (sequential chain + fleet batch surfaces); the coarse entries of
the returned per-scale dict are rebuilt by pyramid_reduce, exactly like
update_coarse_from_fine on the full path.  ``warm_full_every: K``
re-anchors with a full pyramid every K-th warm frame.
"""
import numpy as np
import pytest

from event_based_optical_flow_tpu import solver

from test_solver import _synthetic_events

H, W = 36, 44


def _slv_cfg(method="pyramidal_patch_contrast_maximization"):
    return {
        "method": method,
        "time_aware": False,
        "patch": {
            "initialize": "zero", "scale": 3,
            "crop_height": 32, "crop_width": 40, "filter_type": "bilinear",
        },
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {
            "multi_focal_normalized_gradient_magnitude": 1.0,
            "total_variation": 0.01,
        },
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",
        "precision": "64",
    }


def _opt_cfg(**over):
    cfg = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 10,
        "parameters": {
            "trans_x": {"min": -25, "max": 25},
            "trans_y": {"min": -25, "max": 25},
        },
    }
    cfg.update(over)
    return cfg


def test_warm_finest_decision_logic():
    """Streak/re-anchor semantics of _warm_finest_active, no solves:
    cold frames reset the streak; warm_full_every=K makes every K-th
    consecutive warm frame a full-pyramid frame; K=1 disables; K=0
    never re-anchors."""
    mk = solver.collections["pyramidal_patch_contrast_maximization"]
    solv = mk((H, W), {}, _slv_cfg(), _opt_cfg(warm_finest_only=True), {}, None)

    assert solv._warm_finest_active(False) is False  # cold
    assert solv._warm_streak == 0
    assert solv._warm_finest_active(True) is True    # warm streak 1
    assert solv._warm_finest_active(True) is True    # warm streak 2
    assert solv._warm_finest_active(False) is False  # cold resets
    assert solv._warm_streak == 0

    solv.opt_config["warm_full_every"] = 2
    assert solv._warm_finest_active(True) is True    # streak 1
    assert solv._warm_finest_active(True) is False   # streak 2: re-anchor
    assert solv._wfo_last is False
    assert solv._warm_finest_active(True) is True    # streak 3

    solv.opt_config["warm_full_every"] = 1           # K=1 disables
    assert solv._warm_finest_active(True) is False

    # flag off: never active, streak untouched
    solv_off = mk((H, W), {}, _slv_cfg(), _opt_cfg(), {}, None)
    assert solv_off._warm_finest_active(True) is False


@pytest.mark.slow
def test_pyramid_warm_finest_only_recovers():
    """Sequential chain: cold frame runs the full pyramid; the warm frame
    takes the finest-only path (observable via _wfo_last) and still
    recovers a slightly drifted motion; the returned per-scale dict has
    every scale (the next frame's warm detection needs them)."""
    gt = np.array([10.0, -8.0])
    ev = _synthetic_events(gt, n=4000, h=H, w=W)
    mk = solver.collections["pyramidal_patch_contrast_maximization"]
    solv = mk((H, W), {}, _slv_cfg(), _opt_cfg(warm_finest_only=True), {}, None)

    best_cold = solv.optimize(ev)
    assert solv._wfo_last is False
    fin = best_cold[max(best_cold)]
    assert np.abs(fin[0].mean() - gt[0]) < 1.5
    assert np.abs(fin[1].mean() - gt[1]) < 1.5

    solv.set_previous_frame_best_estimation(best_cold)
    gt2 = gt + np.array([0.5, -0.5])
    ev2 = _synthetic_events(gt2, n=4000, h=H, w=W, seed=9)
    best_warm = solv.optimize(ev2)
    assert solv._wfo_last is True
    assert set(best_warm) == set(best_cold)  # all scales present
    fin2 = best_warm[max(best_warm)]
    assert np.abs(fin2[0].mean() - gt2[0]) < 1.5
    assert np.abs(fin2[1].mean() - gt2[1]) < 1.5

    # coarse entries are the pyramid_reduce of the finest (full-path
    # update_coarse_from_fine semantics)
    from event_based_optical_flow_tpu.ops.interp import pyramid_reduce

    np.testing.assert_allclose(
        best_warm[max(best_warm) - 1], pyramid_reduce(fin2), atol=1e-12
    )


@pytest.mark.slow
def test_pyramid_warm_full_every_reanchors():
    """warm_full_every=2: warm frame 1 is finest-only, warm frame 2 runs
    the full pyramid (re-anchor), warm frame 3 is finest-only again."""
    gt = np.array([10.0, -8.0])
    mk = solver.collections["pyramidal_patch_contrast_maximization"]
    solv = mk(
        (H, W), {}, _slv_cfg(),
        _opt_cfg(warm_finest_only=True, warm_full_every=2), {}, None,
    )
    best = solv.optimize(_synthetic_events(gt, n=4000, h=H, w=W))
    flags = []
    for seed in (9, 11, 13):
        solv.set_previous_frame_best_estimation(best)
        best = solv.optimize(_synthetic_events(gt, n=4000, h=H, w=W, seed=seed))
        flags.append(solv._wfo_last)
    assert flags == [True, False, True]
    fin = best[max(best)]
    assert np.abs(fin[0].mean() - gt[0]) < 1.5
    assert np.abs(fin[1].mean() - gt[1]) < 1.5


@pytest.mark.slow
def test_fleet_warm_finest_only_per_frame():
    """Fleet batch with per-frame warm dicts (the multi-stream serving
    case): the warm batch takes the batched finest-only path and each
    frame recovers its OWN drifted motion."""
    gts = [np.array([10.0, -8.0]), np.array([-6.0, 9.0])]
    slv_cfg = _slv_cfg("fleet_pyramidal_patch_contrast_maximization")
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, _opt_cfg(warm_finest_only=True), {}, None
    )
    events = [
        _synthetic_events(gt, n=2500, h=H, w=W, seed=20 + i)
        for i, gt in enumerate(gts)
    ]
    results = solv.optimize_batch(events)
    assert solv._wfo_last is False
    for res, gt in zip(results, gts):
        fin = res[max(res)]
        np.testing.assert_allclose(fin.reshape(2, -1).mean(1), gt, atol=2.0)

    # per-frame warm: each slot chains from its own solution
    solv.set_previous_frame_best_estimation(results)
    gts2 = [gt + np.array([0.5, -0.5]) for gt in gts]
    events2 = [
        _synthetic_events(gt, n=2500, h=H, w=W, seed=30 + i)
        for i, gt in enumerate(gts2)
    ]
    results2 = solv.optimize_batch(events2)
    assert solv._wfo_last is True
    for res, gt in zip(results2, gts2):
        assert set(res) == set(results[0])  # all scales present
        fin = res[max(res)]
        np.testing.assert_allclose(fin.reshape(2, -1).mean(1), gt, atol=2.0)


def test_warm_finest_only_config_validates():
    import os

    import yaml

    from event_based_optical_flow_tpu.utils.config_schema import (
        ConfigError, validate_config,
    )

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "synthetic_quickstart.yaml"
    )
    with open(cfg_path) as f:
        base = yaml.safe_load(f)
    base["optimizer"]["warm_finest_only"] = True
    base["optimizer"]["warm_full_every"] = 8
    assert validate_config(base) == []  # known keys, no warning, no raise

    base["optimizer"]["warm_finest_only"] = 3
    with pytest.raises(ConfigError, match="warm_finest_only"):
        validate_config(base)
    base["optimizer"]["warm_finest_only"] = True
    base["optimizer"]["warm_full_every"] = -1
    with pytest.raises(ConfigError, match="warm_full_every"):
        validate_config(base)
