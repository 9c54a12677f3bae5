"""Solver integration tests (tiny sizes): gradient correctness of the
jitted objective, end-to-end recovery of known motion, warm start, the
time-aware voxel objective, and metrics plumbing.  The reference has no
integration tests (SURVEY §4); these are new coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import solver
from event_based_optical_flow_tpu.solver.objective import (
    ObjectiveSpec,
    build_objective,
    build_value_grad_hvp,
)
from event_based_optical_flow_tpu.types import pad_events

H, W = 24, 32


def _synthetic_events(gt=np.array([12.0, -8.0]), n=2500, seed=3, h=H, w=W):
    # sparse random "dots" scene: no spatial periodicity, so the CMax
    # landscape has a unique basin (a lattice scene aliases translations
    # by period/duration)
    rng = np.random.default_rng(seed)
    n_dots = max(24, (h * w) // 24)
    dots_x = rng.uniform(2, h - 2, n_dots)
    dots_y = rng.uniform(2, w - 2, n_dots)
    idx = rng.integers(0, n_dots, n)
    t = np.sort(rng.uniform(0, 0.4, n))
    xs = dots_x[idx] + rng.normal(0, 0.2, n)
    ys = dots_y[idx] + rng.normal(0, 0.2, n)
    x = xs - t * gt[0]
    y = ys - t * gt[1]
    ok = (x >= 0) & (x < h - 1) & (y >= 0) & (y < w - 1)
    ev = np.stack([np.round(x), np.round(y), t, rng.integers(0, 2, n)], 1)[ok]
    return ev


def _spec(time_aware=False):
    return ObjectiveSpec(
        image_shape=(H, W),
        outer_padding=0,
        patch_image_size=(2, 2),
        patch_size=(12, 16),
        sliding_window=(12, 16),
        patch_shift=(0, 0),
        filter_type="bilinear",
        iwe_method="bilinear_vote",
        blur_sigma=1,
        cost_name="hybrid",
        cost_with_weight=(
            ("multi_focal_normalized_gradient_magnitude", 1.0),
            ("total_variation", 0.01),
        ),
        time_aware=time_aware,
        time_bin=4,
        flow_interpolation="burgers",
        t0_location="middle",
    )


# full tier only: dense duplicates test_golden_parity's gradient-vs-
# reference check; the TA gradient keeps fast kernel-level coverage via
# the banded voxel JVP/forward equivalence tests
@pytest.mark.slow
@pytest.mark.parametrize("time_aware", [False, True])
def test_objective_gradient_finite_difference(time_aware):
    spec = _spec(time_aware)
    ev = _synthetic_events()
    padded, wgt = pad_events(ev, target_n=4096)
    events = jnp.asarray(padded)
    weights = jnp.asarray(wgt)
    obj = build_objective(spec)
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, 8))

    loss0, _ = obj(x0, events, weights)
    grad = jax.grad(lambda m: obj(m, events, weights)[0])(x0)
    eps = 1e-5
    for i in range(8):
        xp = x0.at[i].add(eps)
        xm = x0.at[i].add(-eps)
        fd = (obj(xp, events, weights)[0] - obj(xm, events, weights)[0]) / (2 * eps)
        assert float(fd) == pytest.approx(float(grad[i]), rel=2e-3, abs=1e-7), i


@pytest.mark.slow
def test_hvp_matches_dense_hessian():
    spec = _spec(False)
    ev = _synthetic_events(n=800)
    padded, wgt = pad_events(ev, target_n=1024)
    events = jnp.asarray(padded)
    weights = jnp.asarray(wgt)
    vg, hvp, hess = build_value_grad_hvp(spec, jit=False)
    x0 = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, 8))
    Hmat = np.asarray(hess(x0, events, weights))
    p = np.random.default_rng(2).normal(size=8)
    hp = np.asarray(hvp(x0, jnp.asarray(p), events, weights))
    np.testing.assert_allclose(hp, Hmat @ p, rtol=1e-6, atol=1e-8)


def _mixed_cfg(**over):
    slv = {
        "method": "mixed_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "size": 12, "sliding_window": [12, 16], "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "precision": "64",
    }
    slv["patch"]["size"] = [12, 16]
    slv.update(over.pop("solver", {}))
    opt = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 20,
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    opt.update(over.pop("optimizer", {}))
    return slv, opt


def test_mixed_solver_recovers_translation():
    gt = np.array([12.0, -8.0])
    ev = _synthetic_events(gt)
    slv_cfg, opt_cfg = _mixed_cfg()
    solv = solver.collections["mixed_patch_contrast_maximization"]((H, W), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    assert best.shape == (2, 2, 2)
    mean = best.reshape(2, -1).mean(1)
    np.testing.assert_allclose(mean, gt, atol=2.5)


def test_mixed_solver_warm_start_and_first_order():
    gt = np.array([10.0, -6.0])
    ev = _synthetic_events(gt)
    slv_cfg, opt_cfg = _mixed_cfg(optimizer={"method": "Adam", "n_iter": 60, "lr": 0.5})
    solv = solver.collections["mixed_patch_contrast_maximization"]((H, W), {}, slv_cfg, opt_cfg, {}, None)
    warm = np.tile(gt[:, None], (1, 4)) + 0.5
    solv.set_previous_frame_best_estimation(warm.reshape(2, 2, 2))
    best = solv.optimize(ev)
    np.testing.assert_allclose(best.reshape(2, -1).mean(1), gt, atol=2.5)


@pytest.mark.parametrize("method", ["L-BFGS-B", "Newton-CG"])
def test_scipy_host_bridge_path(method):
    """Host scipy.optimize driving the jitted objective (the reference's
    scipy_autograd surface): L-BFGS-B (jac=True) and Newton-CG with
    device=false (host scipy line search + device HVP) both recover the
    translation."""
    gt = np.array([10.0, -7.0])
    ev = _synthetic_events(gt)
    slv_cfg, opt_cfg = _mixed_cfg(optimizer={"method": method, "device": False, "max_iter": 30})
    solv = solver.collections["mixed_patch_contrast_maximization"]((H, W), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    np.testing.assert_allclose(best.reshape(2, -1).mean(1), gt, atol=2.5)


def test_scipy_bridge_newton_cg_gtol_maps_to_xtol():
    """scipy's Newton-CG has no gtol option (it wants xtol); the bridge must
    translate the configured tolerance instead of dropping it (which raised
    scipy's "Unknown solver options: gtol" OptimizeWarning)."""
    import warnings

    from event_based_optical_flow_tpu.solver import scipy_bridge

    def vg(x):
        return float(np.sum((x - 3.0) ** 2)), 2.0 * (np.asarray(x) - 3.0)

    def hvp(x, p):
        return 2.0 * np.asarray(p)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any OptimizeWarning -> failure
        res = scipy_bridge.minimize(
            vg, np.zeros(2), method="Newton-CG",
            options={"gtol": 1e-5, "maxiter": 50}, hvp=hvp,
        )
    np.testing.assert_allclose(res.x, [3.0, 3.0], atol=1e-4)
    # an explicit xtol wins over the mapped gtol
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        scipy_bridge.minimize(
            vg, np.zeros(2), method="Newton-CG",
            options={"gtol": 1e-5, "xtol": 1e-6}, hvp=hvp,
        )


def test_sampling_optimizer_path():
    gt = np.array([8.0, -12.0])
    ev = _synthetic_events(gt)
    slv_cfg, opt_cfg = _mixed_cfg(optimizer={"method": "optuna", "n_iter": 64})
    solv = solver.collections["mixed_patch_contrast_maximization"]((H, W), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    assert best.shape == (2, 2, 2)
    assert np.isfinite(best).all()


def test_time_aware_mixed_solver():
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt)
    slv_over = {
        "method": "time_aware_mixed_patch_contrast_maximization",
        "time_aware": True,
        "time_bin": 4,
        "flow_interpolation": "burgers",
        "t0_flow_location": "middle",
    }
    slv_cfg, opt_cfg = _mixed_cfg(solver=slv_over, optimizer={"max_iter": 10})
    solv = solver.collections["time_aware_mixed_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    best = solv.optimize(ev)
    voxel = solv.motion_to_dense_flow(best)
    assert voxel.shape == (4, 2, H, W)
    np.testing.assert_allclose(best.reshape(2, -1).mean(1), gt, atol=3.0)


@pytest.mark.slow  # pipeline e2e is covered fast by test_main_eval
def test_pyramid_solver_end_to_end_with_metrics():
    gt = np.array([10.0, -8.0])
    ev = _synthetic_events(gt, n=4000, h=36, w=44)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 32, "crop_width": 40, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 10,
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"]((36, 44), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    assert set(best.keys()) == {1, 2}
    # warm-start round trip
    solv.set_previous_frame_best_estimation(best)
    # metrics: GT displacement = -motion * duration
    dur = float(ev[:, 2].max() - ev[:, 2].min())
    gt_disp = np.zeros((36, 44, 2))
    gt_disp[..., 0] = -gt[0] * dur
    gt_disp[..., 1] = -gt[1] * dur
    err = solv.calculate_flow_error(best, gt_disp, timescale=dur, events=ev)
    assert err["EPE"] < 2.0
    assert err["PRED_FWL"] < 1.0


@pytest.mark.parametrize("time_aware", [False, True])
def test_fused_metrics_match_composed(time_aware):
    """Pyramid's one-call fused metrics (AEE/NPE/AE + FWLs) == the composed
    multi-dispatch path."""
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": time_aware,
        "time_bin": 4,
        "flow_interpolation": "burgers",
        "t0_flow_location": "middle",
        "patch": {"initialize": "zero", "scale": 2, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 3,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    from event_based_optical_flow_tpu import solver as solver_mod

    solv = solver_mod.collections["pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    ev = _synthetic_events(np.asarray((6.0, -4.0)), n=1500, seed=3)
    rng = np.random.default_rng(4)
    motion = {solv.current_scale: rng.uniform(-5, 5, (2,) + tuple(solv.patch_image_size))}
    gt_flow = rng.uniform(-5, 5, (H, W, 2))
    ts = 0.7

    fused = solv.calculate_flow_error(motion, gt_flow, timescale=ts, events=ev)

    # composed multi-dispatch reference
    gt2 = np.transpose(np.asarray(gt_flow), (2, 0, 1))
    pred = solv.motion_to_dense_flow(motion, ts) * ts
    if time_aware:
        pred = solv.get_original_flow_from_time_aware_flow_voxel(pred)
    mask = solv._eventmask_np(ev)
    mask = mask[None] if mask.ndim == 3 else mask
    from event_based_optical_flow_tpu.flow.metrics import calculate_flow_error_numpy

    want = calculate_flow_error_numpy(gt2[None], pred[None], event_mask=mask)
    want.update(solv.calculate_fwl(motion, gt2, ts, ev))
    for k, v in want.items():
        assert fused[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def test_pyramid_expand_jax_matches_numpy():
    from event_based_optical_flow_tpu.ops.interp import pyramid_expand, pyramid_expand_jax

    m = np.random.default_rng(0).normal(size=(2, 3, 5))
    np.testing.assert_allclose(
        np.asarray(pyramid_expand_jax(jnp.asarray(m))), pyramid_expand(m), atol=1e-12
    )


@pytest.mark.slow
def test_pyramid_chain_matches_per_scale_loop():
    """The whole-frame fused chain (one device program for every scale)
    must reproduce the per-scale dispatch loop: same kernels in the same
    order, same PRNG key sequence — cold and warm-started frames."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2200, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 4,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    results = {}
    for chain in (False, True):
        solv = solver.collections["pyramidal_patch_contrast_maximization"](
            (20, 28), {}, slv_cfg, dict(opt_cfg, chain=chain), {}, None
        )
        assert solv._chain_ready() == chain
        cold = solv.optimize(ev)
        solv.set_previous_frame_best_estimation(cold)
        warmed = solv.optimize(ev)
        results[chain] = (cold, warmed)
    for (a, b) in zip(results[False], results[True]):
        assert sorted(a) == sorted(b)
        for s in a:
            np.testing.assert_allclose(b[s], a[s], atol=1e-5)


@pytest.mark.slow
def test_optimize_with_metrics_matches_two_call_path():
    """optimize_with_metrics (solve + AEE/FWL in one device dispatch) must
    equal optimize() followed by calculate_flow_error()."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2200, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 4,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    dur = float(ev[:, 2].max() - ev[:, 2].min())
    gt_disp = np.zeros((20, 28, 2))
    gt_disp[..., 0] = -gt[0] * dur
    gt_disp[..., 1] = -gt[1] * dur
    S = solver.collections["pyramidal_patch_contrast_maximization"]
    solv1 = S((20, 28), {}, slv_cfg, opt_cfg, {}, None)
    best1, err1 = solv1.optimize_with_metrics(ev, gt_disp, dur, ev)
    solv2 = S((20, 28), {}, slv_cfg, opt_cfg, {}, None)
    best2 = solv2.optimize(ev)
    err2 = solv2.calculate_flow_error(best2, gt_disp, timescale=dur, events=ev)
    for s in best1:
        np.testing.assert_allclose(best1[s], best2[s], atol=1e-12)
    for k in err2:
        assert err1[k] == pytest.approx(err2[k], abs=1e-9), k


@pytest.mark.slow
def test_global_similarity_solver_recovers_rot_and_zoom():
    """Global 4-DoF similarity solver (new capability — the reference
    stripped its rotational models): recovers rotation rate and zoom rate
    on the synthetic rot/zoom scenes, with sub-pixel AEE.  Warp
    convention: events advect with +field, the solver's parameters are
    the negated field (see ops/warp.flow_from_similarity)."""
    from event_based_optical_flow_tpu import data as data_mod
    from event_based_optical_flow_tpu import solver as solver_mod

    H, W = 48, 56
    for scene, extra, idx, expected in [
        ("rot", {"omega": 0.8}, 2, -0.8),
        ("zoom", {"zoom_rate": 0.6}, 3, -0.6),
    ]:
        # n_frames 5 -> ~0.24 s windows: keeps omega*dt small enough that
        # the constant-velocity field's linearization floor vs the exact
        # rotation displacement GT stays well under a pixel
        cfg = {"height": H, "width": W, "duration": 1.0, "event_rate": 30000,
               "n_frames": 5, "scene": scene, "pattern": "dots", "n_dots": 500}
        cfg.update(extra)
        loader = data_mod.collections["synthetic"](config=cfg)
        loader.set_sequence("g")
        ts = loader.eval_frame_time_list()
        i1, i2 = loader.time_to_index(ts[0]), loader.time_to_index(ts[1])
        ev = loader.load_event(i1, i2)
        ev[:, 2] -= ev[:, 2].min()

        solv = solver_mod.collections["global_contrast_maximization"](
            (H, W),
            calibration_parameter={},
            solver_config={
                "method": "global_contrast_maximization",
                "motion_model": "4-param-similarity",
                "patch": {"initialize": "zero"},
                "cost": "multi_focal_normalized_gradient_magnitude",
                "outer_padding": 0,
                "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
                "precision": "64",
            },
            optimizer_config={"method": "Newton-CG", "max_iter": 30, "n_iter": 32},
        )
        best = solv.optimize(ev)
        assert best.shape == (4,)
        assert abs(best[idx] - expected) < 0.12 * abs(expected) + 0.03, (scene, best)
        # the other rate parameter stays near zero
        other = 5 - idx  # 2 <-> 3
        assert abs(best[other]) < 0.1, (scene, best)

        gt = loader.load_optical_flow(ts[0], ts[1])
        err = solv.calculate_flow_error(best, gt, timescale=ts[1] - ts[0], events=ev)
        assert err["EPE"] < 1.0, (scene, err)



def test_coarse_event_subsample_structural():
    """coarse_event_fraction plumbing without a solve (the solve-level
    recovery gates are the slow tests below — these tests are
    compile-bound, so they live in the full tier): the subsample is a
    stride over the time-sorted stream, cached per frame identity, and
    off at fraction 1.0."""
    ev = _synthetic_events(np.array([8.0, -6.0]), n=2600, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 6,
        "coarse_event_fraction": 0.5,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"](
        (20, 28), {}, slv_cfg, opt_cfg, {}, None
    )
    sub = solv._coarse_events(ev)
    assert sub is not None and 0.4 * len(ev) <= len(sub) <= 0.6 * len(ev)
    assert (np.diff(sub[:, 2]) >= 0).all()  # stride keeps time order
    assert solv._coarse_events(ev) is sub  # cached per frame identity
    solv.opt_config = dict(opt_cfg, coarse_event_fraction=1.0)
    solv._coarse_ref = None
    assert solv._coarse_events(ev) is None  # 1.0 = off


@pytest.mark.slow
@pytest.mark.parametrize("chain", [True, False])
def test_pyramid_coarse_event_fraction(chain):
    """optimizer.coarse_event_fraction solves the coarse scales on a
    stride subsample of the events (banded path; new capability for
    DSEC-scale event rates, DEVIATION from the reference documented in
    pyramid._coarse_events).  The finest scale sees every event, so the
    recovered motion stays at full quality."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2600, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",  # interpret-mode banded kernel on CPU
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 6,
        "coarse_event_fraction": 0.5, "chain": chain,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"](
        (20, 28), {}, slv_cfg, opt_cfg, {}, None
    )
    best = solv.optimize(ev)
    # the subsample was actually built and used for the coarse scales
    assert solv._coarse_sub is not None and len(solv._coarse_sub) < len(ev)
    fin = best[max(best)]
    assert np.abs(fin[0].mean() - gt[0]) < 1.5, fin[0].mean()
    assert np.abs(fin[1].mean() - gt[1]) < 1.5, fin[1].mean()


@pytest.mark.slow
@pytest.mark.parametrize("chain", [True, False])
def test_pyramid_coarse_newton_budget(chain):
    """optimizer.coarse_max_iter / coarse_cg_maxiter cut the Newton budget
    of the coarse pyramid scales only (they just seed the next scale's
    init); the finest scale keeps the full budget, so recovery holds."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2600, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",  # interpret-mode banded kernel on CPU
        "precision": "64",
    }
    opt_cfg = {
        # coarse_max_iter only: on a scene this tight (global max_iter 6,
        # CPU interpret kernel) a coarse CG cap visibly degrades recovery;
        # coarse_cg_maxiter's plumbing is asserted structurally below and
        # its speed/accuracy tradeoff belongs to the DSEC-geometry A/B
        "n_iter": 4, "method": "Newton-CG", "max_iter": 6,
        "coarse_max_iter": 4, "coarse_cg_maxiter": 32, "chain": chain,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"](
        (20, 28), {}, slv_cfg, opt_cfg, {}, None
    )
    best = solv.optimize(ev)
    fin = best[max(best)]
    # recovery tolerance is looser than the default-budget tests: this
    # scene's global max_iter (6) is already minimal, so any coarse cut
    # costs some precision here (a no-op override is verified exactly
    # equal to the default; the speed/accuracy tradeoff itself is A/B'd
    # at DSEC geometry on the TPU — BENCHMARKS.md)
    assert np.abs(fin[0].mean() - gt[0]) < 2.0, fin[0].mean()
    assert np.abs(fin[1].mean() - gt[1]) < 2.0, fin[1].mean()
    # the distinct budgets actually reached the solver builders
    budgets = set()
    for k in solv._fun_cache:
        if not (isinstance(k, tuple) and len(k) >= 2):
            continue
        if k[0] == "chain":
            assert k[-1] == (4, 32), k  # coarse_budget rode the cache key
            budgets.add("chain")
        elif k[1] == "newton":
            budgets.add((k[2], k[4]))
        elif k[1] == "fused_scale":
            budgets.add((k[3], k[5]))
    if chain:
        assert "chain" in budgets, budgets
    else:
        assert (4, 32) in budgets and (6, None) in budgets, budgets


@pytest.mark.slow
def test_global_rotation3d_solver_recovers_omega():
    """Calibrated 3-DoF rotation model ("3-rotation", new capability —
    the classic CMax rotation-estimation problem; the reference stripped
    every rotational model): recovers the camera angular velocity on the
    synthetic rot3d scene.  Convention as in the similarity test: events
    advect with +field, the solver's parameters are the negated field."""
    from event_based_optical_flow_tpu import data as data_mod
    from event_based_optical_flow_tpu import solver as solver_mod

    H, W = 48, 56
    omega = np.array([0.3, -0.25, 0.6])
    cfg = {"height": H, "width": W, "duration": 1.0, "event_rate": 30000,
           "n_frames": 5, "scene": "rot3d", "omega3": omega.tolist(),
           "pattern": "dots", "n_dots": 500}
    loader = data_mod.collections["synthetic"](config=cfg)
    loader.set_sequence("g")
    ts = loader.eval_frame_time_list()
    i1, i2 = loader.time_to_index(ts[0]), loader.time_to_index(ts[1])
    ev = loader.load_event(i1, i2)
    ev[:, 2] -= ev[:, 2].min()

    solv = solver_mod.collections["global_contrast_maximization"](
        (H, W),
        calibration_parameter=loader.load_calib(),
        solver_config={
            "method": "global_contrast_maximization",
            "motion_model": "3-rotation",
            "patch": {"initialize": "zero"},
            "cost": "multi_focal_normalized_gradient_magnitude",
            "outer_padding": 0,
            "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
            "precision": "64",
        },
        optimizer_config={"method": "Newton-CG", "max_iter": 30, "n_iter": 32},
    )
    best = solv.optimize(ev)
    assert best.shape == (3,)
    expected = -omega
    for i in range(3):
        assert abs(best[i] - expected[i]) < 0.15 * abs(expected[i]) + 0.04, (i, best)

    gt = loader.load_optical_flow(ts[0], ts[1])
    err = solv.calculate_flow_error(best, gt, timescale=ts[1] - ts[0], events=ev)
    assert err["EPE"] < 1.0, err


@pytest.mark.slow
@pytest.mark.parametrize("chain", [True, False])
def test_pyramid_device_lbfgs_recovers(chain):
    """optimizer.device_solver: lbfgs — the cheap-iteration on-device
    alternative to Newton-CG (one gradient per iteration; the DSEC-scale
    lever) recovers the small scene through the same chain/per-scale
    plumbing."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2600, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",  # interpret-mode banded kernel on CPU
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 20,
        "device_solver": "lbfgs", "chain": chain,
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"](
        (20, 28), {}, slv_cfg, opt_cfg, {}, None
    )
    best = solv.optimize(ev)
    fin = best[max(best)]
    assert np.abs(fin[0].mean() - gt[0]) < 1.5, fin[0].mean()
    assert np.abs(fin[1].mean() - gt[1]) < 1.5, fin[1].mean()


@pytest.mark.slow
def test_pyramid_analytic_hvp_recovers():
    """optimizer.hvp_mode: analytic (v10 fused-kernel second-order path)
    drives the pyramid solve to the same quality as the central-FD
    default on a small recovery scene."""
    gt = np.array([10.0, -8.0])
    ev = _synthetic_events(gt, n=4000, h=36, w=44)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 32, "crop_width": 40, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        # force the fused banded objective (backend auto = fused only on
        # TPU) — without it hvp_mode: analytic silently falls back and
        # this test would pass without touching the v10 path
        "iwe_backend": "pallas",
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 10,
        "hvp_mode": "analytic",
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"]((36, 44), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    # the analytic path must actually have engaged (no silent fallback)
    assert not getattr(solv, "_warned_analytic_hvp", False)
    dur = float(ev[:, 2].max() - ev[:, 2].min())
    gt_disp = np.zeros((36, 44, 2))
    gt_disp[..., 0] = -gt[0] * dur
    gt_disp[..., 1] = -gt[1] * dur
    err = solv.calculate_flow_error(best, gt_disp, timescale=dur, events=ev)
    assert err["EPE"] < 1.0
    assert err["PRED_FWL"] < 1.0


@pytest.mark.slow
def test_pyramid_analytic_warm_mode():
    """hvp_mode: analytic-warm — cold frames run the hybrid (FD coarse,
    analytic finest), warm frames run analytic on every scale; both must
    recover on a small scene (cold first, then warm-chained)."""
    gt = np.array([10.0, -8.0])
    ev = _synthetic_events(gt, n=4000, h=36, w=44)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 32, "crop_width": 40, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",
        "precision": "64",
    }
    opt_cfg = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 10,
        "hvp_mode": "analytic-warm",
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["pyramidal_patch_contrast_maximization"]((36, 44), {}, slv_cfg, opt_cfg, {}, None)
    best_cold = solv.optimize(ev)
    assert not getattr(solv, "_warned_analytic_hvp", False)
    fin = best_cold[max(best_cold)]
    assert np.abs(fin[0].mean() - gt[0]) < 1.5
    assert np.abs(fin[1].mean() - gt[1]) < 1.5
    # warm frame: every scale now runs the analytic GN HVP
    solv.set_previous_frame_best_estimation(best_cold)
    ev2 = _synthetic_events(gt + np.array([0.5, -0.5]), n=4000, h=36, w=44, seed=9)
    best_warm = solv.optimize(ev2)
    fin2 = best_warm[max(best_warm)]
    assert np.abs(fin2[0].mean() - (gt[0] + 0.5)) < 1.5
    assert np.abs(fin2[1].mean() - (gt[1] - 0.5)) < 1.5


@pytest.mark.slow
def test_pyramid_analytic_coldfd_mode():
    """hvp_mode: analytic-coldfd — the accuracy-first hybrid: COLD frames
    must run central-FD on EVERY scale (bit-identical to hvp_mode: fd —
    the plain hybrid's rot cold-frame regression motivates this mode),
    warm frames run the hybrid (analytic finest) and must recover."""
    gt = np.array([10.0, -8.0])
    ev = _synthetic_events(gt, n=4000, h=36, w=44)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 32, "crop_width": 40, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",
        "precision": "64",
    }
    opt_base = {
        "n_iter": 8,
        "method": "Newton-CG",
        "max_iter": 10,
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    mk = solver.collections["pyramidal_patch_contrast_maximization"]
    solv_fd = mk((36, 44), {}, slv_cfg, dict(opt_base, hvp_mode="fd"), {}, None)
    solv_cf = mk((36, 44), {}, slv_cfg, dict(opt_base, hvp_mode="analytic-coldfd"), {}, None)
    best_fd = solv_fd.optimize(ev)
    best_cf = solv_cf.optimize(ev)
    for s in best_fd:
        np.testing.assert_array_equal(
            np.asarray(best_fd[s]), np.asarray(best_cf[s]),
            err_msg=f"cold frame diverged from fd at scale {s}",
        )
    # warm frame: the analytic finest scale engages (no silent fallback)
    solv_cf.set_previous_frame_best_estimation(best_cf)
    ev2 = _synthetic_events(gt + np.array([0.5, -0.5]), n=4000, h=36, w=44, seed=9)
    best_warm = solv_cf.optimize(ev2)
    assert not getattr(solv_cf, "_warned_analytic_hvp", False)
    fin2 = best_warm[max(best_warm)]
    assert np.abs(fin2[0].mean() - (gt[0] + 0.5)) < 1.5
    assert np.abs(fin2[1].mean() - (gt[1] - 0.5)) < 1.5


@pytest.mark.slow
def test_pyramid_analytic_coldfd_split_coarse_warm_engages():
    """Regression (round-4 DSEC gate): under the split-coarse chain
    (coarse_event_fraction) the finest scale solves in its own device
    program, and _get_finest_solver dropped the warm flag — so
    analytic-coldfd silently ran FD on WARM frames exactly on the DSEC
    configuration it was built for.  With identical warm state,
    coldfd's warm solve must be bit-identical to the analytic hybrid's
    (same programs) and must differ from fd's."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2600, h=20, w=28)
    slv_cfg = {
        "method": "pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 16, "crop_width": 24, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        "iwe_backend": "pallas",
        "precision": "64",
    }
    opt_base = {
        "n_iter": 4, "method": "Newton-CG", "max_iter": 6,
        "coarse_event_fraction": 0.5,  # forces the two-program split
        "parameters": {"trans_x": {"min": -20, "max": 20}, "trans_y": {"min": -20, "max": 20}},
    }
    mk = solver.collections["pyramidal_patch_contrast_maximization"]

    # ONE shared cold state so every arm's warm frame sees identical
    # inputs — the arms then differ only by their warm-frame programs
    cold_solver = mk((20, 28), {}, slv_cfg, dict(opt_base, hvp_mode="fd"), {}, None)
    cold = cold_solver.optimize(ev)
    assert cold_solver._coarse_sub is not None  # the split path is active
    ev2 = _synthetic_events(gt + np.array([0.5, -0.5]), n=2600, h=20, w=28, seed=9)

    def warm_solve(hvp_mode):
        solv = mk((20, 28), {}, slv_cfg, dict(opt_base, hvp_mode=hvp_mode), {}, None)
        solv.set_previous_frame_best_estimation(cold)
        warm = solv.optimize(ev2)
        return {s: np.asarray(v) for s, v in warm.items()}

    warm_fd = warm_solve("fd")
    warm_an = warm_solve("analytic")
    warm_cf = warm_solve("analytic-coldfd")
    finest = max(warm_fd)
    assert not np.array_equal(warm_cf[finest], warm_fd[finest]), (
        "coldfd's warm finest scale ran FD — the warm flag was dropped"
    )
    np.testing.assert_array_equal(warm_cf[finest], warm_an[finest])


def test_hvp_mode_routing_table_and_warm_key():
    """_want_analytic is THE single-sourced hvp-mode routing table
    (sequential + fleet builders), and _warm_key must put warm in a
    solver cache key ONLY where the built program differs by warmth —
    keying a warm-independent scale by warmth retraces a bit-identical
    program on the first warm frame (the documented +17-34 s/arm
    gotcha, regressed by analytic-coldfd for the coarse scales until
    round-4 session 4)."""
    slv_cfg, opt_cfg = _mixed_cfg()
    mk = solver.collections["mixed_patch_contrast_maximization"]

    def make(mode):
        return mk((H, W), {}, slv_cfg, dict(opt_cfg, hvp_mode=mode), {}, None)

    # (mode, warm, finest) -> uses the analytic HVP?
    table = {
        ("fd", False, True): False, ("fd", True, True): False,
        ("fd", True, False): False,
        ("analytic", False, True): True, ("analytic", True, True): True,
        ("analytic", False, False): False, ("analytic", True, False): False,
        ("analytic-warm", False, True): True, ("analytic-warm", True, True): True,
        ("analytic-warm", False, False): False, ("analytic-warm", True, False): True,
        ("analytic-coldfd", False, True): False, ("analytic-coldfd", True, True): True,
        ("analytic-coldfd", False, False): False, ("analytic-coldfd", True, False): False,
        ("analytic-all", False, False): True, ("analytic-full", True, False): True,
    }
    solvers = {m: make(m) for m in {k[0] for k in table}}
    for (mode, warm, finest), want in table.items():
        assert solvers[mode]._want_analytic(warm, finest) is want, (mode, warm, finest)

    # warm belongs in the cache key exactly where routing is warm-dependent
    key_table = {
        "fd": {True: False, False: False},
        "analytic": {True: False, False: False},
        "analytic-warm": {True: False, False: True},    # coarse scales only
        "analytic-coldfd": {True: True, False: False},  # finest scale only
        "analytic-all": {True: False, False: False},
    }
    for mode, per_scale in key_table.items():
        s = solvers[mode]
        for finest, expect in per_scale.items():
            assert s._warm_key(True, finest) is expect, (mode, finest)
            assert s._warm_key(False, finest) is False, (mode, finest)


@pytest.mark.parametrize("name", [
    "mixed_patch_contrast_maximization",
    "global_contrast_maximization",
])
def test_single_scale_solvers_pass_warm_flag(name):
    """Regression (round-4 review): GlobalMotion / Mixed optimize()
    never passed warm into _run_newton_device, so the warm-gated hvp
    modes (analytic-coldfd) silently ran FD on warm frames forever on
    these solvers — the same dropped-flag class as the split-coarse
    finest-solver bug.  Intercept the device-Newton entry point and
    assert warmth arrives on the warm-chained frame."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt)
    if name == "mixed_patch_contrast_maximization":
        slv_cfg, opt_cfg = _mixed_cfg(optimizer={"max_iter": 2, "n_iter": 2})
    else:
        slv_cfg, opt_cfg = _mixed_cfg(optimizer={"max_iter": 2, "n_iter": 2})
        slv_cfg = dict(
            slv_cfg,
            method="global_contrast_maximization",
            # the global solver has no tile grid (rejects total_variation)
            cost_with_weight={"multi_focal_normalized_gradient_magnitude": 1.0},
        )
    solv = solver.collections[name]((H, W), {}, slv_cfg, opt_cfg, {}, None)

    seen = []
    orig = type(solv)._run_newton_device

    def spy(self, *a, **kw):
        seen.append(bool(kw.get("warm", False)))
        return orig(self, *a, **kw)

    solv._run_newton_device = spy.__get__(solv)
    best = solv.optimize(ev)
    solv.set_previous_frame_best_estimation(best)
    solv.optimize(ev)
    assert seen == [False, True], seen


def test_global_solver_analytic_hvp_engages():
    """hvp_mode: analytic on the global-motion solver: the similarity
    flow field is linear in its parameters, so the analytic HVP must
    engage (no FD-fallback warning) and the solve must still recover
    the translation component."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt, n=2000)
    slv_cfg, opt_cfg = _mixed_cfg(optimizer={"max_iter": 6, "n_iter": 2,
                                             "hvp_mode": "analytic"})
    slv_cfg = dict(
        slv_cfg,
        method="global_contrast_maximization",
        motion_model="4-param-similarity",
        parameters=["trans_x", "trans_y", "rot", "zoom"],
        iwe_backend="pallas",
        cost_with_weight={"multi_focal_normalized_gradient_magnitude": 1.0},
    )
    opt_cfg = dict(opt_cfg, parameters={
        "trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25},
        "rot": {"min": -3, "max": 3}, "zoom": {"min": -3, "max": 3},
    })
    solv = solver.collections["global_contrast_maximization"]((H, W), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    assert not getattr(solv, "_warned_analytic_hvp", False), (
        "the analytic HVP fell back to FD on a linear global model"
    )
    np.testing.assert_allclose(best[:2], gt, atol=2.5)


@pytest.mark.slow
def test_time_aware_solver_analytic_hvp_engages():
    """hvp_mode: analytic on the time-aware (voxel) solver: the
    Gauss-Newton analytic HVP now routes through the voxel JVP/HVP
    kernels (round-4) — it must engage (no FD-fallback warning) and
    recover the translation; analytic-full must still fall back (the
    motion->voxel Burgers chain is nonlinear, only GN is assembled)."""
    gt = np.array([8.0, -6.0])
    ev = _synthetic_events(gt)
    slv_over = {
        "method": "time_aware_mixed_patch_contrast_maximization",
        "time_aware": True,
        "time_bin": 4,
        "flow_interpolation": "burgers",
        "t0_flow_location": "middle",
        "iwe_backend": "pallas",
    }
    slv_cfg, opt_cfg = _mixed_cfg(
        solver=slv_over, optimizer={"max_iter": 10, "hvp_mode": "analytic"}
    )
    solv = solver.collections["time_aware_mixed_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    best = solv.optimize(ev)
    assert not getattr(solv, "_warned_analytic_hvp", False), (
        "the time-aware analytic HVP fell back to FD"
    )
    np.testing.assert_allclose(best.reshape(2, -1).mean(1), gt, atol=3.0)

    # the full-Hessian study mode is not assembled for time-aware
    solv_full = solver.collections["time_aware_mixed_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, dict(opt_cfg, hvp_mode="analytic-full"), {}, None
    )
    solv_full.optimize(ev)
    assert getattr(solv_full, "_warned_analytic_hvp", False)
