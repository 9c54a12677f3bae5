"""Fleet (batched-frame) solver: batched objective matches per-frame,
batched Newton recovers per-frame motions, FleetPyramidalSolver
end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import solver
from event_based_optical_flow_tpu.solver.fleet import (
    build_batched_objective,
    build_newton_cg_batched,
)
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events
from tests.test_solver import _mixed_cfg, _spec, _synthetic_events

H, W = 24, 32


def _batch(gts, n=2000):
    evs, wgts = [], []
    for i, gt in enumerate(gts):
        ev = _synthetic_events(np.asarray(gt), n=n, seed=10 + i)
        p, w = pad_events(ev, target_n=2048)
        evs.append(p)
        wgts.append(w)
    return jnp.asarray(np.stack(evs)), jnp.asarray(np.stack(wgts))


def test_batched_objective_matches_single():
    spec = _spec(False)
    events, weights = _batch([(10.0, -6.0), (-8.0, 4.0)])
    batched = build_batched_objective(spec)
    single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
    motion = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (2, 8)))
    losses = np.asarray(batched(motion, events, weights))
    for b in range(2):
        want = float(single(motion[b], events[b], weights[b])[0])
        assert losses[b] == pytest.approx(want, rel=1e-6)


def test_batched_fd_polish_refines_weak_analytic_curvature():
    """Fleet fd_polish (lockstep FD refinement after the analytic
    solve): under-curved batched hvp_fn stalls short per frame; the
    polish closes the gap for EVERY frame; inert without hvp_fn."""
    A = jnp.asarray(np.diag([2.0, 6.0, 12.0]))
    bs = jnp.asarray([[1.0, -2.0, 3.0], [-3.0, 1.0, -1.0]])

    def batched(x, b):
        return 0.5 * jnp.einsum("bi,ij,bj->b", x, A, x) - jnp.sum(x * b, -1)

    x_star = np.asarray(bs) / np.diag(np.asarray(A))
    weak = lambda x, d, b: 1e-4 * (d @ A)

    stall = jax.jit(build_newton_cg_batched(
        batched, maxiter=3, cg_maxiter=8, hvp_fn=weak, max_step=0.05))
    xs, fs, ks = stall(jnp.zeros((2, 3)), bs)
    assert np.linalg.norm(np.asarray(xs) - x_star, axis=-1).min() > 0.3

    pol = jax.jit(build_newton_cg_batched(
        batched, maxiter=3, cg_maxiter=8, hvp_fn=weak, max_step=0.05,
        fd_polish=4))
    xp, fp, kp = pol(jnp.zeros((2, 3)), bs)
    assert (np.asarray(fp) <= np.asarray(fs)).all()
    np.testing.assert_allclose(np.asarray(xp), x_star, atol=2e-2)
    assert int(kp) > int(ks)

    # inert without an analytic hvp_fn: identical results
    base = jax.jit(build_newton_cg_batched(batched, maxiter=6, cg_maxiter=8))
    same = jax.jit(build_newton_cg_batched(batched, maxiter=6, cg_maxiter=8,
                                           fd_polish=3))
    xb, fb, kb = base(jnp.zeros((2, 3)), bs)
    xs2, fs2, ks2 = same(jnp.zeros((2, 3)), bs)
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(xs2))
    assert int(kb) == int(ks2)


@pytest.mark.slow
def test_batched_newton_recovers_both_frames():
    spec = _spec(False)
    gts = [(10.0, -6.0), (-8.0, 4.0)]
    events, weights = _batch(gts)
    batched = build_batched_objective(spec)
    solve = jax.jit(build_newton_cg_batched(batched, maxiter=25, cg_maxiter=20))
    x0 = jnp.zeros((2, 8))
    bx, bf, k = solve(x0, events, weights)
    bx = np.asarray(bx).reshape(2, 2, 4)
    for b, gt in enumerate(gts):
        np.testing.assert_allclose(bx[b].reshape(2, -1).mean(1), gt, atol=2.5)


@pytest.mark.slow
def test_fleet_pyramidal_solver():
    gts = [(10.0, -8.0), (-6.0, 9.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=20 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    assert len(results) == 2
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)

    # batch warm start (warm_start: "batch"): the next batch initializes
    # every frame from the previous batch's last per-scale solution and
    # still recovers its own motions
    solv.set_previous_frame_best_estimation(results[-1])
    gts2 = [(9.0, -7.0), (-5.0, 8.0)]
    events2 = [_synthetic_events(np.asarray(gt), n=2500, seed=30 + i) for i, gt in enumerate(gts2)]
    results2 = solv.optimize_batch(events2)
    for res, gt in zip(results2, gts2):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)


@pytest.mark.parametrize("width", [W, 500])  # narrow / wide geometry
@pytest.mark.slow
def test_batched_banded_dense_objective_matches_single(width):
    """Fleet banded DENSE objective (pack_events_dense policy packing —
    FLEX fill-balanced bands since late round 2) vs the per-frame matmul
    objective, loss and motion-grad."""
    from event_based_optical_flow_tpu.ops.pallas_objective_banded import (
        objective_dense_packing,
    )
    from event_based_optical_flow_tpu.solver.fleet import (
        build_batched_objective_banded,
        pack_fleet_banded,
    )

    assert objective_dense_packing(width) == "flex"  # round-2 late policy
    spec = dataclasses.replace(
        _spec(False), iwe_backend="pallas",
        image_shape=(H, width),
        patch_size=(H // 2, width // 2), sliding_window=(H // 2, width // 2),
    )
    gts = [(10.0, -6.0), (-8.0, 4.0)]
    events_list = [
        _synthetic_events(np.asarray(gt), n=1500, seed=60 + i, w=width)
        for i, gt in enumerate(gts)
    ]
    x2, y2, d2, w2, brows, scales = pack_fleet_banded(events_list, H, image_width=width)
    batched = build_batched_objective_banded(spec)
    args = (jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2), jnp.asarray(w2),
            jnp.asarray(brows), jnp.asarray(scales))
    motion = jnp.asarray(np.random.default_rng(7).uniform(-5, 5, (2, 8)))
    losses = np.asarray(batched(motion, *args))
    grads = np.asarray(jax.grad(lambda m: jnp.sum(batched(m, *args)))(motion))

    single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
    for b in range(2):
        padded, wgt = pad_events(events_list[b], target_n=2048)
        want, gw = jax.value_and_grad(
            lambda m: single(m, jnp.asarray(padded), jnp.asarray(wgt))[0]
        )(motion[b])
        assert losses[b] == pytest.approx(float(want), rel=1e-6)
        np.testing.assert_allclose(grads[b], np.asarray(gw), atol=1e-8)

    # hoisted per-frame orig IWEs (the fleet Newton's fast path) are
    # exactly equivalent
    from event_based_optical_flow_tpu.solver.fleet import (
        build_orig_iwe_banded_batched,
    )

    hoisted = build_batched_objective_banded(spec, precomputed_orig=True)
    orig_b = build_orig_iwe_banded_batched(spec)(*args[:-1])
    np.testing.assert_array_equal(
        np.asarray(hoisted(motion, orig_b, *args)), losses
    )
    g2 = np.asarray(jax.grad(lambda m: jnp.sum(hoisted(m, orig_b, *args)))(motion))
    np.testing.assert_array_equal(g2, grads)


@pytest.mark.slow
def test_batched_banded_time_aware_objective_matches_single():
    """Fleet banded TA objective ((bin,band)-packed, batched voxel kernel)
    vs the per-frame unfused TA objective, loss and motion-grad."""
    from event_based_optical_flow_tpu.solver.fleet import (
        build_batched_objective_banded,
        pack_fleet_banded,
    )

    spec = dataclasses.replace(_spec(True), iwe_backend="pallas")
    gts = [(10.0, -6.0), (-8.0, 4.0)]
    events_list = [_synthetic_events(np.asarray(gt), n=1500, seed=40 + i) for i, gt in enumerate(gts)]
    x2, y2, d2, w2, brows, scales = pack_fleet_banded(events_list, H, time_bin=spec.time_bin)
    batched = build_batched_objective_banded(spec)
    args = (jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2), jnp.asarray(w2),
            jnp.asarray(brows), jnp.asarray(scales))
    motion = jnp.asarray(np.random.default_rng(5).uniform(-5, 5, (2, 8)))
    losses = np.asarray(batched(motion, *args))
    grads = np.asarray(jax.grad(lambda m: jnp.sum(batched(m, *args)))(motion))

    single = build_objective(spec)
    for b in range(2):
        padded, wgt = pad_events(events_list[b], target_n=2048)
        want, gw = jax.value_and_grad(
            lambda m: single(m, jnp.asarray(padded), jnp.asarray(wgt))[0]
        )(motion[b])
        assert losses[b] == pytest.approx(float(want), rel=1e-6)
        np.testing.assert_allclose(grads[b], np.asarray(gw), atol=1e-8)


@pytest.mark.slow
def test_fleet_mesh_data_sharding_matches_single_device():
    """Fleet + `parallel:` mesh: frames shard over the 'data' axis (each
    shard runs its own chain — embarrassingly parallel); every frame's
    motion must be recovered as well as single-device (bit-equality does
    not hold: the per-patch sampling key stream depends on the local
    batch layout), including an odd batch size that pads to a shard
    multiple."""
    gts = [(10.0, -8.0), (-6.0, 9.0), (7.0, 5.0)]  # odd B=3 -> pads to 4
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
        "max_iter": 8,
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=50 + i) for i, gt in enumerate(gts)]

    single = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, dict(slv_cfg), opt_cfg, {}, None
    )
    res_single = single.optimize_batch(events_list)

    meshed = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, dict(slv_cfg, parallel={"data": 2}), opt_cfg, {}, None
    )
    assert meshed.mesh is not None and meshed.n_data_shards == 2
    res_mesh = meshed.optimize_batch(events_list)

    assert len(res_mesh) == len(res_single) == 3
    for res in (res_mesh, res_single):
        for per_frame, gt in zip(res, gts):
            finest = per_frame[max(per_frame)]
            np.testing.assert_allclose(
                finest.reshape(2, -1).mean(1), np.asarray(gt), atol=3.5
            )


@pytest.mark.slow
def test_fleet_coarse_newton_budget():
    """optimizer.coarse_max_iter / coarse_cg_maxiter apply to the fleet
    solver's coarse scales too (chain and loop paths share
    _build_fleet_newton); recovery holds with the milder max_iter cut."""
    gts = [(10.0, -8.0), (-6.0, 9.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
        "coarse_max_iter": 6,
        "coarse_cg_maxiter": 32,
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=20 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)
    chain_keys = [k for k in solv._fun_cache if isinstance(k, tuple) and k and k[0] == "fleet_chain"]
    assert chain_keys and chain_keys[0][-1] == (6, 32), chain_keys


@pytest.mark.slow
def test_fleet_device_lbfgs_recovers():
    """optimizer.device_solver: lbfgs on the fleet solver — lockstep
    batched L-BFGS recovers both frames through the chain path."""
    gts = [(10.0, -8.0), (-6.0, 9.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
        "max_iter": 25,
        "device_solver": "lbfgs",
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=20 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)


@pytest.mark.slow
def test_multistream_estimator_per_stream_warm():
    """MultiStreamFlowEstimator: two independent streams with different
    motions solve as one fleet batch; the second push warm-starts each
    stream from its OWN previous solution (fleet chain per-frame warm
    mode) and both keep recovering their own motions."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    gts = [np.array([10.0, -8.0]), np.array([-6.0, 9.0])]
    est = MultiStreamFlowEstimator(
        (H, W), 2,
        solver_config={"patch": {"initialize": "zero", "scale": 3,
                                 "crop_height": 20, "crop_width": 28},
                       "precision": "64"},
        optimizer_config={"n_iter": 8, "max_iter": 10,
                          "parameters": {"trans_x": {"min": -25, "max": 25},
                                         "trans_y": {"min": -25, "max": 25}}},
        fixed_event_count=2000,
        batching="fleet",  # this test pins the fleet per-frame warm path
    )
    for step in range(2):
        # _synthetic_events(g) recovers MOTION g, whose dense flow is -g
        # (get_flow_from_motion sign flip) — generate with -gt so the
        # pushed flow is +gt * span
        windows = [
            _synthetic_events(-gt, n=2600, seed=40 + 10 * step + k)
            for k, gt in enumerate(gts)
        ]
        flows = est.push(windows)
        assert flows.shape == (2, 2, H, W)
        for k, gt in enumerate(gts):
            ev = windows[k]
            span = ev[:, 2].max() - ev[:, 2].min()
            interior = flows[k][:, 4:-4, 4:-4]
            np.testing.assert_allclose(
                [interior[0].mean(), interior[1].mean()], gt * span, atol=1.6
            )
    # per-stream warm state: a list of per-scale dicts, one per stream
    warm = est._solver.previous_frame_best_estimation
    assert isinstance(warm, list) and len(warm) == 2
    assert all(isinstance(d, dict) for d in warm)
    # per-stream tails pinned to the fixed count
    assert all(len(t) == 2000 for t in est._tails)
    est.reset(stream=1)
    assert est._tails[1] is None and est._tails[0] is not None
    est.reset()
    assert est._solver.previous_frame_best_estimation is None


@pytest.mark.slow
# the unmeshed chain traces the identical split-chain body chain_mesh
# runs under shard_map (validated once when the feature landed); keep
# the suite's slow tier bounded by exercising loop + meshed chain only
@pytest.mark.parametrize("mode", ["loop", "chain_mesh"])
def test_fleet_coarse_event_fraction(mode):
    """optimizer.coarse_event_fraction on the FLEET solver: coarse scales
    solve on a second (stride-subsampled) fleet pack; the finest scale
    always sees the full pack.  On the chain path this is the same
    coarse/finest two-program split the sequential chain uses
    (_get_fleet_finest_solver is the second dispatch); recovery holds on
    every path, including frames sharded over a data mesh."""
    gts = [(10.0, -8.0), (-6.0, 9.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
    if mode == "chain_mesh":
        slv_cfg["parallel"] = {"data": 2}
    opt_cfg = {
        "n_iter": 6,
        "method": "Newton-CG",
        "max_iter": 6,  # interpret-mode Pallas: runtime scales with iters
        "coarse_event_fraction": 0.5,
        "chain": mode != "loop",
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=20 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    assert solv._coarse_fleet_applied  # the subsampled pack was built
    if mode != "loop":
        # the split ran as two device programs
        assert any(
            isinstance(k, tuple) and len(k) > 1 and k[1] == "fleet_finest"
            for k in solv._fun_cache
        ), list(solv._fun_cache)
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)


def test_fleet_coarse_events_list_semantics():
    """_coarse_events_list: a frame below the subsample floor keeps its
    FULL events (per-frame degradation; keeps the chain cache key's
    split_coarse flag stable across batches), an all-sparse batch and a
    finest-only pyramid disable the coarse pack entirely."""
    def make(scale):
        return solver.collections["fleet_pyramidal_patch_contrast_maximization"](
            (H, W), {},
            {"method": "fleet_pyramidal_patch_contrast_maximization",
             "time_aware": False,
             "patch": {"initialize": "zero", "scale": scale, "crop_height": 20,
                       "crop_width": 28, "filter_type": "bilinear"},
             "motion_model": "2d-translation", "warp_direction": "first",
             "parameters": ["trans_x", "trans_y"], "cost": "hybrid",
             "outer_padding": 0,
             "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0,
                                  "total_variation": 0.01},
             "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
             "iwe_backend": "pallas", "precision": "64"},
            {"n_iter": 4, "method": "Newton-CG", "max_iter": 4,
             "coarse_event_fraction": 0.5,
             "parameters": {"trans_x": {"min": -25, "max": 25},
                            "trans_y": {"min": -25, "max": 25}}},
            {}, None,
        )

    solv = make(3)
    dense = _synthetic_events(np.array([1.0, 1.0]), n=2000, seed=1)
    sparse = _synthetic_events(np.array([1.0, 1.0]), n=600, seed=2)  # //2 < 512
    subs = solv._coarse_events_list([dense, sparse])
    assert len(subs[0]) == 1000  # stride-2 subsample
    assert len(subs[1]) == 600  # below floor: full frame substituted
    assert solv._coarse_events_list([sparse, sparse]) is None  # all sparse
    assert solv._coarse_events_list([dense, dense]) is not None

    # finest-only pyramid (scale 2 -> a single solved scale): nothing
    # coarse exists, so no second pack is built at all
    solo = make(2)
    assert solo.patch_scales - solo.coarsest_scale == 1
    assert solo._coarse_events_list([dense, dense]) is None


@pytest.mark.slow
def test_batched_analytic_hvp_matches_single_frame_oracle():
    """build_batched_objective_banded_hvp (v10 fleet path) == jax.jvp of
    the gradient of the per-frame UNFUSED (matmul) objective — the full
    Hessian-vector product, frame by frame, exact to f64 rounding (same
    oracle as the single-frame test in test_pallas_and_sharding)."""
    from event_based_optical_flow_tpu.solver.fleet import (
        build_batched_objective_banded_hvp,
        build_orig_iwe_banded_batched,
        pack_fleet_banded,
    )
    from event_based_optical_flow_tpu.solver.objective import (
        objective_supports_analytic_hvp,
    )

    spec = dataclasses.replace(_spec(False), iwe_backend="pallas")
    assert objective_supports_analytic_hvp(spec)
    gts = [(9.0, -5.0), (-7.0, 3.0)]
    events_list = [
        _synthetic_events(np.asarray(gt), n=1400, seed=80 + i)
        for i, gt in enumerate(gts)
    ]
    x2, y2, d2, w2, brows, scales = pack_fleet_banded(events_list, H, image_width=W)
    args = (jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2), jnp.asarray(w2),
            jnp.asarray(brows), jnp.asarray(scales))
    orig_b = build_orig_iwe_banded_batched(spec)(*args[:-1])
    rng = np.random.default_rng(13)
    motion = jnp.asarray(rng.uniform(-5, 5, (2, 8)))
    p = jnp.asarray(rng.normal(0, 1, (2, 8)))

    hvp_full = build_batched_objective_banded_hvp(
        spec, precomputed_orig=True, gauss_newton=False
    )
    got = np.asarray(hvp_full(motion, p, orig_b, *args))

    single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
    for b in range(2):
        padded, wgt = pad_events(events_list[b], target_n=x2.shape[1] * x2.shape[-1])
        gf = lambda m: jax.grad(
            lambda mm: single(mm, jnp.asarray(padded), jnp.asarray(wgt))[0]
        )(m)
        _, oracle = jax.jvp(gf, (motion[b],), (p[b],))
        np.testing.assert_allclose(got[b], np.asarray(oracle), atol=1e-12)

    # the GN default drops exactly the vote-Hessian term A; sanity only
    gn = build_batched_objective_banded_hvp(spec, precomputed_orig=True)(
        motion, p, orig_b, *args
    )
    assert gn.shape == got.shape and np.all(np.isfinite(np.asarray(gn)))

    # the STAGED variant (the fleet Newton's production path) is
    # numerically identical to the fused form
    prep, hvp_staged = build_batched_objective_banded_hvp(
        spec, precomputed_orig=True, gauss_newton=False, staged=True
    )
    aux = prep(motion, orig_b, *args)
    np.testing.assert_allclose(
        np.asarray(hvp_staged(aux, motion, p, orig_b, *args)), got, atol=1e-12
    )


def test_batched_voxel_jvp_hvp_kernels_match_batched_forward():
    """The fleet voxel JVP kernel's value half is bit-identical to the
    batched voxel forward; its tangent half matches a central difference
    of the forward along the tangent voxel; the fleet voxel HVP-backward
    equals d/dh [vjp(voxel + h*dvoxel)(g1 + h*g2)] at h=0 (all f64,
    interpret)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.fleet import pack_fleet_banded

    T = 4
    gts = [(6.0, -4.0), (-5.0, 3.0)]
    events_list = [
        _synthetic_events(np.asarray(gt), n=900, seed=60 + i)
        for i, gt in enumerate(gts)
    ]
    x2, y2, d2, w2, brows, _ = pack_fleet_banded(events_list, H, time_bin=T)
    chunks = tuple(jnp.asarray(a) for a in (x2, y2, d2, w2))
    brows = jnp.asarray(brows)
    B = len(gts)
    rng = np.random.default_rng(21)
    voxel = jnp.asarray(rng.normal(0, 6.0, (B, T, 2, H, W)))
    dvoxel = jnp.asarray(rng.normal(0, 1.0, (B, T, 2, H, W)))
    offsets = (0.0, 1.0)

    def images_of(v):
        return PB.fused_multi_iwe_banded_voxel_batched(
            v, *chunks, brows, (H, W), offsets, False, 1e-6, False, None,
            False,
        )

    imgs, dimgs = PB.fused_multi_iwe_banded_voxel_jvp_batched(
        voxel, dvoxel, *chunks, brows, (H, W), offsets,
        eps=1e-6, use_bf16=False,
    )
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(images_of(voxel)))
    h = 1e-6
    fd = (images_of(voxel + h * dvoxel) - images_of(voxel - h * dvoxel)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dimgs), np.asarray(fd), atol=1e-6)
    tan_only = PB.fused_multi_iwe_banded_voxel_jvp_batched(
        voxel, dvoxel, *chunks, brows, (H, W), offsets,
        eps=1e-6, use_bf16=False, emit_value=False,
    )
    np.testing.assert_array_equal(np.asarray(tan_only), np.asarray(dimgs))

    g1 = jnp.asarray(rng.normal(0, 1, (B, len(offsets), H, W)))
    g2 = jnp.asarray(rng.normal(0, 1, (B, len(offsets), H, W)))

    def vjp_at(v, g):
        _, f_vjp = jax.vjp(images_of, v)
        return f_vjp(g)[0]

    out = PB.fused_multi_iwe_banded_voxel_hvp_bwd_batched(
        voxel, dvoxel, g1, g2, *chunks, brows, (H, W), offsets,
        eps=1e-6, use_bf16=False,
    )
    fd = (
        vjp_at(voxel + h * dvoxel, g1 + h * g2)
        - vjp_at(voxel - h * dvoxel, g1 - h * g2)
    ) / (2 * h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fd), atol=1e-5)
    gn = PB.fused_multi_iwe_banded_voxel_hvp_bwd_batched(
        voxel, dvoxel, g1, g2, *chunks, brows, (H, W), offsets,
        eps=1e-6, use_bf16=False, term_a=False,
    )
    assert gn.shape == out.shape and np.all(np.isfinite(np.asarray(gn)))


@pytest.mark.slow
def test_batched_time_aware_analytic_gn_hvp_matches_single_frame():
    """The fleet TA analytic GN HVP (batched voxel JVP/HVP kernels, grid
    (B, T, G)) == the single-frame TA builder frame by frame, each on its
    own (bin, band) pack (same event sets summed in different orders —
    equality to f64 rounding); the staged fleet form is numerically
    identical to the fused form."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.fleet import (
        build_batched_objective_banded_hvp,
        build_orig_iwe_banded_batched,
        pack_fleet_banded,
    )
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded_hvp,
        build_orig_iwe_banded,
        objective_supports_analytic_hvp,
    )

    spec = dataclasses.replace(_spec(True), iwe_backend="pallas")
    assert objective_supports_analytic_hvp(spec, fleet=True)
    gts = [(9.0, -5.0), (-7.0, 3.0)]
    events_list = [
        _synthetic_events(np.asarray(gt), n=1400, seed=90 + i)
        for i, gt in enumerate(gts)
    ]
    x2, y2, d2, w2, brows, scales = pack_fleet_banded(
        events_list, H, time_bin=spec.time_bin
    )
    args = tuple(jnp.asarray(a) for a in (x2, y2, d2, w2, brows, scales))
    orig_b = build_orig_iwe_banded_batched(spec)(*args[:-1])
    rng = np.random.default_rng(17)
    motion = jnp.asarray(rng.uniform(-4, 4, (2, 8)))
    p = jnp.asarray(rng.normal(0, 1, (2, 8)))

    hvp = build_batched_objective_banded_hvp(spec, precomputed_orig=True)
    got = np.asarray(hvp(motion, p, orig_b, *args))

    single_hvp = build_objective_banded_hvp(spec, precomputed_orig=True)
    single_orig = build_orig_iwe_banded(spec)
    for b in range(2):
        ev = events_list[b]
        padded, wgt = pad_events(ev, target_n=2048)
        dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
        packed = PB.pack_events_by_band_bin(padded, wgt, dtf, H, spec.time_bin)
        t_scale = jnp.asarray(ev[:, 2].max() - ev[:, 2].min())
        s_args = tuple(jnp.asarray(a) for a in packed) + (t_scale,)
        orig = single_orig(*s_args)
        np.testing.assert_allclose(np.asarray(orig), np.asarray(orig_b[b]),
                                   rtol=1e-9, atol=1e-10)
        want = np.asarray(single_hvp(motion[b], p[b], orig, *s_args))
        np.testing.assert_allclose(got[b], want, rtol=1e-7, atol=1e-9)

    prep, hvp_staged = build_batched_objective_banded_hvp(
        spec, precomputed_orig=True, staged=True
    )
    aux = prep(motion, orig_b, *args)
    np.testing.assert_allclose(
        np.asarray(hvp_staged(aux, motion, p, orig_b, *args)), got, atol=1e-12
    )


@pytest.mark.slow
def test_fleet_time_aware_analytic_hvp_engages():
    """hvp_mode: analytic on the TIME-AWARE fleet path: the batched voxel
    JVP/HVP kernels drive the lockstep Newton (no FD-fallback warning)
    and recover per-frame translations; analytic-full still falls back
    (the motion->voxel Burgers chain is nonlinear, only GN is
    assembled)."""
    gts = [(8.0, -6.0), (-6.0, 7.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": True,
        "time_bin": 4,
        "flow_interpolation": "burgers",
        "t0_flow_location": "middle",
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
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
        "hvp_mode": "analytic",
        "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}},
    }
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=30 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    assert not getattr(solv, "_warned_analytic_hvp", False), (
        "the fleet time-aware analytic HVP fell back to FD"
    )
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)

    # the full-Hessian study mode is not assembled for time-aware
    solv_full = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, dict(opt_cfg, hvp_mode="analytic-full"), {}, None
    )
    solv_full.optimize_batch(events_list)
    assert getattr(solv_full, "_warned_analytic_hvp", False)


@pytest.mark.slow
def test_fleet_analytic_hvp_recovers():
    """hvp_mode: analytic (the per-scale hybrid) on the fleet path: the
    batched v10 kernels drive the finest-scale lockstep Newton to the
    same recovery as the FD default; coarse scales keep the FD HVP."""
    gts = [(10.0, -8.0), (-6.0, 9.0)]
    slv_cfg = {
        "method": "fleet_pyramidal_patch_contrast_maximization",
        "time_aware": False,
        "patch": {"initialize": "zero", "scale": 3, "crop_height": 20, "crop_width": 28, "filter_type": "bilinear"},
        "motion_model": "2d-translation",
        "warp_direction": "first",
        "parameters": ["trans_x", "trans_y"],
        "cost": "hybrid",
        "outer_padding": 0,
        "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
        # force the fused banded fleet objective off-TPU so the analytic
        # path engages (backend auto = fused only on TPU)
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
    solv = solver.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv_cfg, opt_cfg, {}, None
    )
    events_list = [_synthetic_events(np.asarray(gt), n=2500, seed=20 + i) for i, gt in enumerate(gts)]
    results = solv.optimize_batch(events_list)
    assert not getattr(solv, "_warned_analytic_hvp", False)
    assert len(results) == 2
    for res, gt in zip(results, gts):
        finest = res[max(res)]
        np.testing.assert_allclose(finest.reshape(2, -1).mean(1), gt, atol=3.5)
