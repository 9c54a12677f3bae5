"""StreamingFlowEstimator: push-API dense flow over consecutive event
windows with warm-start chaining, metrics contract, reset."""

import numpy as np
import pytest

from event_based_optical_flow_tpu.streaming import StreamingFlowEstimator

H, W = 24, 32
VEL = np.array([8.0, -6.0])  # true feature velocity, px/s


def _window(t0, dur=0.4, n=2200, seed=0):
    rng = np.random.default_rng(seed)
    n_dots = 48
    dx = rng.uniform(2, H - 2, n_dots)
    dy = rng.uniform(2, W - 2, n_dots)
    idx = rng.integers(0, n_dots, n)
    t = np.sort(rng.uniform(0, dur, n))
    x = dx[idx] + rng.normal(0, 0.2, n) + t * VEL[0]
    y = dy[idx] + rng.normal(0, 0.2, n) + t * VEL[1]
    ok = (x >= 0) & (x < H - 1) & (y >= 0) & (y < W - 1)
    return np.stack([np.round(x), np.round(y), t0 + t, rng.integers(0, 2, n)], 1)[ok]


@pytest.fixture(scope="module")
def estimator():
    return StreamingFlowEstimator(
        (H, W),
        solver_config={
            "patch": {"initialize": "zero", "scale": 3, "crop_height": 20,
                      "crop_width": 28, "filter_type": "bilinear"},
        },
        optimizer_config={"n_iter": 8, "max_iter": 10},
    )


@pytest.mark.slow
def test_push_recovers_motion_and_chains(estimator):
    dur = 0.4
    for i in range(2):
        flow = estimator.push(_window(t0=i * dur, dur=dur, seed=10 + i))
        assert flow.shape == (2, H, W)
        # displacement over the window ~ VEL * dur where events exist
        interior = flow[:, 4:-4, 4:-4]
        np.testing.assert_allclose(
            [interior[0].mean(), interior[1].mean()], VEL * dur, atol=1.2
        )
    assert estimator.n_windows == 2
    assert estimator._solver.previous_frame_best_estimation is not None
    estimator.reset()
    assert estimator._solver.previous_frame_best_estimation is None


def test_metrics_contract():
    """metrics() is solve-independent: feed a synthetic displacement
    directly (the push-then-metrics accuracy path is covered by the slow
    test above at full solver budget)."""
    est = StreamingFlowEstimator(
        (H, W),
        solver_config={"patch": {"initialize": "zero", "scale": 3,
                                 "crop_height": 20, "crop_width": 28}},
        optimizer_config={"n_iter": 2, "max_iter": 2},
    )
    dur = 0.4
    ev = _window(t0=0.0, dur=dur, seed=99)
    gt_hw2 = np.zeros((H, W, 2))
    gt_hw2[..., 0] = VEL[0] * dur
    gt_hw2[..., 1] = VEL[1] * dur
    flow = np.broadcast_to((VEL * dur + 0.25)[:, None, None], (2, H, W))
    err = est.metrics(flow, gt_hw2, ev)
    assert set(err) >= {"EPE", "AE", "1PE"}
    assert err["EPE"] == pytest.approx(np.hypot(0.25, 0.25), rel=1e-3)


@pytest.mark.slow  # 11 s (solver builds); merge semantics unchanged since r2
def test_partial_configs_merge_and_fit_sensor():
    """Partial solver configs deep-merge over the defaults and the crop
    still fits the sensor (regression: a partial patch dict used to
    replace the whole default patch section, and any solver_config used
    to skip the sensor-fit crop)."""
    est = StreamingFlowEstimator(
        (H, W),
        solver_config={"patch": {"initialize": "zero", "scale": 3}},
        optimizer_config={"n_iter": 6, "max_iter": 6},
    )
    patch = est._solver.slv_config["patch"]
    assert patch["filter_type"] == "bilinear"  # default retained
    assert patch["crop_height"] <= H and patch["crop_width"] <= W
    flow = est.push(_window(t0=0.0, seed=7))
    assert flow.shape == (2, H, W)

    est2 = StreamingFlowEstimator(
        (H, W), solver_config={"warp_direction": "first"},
        optimizer_config={"n_iter": 6, "max_iter": 6},
    )
    patch2 = est2._solver.slv_config["patch"]
    assert patch2["crop_height"] <= H and patch2["crop_width"] <= W

    with pytest.raises(ValueError):
        StreamingFlowEstimator((8, 8))  # too small for the default pyramid


def test_serving_default_hvp_mode_is_analytic_warm():
    """The serving surfaces are warm-dominated and latency-bound, so
    analytic-warm is their DEFAULT hvp mode (round-4 adoption,
    BENCHMARKS.md analytic-warm gate); an explicit user hvp_mode must
    still win (the accuracy escape hatch)."""
    est = StreamingFlowEstimator(
        (H, W), optimizer_config={"n_iter": 6, "max_iter": 6},
    )
    assert est._solver.opt_config["hvp_mode"] == "analytic-warm"

    est2 = StreamingFlowEstimator(
        (H, W),
        optimizer_config={"n_iter": 6, "max_iter": 6, "hvp_mode": "fd"},
    )
    assert est2._solver.opt_config["hvp_mode"] == "fd"


@pytest.mark.slow
def test_warmup_preserves_warm_streak():
    """With warm_finest_only + warm_full_every configured, warmup() must
    not advance the warm streak: WHICH real frames re-anchor (run the
    full pyramid) is part of the restored serving state — otherwise
    warmup pushes shift the re-anchor cadence of real traffic (round-4
    advisor finding)."""
    est = StreamingFlowEstimator(
        (H, W),
        solver_config={
            "patch": {"initialize": "zero", "scale": 3, "crop_height": 20,
                      "crop_width": 28, "filter_type": "bilinear"},
            # the wf fast path needs the device chain (banded objective)
            "iwe_backend": "pallas",
        },
        optimizer_config={"n_iter": 2, "max_iter": 2, "warm_finest_only": True,
                          "warm_full_every": 3},
        fixed_event_count=1500,
    )
    est.push(_window(t0=0.0, seed=1))   # cold
    est.push(_window(t0=0.4, seed=2))   # warm: streak -> 1, fast path
    streak = est._solver._warm_streak
    wfo = est._solver._wfo_last
    assert streak == 1 and wfo is True
    est.warmup(n_windows=2, n_events=1500)
    assert est._solver._warm_streak == streak
    assert est._solver._wfo_last == wfo


@pytest.mark.slow
def test_warmup_compiles_without_leaking_state():
    """warmup() drives the cold->warm program sequence and restores the
    pre-warmup serving state: after warmup, the first REAL push must be
    bit-identical to the same push on a never-warmed estimator (warmup
    must not leak its chain, tail, counters, OR RNG state into
    production results — `initialize: random` here exercises the numpy
    generator and the jax PRNG splits that every push consumes)."""
    def fresh():
        return StreamingFlowEstimator(
            (H, W),
            solver_config={
                "patch": {"initialize": "random", "scale": 2,
                          "crop_height": 20, "crop_width": 28,
                          "filter_type": "bilinear"},
            },
            optimizer_config={"n_iter": 4, "max_iter": 4},
            fixed_event_count=1500,
        )

    est = fresh()
    dt = est.warmup(n_windows=2, n_events=1500)
    assert dt > 0
    assert est.n_windows == 0
    assert est._solver.previous_frame_best_estimation is None
    assert est._tail is None and est.last_span is None

    win = _window(t0=0.0, seed=11)
    flow_warmed = est.push(win)
    flow_plain = fresh().push(win)
    np.testing.assert_array_equal(flow_warmed, flow_plain)


@pytest.mark.slow
def test_multistream_warmup_restores_state():
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    est = MultiStreamFlowEstimator(
        (H, W), n_streams=2,
        solver_config={
            "patch": {"initialize": "zero", "scale": 2, "crop_height": 20,
                      "crop_width": 28, "filter_type": "bilinear"},
        },
        optimizer_config={"n_iter": 4, "max_iter": 4},
        fixed_event_count=1500,
    )
    dt = est.warmup(n_windows=1, n_events=1500)
    assert dt > 0
    assert est.n_batches == 0
    assert est._solver.previous_frame_best_estimation is None
    assert est._tails == [None, None]
    flows = est.push([_window(0.0, seed=3), _window(0.0, seed=4)])
    assert flows.shape == (2, 2, H, W) and np.isfinite(flows).all()


def test_push_rejects_bad_input(estimator):
    with pytest.raises(ValueError):
        estimator.push(np.zeros((0, 4)))
    with pytest.raises(ValueError):
        estimator.push(np.zeros((10, 3)))


def test_fixed_event_count_subsample_logic():
    """fixed_event_count: oversize windows are uniformly subsampled to
    exactly N (temporal order + endpoints kept, no duplicates); smaller
    windows pass through untouched."""
    from event_based_optical_flow_tpu.streaming import _subsample_fixed

    ev = _window(t0=0.0, seed=3)
    n = len(ev)
    sub = _subsample_fixed(ev, n // 3)
    assert len(sub) == n // 3
    assert (np.diff(sub[:, 2]) >= 0).all()  # t-sorted preserved
    np.testing.assert_array_equal(sub[0], ev[0])
    np.testing.assert_array_equal(sub[-1], ev[-1])
    # strictly increasing indices -> all rows distinct rows of ev
    assert len(np.unique(sub[:, 2])) >= len(sub) - np.sum(np.diff(ev[:, 2]) == 0) - 1
    np.testing.assert_array_equal(_subsample_fixed(ev, n), ev)
    np.testing.assert_array_equal(_subsample_fixed(ev, n + 50), ev)


@pytest.mark.slow
def test_fixed_event_count_estimator_tail():
    """The estimator applies fixed_event_count on push: oversize windows
    subsample, undersized ones top up from the previous tail, reset
    drops the tail."""
    ev = _window(t0=0.0, seed=3)
    est = StreamingFlowEstimator(
        (H, W),
        solver_config={"patch": {"initialize": "zero", "scale": 3,
                                 "crop_height": 20, "crop_width": 28}},
        optimizer_config={"n_iter": 6, "max_iter": 6},
        fixed_event_count=800,
    )
    flow = est.push(ev)  # len(ev) > 800 -> subsampled internally
    assert flow.shape == (2, H, W)
    assert est.n_windows == 1
    assert len(est._tail) == 800

    # undersized window: topped up to exactly N from the previous tail
    small = _window(t0=0.5, seed=4)[:300]
    est.push(small)
    assert len(est._tail) == 800
    # the tail's newest rows are the small window itself
    np.testing.assert_array_equal(est._tail[-300:], small)
    est.reset()
    assert est._tail is None
    # no history after reset: solved as-is
    est.push(small)
    assert len(est._tail) == 300


def test_save_load_state_roundtrip(tmp_path):
    """Serving restart: warm-start motions, borrow tail, and the window
    counter round-trip through save_state/load_state (single stream;
    the multi-stream/fleet round-trip is the slow test below)."""
    cfg = {"patch": {"initialize": "zero", "scale": 3,
                     "crop_height": 20, "crop_width": 28}}
    opt = {"n_iter": 2, "max_iter": 2}
    est = StreamingFlowEstimator((H, W), solver_config=cfg,
                                 optimizer_config=opt, fixed_event_count=900)
    est.push(_window(t0=0.0, seed=21))
    est.save_state(tmp_path / "state.npz")
    est2 = StreamingFlowEstimator((H, W), solver_config=cfg,
                                  optimizer_config=opt, fixed_event_count=900)
    est2.load_state(tmp_path / "state.npz")
    assert est2.n_windows == 1
    np.testing.assert_array_equal(est2._tail, est._tail)
    w1 = est._solver.previous_frame_best_estimation
    w2 = est2._solver.previous_frame_best_estimation
    assert sorted(w1) == sorted(w2)
    for s in w1:
        np.testing.assert_array_equal(w1[s], w2[s])


@pytest.mark.slow
def test_multistream_sequential_batching():
    """batching="sequential" (the single-chip auto default since the
    round-5 TA decomposition measured the fleet batch at 1.55x the wall
    of back-to-back sequential solves): per-stream solves, per-stream
    warm chaining, and the SAME warm-list state surface as fleet mode
    (save_state/load_state round-trips across modes)."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    cfg = {"patch": {"initialize": "zero", "scale": 3,
                     "crop_height": 20, "crop_width": 28},
           "iwe_backend": "pallas", "precision": "64"}
    opt = {"n_iter": 4, "max_iter": 6}
    est = MultiStreamFlowEstimator((H, W), 2, solver_config=cfg,
                                   optimizer_config=opt,
                                   fixed_event_count=1500,
                                   batching="sequential")
    # auto rule (measured A/Bs): dense -> fleet, single-chip TA -> seq
    assert MultiStreamFlowEstimator(
        (H, W), 2, solver_config=cfg, optimizer_config=opt
    ).batching == "fleet"
    ta_cfg = dict(cfg, time_aware=True, time_bin=2,
                  flow_interpolation="burgers", t0_flow_location="middle")
    assert MultiStreamFlowEstimator(
        (H, W), 2, solver_config=ta_cfg, optimizer_config=opt
    ).batching == "sequential"
    for step in range(2):
        flows = est.push([_window(t0=0.4 * step, seed=30 + step),
                          _window(t0=0.4 * step, seed=40 + step)])
        assert flows.shape == (2, 2, H, W) and np.isfinite(flows).all()
    warm = est._solver.previous_frame_best_estimation
    assert isinstance(warm, list) and len(warm) == 2
    assert all(isinstance(d, dict) for d in warm)
    # streams are independent: different windows -> different warm state
    fin = max(warm[0])
    assert not np.array_equal(np.asarray(warm[0][fin]),
                              np.asarray(warm[1][fin]))
    # explicit fleet under a mesh-less config still works; sequential
    # under a data mesh is rejected
    with pytest.raises(ValueError):
        MultiStreamFlowEstimator((H, W), 2, solver_config=cfg,
                                 optimizer_config=opt,
                                 parallel_config={"data": 2},
                                 batching="sequential")


@pytest.mark.slow
def test_multistream_sequential_staggered_reanchor():
    """Sequential batching + warm_finest_only + warm_full_every: stream
    re-anchors are STAGGERED by stream index (the wf serving A/B
    measured an all-stream re-anchor batch as a 69-109 s p99 spike;
    sequential mode spreads it to one full solve per push)."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    cfg = {"patch": {"initialize": "zero", "scale": 3,
                     "crop_height": 20, "crop_width": 28},
           "iwe_backend": "pallas", "precision": "64"}
    opt = {"n_iter": 2, "max_iter": 3, "warm_finest_only": True,
           "warm_full_every": 2}
    est = MultiStreamFlowEstimator((H, W), 3, solver_config=cfg,
                                   optimizer_config=opt,
                                   fixed_event_count=1500,
                                   batching="sequential")
    # stagger offsets k % wfe = [0, 1, 0]
    assert [s[0] for s in est._streaks] == [0, 1, 0]
    est.push([_window(t0=0.0, seed=50 + k) for k in range(3)])   # cold
    assert [s[0] for s in est._streaks] == [0, 1, 0]  # re-seeded offsets
    est.push([_window(t0=0.4, seed=60 + k) for k in range(3)])   # warm
    # streaks advanced from their offsets: [1, 2, 1] -> stream 1
    # re-anchored (streak % 2 == 0) while streams 0/2 took the fast path
    assert [s[0] for s in est._streaks] == [1, 2, 1]
    reanchored = [s[0] % 2 == 0 for s in est._streaks]
    assert reanchored == [False, True, False]


@pytest.mark.slow
def test_save_load_state_roundtrip_multistream(tmp_path):
    """Multi-stream (fleet) serving restart round-trip."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    cfg = {"patch": {"initialize": "zero", "scale": 3,
                     "crop_height": 20, "crop_width": 28}}
    opt = {"n_iter": 6, "max_iter": 6}
    ms = MultiStreamFlowEstimator((H, W), 2, solver_config=cfg,
                                  optimizer_config=opt, fixed_event_count=900)
    ms.push([_window(t0=0.0, seed=22), _window(t0=0.0, seed=23)])
    ms.save_state(tmp_path / "ms.npz")
    ms2 = MultiStreamFlowEstimator((H, W), 2, solver_config=cfg,
                                   optimizer_config=opt, fixed_event_count=900)
    ms2.load_state(tmp_path / "ms.npz")
    assert ms2.n_batches == 1
    warm1 = ms._solver.previous_frame_best_estimation
    warm2 = ms2._solver.previous_frame_best_estimation
    assert isinstance(warm2, list) and len(warm2) == 2
    for d1, d2 in zip(warm1, warm2):
        for s in d1:
            np.testing.assert_array_equal(np.asarray(d1[s]), d2[s])
    for t1, t2 in zip(ms._tails, ms2._tails):
        np.testing.assert_array_equal(t1, t2)


def test_http_flow_server_roundtrip(tmp_path):
    """serve.FlowServer: POST an event window as npz, get the dense flow
    back; healthz reports the window count; reset drops the chain; bad
    payloads return 400 and the server keeps serving; state persists to
    state_path."""
    import io
    import json
    import urllib.request

    from event_based_optical_flow_tpu.serve import FlowServer

    # extensionless on purpose: np.savez appends .npz, and the server
    # must normalize so the restart resume check finds the real file
    state = tmp_path / "serve_state"
    server = FlowServer(
        (H, W), port=0,  # ephemeral port
        solver_config={"patch": {"initialize": "zero", "scale": 3,
                                 "crop_height": 20, "crop_width": 28}},
        optimizer_config={"n_iter": 6, "max_iter": 6},
        fixed_event_count=900,
        state_path=str(state),
    ).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        ev = _window(t0=0.0, seed=31)
        buf = io.BytesIO()
        np.savez(buf, events=ev)
        req = urllib.request.Request(f"{base}/flow", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = np.load(io.BytesIO(resp.read()))
        assert out["flow"].shape == (2, H, W)
        assert np.isfinite(out["flow"]).all()
        assert float(out["span"]) > 0

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health == {"status": "ok", "n_windows": 1}
        assert (tmp_path / "serve_state.npz").exists()
        # span reflects the SOLVED window (tail top-up under
        # fixed_event_count), not just the posted one
        assert float(out["span"]) == pytest.approx(server.estimator.last_span)

        # malformed payload: 400, server stays up
        req = urllib.request.Request(f"{base}/flow", data=b"junk", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        req = urllib.request.Request(f"{base}/reset", data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
        assert server.estimator._solver.previous_frame_best_estimation is None
    finally:
        server.shutdown()

    # a fresh server resumes the persisted state
    server2 = FlowServer(
        (H, W), port=0,
        solver_config={"patch": {"initialize": "zero", "scale": 3,
                                 "crop_height": 20, "crop_width": 28}},
        optimizer_config={"n_iter": 6, "max_iter": 6},
        fixed_event_count=900,
        state_path=str(state),
    )
    assert server2.estimator.n_windows == 1
    server2.httpd.server_close()


@pytest.mark.slow
def test_time_aware_push_returns_voxel_shape():
    """Time-aware estimators return the flow VOXEL: [T, 2, H, W] for a
    single stream, [K, T, 2, H, W] multi-stream (the round-4 TA serving
    bench asserted the dense [K, 2, H, W] shape and misread the failure
    as non-finite flows — this pins the documented contract)."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    ta = {
        "time_aware": True, "time_bin": 2,
        "flow_interpolation": "burgers", "t0_flow_location": "middle",
        "patch": {"initialize": "zero", "scale": 2, "crop_height": 20,
                  "crop_width": 28, "filter_type": "bilinear"},
    }
    opt = {"n_iter": 2, "max_iter": 2}
    est = StreamingFlowEstimator((H, W), solver_config=ta,
                                 optimizer_config=opt)
    flow = est.push(_window(t0=0.0, seed=5))
    assert flow.shape == (2, 2, H, W)
    assert np.isfinite(flow).all()

    ms = MultiStreamFlowEstimator((H, W), n_streams=2, solver_config=ta,
                                  optimizer_config=opt)
    flows = ms.push([_window(t0=0.0, seed=6), _window(t0=0.0, seed=7)])
    assert flows.shape == (2, 2, 2, H, W)
    assert np.isfinite(flows).all()
