"""Online (streaming) flow estimation: the serving surface.

The reference only exposes an offline batch pipeline (`main.py --eval`
iterates a prerecorded sequence, ref main.py:52-107).  For deployment a
consumer has a live event stream and wants per-window dense flow with
the same warm-start chaining the eval protocol uses.  This wraps the
pyramidal solver behind a push API:

    est = StreamingFlowEstimator(image_shape=(260, 346))
    for window in event_windows:           # [n, 4] (x, y, t, p) arrays
        flow = est.push(window)            # [2, H, W] px displacement
                                           # over the window
All device state (jitted whole-frame chain, compilation cache, warm
start) lives inside; `reset()` drops the warm-start chain (e.g. on a
scene cut).

Event-count discipline: the event BUFFER is bucket-padded (4096), but
the fill-balanced flex packing's chunk count G is data-dependent — a
drifting per-window event count walks G across its g_round bucket and
retraces the jitted solve chain (minutes at DSEC scale; see
CLAUDE/BENCHMARKS notes).  Fixed-count windows (the reference protocol,
``n_events_per_batch``) are stable.  For variable-rate live streams
pass ``fixed_event_count=N``: windows larger than N are uniformly
subsampled to exactly N (temporal order kept), and windows SMALLER
than N borrow the most recent events from the previous window's tail
(the sliding fixed-count window every event pipeline uses; assumes
consecutive non-overlapping pushes).  Until enough history exists the
window is solved as-is — a bounded number of startup-only retraces.
"""

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DEFAULT_SOLVER = {
    "method": "pyramidal_patch_contrast_maximization",
    "time_aware": False,
    "patch": {"initialize": "random", "scale": 5, "crop_height": 256,
              "crop_width": 336, "filter_type": "bilinear"},
    "motion_model": "2d-translation",
    "warp_direction": "first",
    "parameters": ["trans_x", "trans_y"],
    "cost": "hybrid",
    "outer_padding": 0,
    "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0,
                         "total_variation": 0.01},
    "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
}
_DEFAULT_OPT = {
    "n_iter": 40,
    "method": "Newton-CG",
    "max_iter": 25,
    # Serving surfaces are warm-dominated (every window after the first
    # is a warm frame) and latency-bound, so the v10 analytic GN HVP
    # runs full-analytic on warm frames by default: ~3x the central-FD
    # warm wall at a measured +1-2% EPE across all 6 scene families
    # (BENCHMARKS.md round-4 analytic-warm gate).  Accuracy-critical
    # deployments override with optimizer_config={"hvp_mode": "fd"}
    # (the eval-protocol default).  On CPU (or non-fused backends) the
    # analytic path is inert and the solver falls back to FD.
    # A further latency lever: optimizer_config={"warm_finest_only":
    # True} makes warm frames skip the coarse scales + init sweeps
    # entirely (one finest-scale Newton from the previous motion).
    # Round-5 6-family gate (BENCHMARKS.md, results/gate/wf_mvsec.jsonl):
    # ~3x faster warm windows at accuracy parity-or-better on
    # quadrants/disc/rot/noise, +3% sparse — but +33% EPE on the zoom
    # family (persistent scale motion keeps benefiting from the full
    # pyramid's refinement).  Kept OPT-IN for that reason; pair with
    # "warm_full_every": 4 to halve the zoom cost (+12%) at still ~2x.
    "hvp_mode": "analytic-warm",
    "parameters": {"trans_x": {"min": -150, "max": 150},
                   "trans_y": {"min": -150, "max": 150}},
}


def _subsample_fixed(events: np.ndarray, count: int) -> np.ndarray:
    """Uniform-stride subsample to exactly ``count`` rows (t-sorted input
    keeps temporal order; first and last events always kept).  Indices
    are strictly increasing for count <= n (spacing >= 1), so no event
    is duplicated."""
    n = len(events)
    if n <= count:
        return events
    idx = np.round(np.linspace(0, n - 1, count)).astype(np.int64)
    return events[idx]


def _warmup_window(image_shape, n_events, seed, t0=0.0, span=0.05):
    """Aperiodic moving-dots window (global ~14 px/s translation) for
    compile warmup: a RECOVERABLE scene, so warm-chained warmup windows
    drive the same cold->warm program sequence as production traffic
    (random noise would also compile, but its degenerate solves make the
    warm chain unrepresentative).  Events are clipped (not dropped) at
    the sensor border so exactly ``n_events`` rows come back."""
    rng = np.random.default_rng(seed)
    H, W = image_shape
    n_dots = max(50, (H * W) // 256)
    dx = rng.uniform(1.0, H - 2.0, n_dots)
    dy = rng.uniform(1.0, W - 2.0, n_dots)
    idx = rng.integers(0, n_dots, n_events)
    t = np.sort(rng.uniform(0.0, span, n_events))
    u, v = 12.0, 7.0  # px/s, well inside the default +-150 search bounds
    x = np.clip(dx[idx] - t * u + rng.normal(0, 0.2, n_events), 0, H - 1)
    y = np.clip(dy[idx] - t * v + rng.normal(0, 0.2, n_events), 0, W - 1)
    p = rng.integers(0, 2, n_events).astype(np.float64)
    return np.stack([x, y, t0 + t, p], axis=1)


def _snapshot_solver_rng(solver):
    """Capture the solver's RNG state so warmup pushes don't advance it
    (each push consumes jax PRNG splits for the init sweeps/chain and,
    under ``initialize: random``, the numpy generator too — without the
    restore, the first real push after warmup would draw different init
    candidates than a never-warmed estimator)."""
    key = getattr(solver, "_key", None)
    rng = getattr(solver, "_rng", None)
    return (
        None if key is None else np.asarray(key).copy(),
        None if rng is None else rng.bit_generator.state,
    )


def _snapshot_warm_streak(solver):
    """Capture the warm_finest_only streak counters so warmup pushes don't
    shift which real frames re-anchor under ``warm_full_every`` (the
    'restores pre-warmup state' guarantee covers cadence too)."""
    return (getattr(solver, "_warm_streak", 0), getattr(solver, "_wfo_last", False))


def _restore_warm_streak(solver, snap):
    solver._warm_streak, solver._wfo_last = snap


def _restore_solver_rng(solver, snap):
    key, rng_state = snap
    if key is not None:
        import jax.numpy as jnp

        solver._key = jnp.asarray(key)
    if rng_state is not None:
        solver._rng.bit_generator.state = rng_state


def _deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge (override wins; nested dicts merge instead of
    replace) — partial user configs keep the defaults' remaining keys."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _prepare_configs(image_shape, solver_config, optimizer_config):
    """Deep-merge user configs over the MVSEC-protocol defaults and fit
    the pyramid crop to the sensor (largest multiple of 2^(scales-1):
    each pyramid level halves the patch size).  Unknown keys warn like
    the CLI's schema validation."""
    from .utils.config_schema import _KNOWN_OPT_KEYS, _KNOWN_SOLVER_KEYS

    H, W = image_shape
    slv = _deep_merge(_DEFAULT_SOLVER, solver_config or {})
    user_patch = (solver_config or {}).get("patch", {})
    if "crop_height" not in user_patch or "crop_width" not in user_patch:
        scales = int(slv["patch"]["scale"]) - 1
        unit = 2 ** max(1, scales)
        if (H // unit) * unit == 0 or (W // unit) * unit == 0:
            raise ValueError(
                f"image_shape {image_shape} too small for "
                f"patch.scale={slv['patch']['scale']} (needs >= {unit} px)"
            )
        slv["patch"].setdefault("crop_height", (H // unit) * unit)
        slv["patch"].setdefault("crop_width", (W // unit) * unit)
        slv["patch"]["crop_height"] = min(slv["patch"]["crop_height"], (H // unit) * unit)
        slv["patch"]["crop_width"] = min(slv["patch"]["crop_width"], (W // unit) * unit)
    opt = _deep_merge(_DEFAULT_OPT, optimizer_config or {})
    for key in slv:
        if key not in _KNOWN_SOLVER_KEYS:
            logger.warning(f"unknown solver config key '{key}' (ignored?)")
    for key in opt:
        if key not in _KNOWN_OPT_KEYS:
            logger.warning(f"unknown optimizer config key '{key}' (ignored?)")
    return slv, opt


class StreamingFlowEstimator:
    """Warm-start-chained per-window dense flow over a live event stream.

    Parameters
    ----------
    image_shape : (H, W) sensor resolution.
    solver_config / optimizer_config : same dicts as the YAML `solver:` /
        `optimizer:` sections, DEEP-merged over the defaults (the
        MVSEC-protocol pyramidal configuration with the crop fitted to
        the sensor), so partial overrides like
        ``{"patch": {"scale": 3}}`` keep the remaining keys.  Unknown
        keys warn like the CLI's schema validation.
    Default HVP mode is ``analytic-warm`` (the v10 analytic GN HVP on
    every pyramid scale once windows are warm-chained; cold windows run
    the cold-safe hybrid): ~3x the central-FD warm-window wall at a
    measured +1-2% EPE across all 6 scene families (BENCHMARKS.md
    round-4 analytic-warm gate).  Accuracy-critical deployments pass
    ``optimizer_config={"hvp_mode": "fd"}`` for the eval-protocol
    behavior.

    warm_start : chain each window's solution into the next one's
        initialization (the reference eval protocol).
    fixed_event_count : if set, every solved window has exactly this
        many events once history allows: oversize windows are uniformly
        subsampled, undersized ones are topped up from the previous
        window's tail (see the module docstring: bounds jit retraces
        under variable-rate streams).
    """

    def __init__(
        self,
        image_shape: Tuple[int, int],
        solver_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        warm_start: bool = True,
        fixed_event_count: Optional[int] = None,
    ):
        from . import solver as solver_mod

        H, W = image_shape
        slv, opt = _prepare_configs(image_shape, solver_config, optimizer_config)
        self.image_shape = (H, W)
        self.warm_start = warm_start
        self.fixed_event_count = fixed_event_count
        self._tail: Optional[np.ndarray] = None
        self._solver = solver_mod.collections[slv["method"]](
            (H, W), {}, slv, opt, {}, None
        )
        self.n_windows = 0
        # time span (s) of the most recently SOLVED window — differs from
        # the pushed window's span when fixed_event_count borrowed tail
        # events; the px/s scale of the returned displacement
        self.last_span: Optional[float] = None

    def push(self, events: np.ndarray) -> np.ndarray:
        """Solve one event window; returns the dense flow as a
        [2, H, W] float array in PIXEL DISPLACEMENT over the window's
        time span (divide by the span for px/s).  Time-aware solvers
        (``solver_config: {time_aware: true, time_bin: T}``) return the
        flow VOXEL instead: [T, 2, H, W], one flow field per time bin.
        Events are [n, 4] (x=height coord, y=width coord, t, p) like
        everywhere else."""
        events = np.asarray(events, dtype=np.float64)
        if events.ndim != 2 or events.shape[1] != 4 or not len(events):
            raise ValueError("push expects a non-empty [n, 4] event array")
        if self.fixed_event_count:
            n_fix = int(self.fixed_event_count)
            if len(events) < n_fix and self._tail is not None:
                # top up from the previous window's most recent events
                # (sliding fixed-count window; keeps t order for
                # consecutive pushes)
                borrow = self._tail[-(n_fix - len(events)):]
                events = np.concatenate([borrow, events], axis=0)
            events = _subsample_fixed(events, n_fix)
            self._tail = events
        t = events[:, 2]
        span = float(t.max() - t.min()) or 1.0
        self.last_span = span
        best = self._solver.optimize(events)
        if self.warm_start:
            self._solver.set_previous_frame_best_estimation(best)
        self.n_windows += 1
        flow = self._solver.motion_to_dense_flow(best, span) * span
        return np.asarray(flow, dtype=np.float64)

    def reset(self) -> None:
        """Drop the warm-start chain and the fixed-count borrow tail
        (keeps compiled device programs)."""
        self._solver.previous_frame_best_estimation = None
        self._tail = None

    def warmup(self, n_windows: int = 2, n_events: Optional[int] = None,
               seed: int = 0) -> float:
        """Compile the solve programs BEFORE real traffic by pushing
        synthetic moving-dot windows through the full solve path, then
        restoring the pre-warmup serving state.  Two windows cover both
        programs a warm-start chain uses (under ``hvp_mode:
        analytic-warm`` — the serving default — the warm-frame program
        differs from the cold one and compiles on the SECOND window).
        Returns the elapsed wall seconds (dominated by remote jit
        compilation on a cold cache; near-instant on a warm
        ``~/.cache/evflow_jax``).

        Caveat: the banded event packing buckets its chunk count by the
        events' spatial distribution (flex G, see BENCHMARKS.md), so a
        real window landing in a different bucket still retraces once;
        ``fixed_event_count`` plus the dots scene covers the common
        bucket.  Warm-chain state, the borrow tail, and the window
        counter are restored afterwards, so warmup never leaks into
        real results (a state_path-resumed chain survives it)."""
        import time as _time

        t_start = _time.time()
        count = int(n_events or self.fixed_event_count or 30000)
        warm_prev = self._solver.previous_frame_best_estimation
        tail_prev, span_prev, n_prev = self._tail, self.last_span, self.n_windows
        rng_snap = _snapshot_solver_rng(self._solver)
        streak_snap = _snapshot_warm_streak(self._solver)
        try:
            for i in range(int(n_windows)):
                self.push(_warmup_window(
                    self.image_shape, count, seed + i, t0=0.05 * i))
        finally:
            self._solver.previous_frame_best_estimation = warm_prev
            self._tail, self.last_span, self.n_windows = (
                tail_prev, span_prev, n_prev)
            _restore_solver_rng(self._solver, rng_snap)
            _restore_warm_streak(self._solver, streak_snap)
        return _time.time() - t_start

    def save_state(self, path) -> None:
        """Persist the serving state (warm-start motions + borrow tail +
        window counter) so a restarted process resumes chaining instead
        of re-initializing cold.  Compiled programs are NOT persisted
        here — the jit compilation cache (config.py) covers those."""
        state: Dict[str, np.ndarray] = {"n_windows": np.asarray(self.n_windows)}
        warm = self._solver.previous_frame_best_estimation
        if isinstance(warm, dict):
            for s, v in warm.items():
                state[f"warm_{s}"] = np.asarray(v)
        if self._tail is not None:
            state["tail"] = self._tail
        np.savez(path, **state)

    def load_state(self, path) -> None:
        """Restore state written by :meth:`save_state`."""
        data = np.load(path)
        warm = {
            int(k[5:]): data[k] for k in data.files if k.startswith("warm_")
        }
        self._solver.previous_frame_best_estimation = warm or None
        self._tail = data["tail"] if "tail" in data.files else None
        self.n_windows = int(data["n_windows"])

    def metrics(self, flow: np.ndarray, gt_flow: np.ndarray,
                events: np.ndarray) -> Dict[str, float]:
        """AEE/NPE/AE of a pushed flow against a GT displacement field
        ([H, W, 2] loader convention), masked by the window's events —
        the eval pipeline's metric contract."""
        from .flow.metrics import calculate_flow_error_numpy

        H, W = self.image_shape
        gt_2hw = np.transpose(np.asarray(gt_flow)[:H, :W], (2, 0, 1))
        mask = np.zeros((H, W), bool)
        xs = np.clip(events[:, 0].astype(int), 0, H - 1)
        ys = np.clip(events[:, 1].astype(int), 0, W - 1)
        mask[xs, ys] = True
        return calculate_flow_error_numpy(
            gt_2hw[None], np.asarray(flow)[None], event_mask=mask[None, None]
        )


class MultiStreamFlowEstimator:
    """Dense flow for several INDEPENDENT event streams (multi-sensor /
    multi-client serving): each ``push`` takes one window per stream,
    with PER-STREAM warm-start chaining (each stream's window
    initializes from that stream's own previous solution, not a shared
    one).

    ``batching`` picks how the batch is solved on the device:

    - ``"sequential"``: one sequential whole-pyramid device chain per
      stream, back to back.  The round-5 TA decomposition
      (BENCHMARKS.md, results/serving/ta_decomposition.log) measured
      the K=8 fleet batch at **1.55×** the wall of 8 sequential
      solves — lockstep Newton runs every frame for the slowest
      frame's iterations at every scale, and that straggler surcharge
      exceeds the batching win on a single chip.
    - ``"fleet"``: the whole batch as ONE lockstep device program (the
      fleet chain's per-frame warm mode).  Required when the streams
      shard over a ``parallel: {data: N}`` device mesh — there the
      batch IS the scaling mechanism.
    - ``"auto"`` (default): ``"fleet"`` when a multi-device data mesh
      is configured OR the solver is dense; ``"sequential"`` for
      TIME-AWARE configs on a single chip.  Measured K=8 interleaved
      A/Bs (results/serving/seq_{dense,ta}_ab.log): TA sequential wins
      1.27× (9.31 vs 11.78 s/batch — lockstep stragglers dominate the
      deep voxel solves) while dense fleet wins 1.11× (3.83 vs 4.27 —
      dispatch amortization beats the smaller straggler spread there).

    Same config surface as :class:`StreamingFlowEstimator`; all streams
    share one sensor geometry and solver configuration.  Warm state is
    a per-stream list on the solver in BOTH modes (save_state /
    load_state round-trip across modes).  With
    ``optimizer.warm_finest_only``, sequential mode keeps per-stream
    warm-streak counters so ``warm_full_every`` re-anchors each stream
    on its own cadence (and staggers the re-anchor cost across pushes
    instead of one all-stream spike batch).  Measured wf8 TA K=8 A/B
    (BENCHMARKS.md round 5): fleet p50 3.18 s/batch but p99 **119.6 s**
    (all-stream re-anchor); staggered sequential p50 4.79, p99 5.18 —
    pick ``"fleet"`` for throughput, ``"sequential"`` for tail-latency
    SLOs when enabling wf — and call
    ``warmup(n_windows=warm_full_every + 1)`` so the re-anchor
    program variant compiles before real traffic (the default 2
    windows cover only the cold and plain-warm programs).
    """

    def __init__(
        self,
        image_shape: Tuple[int, int],
        n_streams: int,
        solver_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        warm_start: bool = True,
        fixed_event_count: Optional[int] = None,
        parallel_config: Optional[dict] = None,
        batching: str = "auto",
    ):
        from . import solver as solver_mod

        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        if batching not in ("auto", "fleet", "sequential"):
            raise ValueError(
                f"batching must be auto|fleet|sequential, got {batching!r}"
            )
        H, W = image_shape
        slv, opt = _prepare_configs(image_shape, solver_config, optimizer_config)
        data_mesh = bool(parallel_config) and int(
            (parallel_config or {}).get("data", 1)
        ) > 1
        if batching == "auto":
            is_ta = bool(slv.get("time_aware"))
            batching = "sequential" if (is_ta and not data_mesh) else "fleet"
        if batching == "sequential" and data_mesh:
            raise ValueError(
                "batching='sequential' cannot shard streams over a "
                "parallel data mesh; use batching='fleet'"
            )
        if parallel_config:
            slv = dict(slv, parallel=dict(parallel_config))
        self.image_shape = (H, W)
        self.n_streams = int(n_streams)
        self.warm_start = warm_start
        self.fixed_event_count = fixed_event_count
        self.batching = batching
        self._tails = [None] * self.n_streams
        solver_name = (
            "pyramidal_patch_contrast_maximization"
            if batching == "sequential"
            else "fleet_pyramidal_patch_contrast_maximization"
        )
        self._solver = solver_mod.collections[solver_name](
            (H, W), {}, slv, opt, {}, None
        )
        # per-stream warm_finest_only streak counters (sequential mode).
        # With warm_full_every configured, stagger the initial streaks so
        # the K streams re-anchor on DIFFERENT pushes — the wf serving
        # A/B measured an all-stream re-anchor batch as the p99 tail
        # (69-109 s); offsetting by stream index spreads that cost as
        # one full solve per push instead.  (Fleet mode cannot stagger:
        # one lockstep program, one streak.)
        wfe = int(opt.get("warm_full_every", 0) or 0)
        if batching == "sequential" and wfe > 1 and opt.get("warm_finest_only"):
            self._streaks = [(k % wfe, False) for k in range(self.n_streams)]
        else:
            self._streaks = [(0, False)] * self.n_streams
        self._streaks0 = list(self._streaks)
        self.n_batches = 0

    def push(self, windows) -> np.ndarray:
        """Solve one event window per stream (list of ``n_streams``
        [n, 4] arrays, any per-stream length); returns [n_streams, 2, H,
        W] pixel displacements over each stream's window span
        ([n_streams, T, 2, H, W] — one field per time bin — for
        time-aware solver configs)."""
        if len(windows) != self.n_streams:
            raise ValueError(
                f"push expects {self.n_streams} windows, got {len(windows)}"
            )
        prepped = []
        for k, ev in enumerate(windows):
            ev = np.asarray(ev, dtype=np.float64)
            if ev.ndim != 2 or ev.shape[1] != 4 or not len(ev):
                raise ValueError(f"stream {k}: non-empty [n, 4] array required")
            if self.fixed_event_count:
                n_fix = int(self.fixed_event_count)
                if len(ev) < n_fix and self._tails[k] is not None:
                    borrow = self._tails[k][-(n_fix - len(ev)):]
                    ev = np.concatenate([borrow, ev], axis=0)
                ev = _subsample_fixed(ev, n_fix)
                self._tails[k] = ev
            prepped.append(ev)
        if self.batching == "sequential":
            results = self._solve_sequential(prepped)
        else:
            results = self._solver.optimize_batch(prepped)
            if self.warm_start:
                # list of per-frame motion dicts -> per-stream warm chaining
                self._solver.set_previous_frame_best_estimation(results)
        self.n_batches += 1
        flows = []
        for k, (ev, best) in enumerate(zip(prepped, results)):
            t = ev[:, 2]
            span = float(t.max() - t.min()) or 1.0
            flows.append(
                np.asarray(self._solver.motion_to_dense_flow(best, span)) * span
            )
        return np.stack(flows).astype(np.float64)

    def _solve_sequential(self, prepped):
        """One sequential device chain per stream (``batching:
        "sequential"``): per-stream warm state and warm-streak counters
        swap in around each solve; the solver attribute holds the SAME
        per-stream warm list as fleet mode afterwards (state-surface
        compatibility — save_state/reset/tests see one representation)."""
        warm = self._solver.previous_frame_best_estimation
        warm_list = (
            list(warm) if isinstance(warm, (list, tuple))
            else [None] * self.n_streams
        )
        results = []
        try:
            for k, ev in enumerate(prepped):
                self._solver.previous_frame_best_estimation = warm_list[k]
                _restore_warm_streak(self._solver, self._streaks[k])
                results.append(self._solver.optimize(ev))
                snap = _snapshot_warm_streak(self._solver)
                if snap[0] == 0:
                    # a cold solve reset the chain: re-seed this stream's
                    # stagger offset so its re-anchor cadence stays shifted
                    snap = (self._streaks0[k][0], snap[1])
                self._streaks[k] = snap
        finally:
            # never leave a single stream's dict as the solver state: a
            # mid-batch failure would otherwise drop EVERY stream's warm
            # list (next push and save_state both expect the list form)
            if self.warm_start and len(results) == len(prepped):
                self._solver.previous_frame_best_estimation = list(results)
            else:
                self._solver.previous_frame_best_estimation = warm
        return results

    def warmup(self, n_windows: int = 2, n_events: Optional[int] = None,
               seed: int = 0) -> float:
        """Compile the solve programs before real traffic; see
        :meth:`StreamingFlowEstimator.warmup` (same contract: two pushes
        cover the cold and warm programs under the analytic-warm
        serving default; per-stream warm state, tails, and the batch
        counter are restored afterwards)."""
        import time as _time

        t_start = _time.time()
        count = int(n_events or self.fixed_event_count or 30000)
        warm_prev = self._solver.previous_frame_best_estimation
        tails_prev, n_prev = list(self._tails), self.n_batches
        streaks_prev = list(self._streaks)
        rng_snap = _snapshot_solver_rng(self._solver)
        streak_snap = _snapshot_warm_streak(self._solver)
        try:
            for i in range(int(n_windows)):
                self.push([
                    _warmup_window(self.image_shape, count,
                                   seed + 97 * k + i, t0=0.05 * i)
                    for k in range(self.n_streams)
                ])
        finally:
            self._solver.previous_frame_best_estimation = warm_prev
            self._tails, self.n_batches = tails_prev, n_prev
            self._streaks = streaks_prev
            _restore_solver_rng(self._solver, rng_snap)
            _restore_warm_streak(self._solver, streak_snap)
        return _time.time() - t_start

    def reset(self, stream: Optional[int] = None) -> None:
        """Drop warm-start state and borrow tails — all streams, or one
        stream's tail (per-stream warm entries cannot be dropped
        individually once set; a scene cut on one stream is handled by
        that stream's next window simply re-initializing worse)."""
        if stream is None:
            self._solver.previous_frame_best_estimation = None
            self._tails = [None] * self.n_streams
            self._streaks = list(self._streaks0)
        else:
            self._tails[stream] = None
            self._streaks[stream] = self._streaks0[stream]

    def save_state(self, path) -> None:
        """Persist per-stream serving state (warm motions + tails); see
        :meth:`StreamingFlowEstimator.save_state`."""
        state: Dict[str, np.ndarray] = {"n_batches": np.asarray(self.n_batches)}
        warm = self._solver.previous_frame_best_estimation
        if isinstance(warm, list):
            for k, d in enumerate(warm):
                for s, v in d.items():
                    state[f"warm_{k}_{s}"] = np.asarray(v)
        for k, t in enumerate(self._tails):
            if t is not None:
                state[f"tail_{k}"] = t
        # warm_finest_only re-anchor cadence survives restarts
        state["streaks"] = np.asarray(
            [[st, int(wf)] for st, wf in self._streaks]
        )
        np.savez(path, **state)

    def load_state(self, path) -> None:
        """Restore state written by :meth:`save_state`."""
        data = np.load(path)
        warm = [dict() for _ in range(self.n_streams)]
        any_warm = False
        for key in data.files:
            if key.startswith("warm_"):
                _, k, s = key.split("_")
                warm[int(k)][int(s)] = data[key]
                any_warm = True
        self._solver.previous_frame_best_estimation = warm if any_warm else None
        self._tails = [
            data[f"tail_{k}"] if f"tail_{k}" in data.files else None
            for k in range(self.n_streams)
        ]
        if "streaks" in data.files:
            self._streaks = [
                (int(st), bool(wf)) for st, wf in data["streaks"]
            ][: self.n_streams]
        self.n_batches = int(data["n_batches"])
