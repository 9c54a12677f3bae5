#!/usr/bin/env python3
"""Benchmark: fused warp + bilinear-vote IWE throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "warp_bilinear_iwe", "value": <Mevents/s>, "unit": "Mevents/s",
   "vs_baseline": <value / 500>}

Measured op: the framework's fused Pallas kernel (flow gather + dense-flow
warp + bilinear vote, ops/pallas_objective.py) on the MVSEC protocol shape
(260x346, 30720 events/frame) — the hot op of the CMax objective.

Methodology (tunneled-PJRT-safe):
* the timed region is a jitted ``lax.fori_loop`` whose iterations are
  data-dependent (coordinates shift each step), so no dedup/hoisting;
* synchronization via host transfer (float()), because block_until_ready
  can return early through tunneled runtimes;
* two iteration counts, throughput from the SLOPE (marginal time per
  iteration), which cancels the per-call tunnel latency.

North star (BASELINE.json): >= 500 Mevents/s per chip.  The reference
publishes no numbers (its only perf artifact is a cProfile dump).
"""

import json
import os
import sys
import threading
import time

import numpy as np


def _arm_watchdog(deadline_s: float):
    """If the tunneled TPU stalls (device init or a dispatch hanging
    indefinitely), still emit the one required JSON line and exit instead
    of hanging the harness.  A value of 0 is an honest 'bench could not
    run' record; a silent hang is not.  Override via BENCH_DEADLINE_S."""

    def fire():
        print(
            f"bench watchdog: no result after {deadline_s:.0f}s "
            "(TPU tunnel stalled?) — emitting failure record",
            file=sys.stderr, flush=True,
        )
        print(json.dumps({
            "metric": "warp_bilinear_iwe",
            "value": 0.0,
            "unit": "Mevents/s",
            "vs_baseline": 0.0,
            "error": f"watchdog: no result after {deadline_s:.0f}s",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def _wait_for_device(budget_s: float) -> bool:
    """Poll for a usable accelerator in SUBPROCESSES before the parent
    touches jax.  The tunneled TPU's device init hangs in-process when
    the tunnel is down and cannot be cancelled — but outages are often
    transient (hours-long ones happen, minutes-long ones too), so if the
    device answers within the budget we still capture a real number
    instead of the watchdog's honest-but-useless 0.  Returns True on a
    live probe, False when the budget is exhausted (the caller proceeds
    anyway; the absolute-deadline watchdog keeps its role)."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp; d = jax.devices(); "
        "print(d[0].platform, float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))"
    )
    t_end = time.time() + budget_s
    first = True
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=240,
                capture_output=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if first:
            print("bench: device probe failed — tunnel down? retrying "
                  f"within a {budget_s:.0f}s budget", file=sys.stderr, flush=True)
            first = False
        if time.time() >= t_end:
            return False
        time.sleep(30)


def _run_loop(iters, body_fn, ev, fl):  # body_fn(ev, flow)
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(ev, fl):
        def body(i, acc):
            # vary the flow each iteration (data-dependently) so no
            # iteration can be deduplicated or hoisted
            f = fl + ((i % 7) * 0.013 + acc * 1e-20)
            return acc + body_fn(ev, f)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(run(ev, fl))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for k in range(3):
        ev = ev.at[..., 0].add(0.07 * (k + 1))
        t0 = time.perf_counter()
        float(run(ev, fl))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 1500))
    watchdog = _arm_watchdog(deadline_s)
    if os.environ.get("EVFLOW_PLATFORM", "").lower() not in ("cpu",):
        # leave >= ~600s of the deadline for the measurement itself
        # (compile is persistent-cached; sampling is ~2-3 min)
        _wait_for_device(max(0.0, deadline_s - 700.0))
    # honors EVFLOW_PLATFORM (jax.config, not JAX_PLATFORMS — the tunnel
    # plugin self-registers first) BEFORE any jax device op below
    import event_based_optical_flow_tpu  # noqa: F401
    from event_based_optical_flow_tpu.config import suppress_benign_aot_warnings

    # keep the bench tail clean: drop the benign same-host cpu_aot_loader
    # tuning-pref lines (real cross-host ISA mismatches still pass through)
    suppress_benign_aot_warnings()
    import jax
    import jax.numpy as jnp

    H, W = 260, 346
    n_events = 30720
    batch = 1  # one kernel launch per iteration: per-launch overhead is
    # measured separately (fleet/batched paths amortize it across frames)

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 0.2, (batch, n_events)), axis=1)
    events = np.stack(
        [
            np.round(rng.uniform(0, H - 1, (batch, n_events))),
            np.round(rng.uniform(0, W - 1, (batch, n_events))),
            t,
            rng.integers(0, 2, (batch, n_events)).astype(np.float64),
        ],
        axis=2,
    )
    flow = rng.uniform(-30, 30, (batch, 2, H, W))
    ev = jnp.asarray(events, jnp.float32)
    fl = jnp.asarray(flow, jnp.float32)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # banded fused kernel over pre-packed chunks (packing is per-frame
        # work amortized over thousands of kernel calls in a solve; it is
        # outside the timed loop)
        from event_based_optical_flow_tpu.ops.pallas_objective_banded import (
            FLEX_ROW_SCALE,
            fused_multi_iwe_banded,
            n_col_bands,
            pack_events_by_tile_flex,
        )

        packed = []
        for b in range(batch):
            dtf = (events[b, :, 2] - events[b, :, 2].min()) / (
                events[b, :, 2].max() - events[b, :, 2].min()
            )
            # flex packing, chunk 1280: a grid step costs the same whether
            # its chunk rows are events or padding, so the DP fill-balanced
            # packer (variable-height 8-aligned row bands) directly cuts
            # step count.  Calibrated-slope A/B (tools/probe_kernel.py,
            # 0.3% sample spread): fixed-lattice tile 1024 -> 451 Mev/s;
            # flex 1024 -> 654, 1280 -> 670, 1536 -> 650, 2048 -> 602
            packed.append(
                pack_events_by_tile_flex(
                    events[b], np.ones(n_events), dtf, H, W, chunk=1280
                )
            )
        pk = [jnp.asarray(np.stack([p[i] for p in packed]), jnp.float32) for i in range(4)]
        bands = jnp.asarray(np.stack([p[4] for p in packed]))

        def body_fn(e, f):
            # e is unused on this path (coordinate variation comes via f)
            def one(args):
                x2, y2, d2, w2, bd, ff = args
                # row window 96 (band +-16 at full band height): covers the
                # max displacement of this shape (|flow| <= 30 x
                # |dtf-0.5| <= 0.5 -> 15 px) with the exact per-chunk
                # fallback intact; calibrated A/B: rw 128 -> 432, 96 -> 452
                return fused_multi_iwe_banded(
                    ff, x2, y2, d2, w2, bd, (H, W), (0.5,), False, 1e-6, True,
                    n_col_bands(W), 96, None, 1, False, FLEX_ROW_SCALE,
                ).sum()

            total = jnp.float32(0.0)
            for b in range(batch):
                total += one((pk[0][b], pk[1][b], pk[2][b], pk[3][b], bands[b], f[b]))
            return total
    else:
        from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
        from event_based_optical_flow_tpu.ops.warp import warp_dense_flow

        def body_fn(e, f):
            warped = warp_dense_flow(e, f, e[..., 2].min(axis=-1), (H, W), normalize_t=True)
            return bilinear_vote(warped, (H, W)).sum()

    # Slope sampling with CALIBRATED loop counts.  The signal is
    # (i2 - i1) * marginal seconds of pure device time; tunnel latency
    # jitter is tens of ms per call, so the signal must dwarf it.  The v4
    # kernel at ~0.02-0.07 ms/iter made fixed (256, 1024) pairs carry only
    # ~20-50 ms of signal — noise-dominated, which is how a ~600+ Mev/s
    # kernel captured 406 in round 1.  Now: estimate the marginal once,
    # then size the pairs so each slope spans >= ~1.5 s of device time,
    # and take the MEDIAN of the valid samples (robust to one contended
    # or one lucky window).
    if on_tpu:
        c1, c2 = 64, 512
        t_lo, compile_s = _run_loop(c1, body_fn, ev, fl)
        t_hi, _ = _run_loop(c2, body_fn, ev, fl)
        est = max((t_hi - t_lo) / (c2 - c1), 1e-6)  # s/iter, rough
        target_signal = 1.5  # seconds of device time per slope
        di = int(min(max(np.ceil(target_signal / est), 512), 200_000))
        i1, i2 = di // 4, di // 4 + di
        n_samples = 5
    else:
        i1, i2 = 2, 6
        t_lo, compile_s = _run_loop(i1, body_fn, ev, fl)
        n_samples = 1
    slopes = []
    for si in range(n_samples):
        # vary the flow per sample: repeated identical (program, inputs)
        # executions can be memoized by the relay and return in ~fixed
        # latency, which would fake tiny positive slopes
        fl_s = fl + (si + 1) * 0.013
        t_lo2, _ = _run_loop(i1, body_fn, ev, fl_s)
        t_hi2, _ = _run_loop(i2, body_fn, ev, fl_s)
        slopes.append((t_hi2 - t_lo2) / (i2 - i1))
    valid = sorted(m for m in slopes if m > 0)
    if valid:
        marginal = valid[len(valid) // 2] if len(valid) % 2 else (
            (valid[len(valid) // 2 - 1] + valid[len(valid) // 2]) / 2
        )
    else:
        marginal = max(t_hi2 / i2, 1e-9)
    it1 = i1
    t_lo = t_lo2
    meps = batch * n_events / marginal / 1e6

    print(
        f"fused warp+bilinear IWE: {meps:.1f} Mevents/s marginal "
        f"({marginal*1e3:.2f} ms per {batch}x{n_events}-event iteration; "
        f"fixed per-call overhead {(t_lo - it1*marginal)*1e3:.0f} ms; compile {compile_s:.0f}s; "
        f"backend={jax.default_backend()})",
        file=sys.stderr,
    )
    watchdog.cancel()
    print(json.dumps({
        "metric": "warp_bilinear_iwe",
        "value": round(meps, 1),
        "unit": "Mevents/s",
        "vs_baseline": round(meps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
