#!/usr/bin/env python3
"""Serving throughput/latency benchmark (VERDICT r2 task #8).

MultiStreamFlowEstimator at K streams (default 8): one fleet batch per
push, per-stream warm chaining, fixed_event_count windows (the
production protocol).  Reports warm push latency p50/p99 and
streams/s = K / p50.  Inputs VARY every push (the tunnel relay memoizes
identical (program, input) executions).

    python tools/bench_serving.py [n_pushes=12] [K=8] [mode=multi|http] \
        [hvp_mode=fd|analytic|analytic-warm] [ta=1]

Mode tokens accept ``+wf`` / ``+wfK`` suffixes (optimizer
warm_finest_only [+ warm_full_every K]): e.g. ``analytic-warm+wf8``,
``modes=analytic-warm,analytic-warm+wf`` for the ab mode.

``ta=1`` serves the TIME-AWARE (Burgers, T=10) solver instead of the
dense one (the fleet TA chain; round-4 batched voxel JVP/HVP kernels
make the analytic modes live there too).

``hvp_mode`` feeds the estimator's optimizer_config (the serving
surfaces are warm-dominated: every push after the first is a warm
frame, so ``analytic-warm`` runs full-analytic GN there).

``http`` additionally measures the single-stream HTTP front-end
(serve.FlowServer, npz in/out over localhost): end-to-end POST /flow
latency including (de)serialization.
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import logging

logging.disable(logging.INFO)

from bench_e2e import GT, synth  # noqa: E402

H, W = 260, 346
N_EV = 30000
TA_SLV = None  # set by ta=1: time-aware Burgers solver config
BATCHING = "fleet"  # batching= kv: fleet (historical default) | sequential | auto


def expected_shape(k=None):
    """Per-push flow shape: [2, H, W] dense, [T, 2, H, W] time-aware
    (the voxel — one field per bin), K-leading for multi-stream."""
    core = (TA_SLV["time_bin"], 2, H, W) if TA_SLV else (2, H, W)
    return core if k is None else (k,) + core


def make_window(seed):
    ev = synth(GT, seed=seed, n=int(N_EV * 1.15))
    return ev[: N_EV + (seed % 64)]  # vary the raw count; estimator fixes it


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q / 100 * (len(xs) - 1))))]


def split_batching(mode_str):
    """``<mode>@seq|@fleet|@auto`` -> (mode, batching); no suffix ->
    the global BATCHING (so the ab mode can interleave batching modes:
    ``modes=analytic-warm@fleet,analytic-warm@seq``)."""
    if "@" in mode_str:
        base, b = mode_str.rsplit("@", 1)
        return base, {"seq": "sequential"}.get(b, b)
    return mode_str, BATCHING


def opt_cfg_for(mode_str):
    """Mode token -> optimizer_config.  ``+wf`` appends
    warm_finest_only (``+wfK`` also sets warm_full_every=K):
    e.g. ``analytic-warm+wf``, ``analytic-warm+wf8``."""
    mode_str, _ = split_batching(mode_str)
    base, *flags = mode_str.split("+")
    cfg = {"hvp_mode": base}
    for f in flags:
        if f.startswith("wf"):
            cfg["warm_finest_only"] = True
            if f[2:]:
                cfg["warm_full_every"] = int(f[2:])
        else:
            raise SystemExit(f"unknown mode flag {f!r} in {mode_str!r}")
    return cfg


def _warm_program_differs(mode_str):
    """Whether the warm-frame program differs from the cold one (needs
    its own warm-up push before timing)."""
    return mode_str.startswith("analytic") or "+wf" in mode_str


def bench_multi(n_pushes, k, hvp_mode="fd"):
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    est = MultiStreamFlowEstimator(
        (H, W), n_streams=k, fixed_event_count=N_EV, warm_start=True,
        solver_config=TA_SLV, optimizer_config=opt_cfg_for(hvp_mode),
        batching=split_batching(hvp_mode)[1],
    )
    # warm push: compiles the fleet chain
    t0 = time.time()
    est.push([make_window(1000 + s) for s in range(k)])
    print(f"K={k} first push (compiles): {time.time() - t0:.1f}s", flush=True)
    if _warm_program_differs(hvp_mode):
        t0 = time.time()
        est.push([make_window(1500 + s) for s in range(k)])
        print(f"second push (warm program compiles): {time.time() - t0:.1f}s",
              flush=True)

    lats = []
    for p in range(n_pushes):
        wins = [make_window(2000 + p * k + s) for s in range(k)]
        t0 = time.time()
        flows = est.push(wins)
        lats.append(time.time() - t0)
        assert flows.shape == expected_shape(k), flows.shape
        assert np.isfinite(flows).all()
        print(f"push {p + 1}/{n_pushes}: {lats[-1]:.2f}s", flush=True)
    p50, p99 = pct(lats, 50), pct(lats, 99)
    print(
        json.dumps(
            {
                "bench": "multistream", "batching": est.batching,
                "ta": bool(TA_SLV),
                "K": k,
                "hvp_mode": hvp_mode,
                "geometry": f"{H}x{W}/{N_EV}ev",
                "p50_s": round(p50, 3),
                "p99_s": round(p99, 3),
                "streams_per_s": round(k / p50, 2),
                "windows": n_pushes,
            }
        ),
        flush=True,
    )


def bench_multi_ab(n_pushes, k, modes=("fd", "analytic-warm")):
    """Interleaved in-process A/B of hvp modes on the multistream path
    (tunnel throughput flips between processes — only interleaved
    same-process comparisons resolve <2x differences).  Each mode gets
    its own estimator (own fleet chain + warm state); pushes alternate
    mode-by-mode within each round on identical windows."""
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    ests = {
        m: MultiStreamFlowEstimator(
            (H, W), n_streams=k, fixed_event_count=N_EV, warm_start=True,
            solver_config=TA_SLV, optimizer_config=opt_cfg_for(m),
            batching=split_batching(m)[1],
        )
        for m in modes
    }
    for m, est in ests.items():
        t0 = time.time()
        est.push([make_window(1000 + s) for s in range(k)])
        print(f"[{m}] K={k} first push (compiles): {time.time() - t0:.1f}s",
              flush=True)
        if _warm_program_differs(m):
            # second compile: the warm-frame program can differ from cold
            t0 = time.time()
            est.push([make_window(1500 + s) for s in range(k)])
            print(f"[{m}] second push (warm program compiles): "
                  f"{time.time() - t0:.1f}s", flush=True)

    lats = {m: [] for m in modes}
    for p in range(n_pushes):
        wins = [make_window(2000 + p * k + s) for s in range(k)]
        for m, est in ests.items():
            t0 = time.time()
            flows = est.push(wins)
            lats[m].append(time.time() - t0)
            assert flows.shape == expected_shape(k), flows.shape
            assert np.isfinite(flows).all()
        print(
            f"push {p + 1}/{n_pushes}: "
            + "  ".join(f"{m} {lats[m][-1]:.2f}s" for m in modes),
            flush=True,
        )
    for m in modes:
        p50, p99 = pct(lats[m], 50), pct(lats[m], 99)
        print(
            json.dumps(
                {
                    "bench": "multistream-ab", "batching": split_batching(m)[1], "ta": bool(TA_SLV), "K": k, "hvp_mode": m,
                    "geometry": f"{H}x{W}/{N_EV}ev",
                    "p50_s": round(p50, 3), "p99_s": round(p99, 3),
                    "streams_per_s": round(k / p50, 2), "windows": n_pushes,
                }
            ),
            flush=True,
        )


def bench_http(n_pushes, hvp_mode="fd"):
    import urllib.request

    from event_based_optical_flow_tpu.serve import FlowServer

    srv = FlowServer((H, W), port=0, fixed_event_count=N_EV,
                     solver_config=TA_SLV,
                     optimizer_config=opt_cfg_for(hvp_mode))
    srv.start()
    url = f"http://127.0.0.1:{srv.port}/flow"

    def post(ev, timeout=600):
        buf = io.BytesIO()
        np.savez_compressed(buf, events=ev)
        req = urllib.request.Request(
            url, data=buf.getvalue(), headers={"Content-Type": "application/npz"}
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            out = np.load(io.BytesIO(resp.read()))
            return out["flow"]

    # cold+warm program compiles can exceed 10 min through the tunnel
    # (the analytic-warm arm compiles TWO programs); don't let the
    # client timeout kill the bench mid-compile
    t0 = time.time()
    post(make_window(1), timeout=3600)
    print(f"http first push (compiles): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    post(make_window(2), timeout=3600)
    print(f"http second push (warm program compiles under analytic-warm): "
          f"{time.time() - t0:.1f}s", flush=True)
    lats = []
    for p in range(n_pushes):
        ev = make_window(500 + p)
        t0 = time.time()
        flow = post(ev)
        lats.append(time.time() - t0)
        assert flow.shape == expected_shape(), flow.shape
        print(f"http push {p + 1}/{n_pushes}: {lats[-1]:.2f}s", flush=True)
    print(
        json.dumps(
            {
                "bench": "http",
                "ta": bool(TA_SLV),
                "hvp_mode": hvp_mode,
                "geometry": f"{H}x{W}/{N_EV}ev",
                "p50_s": round(pct(lats, 50), 3),
                "p99_s": round(pct(lats, 99), 3),
                "windows": n_pushes,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    pos = [a for a in sys.argv[1:] if "=" not in a]
    n_pushes = int(pos[0]) if len(pos) > 0 else 12
    k = int(pos[1]) if len(pos) > 1 else 8
    mode = pos[2] if len(pos) > 2 else "multi"
    hvp_mode = kv.get("hvp_mode", "fd")
    BATCHING = kv.get("batching", "fleet")
    if kv.get("ta") in ("1", "true", "yes"):
        TA_SLV = {
            "time_aware": True, "time_bin": 10,
            "flow_interpolation": "burgers", "t0_flow_location": "middle",
        }
    if mode == "http":
        bench_http(n_pushes, hvp_mode)
    elif mode == "ab":
        if "hvp_mode" in kv:
            raise SystemExit(
                "mode 'ab' interleaves a PAIR of modes; pass "
                "modes=<m1>,<m2> (default fd,analytic-warm), not hvp_mode="
            )
        modes = tuple(kv.get("modes", "fd,analytic-warm").split(","))
        bench_multi_ab(n_pushes, k, modes)
    else:
        bench_multi(n_pushes, k, hvp_mode)
