#!/usr/bin/env python3
"""Decompose the time-aware fleet serving batch (VERDICT r4 task #3).

The round-4 TA serving steady state (analytic-warm, K=8, MVSEC
geometry, Burgers T=10) is ~12.8 s/batch — ~2.6x the dense serving
wall — with no per-phase breakdown saying where the next lever is.
This tool splits it by ABLATION, the way the round-2 DSEC solve
decomposition found cg_maxiter: every arm runs interleaved in ONE
process on identical windows (tunnel throughput flips between
processes), and phase shares come from arm differences:

  pack        host pack_fleet_banded wall, timed directly
  coarse+init A(baseline) - B(warm_finest_only): the coarse pyramid
              scales + per-scale init sweeps a warm frame re-runs
  newton      B(wf) - D(wf, max_iter=1): the finest-scale Newton
              iterations beyond the first
  hvp-slope   (C(wf, cg4) - B(wf, cg8)) / 4: per-CG-iteration cost on
              the finest scale (HVP share; negative slope = not
              HVP-bound)
  lockstep    K=8 p50 vs 8 x K=1 p50 on the same stream content (the
              straggler surcharge of batching independent streams)
  residual    everything else (dispatch, reshapes, host round trips)

    python tools/decompose_ta.py [n_pushes=8] [K=8]

Reference anchor: the TA objective this serves
(/root/reference/src/utils/flow_utils.py:567-639 construct_dense_flow_voxel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import logging

logging.disable(logging.INFO)

import numpy as np

from bench_serving import H, W, N_EV, make_window, pct

TA_SLV = {
    "time_aware": True, "time_bin": 10,
    "flow_interpolation": "burgers", "t0_flow_location": "middle",
}

ARMS = {
    # name -> optimizer_config overrides on the analytic-warm default
    "A(baseline)": {},
    "B(wf)": {"warm_finest_only": True},
    "C(wf,cg4)": {"warm_finest_only": True, "cg_maxiter": 4},
    "D(wf,mi1)": {"warm_finest_only": True, "max_iter": 1},
}


def build_est(k, over):
    from event_based_optical_flow_tpu.streaming import MultiStreamFlowEstimator

    # explicit fleet: this tool DECOMPOSES the fleet batch; the auto
    # default resolves single-chip TA to sequential since round 5 and
    # would silently measure the wrong program
    return MultiStreamFlowEstimator(
        (H, W), n_streams=k, fixed_event_count=N_EV, warm_start=True,
        solver_config=dict(TA_SLV),
        optimizer_config=dict({"hvp_mode": "analytic-warm"}, **over),
        batching="fleet",
    )


def time_pack(windows_batches):
    """Host pack wall for the TA fleet pack (bin-banded, T=10)."""
    from event_based_optical_flow_tpu.solver.fleet import pack_fleet_banded

    walls = []
    for wins in windows_batches:
        t0 = time.time()
        pack_fleet_banded([np.asarray(w, np.float64) for w in wins], H,
                          time_bin=TA_SLV["time_bin"], image_width=0)
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main():
    pos = [a for a in sys.argv[1:] if "=" not in a]
    n_pushes = int(pos[0]) if len(pos) > 0 else 8
    k = int(pos[1]) if len(pos) > 1 else 8

    ests = {name: build_est(k, over) for name, over in ARMS.items()}
    est_k1 = build_est(1, {})

    # compile pushes: cold program, then the warm program (differs under
    # analytic-warm and under warm_finest_only)
    for name, est in ests.items():
        for i, seed in enumerate((1000, 1500)):
            t0 = time.time()
            est.push([make_window(seed + s) for s in range(k)])
            print(f"[{name}] compile push {i}: {time.time() - t0:.1f}s",
                  flush=True)
    for i, seed in enumerate((1000, 1500)):
        est_k1.push([make_window(seed)])

    lats = {name: [] for name in ARMS}
    lats_k1 = []
    batches = []
    for p in range(n_pushes):
        wins = [make_window(2000 + p * k + s) for s in range(k)]
        batches.append(wins)
        for name, est in ests.items():
            t0 = time.time()
            flows = est.push(wins)
            lats[name].append(time.time() - t0)
            assert np.isfinite(flows).all()
        t0 = time.time()
        est_k1.push([wins[0]])
        lats_k1.append(time.time() - t0)
        print(
            f"push {p + 1}/{n_pushes}: "
            + "  ".join(f"{n} {lats[n][-1]:.2f}s" for n in ARMS)
            + f"  K1 {lats_k1[-1]:.2f}s",
            flush=True,
        )

    pack_s = time_pack(batches)
    p50 = {name: pct(ls, 50) for name, ls in lats.items()}
    p50_k1 = pct(lats_k1, 50)

    a, b, c, d = (p50[n] for n in ARMS)
    cg_base = 8  # analytic-warm default finest cg_maxiter
    hvp_slope = (b - c) / (cg_base - 4)  # s per CG iteration (K-batch)
    decomp = {
        "bench": "ta-decomposition",
        "K": k, "n_pushes": n_pushes,
        "geometry": f"{H}x{W}/{N_EV}ev/T={TA_SLV['time_bin']}",
        "p50_s": {n: round(v, 3) for n, v in p50.items()},
        "p50_k1_s": round(p50_k1, 3),
        "phases_s": {
            "pack_host": round(pack_s, 3),
            "coarse_plus_init": round(a - b, 3),
            "finest_newton_beyond_first": round(b - d, 3),
            "finest_first_iter_plus_overhead": round(d, 3),
            "per_cg_iter": round(hvp_slope, 4),
        },
        "lockstep": {
            "k1_p50_s": round(p50_k1, 3),
            "k_x_k1": round(k * p50_k1, 3),
            "batch_vs_sequential": round(a / (k * p50_k1), 3),
            "note": "batch_vs_sequential < 1: batching wins despite "
                    "lockstep; > 1: stragglers dominate",
        },
    }
    print(json.dumps(decomp), flush=True)


if __name__ == "__main__":
    main()
