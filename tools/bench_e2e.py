#!/usr/bin/env python3
"""End-to-end solve-time comparison: this framework (TPU) vs the
reference implementation (CPU) on identical synthetic frames at the MVSEC
protocol geometry.

    python tools/bench_e2e.py mine            # this framework (default)
    PYTHONPATH=tools/refshims:/root/reference python tools/bench_e2e.py ref

The reference run needs the reference checkout plus tools/refshims
(minimal stand-ins for torchvision/optuna/skimage/plotly; the optuna
shim is a random-search Study — real TPE adds per-trial overhead, so the
measured reference baseline is, if anything, favorable to the reference).
"""
import os
import sys
import time
import logging

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.disable(logging.INFO)

H, W = 260, 346
GT = np.array([25.0, -18.0])


def synth(gt, seed, n=30000):
    rng = np.random.default_rng(seed)
    n_dots = 400
    dx = rng.uniform(2, H - 2, n_dots)
    dy = rng.uniform(2, W - 2, n_dots)
    idx = rng.integers(0, n_dots, n)
    t = np.sort(rng.uniform(0, 0.25, n))
    xs = dx[idx] + rng.normal(0, 0.2, n)
    ys = dy[idx] + rng.normal(0, 0.2, n)
    right = dy[idx] > W / 2
    u = np.where(right, gt[0], -gt[0])
    v = np.where(right, gt[1], -gt[1])
    x = xs - t * u
    y = ys - t * v
    ok = (x >= 0) & (x < H - 1) & (y >= 0) & (y < W - 1)
    return np.stack([np.round(x), np.round(y), t, rng.integers(0, 2, n)], 1)[ok]


SLV_CFG = {
    "method": "pyramidal_patch_contrast_maximization",
    "time_aware": False,
    "patch": {"initialize": "random", "scale": 5, "crop_height": 256, "crop_width": 336, "filter_type": "bilinear"},
    "motion_model": "2d-translation",
    "warp_direction": "first",
    "parameters": ["trans_x", "trans_y"],
    "cost": "hybrid",
    "outer_padding": 0,
    "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
    "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
}
OPT_CFG = {
    "n_iter": 40,
    "method": "Newton-CG",
    "max_iter": 25,
    "parameters": {"trans_x": {"min": -150, "max": 150}, "trans_y": {"min": -150, "max": 150}},
}


def main():
    # modes: mine (default) | ref        — MVSEC geometry, dense objective
    #        ta [mine-only]              — time-aware (Burgers, T=10)
    #        ta-ref                      — reference time-aware (CPU, shims)
    #        dsecgeo [mine-only]         — 480x640, 300k events/frame
    #        fleet [mine-only]           — 4 frames per batched device solve
    which = sys.argv[1] if len(sys.argv) > 1 else "mine"
    # budget knobs for solve-stage decomposition, e.g.:
    #   bench_e2e.py dsecgeo max_iter=1    (Newton off -> init/search share)
    #   bench_e2e.py dsecgeo n_iter=4      (cheap init searches)
    for arg in sys.argv[2:]:
        if "=" in arg:
            k, v = arg.split("=", 1)
            try:
                OPT_CFG[k] = int(v)
            except ValueError:
                try:
                    OPT_CFG[k] = float(v)  # incl. scientific notation, 1e-6
                except ValueError:
                    OPT_CFG[k] = v  # string knobs, e.g. hvp_mode=analytic-warm
    if which == "fleet":
        return run_fleet()
    if which == "fleet-warm":
        return run_fleet(warm=True)
    global H, W
    slv_cfg = dict(SLV_CFG)
    n_ev = 30000
    if which in ("ta", "ta-ref"):
        slv_cfg.update(
            time_aware=True, time_bin=10, flow_interpolation="burgers",
            t0_flow_location="middle",
        )
    elif which == "dsecgeo":
        H, W = 480, 640
        n_ev = 300000
        slv_cfg["patch"] = dict(
            slv_cfg["patch"], crop_height=480, crop_width=640
        )
        # match the shipped DSEC config's budgets (the documented e2e
        # numbers; override on the command line to study other budgets)
        OPT_CFG.setdefault("cg_maxiter", 8)
        OPT_CFG.setdefault("coarse_event_fraction", 0.25)
        OPT_CFG.setdefault("hvp_mode", "analytic")
        OPT_CFG.setdefault("fd_polish", 2)  # adopted round 5 (BENCHMARKS)
    if which in ("ref", "ta-ref"):
        from src.solver.patch_contrast_pyramid import PyramidalPatchContrastMaximization as Solver
    else:
        from event_based_optical_flow_tpu import solver as _s

        Solver = _s.collections["pyramidal_patch_contrast_maximization"]

    solv = Solver((H, W), {}, slv_cfg, OPT_CFG, {}, None)
    times = []
    for f in range(3):
        ev = synth(GT, seed=f, n=n_ev)
        t0 = time.time()
        best = solv.optimize(ev)
        times.append(time.time() - t0)
        solv.set_previous_frame_best_estimation(best)
        fin = best[max(best)]
        half = fin.shape[2] // 2
        lu, ru = fin[0][:, :half].mean(), fin[0][:, half:].mean()
        lv, rv = fin[1][:, :half].mean(), fin[1][:, half:].mean()
        print(f"{which} frame {f}: {times[-1]:.1f}s halves u=({lu:.1f},{ru:.1f}) v=({lv:.1f},{rv:.1f}) vs ±({GT[0]},{GT[1]})", flush=True)
    print(f"{which} steady-state: {times[-1]:.1f}s/frame")


def run_fleet(bsz: int = 4, warm: bool = False):
    """Fleet (batched-frame) solve throughput: B frames per device
    program, s/frame all-in.  ``warm`` chains each batch from the
    previous batch's last solution (warm_start: "batch")."""
    from event_based_optical_flow_tpu import solver as _s

    solv = _s.collections["fleet_pyramidal_patch_contrast_maximization"](
        (H, W), {}, SLV_CFG, OPT_CFG, {}, None
    )
    tag = "fleet-warm" if warm else "fleet"
    for rep in range(4):
        evs = [synth(GT, seed=rep * bsz + f) for f in range(bsz)]
        t0 = time.time()
        results = solv.optimize_batch(evs)
        dt = time.time() - t0
        if warm:
            solv.set_previous_frame_best_estimation(results[-1])
        fin = results[0][max(results[0])]
        half = fin.shape[2] // 2
        lu, ru = fin[0][:, :half].mean(), fin[0][:, half:].mean()
        print(
            f"{tag} batch {rep}: {dt:.1f}s ({dt / bsz:.2f} s/frame) "
            f"frame0 u=({lu:.1f},{ru:.1f}) vs ±{GT[0]}", flush=True,
        )
    print(f"{tag} steady-state: {dt / bsz:.2f} s/frame ({bsz} frames/batch)")


if __name__ == "__main__":
    main()
