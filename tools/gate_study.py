#!/usr/bin/env python3
"""Default-policy accuracy gate (VERDICT r2 task #7): the adopted DSEC
config budgets (cg_maxiter 8 + coarse_event_fraction 0.25) re-gated
across ALL 6 synthetic scene families at DSEC geometry (480x640, 300k
events/window) — not just quadrants + one clutter scene.

Per family, interleaved in ONE process (tunnel drift cancels):
  A(unbudgeted)   cg_maxiter 32, full events at every scale
  B(dsec-default) cg_maxiter 8,  coarse_event_fraction 0.25

    python tools/gate_study.py [families...] [n_windows=2]

Prints one JSON line per (family, arm) with EPE/wall; gate passes when
B's EPE is within ~5% of A's on every family.
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

import parity_study as PS

H, W = 480, 640
N_EV = 300_000

ARMS = {
    "A(unbudgeted)": {"cg_maxiter": 32},
    "B(budgets)": {"cg_maxiter": 8, "coarse_event_fraction": 0.25},
    # the SHIPPED DSEC default since round-3 session 3: budgets + the
    # v10 hybrid analytic HVP (finest-scale analytic GN, FD coarse)
    "C(dsec-default)": {
        "cg_maxiter": 8, "coarse_event_fraction": 0.25,
        "hvp_mode": "analytic",
    },
}
# one-off studies can replace the arms without editing the file:
#   GATE_ARMS_JSON='{"B(fd cg8)": {...}, "D(analytic cg12)": {...}}'
if os.environ.get("GATE_ARMS_JSON"):
    ARMS = json.loads(os.environ["GATE_ARMS_JSON"])


def make_loader(family):
    from event_based_optical_flow_tpu import data as data_mod

    cfg = {
        "height": H, "width": W, "duration": 1.2,
        "event_rate": 3_000_000.0,  # ~300k per ~0.1 s window
        "flow_max": 25.0, "n_frames": 13, "seed": 11,
        "pattern": "dots", "n_dots": 4000,
        "n_events_per_batch": N_EV, "eval_dt": 1,
    }
    cfg.update(PS.FAMILIES[family])
    loader = data_mod.collections["synthetic"](config=cfg)
    loader.set_sequence(f"gate_{family}")
    return loader, cfg


def main():
    args = sys.argv[1:]
    unknown = [a for a in args if a not in PS.FAMILIES and not a.isdigit()]
    if unknown:
        raise SystemExit(
            f"unknown scene families {unknown!r}: expected names from "
            f"{sorted(PS.FAMILIES)} (a typo would otherwise silently "
            f"launch the full 6-family study)"
        )
    fams = [a for a in args if a in PS.FAMILIES] or list(PS.FAMILIES)
    n_windows = next((int(a) for a in args if a.isdigit()), 2)

    from event_based_optical_flow_tpu import solver as solver_mod

    Solver = solver_mod.collections["pyramidal_patch_contrast_maximization"]
    slv_cfg = dict(PS.SLV_CFG)
    slv_cfg["patch"] = dict(slv_cfg["patch"], crop_height=H, crop_width=W)

    for family in fams:
        loader, cfg = make_loader(family)
        ts = loader.eval_frame_time_list()
        solvers = {
            arm: Solver((H, W), {}, slv_cfg, dict(PS.OPT_CFG, **over), {}, None)
            for arm, over in ARMS.items()
        }
        # warm window (compiles, untimed), then interleaved timed windows
        stats = {arm: {"epe": [], "wall": []} for arm in ARMS}
        for i in range(n_windows + 1):
            opt_b, gt_b, gt_flow, flow_time = PS.gather(
                loader, cfg, ts[i], ts[i + 1]
            )
            for arm, s in solvers.items():
                t0 = time.time()
                best = s.optimize(opt_b)
                wall = time.time() - t0
                s.set_previous_frame_best_estimation(best)
                err = s.calculate_flow_error(
                    best, gt_flow, timescale=flow_time, events=gt_b
                )
                if i == 0:
                    print(
                        f"{family} {arm} warm window: {wall:.1f}s "
                        f"EPE {float(err['EPE']):.3f}",
                        flush=True,
                    )
                    continue
                stats[arm]["epe"].append(float(err["EPE"]))
                stats[arm]["wall"].append(wall)
                print(
                    f"{family} w{i} {arm}: {wall:.1f}s EPE {stats[arm]['epe'][-1]:.3f}",
                    flush=True,
                )
        for arm in ARMS:
            print(
                json.dumps(
                    {
                        "family": family,
                        "arm": arm,
                        "EPE_mean": round(float(np.mean(stats[arm]["epe"])), 4),
                        "EPE_per_window": [round(e, 4) for e in stats[arm]["epe"]],
                        "wall_median_s": round(
                            float(np.median(stats[arm]["wall"])), 2
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
