#!/usr/bin/env python3
"""Default-policy accuracy gate (VERDICT r2 task #7 / r3 tasks #1-2):
the adopted config defaults re-gated across ALL 6 synthetic scene
families — not just quadrants + one clutter scene.

Per family, interleaved in ONE process (tunnel drift cancels):
  A(unbudgeted)   cg_maxiter 32, full events at every scale
  B(budgets)      cg_maxiter 8,  coarse_event_fraction 0.25
  C(dsec-default) budgets + hvp_mode analytic (the shipped default)

    python tools/gate_study.py [families...] [n_windows=2] \
        [--geometry dsec|mvsec] [--out outputs/gate/NAME.jsonl]

Crash resilience (the r3 gate_clip2 crash killed a whole 6-family run
at family 4): each family runs in its OWN subprocess; a mid-family TPU
FailedPrecondition loses only that family and is retried once.  Results
append to a JSONL file; re-running the same command RESUMES (families
whose every arm is already in the file are skipped).

Geometry:
  dsec  (default) 480x640, 300k events/window — the DSEC-config gate
  mvsec 260x346 crop 256x336, 30k events/window — the MVSEC-protocol
        gate (parity_study geometry; used for the analytic-warm study)

One-off studies can replace the arms without editing the file:
  GATE_ARMS_JSON='{"B(fd cg8)": {...}, "D(analytic cg12)": {...}}'
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import logging

logging.disable(logging.INFO)

import numpy as np

import parity_study as PS

GEOMETRIES = {
    # name -> (H, W, crop_h, crop_w, n_events, event_rate, n_dots)
    "dsec": (480, 640, 480, 640, 300_000, 3_000_000.0, 4000),
    "mvsec": (260, 346, 256, 336, 30_000, 300_000.0, 1200),
    # CPU smoke test of the harness itself (EPEs are meaningless here)
    "tiny": (64, 64, 64, 64, 3_000, 40_000.0, 80),
}

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
if os.environ.get("GATE_ARMS_JSON"):
    ARMS = json.loads(os.environ["GATE_ARMS_JSON"])


def make_loader(family, geometry):
    from event_based_optical_flow_tpu import data as data_mod

    h, w, _, _, n_ev, rate, n_dots = GEOMETRIES[geometry]
    cfg = {
        "height": h, "width": w, "duration": 1.2,
        "event_rate": rate, "flow_max": 25.0, "n_frames": 13, "seed": 11,
        "pattern": "dots", "n_dots": n_dots,
        "n_events_per_batch": n_ev, "eval_dt": 1,
    }
    cfg.update(PS.FAMILIES[family])
    loader = data_mod.collections["synthetic"](config=cfg)
    loader.set_sequence(f"gate_{family}")
    return loader, cfg


# --ta: the gate runs on the TIME-AWARE (Burgers voxel, T=10) pyramid
# solver instead of the dense one — same arms, same families;
# calculate_flow_error collapses the voxel to t0 flow for the EPE
# (solver/base.py get_original_flow_from_time_aware_flow_voxel).
TA_SLV_OVER = {
    "time_aware": True, "time_bin": 10,
    "flow_interpolation": "burgers", "t0_flow_location": "middle",
}


def run_family(family, n_windows, geometry, ta=False):
    """One family, all arms, interleaved — runs inside the worker (the
    parent collects the printed JSONL rows from worker stdout)."""
    h, w, crop_h, crop_w, _, _, _ = GEOMETRIES[geometry]
    from event_based_optical_flow_tpu import solver as solver_mod

    Solver = solver_mod.collections["pyramidal_patch_contrast_maximization"]
    slv_cfg = dict(PS.SLV_CFG)
    slv_cfg["patch"] = dict(
        slv_cfg["patch"], crop_height=crop_h, crop_width=crop_w
    )
    if ta:
        slv_cfg.update(TA_SLV_OVER)

    loader, cfg = make_loader(family, geometry)
    ts = loader.eval_frame_time_list()
    solvers = {
        arm: Solver((h, w), {}, slv_cfg, dict(PS.OPT_CFG, **over), {}, None)
        for arm, over in ARMS.items()
    }
    # window 0 = the COLD window (compiles ride it, so it is untimed and
    # excluded from the stats), then n_windows timed warm-chained windows
    stats = {arm: {"epe": [], "wall": [], "cold_epe": None} for arm in ARMS}
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
                stats[arm]["cold_epe"] = float(err["EPE"])
                print(
                    f"{family} {arm} cold window (untimed, compiles): "
                    f"{wall:.1f}s EPE {float(err['EPE']):.3f}",
                    flush=True,
                )
                continue
            stats[arm]["epe"].append(float(err["EPE"]))
            stats[arm]["wall"].append(wall)
            print(
                f"{family} w{i} {arm}: {wall:.1f}s "
                f"EPE {stats[arm]['epe'][-1]:.3f}",
                flush=True,
            )
    for arm in ARMS:
        row = json.dumps(
            {
                "family": family,
                "arm": arm,
                "geometry": geometry,
                "ta": bool(ta),
                "EPE_mean": round(float(np.mean(stats[arm]["epe"])), 4),
                "EPE_per_window": [round(e, 4) for e in stats[arm]["epe"]],
                # cold-window accuracy (its wall is compile-dominated and
                # meaningless); warm-mode studies need this in the record
                "EPE_cold": round(stats[arm]["cold_epe"], 4),
                "wall_median_s": round(
                    float(np.median(stats[arm]["wall"])), 2
                ),
                "wall_per_window_s": [
                    round(w_, 2) for w_ in stats[arm]["wall"]
                ],
            }
        )
        print(row, flush=True)


def parse_args(args):
    geometry, out_path, worker, ta, rest = "dsec", None, False, False, []
    it = iter(args)
    for a in it:
        if a in ("--geometry", "--out"):
            val = next(it, None)
            if val is None:
                raise SystemExit(f"{a} requires a value")
            if a == "--geometry":
                geometry = val
            else:
                out_path = val
        elif a == "--worker":
            worker = True
        elif a == "--ta":
            ta = True
        else:
            rest.append(a)
    if geometry not in GEOMETRIES:
        raise SystemExit(f"unknown geometry {geometry!r}")
    unknown = [a for a in rest if a not in PS.FAMILIES and not a.isdigit()]
    if unknown:
        raise SystemExit(
            f"unknown scene families {unknown!r}: expected names from "
            f"{sorted(PS.FAMILIES)} (a typo would otherwise silently "
            f"launch the full 6-family study)"
        )
    fams = [a for a in rest if a in PS.FAMILIES] or list(PS.FAMILIES)
    n_windows = next((int(a) for a in rest if a.isdigit()), 2)
    return fams, n_windows, geometry, out_path, worker, ta


def main():
    fams, n_windows, geometry, out_path, worker, ta = parse_args(sys.argv[1:])

    if worker:
        # one family inline (the crash-isolated unit) — JSON rows go to
        # stdout; the parent collects them into the out file
        assert len(fams) == 1
        run_family(fams[0], n_windows, geometry, ta=ta)
        return

    if out_path is None:
        out_path = f"outputs/gate/gate_{'ta_' if ta else ''}{geometry}.jsonl"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = [json.loads(l) for l in f if l.strip().startswith("{")]
        for fam in set(r["family"] for r in rows):
            arms_done = {
                r["arm"] for r in rows
                if r["family"] == fam and r.get("geometry", "dsec") == geometry
                and r.get("ta", False) == ta
            }
            if arms_done >= set(ARMS):
                done.add(fam)
    todo = [f for f in fams if f not in done]
    if done:
        print(f"resume: skipping complete families {sorted(done & set(fams))}",
              flush=True)

    base_cmd = [
        sys.executable, os.path.abspath(__file__), "--worker",
        "--geometry", geometry, str(n_windows),
    ] + (["--ta"] if ta else [])
    failures = []
    with open(out_path, "a") as out_fh:
        for family in todo:
            for attempt in (1, 2):
                print(f"=== {family} (attempt {attempt}) ===", flush=True)
                proc = subprocess.Popen(
                    base_cmd + [family], stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                rows = []
                for line in proc.stdout:
                    line = line.rstrip("\n")
                    print(line, flush=True)
                    if line.startswith("{") and '"EPE_mean"' in line:
                        rows.append(line)
                rc = proc.wait()
                if rc == 0 and len(rows) == len(ARMS):
                    # write only on family success: a crashed attempt
                    # leaves NO partial rows (resume stays correct)
                    for row in rows:
                        out_fh.write(row + "\n")
                    out_fh.flush()
                    break
                print(
                    f"!!! {family} attempt {attempt} failed "
                    f"(rc={rc}, rows={len(rows)}/{len(ARMS)})",
                    flush=True,
                )
            else:
                failures.append(family)
    if failures:
        print(f"FAILED families after retry: {failures}", flush=True)
        sys.exit(1)
    print(f"gate complete -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
