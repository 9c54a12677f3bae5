#!/usr/bin/env python3
"""Accuracy parity study: this framework vs the reference, side by side,
on synthetic scene families with exact GT displacement.

Real MVSEC cannot be obtained in this environment (zero egress, no
dataset on disk) — this study is the documented compensation (VERDICT r1
"Next round" #3): >= 3 scene families (translation discontinuities,
rigid rotation, zoom, clutter/noise, sparse density) x BOTH shipped
configs (dense + time-aware Burgers), identical event streams fed to
both implementations, AEE/FWL from each implementation's own metric
stack (identical formulas: ours flow/metrics.py, reference
flow_utils.py:706-758).

    python tools/parity_study.py mine [dense|ta] [families...]
    PYTHONPATH=tools/refshims:/root/reference \
        python tools/parity_study.py ref [dense|ta] [families...]

Prints one JSON line per (family, config) with per-window EPE plus the
mean; collect both outputs into the BENCHMARKS.md table with
tools/parity_study.py report <mine.jsonl> <ref.jsonl>.
"""
import json
import os
import sys
import time
import logging

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "ref":
    # the reference runs on CPU (torch/numpy); keep jax — imported by the
    # synthetic loader's package — off the (possibly busy) TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

logging.disable(logging.INFO)

H, W = 260, 346

# family name -> synthetic-loader data-config overrides.  All families
# use the APERIODIC dots pattern (lattice scenes alias translations by
# period/dt) and MVSEC-protocol-like windows: ~0.1 s, ~30k events.
FAMILIES = {
    "quadrants": {},
    "disc": {"scene": "disc", "flow_max": 25.0},
    "rot": {"scene": "rot", "omega": 0.35},
    "zoom": {"scene": "zoom", "zoom_rate": 0.25},
    "noise": {"noise_fraction": 0.3},
    "sparse": {"event_rate": 60_000.0},
}

N_WINDOWS = 3

SLV_CFG = {
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
OPT_CFG = {
    "n_iter": 40,
    "method": "Newton-CG",
    "max_iter": 25,
    "parameters": {"trans_x": {"min": -150, "max": 150},
                   "trans_y": {"min": -150, "max": 150}},
}


def make_loader(family: str):
    from event_based_optical_flow_tpu import data as data_mod

    cfg = {
        "height": H, "width": W, "duration": 2.0, "event_rate": 300_000.0,
        "flow_max": 25.0, "n_frames": 21, "seed": 11,
        "pattern": "dots", "n_dots": 1200,
        "n_events_per_batch": 30000, "eval_dt": 1,
    }
    cfg.update(FAMILIES[family])
    loader = data_mod.collections["synthetic"](config=cfg)
    loader.set_sequence(f"parity_{family}")
    return loader, cfg


def gather(loader, cfg, t1, t2):
    """Reference main.py:52-107 window protocol (same as main._gather_frame)."""
    n_events = cfg["n_events_per_batch"]
    ind1, ind2 = loader.time_to_index(t1), loader.time_to_index(t2)
    gt_batch = loader.load_event(ind1, ind2)
    gt_flow = loader.load_optical_flow(t1, t2)
    gt_batch[..., 2] -= np.min(gt_batch[..., 2])
    if ind2 - ind1 < n_events:
        short = n_events - (ind2 - ind1)
        ind1 -= short // 2
        ind2 += short // 2
    elif ind2 - ind1 > n_events:
        ind1 = ind2 - n_events
    opt_batch = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
    opt_batch[..., 2] -= np.min(opt_batch[..., 2])
    return opt_batch, gt_batch, gt_flow, t2 - t1


def run(impl: str, ta: bool, families):
    slv_cfg = dict(SLV_CFG)
    if ta:
        slv_cfg.update(time_aware=True, time_bin=10,
                       flow_interpolation="burgers", t0_flow_location="middle")
    if impl == "ref":
        from src.solver.patch_contrast_pyramid import (
            PyramidalPatchContrastMaximization as Solver,
        )
    else:
        from event_based_optical_flow_tpu import solver as _s

        Solver = _s.collections["pyramidal_patch_contrast_maximization"]

    for family in families:
        loader, cfg = make_loader(family)
        solv = Solver((H, W), {}, slv_cfg, OPT_CFG, {}, None)
        ts = loader.eval_frame_time_list()
        epes, fwls, gt_fwls, n3pes = [], [], [], []
        t_start = time.time()
        for i in range(N_WINDOWS):
            opt_b, gt_b, gt_flow, flow_time = gather(loader, cfg, ts[i], ts[i + 1])
            best = solv.optimize(opt_b)
            err = solv.calculate_flow_error(best, gt_flow, timescale=flow_time, events=gt_b)
            solv.set_previous_frame_best_estimation(best)
            epes.append(float(err["EPE"]))
            n3pes.append(float(err.get("3PE", err.get("NPE3", np.nan))))
            fwls.append(float(err.get("PRED_FWL", np.nan)))
            gt_fwls.append(float(err.get("GT_FWL", np.nan)))
        row = {
            "impl": impl,
            "config": "ta" if ta else "dense",
            "family": family,
            "EPE_mean": round(float(np.mean(epes)), 4),
            "EPE_per_window": [round(e, 4) for e in epes],
            "3PE_mean": round(float(np.nanmean(n3pes)), 4),
            "PRED_FWL_mean": round(float(np.nanmean(fwls)), 4),
            "GT_FWL_mean": round(float(np.nanmean(gt_fwls)), 4),
            "wall_s": round(time.time() - t_start, 1),
        }
        print(json.dumps(row), flush=True)


def report(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            rows += [json.loads(l) for l in f if l.strip().startswith("{")]
    key = lambda r: (r["config"], r["family"])
    mine = {key(r): r for r in rows if r["impl"] == "mine"}
    ref = {key(r): r for r in rows if r["impl"] == "ref"}
    print("| config | family | EPE ours | EPE ref | PRED_FWL ours | PRED_FWL ref |")
    print("|---|---|---|---|---|---|")
    for k in sorted(set(mine) | set(ref)):
        m, r = mine.get(k), ref.get(k)
        fmt = lambda d, f: f"{d[f]:.3f}" if d else "—"
        print(
            f"| {k[0]} | {k[1]} | {fmt(m, 'EPE_mean')} | {fmt(r, 'EPE_mean')} | "
            f"{fmt(m, 'PRED_FWL_mean')} | {fmt(r, 'PRED_FWL_mean')} |"
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "report":
        report(args[1:])
        sys.exit(0)
    impl = args[0] if args else "mine"
    for arg in args[1:]:
        if "=" in arg:  # optimizer overrides, e.g. polish=5 n_iter=80
            k, v = arg.split("=", 1)
            OPT_CFG[k] = int(v)
    cfg_names = [a for a in args[1:] if a in ("dense", "ta")] or ["dense", "ta"]
    fams = [a for a in args[1:] if a in FAMILIES] or list(FAMILIES)
    for cfg_name in cfg_names:
        run(impl, cfg_name == "ta", fams)
