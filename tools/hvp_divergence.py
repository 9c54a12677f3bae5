#!/usr/bin/env python3
"""Instrument the DSEC warm-frame analytic-HVP accuracy cost (VERDICT r4
task #2).

The shipped DSEC default (hybrid analytic GN on the finest scale) costs
+4.4% rot / +4-6% sparse EPE vs central-FD, and round 4's coldfd gate
proved it is NOT a cold-frame artifact: warm-chained windows carry the
gap.  This tool compares the two curvature models on IDENTICAL warm
iterates at the finest scale to find where the trajectories diverge:

  - per outer iterate: the CG/Newton direction under the analytic GN
    HVP vs the central-FD HVP from the SAME point — cosine, norm ratio,
    curvature along each direction under both models, per-tile
    divergence stats
  - two full trajectories (GN-driven / FD-driven) from the same warm
    start, with per-iterate loss and final EPE each
  - the candidate fix measured in-process: K central-FD "polish"
    iterations appended to the GN trajectory endpoint (does the gap
    close at its basin, or is the GN path in a different basin?)

    python tools/hvp_divergence.py [rot|sparse|...] [--geometry dsec|mvsec]
        [--windows 2] [--iters 12]

Outputs JSON lines (one per iterate + a summary per window); pipe to a
results/ log.  Reference anchor: the solver protocol this probes
(/root/reference/configs/mvsec_indoor_no_timeaware.yaml:20-54, Newton-CG
budgets) — the curvature model is OUR deviation, not the reference's.
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

import gate_study as GS
import parity_study as PS

MAX_STEP = 10.0  # optimizer.hvp_max_step default (per-component clip)
CG_MAXITER = 8   # the shipped DSEC budget
C1 = 1e-4


def build_probe(solver, events_np):
    """(vg, grad, hvp_gn_factory, hvp_fd, full_args) for the finest
    scale's banded objective on this exact window — the same builders
    patch_base._build_newton wires, evaluated host-side so both
    curvature models can be probed at identical iterates."""
    import jax

    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded,
        build_objective_banded_hvp_staged,
        build_orig_iwe_banded,
        make_cost,
    )

    solver.overload_patch_configuration(solver.patch_scales - 1)
    spec = solver._current_spec()
    args = solver._banded_newton_args(events_np)
    hoist = "orig_iwe" in make_cost(spec).required_keys
    obj = build_objective_banded(spec, precomputed_orig=hoist)
    prep_raw, hvp_raw = build_objective_banded_hvp_staged(
        spec, precomputed_orig=hoist, gauss_newton=True
    )
    full_args = tuple(args)
    if hoist:
        orig = build_orig_iwe_banded(spec)(*args)
        full_args = (orig,) + full_args

    value_fn = lambda x, *a: obj(x, *a)[0]
    vg_j = jax.jit(jax.value_and_grad(value_fn))
    grad_j = jax.jit(jax.grad(value_fn))
    prep_j = jax.jit(prep_raw)
    hvp_j = jax.jit(hvp_raw)
    dt = solver.dtype

    def vg(x):
        f, g = vg_j(x.astype(dt), *full_args)
        return float(f), np.asarray(g, np.float64)

    def make_hvp_gn(x):
        aux = prep_j(x.astype(dt), *full_args)  # once per CG solve

        def hvp(p):
            return np.asarray(
                hvp_j(aux, x.astype(dt), np.asarray(p).astype(dt), *full_args),
                np.float64,
            )

        return hvp

    def hvp_fd(x, p):
        # the device solver's central-difference formula (newton_cg.hvp)
        p = np.asarray(p, np.float64)
        p_norm = np.linalg.norm(p) + 1e-12
        eps = 0.1 * (1.0 + 1e-3 * np.linalg.norm(x)) / p_norm
        gp = np.asarray(grad_j((x + eps * p).astype(dt), *full_args), np.float64)
        gm = np.asarray(grad_j((x - eps * p).astype(dt), *full_args), np.float64)
        return (gp - gm) / (2.0 * eps)

    return vg, make_hvp_gn, hvp_fd, spec


def cg(g, hvp, cg_maxiter=CG_MAXITER):
    """Truncated CG on H p = -g (scipy forcing sequence; simplified
    negative-curvature exit, matching newton_cg.cg_solve semantics)."""
    g_norm = np.linalg.norm(g)
    eta = min(0.5, np.sqrt(g_norm)) * g_norm
    p = np.zeros_like(g)
    r, d = g.copy(), -g.copy()
    for i in range(cg_maxiter):
        if np.linalg.norm(r) <= eta:
            break
        hd = hvp(d)
        curv = float(d @ hd)
        if curv <= 1e-16 * float(d @ d):
            if i == 0:
                p = (float(r @ r) / curv) * d if curv != 0 else -g
            break
        alpha = float(r @ r) / curv
        p = p + alpha * d
        r_new = r + alpha * hd
        beta = float(r_new @ r_new) / float(r @ r)
        d = -r_new + beta * d
        r = r_new
    if not np.any(p):
        p = -g
    return p


def clip_step(p):
    return np.clip(p, -MAX_STEP, MAX_STEP)


def backtrack(vg, x, f0, g, p, ls_maxiter=16):
    slope = float(g @ p)
    alpha = 1.0
    for _ in range(ls_maxiter):
        f1, _ = vg(x + alpha * p)
        if f1 <= f0 + C1 * alpha * slope:
            return alpha, f1
        alpha *= 0.5
    return 0.0, f0


def newton_traj(vg, hvp_factory, x0, iters, probe=None):
    """Host Newton-CG following ONE curvature model; ``probe(x)`` adds
    per-iterate cross-diagnostics."""
    x = x0.copy()
    rows = []
    for k in range(iters):
        f0, g = vg(x)
        hvp = hvp_factory(x)
        p = clip_step(cg(g, hvp))
        row = {"iter": k, "loss": f0, "g_norm": float(np.linalg.norm(g)),
               "step_norm": float(np.linalg.norm(p))}
        if probe is not None:
            row.update(probe(x, g, p, hvp))
        alpha, f1 = backtrack(vg, x, f0, g, p)
        row["alpha"] = alpha
        rows.append(row)
        if alpha == 0.0:
            break
        x = x + alpha * p
    return x, rows


def main():
    family, geometry, n_windows, iters, backend, fast = "rot", "dsec", 2, 12, None, False
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--geometry":
            geometry = next(it)
        elif a == "--windows":
            n_windows = int(next(it))
        elif a == "--iters":
            iters = int(next(it))
        elif a == "--backend":
            backend = next(it)  # CPU smoke: --backend pallas (interpret)
        elif a == "--fast":
            fast = True  # CPU smoke: tiny solve budgets
        elif a in PS.FAMILIES:
            family = a
        else:
            raise SystemExit(f"unknown arg {a!r}")

    h, w, crop_h, crop_w, _, _, _ = GS.GEOMETRIES[geometry]
    from event_based_optical_flow_tpu import solver as solver_mod

    Solver = solver_mod.collections["pyramidal_patch_contrast_maximization"]
    slv_cfg = dict(PS.SLV_CFG)
    slv_cfg["patch"] = dict(slv_cfg["patch"], crop_height=crop_h, crop_width=crop_w)
    if backend:
        slv_cfg["iwe_backend"] = backend
    opt_over = (
        {"cg_maxiter": 8, "coarse_event_fraction": 0.25, "hvp_mode": "analytic"}
        if geometry == "dsec" else {"hvp_mode": "analytic"}
    )
    if fast:
        opt_over.update(n_iter=4, max_iter=4, cg_maxiter=4)
    s = Solver((h, w), {}, slv_cfg, dict(PS.OPT_CFG, **opt_over), {}, None)

    loader, cfg = GS.make_loader(family, geometry)
    ts = loader.eval_frame_time_list()

    # window 0: the cold solve seeds the warm chain (untimed)
    opt_b, gt_b, gt_flow, flow_time = PS.gather(loader, cfg, ts[0], ts[1])
    t0 = time.time()
    best = s.optimize(opt_b)
    s.set_previous_frame_best_estimation(best)
    print(f"cold window solved in {time.time() - t0:.1f}s", flush=True)

    for wi in range(1, n_windows + 1):
        opt_b, gt_b, gt_flow, flow_time = PS.gather(loader, cfg, ts[wi], ts[wi + 1])
        warm = s.previous_frame_best_estimation
        s_fin = s.patch_scales - 1
        x0 = np.asarray(warm[s_fin], np.float64).reshape(-1)

        vg, make_hvp_gn, hvp_fd, spec = build_probe(s, opt_b)
        grid = tuple(s.patch_image_size)

        def probe(x, g, p_gn, hvp_gn):
            p_fd = clip_step(cg(g, lambda d: hvp_fd(x, d)))
            cos = float(p_gn @ p_fd / ((np.linalg.norm(p_gn) * np.linalg.norm(p_fd)) + 1e-12))
            # curvature along the GN direction under both models: the
            # ratio is how much GN under-curves where it actually steps
            d = p_gn / (np.linalg.norm(p_gn) + 1e-12)
            c_gn = float(d @ hvp_gn(d))
            c_fd = float(d @ hvp_fd(x, d))
            tile_div = np.linalg.norm(
                (p_gn - p_fd).reshape((2,) + grid), axis=0
            )
            jmax, imax = np.unravel_index(np.argmax(tile_div), tile_div.shape)
            return {
                "cos_gn_fd": round(cos, 4),
                "fd_step_norm": float(np.linalg.norm(p_fd)),
                "curv_gn_along_gn": c_gn, "curv_fd_along_gn": c_fd,
                "tile_div_max": float(tile_div.max()),
                "tile_div_mean": float(tile_div.mean()),
                "tile_div_argmax": [int(jmax), int(imax)],
            }

        x_gn, rows_gn = newton_traj(vg, make_hvp_gn, x0, iters, probe=probe)
        x_fd, rows_fd = newton_traj(
            vg, lambda x: (lambda p: hvp_fd(x, p)), x0, iters
        )
        # candidate fix: FD polish from the GN endpoint
        x_pol, rows_pol = newton_traj(
            vg, lambda x: (lambda p: hvp_fd(x, p)), x_gn, 3
        )

        def epe(x):
            m = np.asarray(x, np.float64).reshape((2,) + grid)
            return float(
                s.calculate_flow_error(m, gt_flow, timescale=flow_time,
                                       events=gt_b)["EPE"]
            )

        for r in rows_gn:
            print(json.dumps({"window": wi, "traj": "gn", **r}), flush=True)
        for r in rows_fd:
            print(json.dumps({"window": wi, "traj": "fd", **r}), flush=True)
        for r in rows_pol:
            print(json.dumps({"window": wi, "traj": "gn+fdpolish", **r}), flush=True)
        summary = {
            "window": wi, "family": family, "geometry": geometry,
            "summary": True,
            "EPE_warmstart": epe(x0),
            "EPE_gn": epe(x_gn), "EPE_fd": epe(x_fd),
            "EPE_gn_fdpolish": epe(x_pol),
            "x_dist_gn_fd": float(np.linalg.norm(x_gn - x_fd)),
            "loss_gn": rows_gn[-1]["loss"], "loss_fd": rows_fd[-1]["loss"],
        }
        print(json.dumps(summary), flush=True)

        # chain the REAL solver forward so window wi+1 is a true warm frame
        best = s.optimize(opt_b)
        s.set_previous_frame_best_estimation(best)


if __name__ == "__main__":
    main()
