#!/usr/bin/env python3
"""Interleaved SAME-PROCESS A/B at the full-solve level (MVSEC
protocol): solving the same frames alternately with two solver variants
cancels the tunnel's session drift (single-shot e2e numbers swing
+-50%).

    python tools/ab_policy.py [n_rounds]          # packing-policy A/B
    python tools/ab_policy.py [n_rounds] hvp      # one-sided vs central FD-HVP
    python tools/ab_policy.py [n_rounds] flex     # flex vs tile packing (MVSEC)
    python tools/ab_policy.py [n_rounds] flex-dsec  # same at 480x640/300k
    python tools/ab_policy.py [n_rounds] coarse-dsec  # coarse_event_fraction
        # accuracy+speed A/B on a 30%-clutter DSEC-geometry scene
    python tools/ab_policy.py [n_rounds] budget-dsec  # coarse-scale Newton
        # budget (coarse_max_iter/coarse_cg_maxiter) on the same scene
    python tools/ab_policy.py [n_rounds] tent  # v8 tent vote blocks vs
        # select (speed + flowMAE, 30%-clutter MVSEC geometry)
    python tools/ab_policy.py [n_rounds] lbfgs-dsec  # device L-BFGS vs
        # Newton-CG at DSEC geometry (same clutter scene)
    python tools/ab_policy.py [n_rounds] hvp-ta  # time-aware (Burgers
        # T=10) voxel analytic HVP vs central FD (30%-clutter, MVSEC geom)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import logging

logging.disable(logging.INFO)

from bench_e2e import GT, OPT_CFG, SLV_CFG, synth  # noqa: E402

H, W = 260, 346


N_EV = 30000


def build_solver(opt_over=None, slv_over=None):
    from event_based_optical_flow_tpu import solver as _s

    slv = dict(SLV_CFG, **(slv_over or {}))
    if (H, W) != (260, 346):
        slv["patch"] = dict(slv["patch"], crop_height=H, crop_width=W)
    return _s.collections["pyramidal_patch_contrast_maximization"](
        (H, W), {}, slv, dict(OPT_CFG, **(opt_over or {})), {}, None
    )


def main():
    global H, W, N_EV
    import event_based_optical_flow_tpu.ops.pallas_objective_banded as PB

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mode = sys.argv[2] if len(sys.argv) > 2 else "packing"

    noise_frac = 0.0
    slv_over = None
    if mode.startswith(("flex", "coarse", "budget", "lbfgs")):
        if mode.endswith("-dsec"):
            import bench_e2e as _be

            _be.H, _be.W = 480, 640  # synth() reads bench_e2e's globals
            H, W, N_EV = 480, 640, 300000
        if mode.startswith("lbfgs"):
            # device L-BFGS vs Newton-CG at DSEC geometry (speed + flowMAE
            # on the 30%-clutter scene); both on the shipped coarse policy
            noise_frac = 0.3
            base = {"cg_maxiter": 8, "coarse_event_fraction": 0.25}
            POLICIES = {
                "A(newton cg8)": ("flex", 96),
                "B(lbfgs mi80)": ("flex", 96),
            }
            OPT_OVER = {
                "A(newton cg8)": dict(base),
                "B(lbfgs mi80)": dict(
                    base, device_solver="lbfgs", max_iter=80,
                    coarse_max_iter=40,
                ),
            }
        elif mode.startswith("budget"):
            # coarse-scale Newton budget on top of the shipped DSEC config
            # (cg 8 + coarse_event_fraction 0.25): coarse scales only seed
            # the next scale's init, so their budget may be cuttable
            noise_frac = 0.3
            base = {"cg_maxiter": 8, "coarse_event_fraction": 0.25}
            POLICIES = {
                "A(dsec-default)": ("flex", 96),
                "B(coarse mi10/cg4)": ("flex", 96),
            }
            OPT_OVER = {
                "A(dsec-default)": dict(base),
                "B(coarse mi10/cg4)": dict(
                    base, coarse_max_iter=10, coarse_cg_maxiter=4
                ),
            }
        elif mode.startswith("coarse"):
            noise_frac = 0.3
            POLICIES = {
                "A(full-events)": ("flex", 96),
                "B(coarse 0.25)": ("flex", 96),
            }
            OPT_OVER = {
                "A(full-events)": {},
                "B(coarse 0.25)": {"coarse_event_fraction": 0.25},
            }
        else:
            POLICIES = {
                "A(flex,rw96)": ("flex", 96),
                "B(tile,rw96)": ("tile", 96),
            }
            OPT_OVER = {k: {} for k in POLICIES}
    elif mode == "hvp":
        POLICIES = {
            "A(one-sided)": ("tile", 96),
            "B(central)": ("tile", 96),
        }
        OPT_OVER = {"A(one-sided)": {}, "B(central)": {"hvp_central": True}}
    elif mode.startswith("hvp-analytic"):
        # v10 analytic (fused JVP+HVP kernels, GN curvature + step cap)
        # vs the shipped central-FD default: speed + flowMAE on the
        # 30%-clutter scene (the family that exposed one-sided FD noise).
        # hvp-analytic-dsec runs at DSEC geometry on the shipped DSEC
        # budgets (cg 8 + coarse_event_fraction 0.25).
        noise_frac = 0.3
        base = {}
        if mode.endswith("-dsec"):
            import bench_e2e as _be

            _be.H, _be.W = 480, 640
            H, W, N_EV = 480, 640, 300000
            base = {"cg_maxiter": 8, "coarse_event_fraction": 0.25}
        POLICIES = {
            "A(central-fd)": ("flex", 96),
            "B(hybrid)": ("flex", 96),
            "C(analytic-all)": ("flex", 96),
        }
        OPT_OVER = {
            "A(central-fd)": dict(base),
            # the adoptable hybrid: analytic GN on the finest scale only
            "B(hybrid)": dict(base, hvp_mode="analytic"),
            # full-chain analytic (cold-start-risky; measured 2026-08-19:
            # warm parity at 2.6x speed, cold frame misroutes)
            "C(analytic-all)": dict(base, hvp_mode="analytic-all"),
        }
    elif mode == "hvp-ta":
        # v10 voxel analytic HVP (time-aware Burgers objective, GN via the
        # banded voxel JVP/HVP kernels) vs the central-FD default: speed +
        # flowMAE on the 30%-clutter scene at MVSEC geometry, T=10 bins.
        noise_frac = 0.3
        slv_over = dict(
            time_aware=True, time_bin=10, flow_interpolation="burgers",
            t0_flow_location="middle",
        )
        POLICIES = {
            "A(central-fd)": ("flex", 96),
            "B(hybrid)": ("flex", 96),
            "C(analytic-warm)": ("flex", 96),
        }
        OPT_OVER = {
            "A(central-fd)": {},
            "B(hybrid)": {"hvp_mode": "analytic"},
            # warm frames run full-analytic GN at every scale — the TA
            # serving default since round 4 (all measured rounds here are
            # warm: round 0 is the untimed compile/cold frame)
            "C(analytic-warm)": {"hvp_mode": "analytic-warm"},
        }
    elif mode == "warmfinest":
        # optimizer.warm_finest_only: warm frames skip the coarse scales
        # and init sweeps and run one finest-scale Newton from the
        # previous motion.  Speed + flowMAE on the warm-chained
        # 30%-clutter scene at MVSEC geometry, stacked on the
        # analytic-warm serving default.  (Accuracy under tile-level
        # motion CHANGE is the 6-family gate's job — disc is the canary.)
        noise_frac = 0.3
        POLICIES = {
            "A(analytic-warm)": ("flex", 96),
            "B(+warm-finest)": ("flex", 96),
            "C(+wf,full-every-8)": ("flex", 96),
        }
        OPT_OVER = {
            "A(analytic-warm)": {"hvp_mode": "analytic-warm"},
            "B(+warm-finest)": {
                "hvp_mode": "analytic-warm", "warm_finest_only": True,
            },
            "C(+wf,full-every-8)": {
                "hvp_mode": "analytic-warm", "warm_finest_only": True,
                "warm_full_every": 8,
            },
        }
    elif mode == "tent":
        # v8 vote-block build (OBJECTIVE_TENT consumed at objective BUILD
        # time; builds happen lazily under with_policy): speed + accuracy
        # on the 30%-clutter scene at MVSEC geometry
        noise_frac = 0.3
        POLICIES = {
            "A(select)": ("flex", 96, False),
            "B(tent)": ("flex", 96, True),
            "C(tent-all)": ("flex", 96, "all"),
        }
        OPT_OVER = {k: {} for k in POLICIES}
    else:
        POLICIES = {
            "A(tile,rw96)": ("tile", 96),
            "B(band,rw128)": ("band", 128),
        }
        OPT_OVER = {k: {} for k in POLICIES}

    default_policy = (PB.OBJECTIVE_DENSE_PACKING, PB.OBJECTIVE_ROW_WINDOW,
                      PB.OBJECTIVE_TENT)

    def with_policy(name, fn):
        # the host packer reads the policy constants at CALL time and the
        # kernel flags at BUILD time — both must see the same policy for
        # a given solver on every call
        pol = POLICIES[name] if len(POLICIES[name]) == 3 else POLICIES[name] + (PB.OBJECTIVE_TENT,)
        PB.OBJECTIVE_DENSE_PACKING, PB.OBJECTIVE_ROW_WINDOW, PB.OBJECTIVE_TENT = pol
        try:
            return fn()
        finally:
            (PB.OBJECTIVE_DENSE_PACKING, PB.OBJECTIVE_ROW_WINDOW,
             PB.OBJECTIVE_TENT) = default_policy

    solvers = {name: build_solver(OPT_OVER[name], slv_over) for name in POLICIES}

    def make_frame(seed):
        ev = synth(GT, seed=seed, n=N_EV)
        if noise_frac:
            # uniform clutter REPLACING a fraction of the signal events
            # (the parity study's "noise" family at this geometry).  The
            # count stays fixed across frames on purpose: a varying count
            # shifts the flex pack's G bucket and retraces the whole
            # DSEC-scale Newton chain (~minutes) EVERY round — the
            # production protocol (main.py n_events_per_batch) is
            # fixed-count for the same reason.
            rng = np.random.default_rng(seed + 7)
            noisy = rng.random(len(ev)) < noise_frac
            ev[noisy, 0] = rng.uniform(0, H - 1, int(noisy.sum()))
            ev[noisy, 1] = rng.uniform(0, W - 1, int(noisy.sum()))
        n_fix = int(N_EV * 0.9)
        if len(ev) < n_fix:
            raise RuntimeError(f"scene too sparse: {len(ev)} < {n_fix}")
        return ev[:n_fix]

    frames = [make_frame(100 + f) for f in range(n_rounds + 1)]
    maes = {}

    def grid_gt(wp):
        # the solver's motion grid covers the crop uniformly: the GT
        # half-split in width maps to the grid's width midpoint
        gu = np.where(np.arange(wp)[None, :] >= wp / 2, GT[0], -GT[0])
        gv = np.where(np.arange(wp)[None, :] >= wp / 2, GT[1], -GT[1])
        return gu, gv
    # warm both (compiles + warm start state)
    for name, s in solvers.items():
        best = with_policy(name, lambda: s.optimize(frames[0]))
        s.set_previous_frame_best_estimation(best)

    times = {name: [] for name in POLICIES}
    for r in range(1, n_rounds + 1):
        for name, s in solvers.items():
            t0 = time.time()
            best = with_policy(name, lambda: s.optimize(frames[r]))
            times[name].append(time.time() - t0)
            s.set_previous_frame_best_estimation(best)
            fin = best[max(best)]
            half = fin.shape[2] // 2
            extra = ""
            if noise_frac:
                gu, gv = grid_gt(fin.shape[2])
                mae = 0.5 * (np.abs(fin[0] - gu).mean() + np.abs(fin[1] - gv).mean())
                maes.setdefault(name, []).append(float(mae))
                extra = f" flowMAE={mae:.2f} px/s"
            print(
                f"round {r} {name}: {times[name][-1]:.2f}s "
                f"u=({fin[0][:, :half].mean():.1f},{fin[0][:, half:].mean():.1f})" + extra,
                flush=True,
            )
    for name, ts in times.items():
        line = f"{name}: median {sorted(ts)[len(ts)//2]:.2f}s over {len(ts)} frames"
        if name in maes:
            line += f", mean flowMAE {np.mean(maes[name]):.3f} px/s"
        print(line)


if __name__ == "__main__":
    main()
