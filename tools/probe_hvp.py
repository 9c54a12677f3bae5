#!/usr/bin/env python3
"""Honest same-session A/B of one Newton-CG HVP through the full banded
objective (the CG-dominant op): central-FD (2 gradient evals, the
shipped accuracy default), one-sided FD (1 gradient eval, the speed
mode), and the v10 analytic paths (fused JVP + HVP-backward kernels;
"gn" = Gauss-Newton curvature, the analytic default; "full" adds the
a.e. vote-Hessian term A).

    python tools/probe_hvp.py [mvsec|dsec] [central onesided gn full]

Calibrated interleaved slopes (>= ~0.8 s of device signal per sample,
3 reps) — the probe discipline from tools/probe_objective.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.objective import (
        ObjectiveSpec,
        build_objective_banded,
        build_objective_banded_hvp,
        build_orig_iwe_banded,
    )
    from event_based_optical_flow_tpu.types import pad_events

    geo = sys.argv[1] if len(sys.argv) > 1 else "mvsec"
    if geo == "dsec":
        H, W, n_events, grid = 480, 640, 300_000, (30, 40)
    else:
        H, W, n_events, grid = 260, 346, 30_720, (16, 16)
    modes = sys.argv[2:] or ["central", "onesided", "gn", "gnstaged", "full"]

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 0.2, n_events))
    ev = np.stack(
        [
            np.round(rng.uniform(0, H - 1, n_events)),
            np.round(rng.uniform(0, W - 1, n_events)),
            t,
            rng.integers(0, 2, n_events).astype(np.float64),
        ],
        axis=1,
    )
    padded, wgt = pad_events(ev, target_n=-(-n_events // 1024) * 1024)
    dtf = (padded[:, 2] - t.min()) / (t.max() - t.min())
    packed = PB.pack_events_dense(padded, wgt, dtf, H, W)
    args = tuple(
        jnp.asarray(np.asarray(a), jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
        for a in packed
    ) + (jnp.asarray(t.max() - t.min(), jnp.float32),)
    print(f"{geo}: G={packed[0].shape[0]} chunks, grid {grid}", flush=True)

    spec = ObjectiveSpec(
        image_shape=(H, W), outer_padding=0, patch_image_size=grid,
        patch_size=(H // grid[0], W // grid[1]),
        sliding_window=(H // grid[0], W // grid[1]), patch_shift=(0, 0),
        filter_type="bilinear", iwe_method="bilinear_vote", blur_sigma=1.0,
        cost_name="hybrid",
        cost_with_weight=(
            ("multi_focal_normalized_gradient_magnitude", 1.0),
            ("total_variation", 0.01),
        ),
        time_aware=False, iwe_backend="auto",
    )
    obj = build_objective_banded(spec, precomputed_orig=True)
    orig = build_orig_iwe_banded(spec)(*args)
    grad_f = jax.grad(lambda m: obj(m, orig, *args)[0])
    hvp_gn = build_objective_banded_hvp(spec, precomputed_orig=True)
    hvp_full = build_objective_banded_hvp(spec, precomputed_orig=True,
                                          gauss_newton=False)
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded_hvp_staged,
    )

    prep_s, hvp_s = build_objective_banded_hvp_staged(spec, precomputed_orig=True)

    m_dof = 2 * grid[0] * grid[1]
    motion = jnp.asarray(rng.uniform(-8, 8, m_dof), jnp.float32)
    p0 = jnp.asarray(rng.normal(0, 2, m_dof), jnp.float32)

    def central(m, p):
        pn = jnp.linalg.norm(p) + 1e-12
        eps = jnp.float32(0.1) * (1.0 + 1e-3 * jnp.linalg.norm(m)) / pn
        return (grad_f(m + eps * p) - grad_f(m - eps * p)) / (2 * eps)

    def onesided(m, p):
        pn = jnp.linalg.norm(p) + 1e-12
        eps = jnp.float32(0.1) * (1.0 + 1e-3 * jnp.linalg.norm(m)) / pn
        return (grad_f(m + eps * p) - grad_f(m)) / eps

    bodies = {
        "central": central,
        "onesided": onesided,
        "gn": lambda m, p: hvp_gn(m, p, orig, *args),
        "full": lambda m, p: hvp_full(m, p, orig, *args),
    }

    def make_runner(body):
        @jax.jit
        def run(iters, m0, pv):
            def it(i, acc):
                m = m0 + (i % 7) * 0.013
                return acc + body(m, pv + acc * 1e-20).sum()

            return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

        return run

    def make_staged_runner(cg=8):
        # the production CG-loop shape: ONE prep (value images) per
        # Newton iteration, ``cg`` tangent-only HVPs against it; each
        # reported sample is per-HVP (amortized prep included)
        @jax.jit
        def run(iters, m0, pv):
            def it(i, acc):
                m = m0 + (i % 7) * 0.013
                aux = prep_s(m, orig, *args)

                def inner(j, a):
                    return a + hvp_s(aux, m, pv + (a + j) * 1e-20, orig, *args).sum()

                return jax.lax.fori_loop(0, cg, inner, acc)

            return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

        return run, cg

    runners, scale = {}, {}
    for k in modes:
        if k == "gnstaged":
            runners[k], scale[k] = make_staged_runner()
        else:
            runners[k], scale[k] = make_runner(bodies[k]), 1
    est = {}
    for name, run in runners.items():
        t0 = time.perf_counter()
        float(run(4, motion, p0))
        print(f"{name}: compile+4 iters {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter(); float(run(16, motion, p0)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(128, motion, p0)); b = time.perf_counter() - t0
        est[name] = max((b - a) / 112, 1e-6)

    results = {name: [] for name in runners}
    for rep in range(3):
        for name, run in runners.items():
            di = int(min(max(np.ceil(0.8 / est[name]), 64), 50_000))
            i1, i2 = di // 4, di // 4 + di
            m = motion + 0.013 * (rep + 1)
            t0 = time.perf_counter(); float(run(i1, m, p0)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(i2, m, p0)); b = time.perf_counter() - t0
            # per-HVP (staged: per outer step = 1 prep + cg HVPs -> /cg)
            results[name].append((b - a) / (i2 - i1) / scale[name])
    print(flush=True)
    for name, ms in results.items():
        ms = sorted(x for x in ms if x > 0)
        med = ms[len(ms) // 2] if ms else float("nan")
        print(
            f"{geo} HVP {name:8s} median {med*1e3:.4f} ms   "
            f"samples={[f'{x*1e3:.4f}' for x in ms]}", flush=True,
        )


if __name__ == "__main__":
    main()
