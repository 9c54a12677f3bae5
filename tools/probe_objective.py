#!/usr/bin/env python3
"""Honest same-session A/B of the OBJECTIVE evaluation (value+grad of the
full hybrid CMax cost through the banded kernel — the Newton-dominant
shape) across packing/chunk variants and geometries.

    python tools/probe_objective.py [mvsec|dsec] [chunks...]
        # variants: "512" "1024" "512:96" "flex1024:96" "tentflex1024:96"
        # "tentallflex1024:96" (v8 forward+backward tent)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.ops.pallas_objective_banded import (
        BAND,
        FLEX_ROW_SCALE,
        fused_multi_iwe_banded,
        n_col_bands,
        objective_row_window,
        pack_events_by_band,
        pack_events_by_tile,
        pack_events_by_tile_flex,
    )
    from event_based_optical_flow_tpu.ops.blur import gaussian_blur3
    from event_based_optical_flow_tpu.costs import functional as F

    geo = sys.argv[1] if len(sys.argv) > 1 else "mvsec"
    if geo == "dsec":
        H, W, n_events = 480, 640, 300_000
    else:
        H, W, n_events = 260, 346, 30_720
    # variant syntax: <chunk>[:rw] e.g. "512" "1024" "512:96"
    specs = sys.argv[2:] or ["512", "1024"]

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 0.2, n_events))
    events = np.stack(
        [
            np.round(rng.uniform(0, H - 1, n_events)),
            np.round(rng.uniform(0, W - 1, n_events)),
            t,
            rng.integers(0, 2, n_events).astype(np.float64),
        ],
        axis=1,
    )
    dtf = (t - t.min()) / (t.max() - t.min())
    wt = np.ones(n_events)
    flow = jnp.asarray(rng.uniform(-8, 8, (2, H, W)), jnp.float32)

    rw_default = objective_row_window(H)

    def make_runner(packed, col_bands, rw, row_scale=BAND, tent=False,
                    pregather=False):
        pk = tuple(
            jnp.asarray(a, jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
            for a in packed
        )

        def loss_of(f):
            # objective shape: orig hoisted out (3 warp votes), blur, MF-NGM
            imgs = fused_multi_iwe_banded(
                f, *pk, (H, W), (0.0, 1.0, 0.5), False, 1e-6, True,
                col_bands, rw, None, 1, False, row_scale, tent, pregather,
            )
            imgs = gaussian_blur3(imgs, 1.0)
            orig = jax.lax.stop_gradient(imgs[2])
            return F.multi_focal_normalized_gradient_magnitude(
                orig, imgs[1], imgs[0], imgs[2], omit_boundary=True
            )

        def body_fn(f):
            l, g = jax.value_and_grad(loss_of)(f)
            return l + g.sum() * 1e-20

        @jax.jit
        def run(iters, f0):
            def body(i, acc):
                f = f0 + ((i % 7) * 0.013 + acc * 1e-20)
                return acc + body_fn(f)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    variants = {}
    for spec in specs:
        if spec.startswith("band"):
            continue
        if spec.startswith(("flex", "tentflex", "tentallflex", "preflex")):
            pre = False
            if spec.startswith("tentallflex"):
                tent, rest = "all", spec[11:]
            elif spec.startswith("tentflex"):
                tent, rest = True, spec[8:]
            elif spec.startswith("preflex"):
                tent, rest, pre = False, spec[7:], True
            else:
                tent, rest = False, spec[4:]
            parts = rest.split(":")
            chunk = int(parts[0])
            rw = int(parts[1]) if len(parts) > 1 else rw_default
            variants[spec] = (
                pack_events_by_tile_flex(events, wt, dtf, H, W, chunk=chunk),
                n_col_bands(W), rw, FLEX_ROW_SCALE, tent, pre,
            )
            continue
        parts = spec.split(":")
        chunk = int(parts[0])
        rw = int(parts[1]) if len(parts) > 1 else rw_default
        variants[f"tile{spec}"] = (
            pack_events_by_tile(events, wt, dtf, H, W, chunk=chunk), n_col_bands(W), rw,
        )
    if geo == "mvsec":
        for spec in [s for s in specs if s.startswith("band")]:
            parts = spec.split(":")
            rw = int(parts[1]) if len(parts) > 1 else rw_default
            variants[spec] = (pack_events_by_band(events, wt, dtf, H), None, rw)
        if not any(s.startswith("band") for s in specs):
            variants["band512"] = (pack_events_by_band(events, wt, dtf, H), None, rw_default)

    runners = {}
    for name, spec in variants.items():
        packed, cb, rw = spec[:3]
        rs = spec[3] if len(spec) > 3 else BAND
        tnt = spec[4] if len(spec) > 4 else False
        pre = spec[5] if len(spec) > 5 else False
        runners[name] = make_runner(packed, cb, rw, rs, tnt, pre)
        print(f"{name}: G={packed[0].shape[0]} chunks rw={rw}", flush=True)

    est = {}
    for name, run in runners.items():
        t0 = time.perf_counter()
        float(run(4, flow))
        print(f"{name}: compile+4 iters {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter(); float(run(16, flow)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(128, flow)); b = time.perf_counter() - t0
        est[name] = max((b - a) / 112, 1e-6)

    results = {name: [] for name in runners}
    for rep in range(3):
        for name, run in runners.items():
            di = int(min(max(np.ceil(0.8 / est[name]), 64), 50_000))
            i1, i2 = di // 4, di // 4 + di
            f = flow + 0.013 * (rep + 1)
            t0 = time.perf_counter(); float(run(i1, f)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(i2, f)); b = time.perf_counter() - t0
            results[name].append((b - a) / (i2 - i1))
    print(flush=True)
    for name, ms in results.items():
        ms = sorted(m for m in ms if m > 0)
        med = ms[len(ms) // 2] if ms else float("nan")
        print(
            f"{geo} fwd+bwd {name:10s} median {med*1e3:.4f} ms/eval   "
            f"samples={[f'{m*1e3:.4f}' for m in ms]}", flush=True,
        )


if __name__ == "__main__":
    main()
