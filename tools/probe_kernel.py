#!/usr/bin/env python3
"""Honest same-session A/B of fused-kernel variants on the bench shape
(tile packing, 1 warp + vote, 260x346, 30720 events).  Timing per
CLAUDE.md rules: jitted fori_loop, data-dependent iterations, host-sync,
slope between two calibrated loop counts (signal >= ~0.8 s device time).

    python tools/probe_kernel.py [variants...]
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
        FLEX_ROW_SCALE,
        fused_multi_iwe_banded,
        n_col_bands,
        pack_events_by_band,
        pack_events_by_tile,
        pack_events_by_tile_flex,
    )

    H, W = 260, 346
    n_events = 30720
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
    flow = jnp.asarray(rng.uniform(-30, 30, (2, H, W)), jnp.float32)

    def make_runner(packed, col_bands, row_window, use_bf16=True, k=1,
                    offsets=(0.5,), include_orig=False, stack_uv=False,
                    row_scale=64, tent=False, pregather=False):
        pk = tuple(
            jnp.asarray(a, jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
            for a in packed
        )

        def body_fn(f):
            return fused_multi_iwe_banded(
                f, *pk, (H, W), offsets, include_orig, 1e-6, use_bf16,
                col_bands, row_window, None, k, stack_uv, row_scale, tent,
                pregather,
            ).sum()

        @jax.jit
        def run(iters, f0):
            def body(i, acc):
                f = f0 + ((i % 7) * 0.013 + acc * 1e-20)
                return acc + body_fn(f)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    variants = {}
    for chunk in (512, 1024, 2048):
        variants[f"tile{chunk}+row"] = (
            pack_events_by_tile(events, wt, dtf, H, W, chunk=chunk), n_col_bands(W), 128, 1,
        )
    variants["tile512+norow"] = (
        pack_events_by_tile(events, wt, dtf, H, W, chunk=512), n_col_bands(W), None, 1,
    )
    variants["band512+row"] = (pack_events_by_band(events, wt, dtf, H), None, 128, 1)
    for k in (2, 4):
        variants[f"tile512+row/k{k}"] = (
            pack_events_by_tile(events, wt, dtf, H, W, chunk=512), n_col_bands(W), 128, k,
        )
    variants["tile1024+row/k2"] = (
        pack_events_by_tile(events, wt, dtf, H, W, chunk=1024), n_col_bands(W), 128, 2,
    )
    variants["band512+row/k2"] = (pack_events_by_band(events, wt, dtf, H), None, 128, 2)
    for rw in (96, 112):
        variants[f"tile1024+row{rw}"] = (
            pack_events_by_tile(events, wt, dtf, H, W, chunk=1024), n_col_bands(W), rw, 1,
        )

    # cost decomposition: t(full) = ovh + gather + vote;
    # t(orig) = ovh + vote; t(2off) = ovh + gather + 2*vote
    variants["tile1024+row/orig"] = (
        pack_events_by_tile(events, wt, dtf, H, W, chunk=1024), n_col_bands(W), 128, 1,
        (), True,
    )
    variants["tile1024+row/2off"] = (
        pack_events_by_tile(events, wt, dtf, H, W, chunk=1024), n_col_bands(W), 128, 1,
        (0.5, 1.0), False,
    )

    # ad-hoc spec: "tileC[:RW[:s]]" e.g. tile1536:96, tile1024:96:s
    # (trailing ":s" = stack_uv: pre-interleaved hi/lo-bf16 gather table);
    # "flexC[:RW]" = fill-balanced variable-height row bands (v7)
    for arg in sys.argv[1:]:
        if arg.startswith("tile") and arg not in variants:
            parts = arg[4:].split(":")
            chunk = int(parts[0])
            rw = int(parts[1]) if len(parts) > 1 else 128
            stk = len(parts) > 2 and parts[2] == "s"
            variants[arg] = (
                pack_events_by_tile(events, wt, dtf, H, W, chunk=chunk),
                n_col_bands(W), rw, 1, (0.5,), False, stk, 64,
            )
        elif arg.startswith("flex") and arg not in variants:
            parts = arg[4:].split(":")
            chunk = int(parts[0])
            rw = int(parts[1]) if len(parts) > 1 else 128
            variants[arg] = (
                pack_events_by_tile_flex(events, wt, dtf, H, W, chunk=chunk),
                n_col_bands(W), rw, 1, (0.5,), False, False, FLEX_ROW_SCALE,
            )
        elif arg.startswith("preflex") and arg not in variants:
            # "preflexC[:RW]": v9 streamed precomputed gather one-hots
            # (HBM tables instead of per-step VPU builds) on flex packing
            parts = arg[len("preflex"):].split(":")
            chunk = int(parts[0])
            rw = int(parts[1]) if len(parts) > 1 else 128
            variants[arg] = (
                pack_events_by_tile_flex(events, wt, dtf, H, W, chunk=chunk),
                n_col_bands(W), rw, 1, (0.5,), False, False, FLEX_ROW_SCALE,
                False, True,
            )
        elif arg.startswith("tent") and arg not in variants:
            # "tentflexC[:RW]": v8 bf16 tent-arithmetic vote blocks on
            # flex packing; "tentallflexC[:RW]": tent the backward's
            # dot-consumed column blocks too (tent="all")
            if arg.startswith("tentallflex"):
                rest, tent = arg[len("tentallflex"):], "all"
            elif arg.startswith("tentflex"):
                rest, tent = arg[len("tentflex"):], True
            else:
                raise SystemExit(
                    f"unrecognized tent variant {arg!r}: expected "
                    f"tentflexC[:RW] or tentallflexC[:RW]"
                )
            parts = rest.split(":")
            chunk = int(parts[0])
            rw = int(parts[1]) if len(parts) > 1 else 128
            variants[arg] = (
                pack_events_by_tile_flex(events, wt, dtf, H, W, chunk=chunk),
                n_col_bands(W), rw, 1, (0.5,), False, False, FLEX_ROW_SCALE,
                tent,
            )

    names = sys.argv[1:] or list(variants)
    runners = {}
    for name in names:
        spec = variants[name]
        packed, cb, rw, k = spec[:4]
        offs, orig = (spec[4], spec[5]) if len(spec) > 4 else ((0.5,), False)
        stk = spec[6] if len(spec) > 6 else False
        rs = spec[7] if len(spec) > 7 else 64
        tent = spec[8] if len(spec) > 8 else False
        pre = spec[9] if len(spec) > 9 else False
        g = packed[0].shape[0]
        runners[name] = make_runner(packed, cb, rw, k=k, offsets=offs,
                                    include_orig=orig, stack_uv=stk, row_scale=rs,
                                    tent=tent, pregather=pre)
        print(f"{name}: G={g} chunks", flush=True)

    # compile + calibrate
    est = {}
    for name, run in runners.items():
        t0 = time.perf_counter()
        float(run(8, flow))
        print(f"{name}: compile+8 iters {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter(); float(run(64, flow)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(512, flow)); b = time.perf_counter() - t0
        est[name] = max((b - a) / 448, 1e-6)

    # interleaved slope samples
    results = {name: [] for name in runners}
    for rep in range(3):
        for name, run in runners.items():
            di = int(min(max(np.ceil(0.8 / est[name]), 256), 100_000))
            i1, i2 = di // 4, di // 4 + di
            f = flow + 0.013 * (rep + 1)
            t0 = time.perf_counter(); float(run(i1, f)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(i2, f)); b = time.perf_counter() - t0
            results[name].append((b - a) / (i2 - i1))
    print()
    for name, ms in results.items():
        ms = sorted(m for m in ms if m > 0)
        med = ms[len(ms) // 2] if ms else float("nan")
        print(
            f"{name:16s} median {med*1e3:.4f} ms/iter = "
            f"{n_events/med/1e6:.0f} Mev/s   samples={[f'{m*1e3:.4f}' for m in ms]}"
        )


if __name__ == "__main__":
    main()
