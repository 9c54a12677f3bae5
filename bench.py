#!/usr/bin/env python3
"""Benchmark: fused warp + bilinear-vote IWE throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "warp_bilinear_iwe", "value": <Mevents/s>, "unit": "Mevents/s",
   "vs_baseline": <value / 500>}

Methodology: the measured region is a single jitted ``lax.fori_loop``
whose iterations are data-dependent (each perturbs the inputs with the
previous result), so neither XLA nor the runtime can dedupe repeated
work, and per-call dispatch latency is amortized away.  The north-star
target (BASELINE.json) is >= 500 Mevents/s for warp + bilinear vote per
chip; the reference repo publishes no numbers (its only perf artifact is
a cProfile dump).  Detail lines go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.ops.pallas_iwe import bilinear_vote_pallas
    from event_based_optical_flow_tpu.ops.warp import warp_dense_flow

    H, W = 260, 346
    n_events = 30720          # MVSEC protocol batch size (padded)
    batch = 8                 # frames per step
    iters = 24

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 0.2, (batch, n_events)), axis=1)
    events = np.stack(
        [
            np.round(rng.uniform(0, H - 1, (batch, n_events))),
            np.round(rng.uniform(0, W - 1, (batch, n_events))),
            t,
            rng.integers(0, 2, (batch, n_events)).astype(np.float64),
        ],
        axis=2,
    )
    flow = rng.uniform(-30, 30, (batch, 2, H, W))
    ev = jnp.asarray(events, jnp.float32)
    fl = jnp.asarray(flow, jnp.float32)

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def run(ev, fl):
        def body(i, acc):
            e = ev.at[..., 0].add(i * 0.013 + acc * 1e-20)
            warped = warp_dense_flow(e, fl, e[..., 2].min(axis=-1), (H, W), normalize_t=True)
            if use_pallas:
                iwe = bilinear_vote_pallas(warped, (H, W))
            else:
                from event_based_optical_flow_tpu.ops.iwe import bilinear_vote

                iwe = bilinear_vote(warped, (H, W))
            return acc + iwe.sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # NOTE: synchronize via host transfer (float()); block_until_ready does
    # not reliably wait through tunneled PJRT runtimes.
    t0 = time.perf_counter()
    float(run(ev, fl))
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        ev = ev.at[..., 0].add(0.07)  # genuinely new inputs each timed call
        t0 = time.perf_counter()
        float(run(ev, fl))
        best = min(best, time.perf_counter() - t0)

    total_events = batch * n_events * iters
    meps = total_events / best / 1e6
    print(
        f"warp+bilinear IWE: {meps:.1f} Mevents/s "
        f"({iters} iters x {batch} frames x {n_events} events in {best:.3f}s, "
        f"compile {compile_s:.0f}s, backend={jax.default_backend()}, pallas={use_pallas})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "warp_bilinear_iwe",
        "value": round(meps, 1),
        "unit": "Mevents/s",
        "vs_baseline": round(meps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
