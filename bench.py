#!/usr/bin/env python3
"""Benchmark: fused warp + bilinear-vote IWE throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "warp_bilinear_iwe", "value": <Mevents/s>, "unit": "Mevents/s",
   "vs_baseline": <value / 500>}

The north-star target (BASELINE.json) is >= 500 Mevents/s for the
warp + bilinear-scatter kernel per chip; the reference repo publishes no
numbers (its only perf artifact is a cProfile dump).  Additional detail
lines go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
    from event_based_optical_flow_tpu.ops.warp import warp_dense_flow

    H, W = 260, 346
    n_events = 30720          # MVSEC protocol batch size (padded)
    batch = 32                # frames per launch to saturate the chip

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

    @jax.jit
    def warp_and_iwe(ev, fl):
        warped = warp_dense_flow(ev, fl, ev[..., 2].min(axis=-1), (H, W), normalize_t=True)
        return bilinear_vote(warped, (H, W))

    # warmup / compile
    warp_and_iwe(ev, fl).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = warp_and_iwe(ev, fl)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    total_events = batch * n_events * iters
    meps = total_events / dt / 1e6
    print(
        f"warp+bilinear IWE: {meps:.1f} Mevents/s "
        f"({iters} iters x {batch} frames x {n_events} events in {dt:.3f}s on "
        f"{jax.devices()[0].platform})",
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
