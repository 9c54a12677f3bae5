import time, numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
from event_based_optical_flow_tpu.ops.pallas_iwe import bilinear_vote_pallas
from event_based_optical_flow_tpu.ops.warp import warp_dense_flow

H, W = 260, 346
n_events = 30720; batch = 4
rng = np.random.default_rng(0)
t = np.sort(rng.uniform(0, 0.2, (batch, n_events)), axis=1)
ev = jnp.asarray(np.stack([np.round(rng.uniform(0, H-1, (batch,n_events))),
              np.round(rng.uniform(0, W-1, (batch,n_events))), t,
              rng.integers(0,2,(batch,n_events)).astype(float)], axis=2), jnp.float32)
fl = jnp.asarray(rng.uniform(-30, 30, (batch, 2, H, W)), jnp.float32)

def bench(name, fn, iters=16):
    @jax.jit
    def run(ev, fl):
        def body(i, acc):
            e = ev.at[..., 2].add(acc * 1e-12 + i * 1e-9)
            return acc + fn(e, fl)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    tc = time.perf_counter(); float(run(ev, fl)); tcomp = time.perf_counter()-tc
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(run(ev, fl)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1e3/iters:.2f} ms/iter -> {batch*n_events*iters/best/1e6:.0f} Mev/s (compile {tcomp:.0f}s)", flush=True)

# warp only
bench("warp_only", lambda e, fl: warp_dense_flow(e, fl, e[..., 2].min(axis=-1), (H, W), normalize_t=True).sum())
# IWE only (no warp, raw coords)
bench("iwe_pallas_only", lambda e, fl: bilinear_vote_pallas(e, (H, W)).sum())
bench("iwe_matmul_only", lambda e, fl: bilinear_vote(e, (H, W), backend="matmul").sum())
