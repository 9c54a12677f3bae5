import time, numpy as np, jax, jax.numpy as jnp
import event_based_optical_flow_tpu.ops.pallas_iwe as P
from event_based_optical_flow_tpu.ops.warp import warp_dense_flow

H, W = 260, 346
n_events = 30720; batch = 8
rng = np.random.default_rng()
def fresh():
    return jnp.asarray(np.stack([rng.uniform(0, H-1, (batch,n_events)), rng.uniform(0, W-1, (batch,n_events)),
        np.sort(rng.uniform(0,0.2,(batch,n_events)),axis=1), rng.integers(0,2,(batch,n_events)).astype(float)],2), jnp.float32)
fl = jnp.asarray(rng.uniform(-30, 30, (batch, 2, H, W)), jnp.float32)

def slope(name, body_fn, it1=8, it2=40):
    times = {}
    for ITERS in (it1, it2):
        @jax.jit
        def run(ev, fl):
            def body(i, acc):
                e = ev.at[..., 0].add(i * 0.013 + acc * 1e-20)
                return acc + body_fn(e, fl)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        float(run(fresh(), fl))
        best = 1e9
        for _ in range(3):
            ev = fresh()
            t0 = time.perf_counter(); float(run(ev, fl)); best = min(best, time.perf_counter()-t0)
        times[ITERS] = best
    marg = (times[it2] - times[it1]) / (it2 - it1)
    print(f"{name}: marginal {marg*1e3:.3f} ms/iter -> {batch*n_events/marg/1e6:.0f} Mev/s (fixed {1e3*(times[it1]-it1*marg):.0f} ms)", flush=True)

def with_warp(vote):
    def f(e, fl):
        warped = warp_dense_flow(e, fl, e[..., 2].min(axis=-1), (H, W), normalize_t=True)
        return vote(warped).sum()
    return f

for chunk in (512, 1024):
    P._CHUNK = chunk
    slope(f"warp+pallas_bf16 c{chunk}", with_warp(lambda w: P.bilinear_vote_pallas(w, (H, W), use_bf16=True)))
slope("vote_only_bf16 c1024", lambda e, fl: P.bilinear_vote_pallas(e, (H, W), use_bf16=True).sum())
slope("warp_only", lambda e, fl: warp_dense_flow(e, fl, e[..., 2].min(axis=-1), (H, W), normalize_t=True).sum())
