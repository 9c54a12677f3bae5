import time, numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
from event_based_optical_flow_tpu.ops.pallas_objective import fused_multi_iwe
from event_based_optical_flow_tpu.types import pad_events

H, W = 260, 346
n = 30720
rng = np.random.default_rng()
ev = np.stack([np.round(rng.uniform(0, H-1, n)), np.round(rng.uniform(0, W-1, n)),
               np.sort(rng.uniform(0, 0.25, n)), rng.integers(0,2,n).astype(float)], 1)
padded, wgt = pad_events(ev, target_n=30720)
dtf = (padded[:,2]-ev[:,2].min())/(ev[:,2].max()-ev[:,2].min())
x2, y2, d2, w2, bands = PB.pack_events_by_band(padded, wgt, dtf, H)
args = tuple(jnp.asarray(a, jnp.float32) for a in (x2, y2, d2, w2)) + (jnp.asarray(bands),)
events = jnp.asarray(padded, jnp.float32); weights = jnp.asarray(wgt, jnp.float32)
flow = jnp.asarray(rng.uniform(-30, 30, (2, H, W)), jnp.float32)

def slope(name, fn, it=(8, 40)):
    times = {}
    for ITERS in it:
        @jax.jit
        def run(flow):
            def body(i, acc):
                f = flow + (i * 1e-3 + acc * 1e-20)
                return acc + fn(f)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        float(run(flow))
        best = 1e9
        for k in range(3):
            fl = flow + 0.01*(k+1)
            t0 = time.perf_counter(); float(run(fl)); best = min(best, time.perf_counter()-t0)
        times[ITERS] = best
    marg = (times[it[1]] - times[it[0]]) / (it[1] - it[0])
    print(f"{name}: {marg*1e3:.3f} ms/iter -> {n/marg/1e6:.0f} Mev/s", flush=True)

# bench shape: 1 warped image, no orig
slope("banded fwd4", lambda f: PB.fused_multi_iwe_banded(f, *args, (H, W), (0.0,1.0,0.5), True, 1e-6, True).sum())
#slope("banded 1-dir bf16", lambda f: PB.fused_multi_iwe_banded(f, *args, (H, W), (0.5,), False, 1e-6, True).sum())
slope("v1     fwd4", lambda f: fused_multi_iwe(events, f, (H, W), weights=weights, use_bf16=True).sum())
#slope("v1     1-dir bf16", lambda f: fused_multi_iwe(events, f, (H, W), offsets=(0.5,), weights=weights, include_orig=False, use_bf16=True).sum())
# objective shape: orig + 3 warps, fwd+bwd
tgt = jnp.asarray(rng.standard_normal((4, H, W)), jnp.float32)
gb = jax.grad(lambda f: jnp.vdot(PB.fused_multi_iwe_banded(f, *args, (H, W), (0.0,1.0,0.5), True, 1e-6, True), tgt))
slope("banded obj fwd+bwd", lambda f: gb(f).sum(), it=(4, 16))
gv = jax.grad(lambda f: jnp.vdot(fused_multi_iwe(events, f, (H, W), weights=weights, use_bf16=True), tgt))
slope("v1     obj fwd+bwd", lambda f: gv(f).sum(), it=(4, 16))
