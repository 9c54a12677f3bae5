import time, numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.ops.pallas_iwe import bilinear_vote_pallas
from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
H, W = 260, 346
n_events = 30720; batch = 8
rng = np.random.default_rng()  # time-seeded: fresh inputs every process
def fresh():
    return jnp.asarray(np.stack([rng.uniform(0, H-1, (batch,n_events)), rng.uniform(0, W-1, (batch,n_events)),
        np.sort(rng.uniform(0,0.2,(batch,n_events)),axis=1), rng.integers(0,2,(batch,n_events)).astype(float)],2), jnp.float32)

def bench(name, fn, iters_list=(8, 24)):
    for ITERS in iters_list:
        @jax.jit
        def run(ev):
            def body(i, acc):
                e = ev.at[..., 0].add(i * 0.013 + acc * 1e-20)  # real coordinate shifts per iter
                return acc + fn(e).sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        float(run(fresh()))
        best=1e9
        for _ in range(3):
            ev = fresh()
            t0=time.perf_counter(); float(run(ev)); best=min(best,time.perf_counter()-t0)
        print(f"{name} iters={ITERS}: {batch*n_events*ITERS/best/1e6:.0f} Mev/s ({best*1e3/ITERS:.3f} ms/iter)", flush=True)

bench("pallas_f32", lambda e: bilinear_vote_pallas(e, (H, W)))
bench("pallas_bf16", lambda e: bilinear_vote_pallas(e, (H, W), use_bf16=True))
bench("matmul", lambda e: bilinear_vote(e, (H, W), backend="matmul"), iters_list=(8,))
