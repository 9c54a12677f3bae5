import time, numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.solver.objective import ObjectiveSpec, build_objective
from event_based_optical_flow_tpu.types import pad_events
from event_based_optical_flow_tpu import config as evcfg

H, W = 260, 346
spec = ObjectiveSpec(
    image_shape=(H, W), outer_padding=0,
    patch_image_size=(16, 16), patch_size=(16, 21), sliding_window=(16, 21),
    patch_shift=(2, 5), filter_type="bilinear", iwe_method="bilinear_vote",
    blur_sigma=1, cost_name="hybrid",
    cost_with_weight=(("multi_focal_normalized_gradient_magnitude", 1.0), ("total_variation", 0.01)),
)
rng = np.random.default_rng()
def fresh_events():
    ev = np.stack([np.round(rng.uniform(0, H-1, 30000)), np.round(rng.uniform(0, W-1, 30000)),
                   np.sort(rng.uniform(0, 0.2, 30000)), rng.integers(0,2,30000).astype(float)], 1)
    p, wgt = pad_events(ev, target_n=30720)
    return jnp.asarray(p, jnp.float32), jnp.asarray(wgt, jnp.float32)

for backend in ("pallas", "pallas_bf16", "matmul"):
    evcfg.set_iwe_backend(backend)
    obj = build_objective(spec)
    def vg_step(x, events, weights):
        (loss, _), grad = jax.value_and_grad(obj, has_aux=True)(x, events, weights)
        return loss, grad
    times = {}
    for ITERS in (4, 16):
        @jax.jit
        def run(x0, events, weights):
            def body(i, carry):
                x, acc = carry
                loss, grad = vg_step(x, events, weights)
                return (x - 0.05 * grad, acc + loss)
            return jax.lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0.0)))[1]
        ev, wt = fresh_events()
        x0 = jnp.asarray(rng.uniform(-20, 20, 512), jnp.float32)
        float(run(x0, ev, wt))
        best = 1e9
        for _ in range(3):
            ev, wt = fresh_events()
            t0 = time.perf_counter(); float(run(x0, ev, wt)); best = min(best, time.perf_counter()-t0)
        times[ITERS] = best
    marg = (times[16] - times[4]) / 12
    print(f"{backend}: value_and_grad {marg*1e3:.2f} ms/eval (fixed {1e3*(times[4]-4*marg):.0f} ms)", flush=True)
