import time, numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.solver.objective import ObjectiveSpec, build_objective
from event_based_optical_flow_tpu.types import pad_events

H, W = 260, 346
def spec_for(grid):
    return ObjectiveSpec(
        image_shape=(H, W), outer_padding=0,
        patch_image_size=grid, patch_size=(256//grid[0], 336//grid[1]),
        sliding_window=(256//grid[0], 336//grid[1]),
        patch_shift=(2, 5), filter_type="bilinear", iwe_method="bilinear_vote",
        blur_sigma=1, cost_name="hybrid",
        cost_with_weight=(("multi_focal_normalized_gradient_magnitude", 1.0), ("total_variation", 0.01)),
    )
rng = np.random.default_rng(0)
ev = np.stack([np.round(rng.uniform(0, H-1, 30000)), np.round(rng.uniform(0, W-1, 30000)),
               np.sort(rng.uniform(0, 0.2, 30000)), rng.integers(0,2,30000).astype(float)], 1)
padded, wgt = pad_events(ev, target_n=30720)
events = jnp.asarray(padded, jnp.float32); weights = jnp.asarray(wgt, jnp.float32)

grid = (16, 16)
obj = build_objective(spec_for(grid))
M = 2 * grid[0] * grid[1]
x0 = jnp.asarray(rng.uniform(-20, 20, M), jnp.float32)

ITERS = 32
@jax.jit
def many_vg(x0, events, weights):
    def body(i, carry):
        x, acc = carry
        (loss, _), grad = jax.value_and_grad(obj, has_aux=True)(x, events, weights)
        return (x - 1e-4 * grad, acc + loss)
    return jax.lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0.0)))

t0=time.perf_counter(); r = many_vg(x0, events, weights); jax.block_until_ready(r); tc = time.perf_counter()-t0
best=1e9
for _ in range(3):
    t0=time.perf_counter(); r = many_vg(x0, events, weights); jax.block_until_ready(r)
    best=min(best, time.perf_counter()-t0)
print(f"value_and_grad (varying): {best*1e3/ITERS:.2f} ms/eval (compile {tc:.0f}s), loss_sum={float(r[1]):.3f}", flush=True)
