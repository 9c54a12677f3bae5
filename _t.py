import numpy as np, jax, jax.numpy as jnp
from event_based_optical_flow_tpu.ops.pallas_objective import fused_multi_iwe
from event_based_optical_flow_tpu.ops.warp import multi_direction_dense_warp
from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
from event_based_optical_flow_tpu.types import pad_events
H, W = 64, 80
rng = np.random.default_rng(0)
ev = np.stack([np.round(rng.uniform(0, H-1, 3000)), np.round(rng.uniform(0, W-1, 3000)),
               np.sort(rng.uniform(0, 0.3, 3000)), rng.integers(0,2,3000).astype(float)], 1)
padded, wgt = pad_events(ev, target_n=4096)
events = jnp.asarray(padded, jnp.float32); weights = jnp.asarray(wgt, jnp.float32)
flow = jnp.asarray(rng.uniform(-10, 10, (2, H, W)), jnp.float32)
def unfused(flow):
    warped = multi_direction_dense_warp(events, flow, [0.0, 1.0, 0.5], (H, W), weights=weights)
    imgs = [bilinear_vote(events, (H, W), weight=weights, backend="matmul")]
    imgs += [bilinear_vote(w, (H, W), weight=weights, backend="matmul") for w in warped]
    return jnp.stack(imgs)
def fused(flow):
    return fused_multi_iwe(events, flow, (H, W), offsets=(0.0,1.0,0.5), weights=weights, use_bf16=False)
a = np.asarray(jax.jit(unfused)(flow)); b = np.asarray(jax.jit(fused)(flow))
print("fwd f32 max err:", np.abs(a-b).max())
tgt = jnp.asarray(rng.standard_normal((4, H, W)), jnp.float32)
gu = np.asarray(jax.jit(jax.grad(lambda f: jnp.vdot(unfused(f), tgt)))(flow))
try:
    gf = np.asarray(jax.jit(jax.grad(lambda f: jnp.vdot(fused(f), tgt)))(flow))
    print("grad max err:", np.abs(gu-gf).max(), "scale:", np.abs(gu).max())
except Exception as e:
    import traceback; traceback.print_exc()
bb = np.asarray(jax.jit(lambda f: fused_multi_iwe(events, f, (H, W), offsets=(0.0,1.0,0.5), weights=weights, use_bf16=True))(flow))
print("bf16 fwd max abs err:", np.abs(a-bb).max())
