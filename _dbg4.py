import numpy as np, sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_evflow_tests")
import jax.numpy as jnp
sys.path.insert(0, "tests")
from test_solver import _synthetic_events, _spec
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events

gt = np.array([12.0, -8.0])
ev = _synthetic_events(gt)
padded, wgt = pad_events(ev, target_n=4096)
events, weights = jnp.asarray(padded), jnp.asarray(wgt)
spec = _spec(False)
obj = build_objective(spec)
f = lambda x: obj(x, events, weights)[0]
x0 = jnp.zeros(8)
f0, g = jax.value_and_grad(f)(x0)
print("f0", float(f0), "g", np.asarray(g).round(4))
def hvp(x, p):
    return jax.grad(lambda xx: jnp.vdot(jax.grad(f)(xx), p))(x)
H = jnp.stack([hvp(x0, jnp.eye(8)[i]) for i in range(8)])
evals = np.linalg.eigvalsh(np.asarray(H))
print("H eigvals:", evals.round(3))
# emulate one CG + line search
from event_based_optical_flow_tpu.solver import newton_cg as NCG
solve = NCG.build_newton_cg(lambda x, e, w: obj(x, e, w)[0], maxiter=1, cg_maxiter=32)
x1, f1, k = jax.jit(solve)(x0, events, weights)
print("after 1 newton iter: f", float(f1), "x", np.asarray(x1).round(3))
# what about pure gradient direction?
for alpha in (1.0, 0.1, 0.01, 100.0, 1000.0):
    print("alpha", alpha, "f(x0 - a g) =", float(f(x0 - alpha*g)))
