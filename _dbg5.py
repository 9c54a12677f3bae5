import numpy as np, sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_evflow_tests")
import jax.numpy as jnp, scipy.optimize
sys.path.insert(0, "tests")
from test_solver import _synthetic_events, _spec
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events

gt = np.array([12.0, -8.0])
ev = _synthetic_events(gt)
padded, wgt = pad_events(ev, target_n=4096)
events, weights = jnp.asarray(padded), jnp.asarray(wgt)
obj = build_objective(_spec(False))
f = jax.jit(lambda x: obj(x, events, weights)[0])
fg = jax.jit(jax.value_and_grad(lambda x: obj(x, events, weights)[0]))
def hvp(x, p):
    return jax.grad(lambda xx: jnp.vdot(jax.grad(lambda m: obj(m, events, weights)[0])(xx), p))(x)
hvpj = jax.jit(hvp)

trace = []
def fun(x):
    v, g = fg(jnp.asarray(x))
    trace.append((float(v), np.abs(np.asarray(g)).max()))
    return float(v), np.asarray(g, np.float64)
res = scipy.optimize.minimize(fun, np.zeros(8), jac=True, method="Newton-CG",
    hessp=lambda x, p: np.asarray(hvpj(jnp.asarray(x), jnp.asarray(p)), np.float64),
    options={"maxiter": 20, "xtol": 1e-5})
print("scipy result x:", res.x.round(2), "f:", res.fun, "nit:", res.nit)
print("first 8 evals:", [(round(v,5), round(g,4)) for v, g in trace[:8]])
