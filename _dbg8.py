import numpy as np, sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, ".")
from tests.test_solver import _spec, _synthetic_events
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events
import dataclasses, functools

spec = _spec(False)
ev = _synthetic_events(np.asarray((10.0, -6.0)), n=2000, seed=10)
p, w = pad_events(ev, target_n=2048)
events1 = jnp.asarray(p); weights1 = jnp.asarray(w)
single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
value_fn = lambda x, e, w: single(x, e, w)[0]

import event_based_optical_flow_tpu.solver.newton_cg as N

for scale in (1e-3, 0.1, 0.5, 1.0):
    src = open("event_based_optical_flow_tpu/solver/newton_cg.py").read()
    # quick param sweep by building with modified eps via monkeypatched builder
    def build(scale=scale):
        def wrapper(*a, **k):
            return N.build_newton_cg(*a, **k)
        return wrapper
    # easier: temporarily patch the eps line via exec of a closure
    def build_ncg_eps(value_fn, eps_scale):
        base = N.build_newton_cg(value_fn, maxiter=25, cg_maxiter=20, hvp_mode="fd")
        return base
    # direct approach: modify module-level behavior via env-like global
    N._FD_EPS_SCALE = scale
    solve = jax.jit(N.build_newton_cg(value_fn, maxiter=25, cg_maxiter=20, hvp_mode="fd"))
    x, f, k = solve(jnp.zeros(8), events1, weights1)
    print(f"eps-scale {scale}: f {float(f):.4f} k {int(k)} x {np.asarray(x).reshape(2,4).mean(1).round(2)}")
