import numpy as np, sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_evflow_tests")
import jax.numpy as jnp
sys.path.insert(0, "tests")
from test_solver import _synthetic_events, _spec
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events

ev = _synthetic_events(np.array([12.0, -8.0]))
padded, wgt = pad_events(ev, target_n=4096)
events, weights = jnp.asarray(padded), jnp.asarray(wgt)
obj = build_objective(_spec(False))
value_fn = lambda x, e, w: obj(x, e, w)[0]
args = (events, weights)

from event_based_optical_flow_tpu.solver.newton_cg import build_newton_cg
# monkey-patch style: rebuild internals manually
f = lambda x: value_fn(x, *args)
vg = jax.value_and_grad(f)
def hvp(x, p):
    return jax.grad(lambda xx: jnp.vdot(jax.grad(f)(xx), p))(x)

x0 = jnp.zeros(8)
f0, g = vg(x0)
print("f0", float(f0), "|g|", float(jnp.linalg.norm(g)))
# manual CG iteration 0
d = -g; r = g
hd = hvp(x0, d)
curv = float(jnp.vdot(d, hd)); rs = float(jnp.vdot(r, r))
print("curv", curv, "rs", rs, "neg_curv?", curv <= 1e-16*float(jnp.vdot(d,d)))
p = (rs/curv) * d
print("p norm", float(jnp.linalg.norm(p)), "g.p", float(jnp.vdot(g, p)))
print("f(x0+p)", float(f(x0+p)), "armijo rhs", float(f0) + 1e-4*float(jnp.vdot(g,p)))
# full solve
solve = jax.jit(build_newton_cg(value_fn, maxiter=20, cg_maxiter=32))
x, fv, k = solve(x0, *args)
print("solve:", int(k), "iters f", float(fv), "x", np.asarray(x).round(2))

print("\nline search trajectory:")
for k in range(14):
    a = 0.5**k
    fv2 = float(f(x0 + a*p))
    rhs = 4.0 + 1e-4*a*float(jnp.vdot(g,p))
    print(f"  alpha=2^-{k}: f={fv2:.6f} rhs={rhs:.6f} accept={fv2<=rhs}")
