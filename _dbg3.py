import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from event_based_optical_flow_tpu.solver.newton_cg import build_newton_cg

# convex quadratic: f = 0.5 x'Ax - b'x
rng = np.random.default_rng(0)
Q = rng.standard_normal((8, 8)); A = Q @ Q.T + 0.5*np.eye(8)
b = rng.standard_normal(8)
Aj, bj = jnp.asarray(A), jnp.asarray(b)
f = lambda x: 0.5*x @ Aj @ x - bj @ x
solve = jax.jit(build_newton_cg(lambda x: f(x), maxiter=25, cg_maxiter=32))
x, fv, k = solve(jnp.zeros(8))
x_star = np.linalg.solve(A, b)
print("quadratic: iters", int(k), "err", float(jnp.abs(x - jnp.asarray(x_star)).max()))

# rosenbrock
def rosen(x):
    return jnp.sum(100.0*(x[1:]-x[:-1]**2)**2 + (1-x[:-1])**2)
solve = jax.jit(build_newton_cg(lambda x: rosen(x), maxiter=60, cg_maxiter=50))
x, fv, k = solve(jnp.zeros(6))
print("rosenbrock: iters", int(k), "f", float(fv), "x[0]", float(x[0]))
