import numpy as np, sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, ".")
from tests.test_solver import _spec, _synthetic_events
from event_based_optical_flow_tpu.solver.fleet import build_batched_objective, build_newton_cg_batched
from event_based_optical_flow_tpu.solver.newton_cg import build_newton_cg
from event_based_optical_flow_tpu.solver.objective import build_objective
from event_based_optical_flow_tpu.types import pad_events
import dataclasses

spec = _spec(False)
ev = _synthetic_events(np.asarray((10.0, -6.0)), n=2000, seed=10)
p, w = pad_events(ev, target_n=2048)
events1 = jnp.asarray(p)[None]; weights1 = jnp.asarray(w)[None]

batched = build_batched_objective(spec)
bsolve = jax.jit(build_newton_cg_batched(batched, maxiter=25, cg_maxiter=20))
bx, bf, k = bsolve(jnp.zeros((1, 8)), events1, weights1)
print("batched B=1:", np.asarray(bx).reshape(2,4).mean(1), "f", float(bf[0]), "k", int(k))

single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
ssolve = jax.jit(build_newton_cg(lambda x, e, w: single(x, e, w)[0], maxiter=25, cg_maxiter=20))
sx, sf, sk = ssolve(jnp.zeros(8), events1[0], weights1[0])
print("single:     ", np.asarray(sx).reshape(2,4).mean(1), "f", float(sf), "k", int(sk))

ssolve_fd = jax.jit(build_newton_cg(lambda x, e, w: single(x, e, w)[0], maxiter=25, cg_maxiter=20, hvp_mode="fd"))
sx, sf, sk = ssolve_fd(jnp.zeros(8), events1[0], weights1[0])
print("single fd:  ", np.asarray(sx).reshape(2,4).mean(1), "f", float(sf), "k", int(sk))
bsolve_ad = jax.jit(build_newton_cg_batched(batched, maxiter=25, cg_maxiter=20, fd_hvp=False))
bx, bf, k = bsolve_ad(jnp.zeros((1, 8)), events1, weights1)
print("batched ad: ", np.asarray(bx).reshape(2,4).mean(1), "f", float(bf[0]), "k", int(k))
