import numpy as np, logging, sys
logging.disable(logging.INFO)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_evflow_tests")
sys.path.insert(0, "tests")
from test_solver import _synthetic_events, _mixed_cfg
from event_based_optical_flow_tpu import solver
from event_based_optical_flow_tpu.solver.objective import build_objective
import jax.numpy as jnp

gt = np.array([12.0, -8.0])
ev = _synthetic_events(gt)
for device in (False, True):
    slv_cfg, opt_cfg = _mixed_cfg()
    opt_cfg["device"] = device
    solv = solver.collections["mixed_patch_contrast_maximization"]((24, 32), {}, slv_cfg, opt_cfg, {}, None)
    best = solv.optimize(ev)
    spec = solv._current_spec()
    obj = build_objective(spec)
    evd, wd = solv.prepare_events(ev)
    loss = float(obj(jnp.asarray(best.reshape(-1)), evd, wd)[0])
    print(f"device={device}: mean {best.reshape(2,-1).mean(1)} loss {loss:.6f}")
