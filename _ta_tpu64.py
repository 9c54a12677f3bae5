import sys, time, logging
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
logging.disable(logging.INFO)
import importlib.util
spec = importlib.util.spec_from_file_location("be", "/root/repo/tools/bench_e2e.py")
be = importlib.util.module_from_spec(spec); spec.loader.exec_module(be)
be.SLV_CFG.update({"time_aware": True, "time_bin": 10, "flow_interpolation": "burgers",
                   "t0_flow_location": "middle", "precision": sys.argv[1] if len(sys.argv)>1 else "64"})
from event_based_optical_flow_tpu import solver
solv = solver.collections["pyramidal_patch_contrast_maximization"]((be.H, be.W), {}, be.SLV_CFG, be.OPT_CFG, {}, None)
for f in range(2):
    ev = be.synth(be.GT, seed=f)
    t0 = time.time(); best = solv.optimize(ev); dt = time.time()-t0
    solv.set_previous_frame_best_estimation(best)
    fin = best[max(best)]
    print(f"TA-TPU-{be.SLV_CFG['precision']} frame {f}: {dt:.1f}s halves u=({fin[0][:, :8].mean():.1f},{fin[0][:, 8:].mean():.1f}) v=({fin[1][:, :8].mean():.1f},{fin[1][:, 8:].mean():.1f})", flush=True)
