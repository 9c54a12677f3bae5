import time, logging, numpy as np
logging.disable(logging.INFO)
H, W = 260, 346
def synth(gt, seed, n=30000):
    rng = np.random.default_rng(seed)
    n_dots = 400
    dx = rng.uniform(2, H-2, n_dots); dy = rng.uniform(2, W-2, n_dots)
    idx = rng.integers(0, n_dots, n)
    t = np.sort(rng.uniform(0, 0.25, n))
    xs = dx[idx] + rng.normal(0, 0.2, n); ys = dy[idx] + rng.normal(0, 0.2, n)
    right = dy[idx] > W/2
    u = np.where(right, gt[0], -gt[0]); v = np.where(right, gt[1], -gt[1])
    x = xs - t*u; y = ys - t*v
    ok = (x>=0)&(x<H-1)&(y>=0)&(y<W-1)
    return np.stack([np.round(x), np.round(y), t, rng.integers(0,2,n)],1)[ok]

from event_based_optical_flow_tpu import solver
from event_based_optical_flow_tpu.solver import patch_base, pyramid as pyr
import event_based_optical_flow_tpu.solver.patch_base as PB

# instrument
orig_newton = PB.PatchContrastMaximization._run_newton_device
orig_search = PB.PatchContrastMaximization.initialize_guess_from_patch_search
times = {"newton": [], "search": []}
def timed_newton(self, *a, **k):
    t0=time.time(); r = orig_newton(self, *a, **k); times["newton"].append(time.time()-t0); return r
def timed_search(self, *a, **k):
    t0=time.time(); r = orig_search(self, *a, **k); times["search"].append(time.time()-t0); return r
PB.PatchContrastMaximization._run_newton_device = timed_newton
PB.PatchContrastMaximization.initialize_guess_from_patch_search = timed_search

slv_cfg = {"method": "x", "time_aware": False,
  "patch": {"initialize": "random", "scale": 5, "crop_height": 256, "crop_width": 336, "filter_type": "bilinear"},
  "motion_model": "2d-translation", "warp_direction": "first",
  "parameters": ["trans_x","trans_y"], "cost": "hybrid", "outer_padding": 0,
  "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
  "iwe": {"method": "bilinear_vote", "blur_sigma": 1}}
opt_cfg = {"n_iter": 40, "method": "Newton-CG", "max_iter": 25,
  "parameters": {"trans_x": {"min": -150, "max": 150}, "trans_y": {"min": -150, "max": 150}}}
solv = solver.collections["pyramidal_patch_contrast_maximization"]((H,W), {}, slv_cfg, opt_cfg, {}, None)
for f in range(2):
    ev = synth(np.array([25.0,-18.0]), seed=f)
    t0 = time.time(); best = solv.optimize(ev); dt = time.time()-t0
    solv.set_previous_frame_best_estimation(best)
    print(f"frame {f}: total {dt:.1f}s newton {[round(x,1) for x in times['newton']]} search {[round(x,1) for x in times['search']]}", flush=True)
    times["newton"].clear(); times["search"].clear()
