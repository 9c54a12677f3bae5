"""Reference pyramid solver wall-clock on synthetic 30k-event frames (CPU)."""
import sys, time, logging
sys.path.insert(0, "/tmp/refshims"); sys.path.insert(0, "/root/reference")
logging.disable(logging.INFO)
import numpy as np

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
    ev = np.stack([np.round(x), np.round(y), t, rng.integers(0,2,n)],1)[ok]
    return ev

from src.solver.patch_contrast_pyramid import PyramidalPatchContrastMaximization
slv_cfg = {
  "method": "pyramidal_patch_contrast_maximization", "time_aware": False,
  "patch": {"initialize": "random", "scale": 5, "crop_height": 256, "crop_width": 336, "filter_type": "bilinear"},
  "motion_model": "2d-translation", "warp_direction": "first",
  "parameters": ["trans_x", "trans_y"], "cost": "hybrid", "outer_padding": 0,
  "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
  "iwe": {"method": "bilinear_vote", "blur_sigma": 1},
}
opt_cfg = {"n_iter": 40, "method": "Newton-CG", "max_iter": 25,
  "parameters": {"trans_x": {"min": -150, "max": 150}, "trans_y": {"min": -150, "max": 150}}}
solv = PyramidalPatchContrastMaximization((H, W), {}, slv_cfg, opt_cfg, {}, None)

times = []
for f in range(2):
    ev = synth(np.array([25.0, -18.0]), seed=f)
    t0 = time.time()
    best = solv.optimize(ev)
    dt = time.time() - t0
    times.append(dt)
    solv.set_previous_frame_best_estimation(best)
    finest = best[max(best)]
    print(f"REF frame {f}: {dt:.1f}s; finest mean u={finest[0].mean():.1f} v={finest[1].mean():.1f}", flush=True)
print(f"REF steady-state: {times[-1]:.1f}s/frame", flush=True)
np.save("/tmp/ref_e2e_times.npy", np.array(times))
