import numpy as np, logging, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
logging.disable(logging.INFO)
H, W = 68, 84
def synth(gt, seed, n=8000):
    rng = np.random.default_rng(seed)
    n_dots = 120
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
for ta in (False, True):
    slv_cfg = {"method": "x", "time_aware": ta,
      "patch": {"initialize": "zero", "scale": 3, "crop_height": 64, "crop_width": 80, "filter_type": "bilinear"},
      "motion_model": "2d-translation", "warp_direction": "first",
      "parameters": ["trans_x","trans_y"], "cost": "hybrid", "outer_padding": 0,
      "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
      "iwe": {"method": "bilinear_vote", "blur_sigma": 1}, "precision": "64"}
    if ta:
        slv_cfg.update({"time_bin": 10, "flow_interpolation": "burgers", "t0_flow_location": "middle"})
    opt_cfg = {"n_iter": 16, "method": "Newton-CG", "max_iter": 15,
      "parameters": {"trans_x": {"min": -40, "max": 40}, "trans_y": {"min": -40, "max": 40}}}
    solv = solver.collections["pyramidal_patch_contrast_maximization"]((H,W), {}, slv_cfg, opt_cfg, {}, None)
    gt = np.array([25.0, -18.0])
    ev = synth(gt, 0)
    best = solv.optimize(ev)
    fin = best[max(best)]
    print(f"TA={ta}: halves u=({fin[0][:, :2].mean():.1f},{fin[0][:, 2:].mean():.1f}) v=({fin[1][:, :2].mean():.1f},{fin[1][:, 2:].mean():.1f}) vs ±({gt[0]},{gt[1]})", flush=True)
