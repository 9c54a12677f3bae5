import numpy as np, logging
logging.basicConfig(level=logging.ERROR)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, "tests")
from test_solver import _synthetic_events
from event_based_optical_flow_tpu import solver

gt = np.array([10.0, -8.0])
ev = _synthetic_events(gt, n=4000, h=36, w=44)
print("events:", len(ev), "t range:", ev[:,2].max()-ev[:,2].min())
slv_cfg = {
    "method": "pyramidal_patch_contrast_maximization", "time_aware": False,
    "patch": {"initialize": "zero", "scale": 3, "crop_height": 32, "crop_width": 40, "filter_type": "bilinear"},
    "motion_model": "2d-translation", "warp_direction": "first",
    "parameters": ["trans_x", "trans_y"], "cost": "hybrid", "outer_padding": 0,
    "cost_with_weight": {"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
    "iwe": {"method": "bilinear_vote", "blur_sigma": 1}, "precision": "64",
}
opt_cfg = {"n_iter": 8, "method": "Newton-CG", "max_iter": 10,
    "parameters": {"trans_x": {"min": -25, "max": 25}, "trans_y": {"min": -25, "max": 25}}}
solv = solver.collections["pyramidal_patch_contrast_maximization"]((36, 44), {}, slv_cfg, opt_cfg, {}, None)
best = solv.optimize(ev)
for s, m in best.items():
    print(f"scale {s}: u mean {m[0].mean():.2f} v mean {m[1].mean():.2f}")
    print(np.round(m,1))
