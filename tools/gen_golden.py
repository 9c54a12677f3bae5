#!/usr/bin/env python3
"""Generate golden parity fixtures from the reference implementation.

Run with the reference repo available (and the torchvision/optuna shims on
sys.path if those packages are absent):

    PYTHONPATH=/tmp/refshims:/root/reference python tools/gen_golden.py

The outputs under tests/golden/ are committed; the test suite never
imports the reference at runtime.
"""
import os
import sys

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

from src.event_image_converter import EventImageConverter
from src.warp import Warp
from src.utils import flow_utils
from src.utils.stat_utils import SobelTorch
from src.costs import (
    ImageVariance, GradientMagnitude, NormalizedImageVariance,
    NormalizedGradientMagnitude, MultiFocalNormalizedImageVariance,
    MultiFocalNormalizedGradientMagnitude, TotalVariation, HybridCost,
)
from src.solver.patch_contrast_base import PatchContrastMaximization

rng = np.random.default_rng(1234)
H, W = 24, 30
n = 400

events = np.concatenate([
    rng.uniform(-2, H + 2, (n, 1)),
    rng.uniform(-2, W + 2, (n, 1)),
    np.sort(rng.uniform(0.0, 0.25, (n, 1)), axis=0),
    rng.integers(0, 2, (n, 1)).astype(float),
], axis=1)
int_events = events.copy()
int_events[:, 0] = np.clip(np.round(int_events[:, 0]), 0, H - 1)
int_events[:, 1] = np.clip(np.round(int_events[:, 1]), 0, W - 1)

eic = EventImageConverter((H, W), outer_padding=0)
eic_pad = EventImageConverter((H, W), outer_padding=2)
tev = torch.from_numpy(events).double()
iwe = eic.bilinear_vote_tensor(tev).numpy()
iwe_pad = eic_pad.bilinear_vote_tensor(tev).numpy()
iwe_count = eic.count_event_numpy(events)
iwe_blur_torch = eic.create_image_from_events_tensor(tev, sigma=1).numpy()
iwe_blur_scipy = eic.create_image_from_events_numpy(events, sigma=1)

warper = Warp((H, W), normalize_t=True)
warper_nonorm = Warp((H, W), normalize_t=False)
motion2 = np.array([4.0, -3.0])
dense = rng.uniform(-8, 8, (2, H, W))
voxel = rng.uniform(-8, 8, (5, 2, H, W))
tint = torch.from_numpy(int_events).double()
w2dof, _ = warper.warp_event(tint, torch.from_numpy(motion2), "2d-translation", direction="first")
wdense, _ = warper.warp_event(tint, torch.from_numpy(dense), "dense-flow", direction="middle")
wvox, _ = warper.warp_event(tint, torch.from_numpy(voxel), "dense-flow-voxel", direction=0.3)
w2dof_nonorm, _ = warper_nonorm.warp_event(tint, torch.from_numpy(motion2), "2d-translation", direction="last")

# costs (torch path, double precision as in the reference optimizer)
iwe_t = torch.from_numpy(iwe).double()
orig_t = torch.from_numpy(iwe_blur_torch).double()
flow_t = torch.from_numpy(dense).double()
costs_out = {}
for omit in (True, False):
    arg = {"iwe": iwe_t, "orig_iwe": orig_t, "omit_boundary": omit,
           "forward_iwe": iwe_t, "backward_iwe": orig_t * 0.7 + iwe_t * 0.3,
           "middle_iwe": iwe_t * 1.1, "flow": flow_t}
    suffix = "omit" if omit else "full"
    costs_out[f"image_variance_{suffix}"] = float(ImageVariance(precision="64").calculate(arg))
    costs_out[f"gradient_magnitude_{suffix}"] = float(GradientMagnitude(precision="64").calculate(arg))
    costs_out[f"norm_image_variance_{suffix}"] = float(NormalizedImageVariance(precision="64").calculate(arg))
    costs_out[f"norm_grad_mag_{suffix}"] = float(NormalizedGradientMagnitude(precision="64").calculate(arg))
    costs_out[f"mf_norm_image_variance_{suffix}"] = float(MultiFocalNormalizedImageVariance(precision="64").calculate(arg))
    costs_out[f"mf_norm_grad_mag_{suffix}"] = float(MultiFocalNormalizedGradientMagnitude(precision="64").calculate(arg))
    costs_out[f"total_variation_{suffix}"] = float(TotalVariation(precision="64").calculate(arg))
    costs_out[f"hybrid_{suffix}"] = float(HybridCost(
        direction="minimize",
        cost_with_weight={"multi_focal_normalized_gradient_magnitude": 1.0, "total_variation": 0.01},
        precision="64").calculate(arg))

# reference gradient through the torch objective (for autograd parity)
mot = torch.tensor([2.0, -1.5], dtype=torch.float64, requires_grad=True)
ev_req = torch.from_numpy(int_events).double()
warped, _ = warper.warp_event(ev_req, mot, "2d-translation", direction="middle")
iwe_w = eic.create_image_from_events_tensor(warped, sigma=1)
iwe_o = eic.create_image_from_events_tensor(ev_req, sigma=1)
loss = NormalizedGradientMagnitude(precision="64").calculate(
    {"iwe": iwe_w, "orig_iwe": iwe_o, "omit_boundary": True})
loss.backward()
grad_2dof = mot.grad.detach().numpy()
loss_2dof = float(loss.detach())

# PDE voxels
f0 = rng.uniform(-0.8, 0.8, (2, H, W))
voxes = {}
for scheme in ("upwind", "burgers"):
    for loc in ("first", "middle"):
        voxes[f"voxel_{scheme}_{loc}"] = flow_utils.construct_dense_flow_voxel_numpy(
            f0.copy(), 6, scheme, loc)

# tile -> dense interpolation (torchvision path via shim == real torchvision)
class _Shim: pass
shim = _Shim()
shim.patch_size = (12, 16)
shim.sliding_window = (12, 16)
shim.patch_shift = (2, 3)
shim.motion_vector_size = 2
shim.patch_image_size = (2, 2)
shim.image_shape = (H, W)
shim.filter_type = "bilinear"
tile_motion = rng.uniform(-10, 10, (2, 2, 2))
tile_dense = PatchContrastMaximization.interpolate_dense_flow_from_patch_tensor(
    shim, torch.from_numpy(tile_motion).double().reshape(-1)).numpy()
shim.filter_type = "nearest"
tile_dense_nearest = PatchContrastMaximization.interpolate_dense_flow_from_patch_tensor(
    shim, torch.from_numpy(tile_motion).double().reshape(-1)).numpy()

# flow error metrics (no inf in GT: reference propagates nan through inf*mask)
gt = rng.uniform(-3, 3, (1, 2, H, W))
gt[0, :, :4, :4] = 0
pred = rng.uniform(-3, 3, (1, 2, H, W))
emask = rng.random((1, 1, H, W)) > 0.3
err = flow_utils.calculate_flow_error_numpy(gt, pred, event_mask=emask)

np.savez_compressed(
    os.path.join(OUT, "reference_oracle.npz"),
    events=events, int_events=int_events,
    iwe=iwe, iwe_pad=iwe_pad, iwe_count=iwe_count,
    iwe_blur_torch=iwe_blur_torch, iwe_blur_scipy=iwe_blur_scipy,
    motion2=motion2, dense=dense, voxel=voxel,
    w2dof=w2dof.detach().numpy(), wdense=wdense.detach().numpy(),
    wvox=wvox.detach().numpy(), w2dof_nonorm=w2dof_nonorm.detach().numpy(),
    grad_2dof=grad_2dof, loss_2dof=loss_2dof,
    f0=f0, tile_motion=tile_motion, tile_dense=tile_dense,
    tile_dense_nearest=tile_dense_nearest,
    gt=gt, pred=pred, emask=emask,
    **{f"err_{k}": v for k, v in err.items()},
    **costs_out,
    **voxes,
)
print("golden written:", os.path.join(OUT, "reference_oracle.npz"))
