"""event_based_optical_flow_tpu — TPU-native contrast-maximization optical flow.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``tub-rip/event_based_optical_flow`` ("Secrets of Event-based Optical Flow",
ECCV 2022 / T-PAMI 2024).  The reference implementation is a dual
numpy/torch CPU/CUDA pipeline; this framework is a single functional JAX
core designed for TPU:

* events are fixed-size padded ``[n, 4]`` arrays with weight masks so that
  every kernel is jit-compilable with static shapes,
* the hot warp→bilinear-vote→IWE path runs on the MXU via a matmul
  ("hat function") formulation, with an exact scatter backend for parity,
* the PDE (upwind / inviscid Burgers) time-aware flow propagation is a
  ``lax.scan``,
* optimizer inner loops are jit-compiled ``value_and_grad`` / HVP
  functions; Optuna-style initialization searches are ``vmap``-ed batched
  sweeps on device,
* multi-device scaling uses ``jax.sharding`` meshes (data-parallel frames,
  event-sharded IWE accumulation with ``psum``).

Layer map (mirrors SURVEY.md §1 for the reference):
  ops/      — warp, IWE rasterization, blur, sobel, tile interpolation (L1)
  costs/    — contrast objectives and registry (L2)
  flow/     — PDE flow propagation, metrics, GT handling (L1/L4)
  solver/   — CMax solvers: mixed, time-aware, pyramidal (L3)
  data/     — dataset loaders (L4)
  models/   — EV-FlowNet (flax) (LX)
  parallel/ — mesh / sharding utilities
  utils/    — event generation, misc
"""

from . import config
from .types import FlowPatch

__version__ = "0.1.0"

__all__ = ["config", "FlowPatch", "__version__"]
