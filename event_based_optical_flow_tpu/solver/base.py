"""Solver base: config plumbing, optimizer dispatch, metrics (AEE/FWL).

Mirrors the reference ``src/solver/base.py`` config surface: same YAML
keys, same optimizer-name families (scipy methods, torch-style first-order
names mapped to optax, 'optuna' mapped to the device sampling search),
same warm-start and metric semantics.  Everything numeric runs as jitted
jax; the class holds configuration and host-side orchestration only.
"""

import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import costs as costs_mod
from ..costs import functional as F
from ..flow.metrics import calculate_flow_error_numpy
from ..ops.iwe import EventImageConverter
from ..ops.warp import Warp
from ..types import pad_events
from ..utils.misc import check_key_and_bool

logger = logging.getLogger(__name__)

# torch.optim names (reference base.py:38-52) -> optax constructors
TORCH_OPTIMIZERS = [
    "Adadelta",
    "Adagrad",
    "Adam",
    "AdamW",
    "SparseAdam",
    "Adamax",
    "ASGD",
    "LBFGS",
    "NAdam",
    "RAdam",
    "RMSprop",
    "Rprop",
    "SGD",
]


def _optax_factory(name: str, lr: float):
    import optax

    table = {
        "Adadelta": optax.adadelta,
        "Adagrad": optax.adagrad,
        "Adam": optax.adam,
        "AdamW": optax.adamw,
        "SparseAdam": optax.adam,
        "Adamax": optax.adamax,
        "ASGD": optax.sgd,
        "NAdam": optax.nadam,
        "RAdam": optax.radam,
        "RMSprop": optax.rmsprop,
        "Rprop": optax.rprop,
        "SGD": optax.sgd,
        "LBFGS": optax.lbfgs,
    }
    if name not in table:
        raise NotImplementedError(f"Optimizer {name} is not supported")
    return table[name](lr)


class SolverBase:
    """Base class for solvers (reference src/solver/base.py:87-915).

    Params:
        image_shape (tuple) ... (H, W)
        calibration_parameter (dict)
        solver_config / optimizer_config / output_config (dict) ... same
            YAML schema as the reference configs.
        visualize_module ... visualizer.Visualizer or None
    """

    def __init__(
        self,
        image_shape: tuple,
        calibration_parameter: dict = {},
        solver_config: dict = {},
        optimizer_config: dict = {},
        output_config: dict = {},
        visualize_module=None,
    ):
        self.image_shape = tuple(image_shape)
        self.padding = int(solver_config.get("outer_padding", 0))
        self.calib_param = calibration_parameter
        self.opt_config = optimizer_config
        self.opt_method = optimizer_config["method"]
        self.sampling_method = optimizer_config.get("sampler", "TPE")
        self.slv_config = solver_config
        self.out_config = output_config
        self.iwe_config = solver_config["iwe"]
        self.visualizer = visualize_module
        self.precision = str(solver_config.get("precision", "32"))
        self.dtype = jnp.float64 if self.precision == "64" else jnp.float32
        self.iwe_backend = solver_config.get("iwe_backend", None)
        self._setup_parallel(solver_config.get("parallel") or {})

        self.setup_cost_func()

        self.normalize_t_in_batch = True
        self.imager = EventImageConverter(self.image_shape, outer_padding=self.padding)
        self.warper = Warp(self.image_shape, normalize_t=self.normalize_t_in_batch,
                           calib_param=self.calib_param)
        self.warp_direction = solver_config.get("warp_direction", "first")

        self.previous_frame_best_estimation = None
        self.motion_model = solver_config["motion_model"]
        self.motion_model_keys = self.warper.get_key_names(self.motion_model)
        self.motion_vector_size = self.warper.get_motion_vector_size(self.motion_model)
        self.param_keys = solver_config.get("parameters", self.motion_model_keys)
        self.setup_time_aware()

        self.iwe_visualize_max_scale = solver_config.get("max_scale", 50)
        self._rng = np.random.default_rng(solver_config.get("seed", 0))
        self._fwl_cache: Dict = {}
        logger.info(f"Solver config: {solver_config}; optimizer: {optimizer_config}")

    # --- configuration -----------------------------------------------------
    def _setup_parallel(self, parallel_config: dict):
        """Build the ("data", "event") device mesh from the ``parallel:``
        config block (no reference counterpart — the reference is strictly
        single-device, SURVEY §2.10).  ``event: M`` shards each frame's
        packed event chunks over M devices inside the fused objective
        (partial IWEs psum-combined over ICI); ``data: N`` is the frame
        axis used by fleet/batched paths.  With no block (or 1x1) the
        solver stays single-device and no mesh is created."""
        self.parallel_config = parallel_config
        self.mesh = None
        self.n_event_shards = 1
        if not parallel_config:
            return
        data = int(parallel_config.get("data", 1))
        event = int(parallel_config.get("event", 1))
        if data * event <= 1:
            return
        n_avail = len(jax.devices())
        if data * event > n_avail:
            raise ValueError(
                f"config 'parallel' asks for data={data} x event={event} = "
                f"{data * event} devices but only {n_avail} are visible"
            )
        from ..parallel.sharded import make_mesh

        self.mesh = make_mesh(data * event, data=data, event=event)
        self.n_event_shards = event
        logger.info(f"Parallel mesh: data={data}, event={event} over {data * event} devices")

    def setup_cost_func(self):
        if self.slv_config["cost"] == "hybrid":
            self.cost_weight = self.slv_config["cost_with_weight"]
            self.cost_func = costs_mod.HybridCost(
                direction="minimize", cost_with_weight=self.cost_weight, store_history=True
            )
        else:
            self.cost_weight = None
            self.cost_func = costs_mod.functions[self.slv_config["cost"]](
                direction="minimize", store_history=True
            )

    def setup_time_aware(self):
        if check_key_and_bool(self.slv_config, "time_aware"):
            self.is_time_aware = True
            self.motion_model_for_dense_warp = "dense-flow-voxel"
            self.time_bin = self.slv_config["time_bin"]
            self.flow_interpolation = self.slv_config["flow_interpolation"]
            self.t0_flow_location = self.slv_config["t0_flow_location"]
            self.scale_later = check_key_and_bool(self.slv_config, "scale_later")
        else:
            self.is_time_aware = False
            self.motion_model_for_dense_warp = "dense-flow"

    def get_original_flow_from_time_aware_flow_voxel(self, flow_voxel):
        """[(b,) T, 2, H, W] -> the t0 slice (ref base.py:230-250)."""
        flow_voxel = np.asarray(flow_voxel)
        if flow_voxel.ndim == 4:
            flow_voxel = flow_voxel[None]
        orig_ind = 0 if self.t0_flow_location == "first" else flow_voxel.shape[1] // 2
        return np.squeeze(flow_voxel[:, orig_ind])

    # --- motion conversions ------------------------------------------------
    def motion_model_to_motion(self, params: dict) -> np.ndarray:
        return self.warper.motion_model_to_motion(self.motion_model, params)

    def motion_to_motion_model(self, motion) -> dict:
        return self.warper.motion_model_from_motion(motion, self.motion_model)

    def motion_to_dense_flow(self, motion):
        return np.asarray(self.warper.get_flow_from_motion(motion, self.motion_model))

    # --- warm start --------------------------------------------------------
    def set_previous_frame_best_estimation(self, previous_best):
        if isinstance(previous_best, dict):
            self.previous_frame_best_estimation = {
                k: np.copy(np.asarray(v)) for k, v in previous_best.items()
            }
        elif isinstance(previous_best, (list, tuple)) and all(
            isinstance(d, dict) for d in previous_best
        ):
            # per-frame warm motions (fleet chain per-frame mode /
            # multi-stream serving): one per-scale dict per frame
            self.previous_frame_best_estimation = [
                {k: np.copy(np.asarray(v)) for k, v in d.items()}
                for d in previous_best
            ]
        else:
            self.previous_frame_best_estimation = np.copy(np.asarray(previous_best))

    def update_time_scale_for_previous_frame_best_estimation(self, scale: float):
        prev = self.previous_frame_best_estimation
        if isinstance(prev, dict):
            self.previous_frame_best_estimation = {
                k: v * scale for k, v in prev.items()
            }
        elif isinstance(prev, list):
            self.previous_frame_best_estimation = [
                {k: v * scale for k, v in d.items()} for d in prev
            ]
        elif prev is not None:
            self.previous_frame_best_estimation = prev * scale

    # --- initialization ----------------------------------------------------
    def initialize_random(self):
        return self._rng.random(self.motion_vector_size).astype(np.float64) * 0.01 - 0.005

    def initialize_zeros(self):
        return np.zeros(self.motion_vector_size, dtype=np.float64)

    # --- events ------------------------------------------------------------
    def prepare_events(self, events: np.ndarray):
        """Pad to a bucketed static size and move to device."""
        padded, weights = pad_events(np.asarray(events, dtype=np.float64))
        return (
            jnp.asarray(padded, dtype=self.dtype),
            jnp.asarray(weights, dtype=self.dtype),
        )

    # --- metrics -----------------------------------------------------------
    def calculate_flow_error(self, motion, gt_flow, timescale: float = 1.0, events=None) -> dict:
        """AEE/NPE/AE + FWL against GT displacement (ref base.py:543-579).

        gt_flow: [H, W, 2] displacement; motion in pix/s.
        """
        gt_flow = np.transpose(np.asarray(gt_flow), (2, 0, 1))
        pred_flow = self.motion_to_dense_flow(np.asarray(motion) * timescale)
        if self.is_time_aware:
            pred_flow = self.get_original_flow_from_time_aware_flow_voxel(pred_flow)
        pred_flow = pred_flow[None]

        if events is not None:
            event_mask = self._eventmask_np(events)
            fwl = self.calculate_fwl(motion, gt_flow, timescale, events)
            if self.padding > 0:
                event_mask = event_mask[..., self.padding : -self.padding, self.padding : -self.padding]
            event_mask = event_mask[None] if event_mask.ndim == 3 else event_mask
        else:
            event_mask = None
            fwl = {}
        flow_error = calculate_flow_error_numpy(gt_flow[None], pred_flow, event_mask=event_mask)
        flow_error.update(fwl)
        logger.info(f"{flow_error = } for time period {timescale} sec.")
        return flow_error

    def _fwl_fn(self, n_pad: int, use_voxel: bool):
        """Jitted FWL evaluator, cached per (padded size, motion model):
        one device call instead of ~30 eager dispatches per frame."""
        key = (n_pad, use_voxel)
        if key not in self._fwl_cache:
            imager = self.imager
            warper = Warp(self.image_shape, normalize_t=True)
            model = "dense-flow-voxel" if use_voxel else "dense-flow"
            backend = self.iwe_backend

            @jax.jit
            def f(events, weights, flow):
                orig_iwe = imager.create_iwe(
                    events, sigma=1, weight=weights, blur_mode="scipy", backend=backend
                )
                warped = warper.warp_event(events, flow, model, weights=weights)
                warped_iwe = imager.create_iwe(
                    warped, sigma=1, weight=weights, blur_mode="scipy", backend=backend
                )
                ratio = F.normalized_image_variance(warped_iwe, orig_iwe, omit_boundary=False, ddof=0)
                return 1.0 / ratio

            self._fwl_cache[key] = f
        return self._fwl_cache[key]

    def _fwl_of_flow(self, events, flow, use_voxel: bool, normalize_t: bool = True) -> float:
        """Var(IWE_orig)/Var(IWE_warped); < 1 is better (ref base.py:581-649)."""
        padded, wgt = pad_events(np.asarray(events, dtype=np.float64))
        f = self._fwl_fn(len(padded), use_voxel)
        return float(
            f(jnp.asarray(padded, self.dtype), jnp.asarray(wgt, self.dtype),
              jnp.asarray(np.asarray(flow), self.dtype))
        )

    def _eventmask_np(self, events) -> np.ndarray:
        """Jitted, padded event mask (cached per size)."""
        padded, wgt = pad_events(np.asarray(events, dtype=np.float64))
        key = ("mask", len(padded))
        if key not in self._fwl_cache:
            imager = self.imager
            backend = self.iwe_backend
            self._fwl_cache[key] = jax.jit(
                lambda e, w: imager.create_eventmask(e, weight=w)
            )
        return np.asarray(
            self._fwl_cache[key](jnp.asarray(padded, self.dtype), jnp.asarray(wgt, self.dtype))
        )

    def calculate_fwl(self, motion, gt_flow, timescale: float, events) -> dict:
        fwl = {"GT_FWL": self._fwl_of_flow(events, np.asarray(gt_flow), use_voxel=False)}
        fwl.update(self.calculate_fwl_pred(motion, events, timescale))
        return fwl

    def calculate_fwl_pred(self, motion, events, timescale: float = 1.0) -> dict:
        pred_flow = self.motion_to_dense_flow(np.asarray(motion) * timescale)
        return {
            "PRED_FWL": self._fwl_of_flow(events, pred_flow, use_voxel=self.is_time_aware)
        }

    def save_flow_error_as_text(self, nth_frame: int, flow_error_dict: dict,
                                fname: str = "flow_error_per_frame.txt"):
        if self.visualizer is not None:
            fname = os.path.join(self.visualizer.save_dir, fname)
        with open(fname, "a") as f:
            f.write(f"frame {nth_frame}::" + str(flow_error_dict) + "\n")

    # --- visualization delegation (host-side) ------------------------------
    def create_clipped_iwe_for_visualization(self, events, max_scale=50):
        padded, wgt = pad_events(np.asarray(events, dtype=np.float64))
        key = ("vizIWE", len(padded))
        if key not in self._fwl_cache:
            imager = self.imager
            method = self.iwe_config["method"]
            backend = self.iwe_backend
            self._fwl_cache[key] = jax.jit(
                lambda e, w: imager.create_iwe(e, method, sigma=0, weight=w, backend=backend)
            )
        im = np.asarray(
            self._fwl_cache[key](jnp.asarray(padded, self.dtype), jnp.asarray(wgt, self.dtype))
        )
        clipped = 255 - np.clip(max_scale * im, 0, 255).astype(np.uint8)
        if self.padding > 0:
            clipped = clipped[self.padding : -self.padding, self.padding : -self.padding]
        return clipped

    def _warped_viz_iwe(self, events_np, motion, motion_model, direction="first",
                        return_warped: bool = False):
        """Visualization fast path: pad + warp + IWE as ONE cached jitted
        device call.  The previous eager per-op dispatch cost seconds per
        frame through the tunneled runtime (each eager op is a remote
        call) and recompiled on every new event count; bucketed padding
        bounds the cache.  Returns the clipped uint8 image (and the
        padded warped events + weights when ``return_warped``)."""
        padded, wgt = pad_events(np.asarray(events_np, dtype=np.float64))
        motion_j = jnp.asarray(np.asarray(motion), self.dtype)
        key = ("vizWarpIWE", len(padded), motion_model, str(direction), motion_j.shape)
        if key not in self._fwl_cache:
            imager, warper = self.imager, self.warper
            method = self.iwe_config["method"]
            backend = self.iwe_backend

            def run(e, w, m):
                warped = warper.warp_event(e, m, motion_model, direction, weights=w)
                return warped, imager.create_iwe(warped, method, sigma=0, weight=w, backend=backend)

            self._fwl_cache[key] = jax.jit(run)
        warped, im = self._fwl_cache[key](
            jnp.asarray(padded, self.dtype), jnp.asarray(wgt, self.dtype), motion_j
        )
        clipped = 255 - np.clip(self.iwe_visualize_max_scale * np.asarray(im), 0, 255).astype(np.uint8)
        if self.padding > 0:
            clipped = clipped[self.padding : -self.padding, self.padding : -self.padding]
        if return_warped:
            return clipped, np.asarray(warped), wgt
        return clipped

    def visualize_one_batch_warp(self, events, warp=None):
        if self.visualizer is None:
            return
        events = np.asarray(events)
        if warp is None:
            clipped = self.create_clipped_iwe_for_visualization(events, self.iwe_visualize_max_scale)
            self.visualizer.visualize_image(clipped)
            return
        warp = np.copy(np.asarray(warp))
        if self.normalize_t_in_batch:
            warp *= np.max(events[:, 2]) - np.min(events[:, 2])
        clipped, warped, wgt = self._warped_viz_iwe(
            events, warp, self.motion_model, return_warped=True
        )
        self.visualizer.visualize_image(clipped)
        flow = self.motion_to_dense_flow(warp)
        self.visualizer.visualize_optical_flow_on_event_mask(flow, warped[wgt > 0])

    def visualize_original_sequential(self, events):
        if self.visualizer is None:
            return
        clipped = self.create_clipped_iwe_for_visualization(events, self.iwe_visualize_max_scale)
        self.visualizer.visualize_image(clipped, file_prefix="original")

    def visualize_pred_sequential(self, events, warp):
        if self.visualizer is None:
            return
        events = np.asarray(events)
        warp = np.copy(np.asarray(warp))
        if self.normalize_t_in_batch:
            warp *= np.max(events[:, 2]) - np.min(events[:, 2])
        clipped = self._warped_viz_iwe(events, warp, self.motion_model)
        self.visualizer.visualize_image(clipped, file_prefix="pred_warp")

    def visualize_gt_sequential(self, events, gt_warp, gt_type: str = "flow"):
        if self.visualizer is None:
            return
        events = np.asarray(events)
        if gt_type == "flow":
            motion_model = "dense-flow"
            gt_warp = np.transpose(np.asarray(gt_warp), (2, 0, 1))
        else:
            motion_model = self.motion_model
        clipped = self._warped_viz_iwe(events, gt_warp, motion_model)
        self.visualizer.visualize_image(clipped, file_prefix="gt_warp")
        if motion_model == "dense-flow":
            self.visualizer.visualize_optical_flow(
                gt_warp[0], gt_warp[1], visualize_color_wheel=False, file_prefix="gt_flow"
            )

    def visualize_flows(self, motion, gt_flow, timescale: float = 1.0) -> None:
        """Side-by-side pred/GT flow colorization (ref base.py:459-481)."""
        if self.visualizer is None:
            return
        pred_flow = self.motion_to_dense_flow(np.asarray(motion) * timescale)
        if self.is_time_aware:
            pred_flow = self.get_original_flow_from_time_aware_flow_voxel(pred_flow)
        gt_flow = np.transpose(np.asarray(gt_flow), (2, 0, 1))
        self.visualizer.visualize_optical_flow_pred_and_gt(
            pred_flow, gt_flow,
            pred_file_prefix="flow_comparison_pred",
            gt_file_prefix="flow_comparison_gt",
        )

    def undistort_image(self, image: np.ndarray) -> np.ndarray:
        """Undistort with the calibration params (ref base.py:893-908;
        host-side, needs cv2 and K/D in calib_param)."""
        import cv2

        newcameramtx, _ = cv2.getOptimalNewCameraMatrix(
            self.calib_param["K"], self.calib_param["D"], self.image_shape, 1, self.image_shape
        )
        return cv2.undistort(image, self.calib_param["K"], self.calib_param["D"], None, newcameramtx)

    # --- profiling -----------------------------------------------------------
    def profiled_optimize(self, events: np.ndarray) -> np.ndarray:
        """optimize() wrapped in a jax profiler trace when the config asks
        for one (output.trace_dir) — the TPU-native replacement for the
        reference's cProfile dumps (ref src/utils/misc.py:88-144,
        base.py:700): produces xprof/tensorboard traces of the device
        programs instead of host call stacks."""
        trace_dir = self.out_config.get("trace_dir") if self.out_config else None
        if not trace_dir:
            return self.optimize(events)
        with jax.profiler.trace(trace_dir):
            return self.optimize(events)

    # --- main entry --------------------------------------------------------
    def optimize(self, events: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def setup_single_training(self, *args, **kwargs):
        pass

    def train(self, *args, **kwargs):
        pass
