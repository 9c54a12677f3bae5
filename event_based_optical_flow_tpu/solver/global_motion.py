"""Global (whole-frame) motion-model CMax solver.

Optimizes the motion model's parameter vector directly — 2-DoF
translation, the 4-DoF similarity (translation + rotation + zoom about
the image center, ops/warp.flow_from_similarity), or the calibrated
3-DoF camera rotation ("3-rotation", ops/warp.flow_from_rotation; the
classic CMax rotation-estimation problem) — with the on-device
Newton-CG (or any scipy/optax family) through the same fused banded
objective as the tile solvers (the kernel consumes a dense [2, H, W]
flow regardless of how it was parameterized).

New capability: the reference ships only tile parameterizations — its
"rigid-optical-flow" motion model is an alias of 2d-translation
(reference src/warp.py:77,108) and no rotational model survives in the
public release.  Ego-motion-dominated sequences (ECD slider/rotation)
are the target.

Config surface: ``solver.method: global_contrast_maximization`` with
``solver.motion_model`` one of 2d-translation / rigid-optical-flow /
4-param-similarity / 3-rotation; ``optimizer.parameters`` boxes keyed by
the model's parameter names (trans_x/trans_y[/rot/zoom] or
rot_x/rot_y/rot_z) drive random init.  3-rotation reads the camera
intrinsics from ``calibration_parameter["K"]`` (generic pinhole assumed
without one).  The cost must not include total_variation (no tile grid
to regularize).
"""

import logging

import numpy as np

from .base import TORCH_OPTIMIZERS
from .patch_base import PatchContrastMaximization
from .scipy_bridge import SCIPY_OPTIMIZERS

logger = logging.getLogger(__name__)

# fallback random-init half-ranges per parameter kind (overridden by
# optimizer.parameters boxes when present)
_DEFAULT_BOX = {
    "trans_x": 50.0, "trans_y": 50.0, "rot": 1.0, "zoom": 1.0,
    "rot_x": 0.5, "rot_y": 0.5, "rot_z": 1.0,
}


class GlobalMotionContrastMaximization(PatchContrastMaximization):
    def __init__(
        self,
        image_shape: tuple,
        calibration_parameter: dict,
        solver_config: dict = {},
        optimizer_config: dict = {},
        output_config: dict = {},
        visualize_module=None,
    ):
        super().__init__(
            image_shape,
            calibration_parameter,
            solver_config,
            optimizer_config,
            output_config,
            visualize_module,
        )
        # the whole frame is one "patch"; the objective bypasses the tile
        # interpolation entirely (ObjectiveSpec.motion_model)
        self.patches = {}
        self.n_patch = 1
        self.patch_image_size = (1, 1)
        self.patch_size = tuple(image_shape)
        self.sliding_window = tuple(image_shape)
        self.objective_motion_model = self.motion_model
        # optimize in pixel-equivalent units: 1 unit of rot/zoom rate moves
        # a pixel at radius R by R px/s — without this the Hessian is
        # ~R^2-ill-conditioned and the pixel-tuned line-search/escape
        # probes of the Newton solve miss the basin (measured: the zoom
        # scene solve stalled at the zero init)
        r_char = (image_shape[0] + image_shape[1]) / 4.0
        from ..ops.warp import calib_tuple

        self._calib = calib_tuple(tuple(image_shape), self.calib_param)
        # rot_x/rot_y move a pixel ~f px/s per rad/s, rot(_z)/zoom ~R px/s
        f_char = (self._calib[0] + self._calib[1]) / 2.0
        scale_of = {"trans_x": 1.0, "trans_y": 1.0, "rot_x": 1.0 / f_char,
                    "rot_y": 1.0 / f_char}
        self._param_scale = np.array(
            [scale_of.get(k, 1.0 / r_char) for k in self.motion_model_keys]
        )
        if self.slv_config["cost"] == "hybrid" and "total_variation" in (
            self.slv_config.get("cost_with_weight") or {}
        ):
            raise ValueError(
                "global_contrast_maximization has no tile grid: drop "
                "total_variation from solver.cost_with_weight"
            )

    def _current_spec(self, time_aware=None):
        import dataclasses

        spec = super()._current_spec(time_aware)
        return dataclasses.replace(
            spec, param_scale=tuple(self._param_scale), calib=tuple(self._calib)
        )

    def motion_to_dense_flow(self, motion_array):
        """Analytic model field (PatchContrastMaximization overrides this
        with the tile interpolation, which does not apply here)."""
        import jax.numpy as jnp

        return np.asarray(
            self.warper.get_flow_from_motion(
                jnp.asarray(np.asarray(motion_array, dtype=np.float64)), self.motion_model
            )
        )

    # --- initialization -----------------------------------------------------
    def initialize_zeros(self):
        return np.zeros(self.motion_vector_size, dtype=np.float64)

    def initialize_random(self):
        params = self.opt_config.get("parameters")
        out = np.zeros(self.motion_vector_size, dtype=np.float64)
        for i, key in enumerate(self.motion_model_keys):
            if isinstance(params, dict) and key in params:
                lo, hi = params[key]["min"], params[key]["max"]
            else:
                half = _DEFAULT_BOX.get(key, 1.0)
                lo, hi = -half, half
            out[i] = self._rng.uniform(lo, hi)
        return out

    def _param_boxes(self):
        params = self.opt_config.get("parameters")
        lo, hi = [], []
        for key in self.motion_model_keys:
            if isinstance(params, dict) and key in params:
                lo.append(params[key]["min"])
                hi.append(params[key]["max"])
            else:
                half = _DEFAULT_BOX.get(key, 1.0)
                lo.append(-half)
                hi.append(half)
        return np.array(lo), np.array(hi)

    def _initial_motion(self, spec, ev, w) -> np.ndarray:
        if self.previous_frame_best_estimation is not None:
            return np.copy(np.asarray(self.previous_frame_best_estimation)).reshape(-1)
        init = self.slv_config.get("patch", {}).get("initialize", "zero")
        if init == "random":
            x0 = self.initialize_random()
        elif init == "zero":
            x0 = self.initialize_zeros()
        else:
            raise NotImplementedError(
                f"global motion initialization {init!r} not implemented (zero/random)"
            )
        n_cand = int(self.opt_config.get("n_iter", 0))
        if n_cand > 0:
            x0 = self._sampling_init(spec, ev, w, x0, n_cand)
        return x0

    def _sampling_init(self, spec, ev, w, x0, n_cand: int):
        """Vmapped random sweep over the parameter boxes before Newton:
        CMax is multi-modal, and a pure Newton start can sit at a local
        maximum of the smoothed cost whose negative-curvature escape
        direction is translation-contaminated (measured on the zoom
        scene: the zero init stalled).  Mirrors the tile solvers' init
        searches; ``optimizer.n_iter`` candidates."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from .objective import build_objective

        obj = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
        lo, hi = self._param_boxes()
        size = self.motion_vector_size
        # per-axis sweeps (others at the incumbent): a joint random search
        # over the full box needs exponentially many samples — a wide
        # translation box drowns the rotation/zoom axes entirely
        per_axis = max(4, n_cand // size)
        cands = [np.asarray(x0, dtype=np.float64)[None]]
        best = np.asarray(x0, dtype=np.float64)
        for k in range(size):
            sweep = np.tile(best[None], (per_axis, 1))
            sweep[:, k] = np.linspace(lo[k], hi[k], per_axis)
            cands.append(sweep)
        cands = np.concatenate(cands, axis=0)
        # the objective works in scaled units (spec.param_scale)
        cands_scaled = cands / self._param_scale[None, :]
        eval_batch = jax.jit(jax.vmap(lambda x: obj(x, ev, w)[0]))
        losses = np.asarray(eval_batch(jnp.asarray(cands_scaled, self.dtype)))
        return cands[int(np.nanargmin(losses))]

    # --- main ---------------------------------------------------------------
    def optimize(self, events: np.ndarray) -> np.ndarray:
        logger.info(
            f"Start global-motion optimization ({self.motion_model}, "
            f"DoF {self.motion_vector_size})"
        )
        events = np.asarray(events, dtype=np.float64)
        spec = self._current_spec()
        ev, w = self.prepare_events(events)
        # the device solve works in scaled (pixel-equivalent) units; init
        # and result convert at the boundary
        motion0 = self._initial_motion(spec, ev, w) / self._param_scale

        if self.opt_method == "Newton-CG" and self.opt_config.get("device", True):
            best = self._run_newton_device(
                spec, ev, w, motion0,
                maxiter=self.opt_config.get("max_iter", 25), gtol=1e-7,
                events_np=events,
                # warmth gates the hvp_mode routing (analytic-warm/-coldfd)
                warm=self.previous_frame_best_estimation is not None,
            )
        elif self.opt_method in SCIPY_OPTIMIZERS:
            result = self._run_scipy_on_spec(
                spec, ev, w, motion0,
                options={
                    "gtol": 1e-7,
                    "disp": False,
                    "maxiter": self.opt_config.get("max_iter", 25),
                },
            )
            best = result.x
        elif self.opt_method in TORCH_OPTIMIZERS:
            from .optax_loop import run_first_order

            best, _ = run_first_order(
                self._get_funs(spec)[0], motion0, self.opt_method, self.opt_config,
                ev, w, self.dtype,
            )
        else:
            raise NotImplementedError(
                f"Optimizer {self.opt_method} is not supported by the global solver"
            )

        best_motion = np.asarray(best, dtype=np.float64).reshape(-1) * self._param_scale
        if self.visualizer and self.cost_func.get_history()["loss"]:
            self.visualizer.visualize_scipy_history(self.cost_func.get_history(), self.cost_weight)
        logger.info(
            f"End optimization. Best: "
            f"{dict(zip(self.motion_model_keys, np.round(best_motion, 4)))}"
        )
        return best_motion
