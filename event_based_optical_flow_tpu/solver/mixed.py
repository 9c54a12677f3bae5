"""Single-scale tile CMax solver.

Mirrors reference ``MixedPatchContrastMaximization``
(src/solver/patch_contrast_mixed.py): one tile grid from
``patch.size``/``patch.sliding_window``, optimized jointly with a scipy
method (gtol 1e-7, ref :167-182) or the sampling ("optuna") optimizer.
"""

import logging

import numpy as np

from .base import TORCH_OPTIMIZERS
from .optax_loop import run_first_order
from .patch_base import PatchContrastMaximization, prepare_patch
from .scipy_bridge import SCIPY_OPTIMIZERS

logger = logging.getLogger(__name__)


class MixedPatchContrastMaximization(PatchContrastMaximization):
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
        self.set_patch_size_and_sliding_window()
        self.patches, self.patch_image_size = prepare_patch(
            image_shape, self.patch_size, self.sliding_window
        )
        self.n_patch = len(self.patches)

    def _initial_motion(self, events_np: np.ndarray) -> np.ndarray:
        if self.previous_frame_best_estimation is not None:
            return np.copy(self.previous_frame_best_estimation)
        init = self.slv_config["patch"]["initialize"]
        if init == "random":
            return self.initialize_random()
        if init == "zero":
            return self.initialize_zeros()
        if init == "optuna-sampling":
            zeros = self.initialize_zeros()
            return self.initialize_guess_from_patch_search(
                events_np, zeros, self.opt_config["n_iter"]
            )
        if init in ("global-best", "grid-best"):
            # dense grid sweep of one shared translation (ref :126-187)
            best = self._grid_best_translation(events_np, step=10 if init == "global-best" else 30)
            return np.tile(best[:, None], (1, self.n_patch))
        raise NotImplementedError(f"Initialization {init!r} not implemented")

    def _grid_best_translation(self, events_np: np.ndarray, step: int) -> np.ndarray:
        """Vmapped sweep of sampling_field x sampling_field shared
        translations through the full objective."""
        import jax
        import jax.numpy as jnp

        from .objective import build_objective

        import dataclasses

        spec = dataclasses.replace(self._current_spec(), iwe_backend="matmul")
        obj = build_objective(spec)
        ev, w = self.prepare_events(events_np)
        field = np.arange(-150, 150, step, dtype=np.float64)
        grid = np.stack(np.meshgrid(field, field, indexing="ij"), -1).reshape(-1, 2)
        tiles = np.repeat(grid[:, :, None], self.n_patch, axis=2).reshape(len(grid), -1)

        eval_batch = jax.jit(jax.vmap(lambda x: obj(x, ev, w)[0]))
        losses = np.asarray(eval_batch(jnp.asarray(tiles, self.dtype)))
        return grid[int(np.nanargmin(losses))]

    def optimize(self, events: np.ndarray) -> np.ndarray:
        logger.info(f"Start optimization; DoF {self.motion_vector_size * self.n_patch}")
        events = np.asarray(events, dtype=np.float64)
        spec = self._current_spec()
        ev, w = self.prepare_events(events)
        motion0 = self._initial_motion(events)

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
                spec,
                ev,
                w,
                motion0,
                options={
                    "gtol": 1e-7,
                    "disp": False,
                    "maxiter": self.opt_config.get("max_iter", 25),
                },
            )
            best = result.x
        elif self.opt_method == "optuna":
            best, _ = self._run_sampling_on_spec(
                spec, ev, w, motion0, self.opt_config["n_iter"]
            )
        elif self.opt_method in TORCH_OPTIMIZERS:
            best, _ = run_first_order(
                self._get_funs(spec)[0], motion0, self.opt_method, self.opt_config,
                ev, w, self.dtype,
            )
        else:
            raise NotImplementedError(f"Optimizer {self.opt_method} is not supported")

        best_motion = np.asarray(best, dtype=np.float64).reshape(
            (self.motion_vector_size,) + tuple(self.patch_image_size)
        )
        if self.visualizer and self.cost_func.get_history()["loss"]:
            self.visualizer.visualize_scipy_history(self.cost_func.get_history(), self.cost_weight)
        logger.info(f"End optimization. Best: {best_motion.reshape(2, -1).mean(-1)} (tile mean)")
        return best_motion
