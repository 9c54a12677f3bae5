"""Pyramidal (coarse-to-fine) tile CMax — the flagship solver.

Mirrors reference ``PyramidalPatchContrastMaximization``
(src/solver/patch_contrast_pyramid.py): scales s = 1..patch.scale-1 over a
center crop, per-scale non-overlapping tile grids (size crop/2^s), each
scale solved with Newton-CG (gtol 1e-5, maxiter from config) warm-started
from the expanded coarser solution (averaged with the previous frame when
available) and refined per-patch by a sampling search; finally a
fine-to-coarse pyramid_reduce feedback produces the per-scale result dict.

TPU mapping: each scale's objective is one jit-compiled value_and_grad /
HVP (compiled once, reused across frames); the per-patch init search is a
single vmapped device sweep over all patches x candidates instead of the
reference's sequential per-patch Optuna CPU loop.
"""

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..flow.voxel import construct_dense_flow_voxel
from ..ops.interp import (
    pyramid_expand,
    pyramid_expand_jax,
    pyramid_reduce,
    tile_to_dense_flow,
)
from ..costs import functional as F
from ..flow.metrics import calculate_flow_error_numpy
from ..types import pad_events
from .base import TORCH_OPTIMIZERS
from .patch_base import PatchContrastMaximization, prepare_patch
from .sampling import gather_patch_events
from .scipy_bridge import SCIPY_OPTIMIZERS

logger = logging.getLogger(__name__)

# below this many events a stride subsample is not statistically
# meaningful for a coarse-scale solve (shared by the sequential and
# fleet coarse_event_fraction paths)
COARSE_SUBSAMPLE_MIN_EVENTS = 512


def coarse_subsample(events_np: np.ndarray, frac: float):
    """Stride-k subsample of a time-sorted event array for the coarse
    pyramid scales (k = round(1/frac); temporal and spatial coverage are
    kept), or None when ``frac`` >= 1 or the subsample would drop below
    the statistical floor.  Strides BEFORE any dtype conversion — the
    packers re-convert anyway, and a premature float64 copy of a full
    DSEC-sized frame is pure waste."""
    if frac >= 1.0:
        return None
    k = max(1, int(round(1.0 / max(frac, 1e-3))))
    sub = np.ascontiguousarray(np.asarray(events_np)[::k])
    if len(sub) < COARSE_SUBSAMPLE_MIN_EVENTS:
        return None
    return sub


class PyramidalPatchContrastMaximization(PatchContrastMaximization):
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
        self.coarsest_scale = 1
        self.patch_scales = self.slv_config["patch"]["scale"]
        self.cropped_height = self.slv_config["patch"]["crop_height"]
        self.cropped_width = self.slv_config["patch"]["crop_width"]
        self.cropped_image_shape = (self.cropped_height, self.cropped_width)
        self.prepare_pyramidal_patch(self.cropped_image_shape, self.coarsest_scale, self.patch_scales)
        self.overload_patch_configuration(self.coarsest_scale)
        self.patch_shift = (
            (self.image_shape[0] - self.cropped_height) // 2,
            (self.image_shape[1] - self.cropped_width) // 2,
        )

    def prepare_pyramidal_patch(self, image_size, coarsest_scale: int, finest_scale: int):
        """Per-scale tile geometry (ref patch_contrast_pyramid.py:69-100)."""
        self.scaled_patches = {}
        self.scaled_patch_image_size = {}
        self.scaled_n_patch = {}
        self.scaled_patch_size = {}
        self.scaled_sliding_window = {}
        self.total_n_patch = 0
        self.current_scale = coarsest_scale
        for i in range(coarsest_scale, finest_scale):
            scaled = (image_size[0] // (2**i), image_size[1] // (2**i))
            self.scaled_patch_size[i] = scaled
            self.scaled_sliding_window[i] = scaled
            self.scaled_patches[i], self.scaled_patch_image_size[i] = prepare_patch(
                image_size, scaled, scaled
            )
            self.scaled_n_patch[i] = len(self.scaled_patches[i])
            self.total_n_patch += self.scaled_n_patch[i]

    def overload_patch_configuration(self, n_scale: int):
        self.current_scale = n_scale
        self.patches = self.scaled_patches[n_scale]
        self.patch_image_size = self.scaled_patch_image_size[n_scale]
        self.n_patch = self.scaled_n_patch[n_scale]
        self.sliding_window = self.scaled_sliding_window[n_scale]
        self.patch_size = self.scaled_patch_size[n_scale]

    # ----------------------------------------------------------------- main
    def _coarse_events(self, events_np: np.ndarray):
        """Stride-subsampled events for the COARSE pyramid scales, or None.

        ``optimizer.coarse_event_fraction: f`` (default 1.0 = off) solves
        every scale but the finest on ~f of the events (stride k=round(1/f)
        on the time-sorted stream, so temporal and spatial coverage are
        kept).  Coarse scales estimate few parameters from the same event
        set as the finest — at high event rates (DSEC: 300k/frame) that
        makes every scale cost the same and the pyramid ~S× the price of
        its finest scale.  DEVIATION from the reference (which uses all
        events at all scales), opt-in per config; the finest scale — the
        one whose motion becomes the output flow — always sees every
        event.  Applies to the fused banded device path (the TPU
        production path); other optimizer families ignore it."""
        frac = float(self.opt_config.get("coarse_event_fraction", 1.0))
        if frac >= 1.0:
            return None
        if getattr(self, "_coarse_ref", None) is events_np:
            return self._coarse_sub
        sub = coarse_subsample(events_np, frac)
        self._coarse_ref, self._coarse_sub = events_np, sub
        return sub

    def _scale_budget(self, s: int):
        """(max_iter, cg_maxiter_override) for pyramid scale ``s``.

        ``optimizer.coarse_max_iter`` / ``optimizer.coarse_cg_maxiter``
        (defaults: the global budgets) apply to every scale but the
        finest — coarse scales only seed the next scale's init, so their
        Newton budget can be cut well below the finest's without moving
        the output flow (A/B'd at DSEC geometry incl. a 30%-clutter
        scene, BENCHMARKS.md).  Device Newton paths only, like
        ``coarse_event_fraction``."""
        mi = int(self.opt_config.get("max_iter", 25))
        cg = None
        if s < self.patch_scales - 1:
            mi = int(self.opt_config.get("coarse_max_iter", mi))
            if "coarse_cg_maxiter" in self.opt_config:
                cg = int(self.opt_config["coarse_cg_maxiter"])
        return mi, cg

    @staticmethod
    def _warm_has_finest(warm, s_fin: int) -> bool:
        """Shared warmth predicate for the ``warm_finest_only`` gate —
        used by BOTH the sequential chain and the fleet surface so the
        warm-streak / ``warm_full_every`` cadence is identical for the
        same stream.  The fast path needs the finest scale's previous
        motion: a per-scale dict containing ``s_fin``, or (fleet
        per-frame mode) a non-empty list of such dicts."""
        if isinstance(warm, (list, tuple)):
            return len(warm) > 0 and all(
                isinstance(w, dict) and s_fin in w for w in warm
            )
        return isinstance(warm, dict) and s_fin in warm

    def _warm_finest_active(self, use_warm: bool) -> bool:
        """Decide, ONCE per frame/batch, whether this solve takes the warm
        finest-only fast path (``optimizer.warm_finest_only``).  Cold
        frames reset the warm streak; ``optimizer.warm_full_every: K``
        (K > 0) makes every K-th consecutive warm frame run the full
        pyramid instead, re-anchoring the basin after motion drift
        (K = 1 therefore disables the fast path entirely).  The decision
        is recorded in ``self._wfo_last`` for tests/telemetry."""
        self._wfo_last = False
        if not use_warm:
            self._warm_streak = 0
            return False
        if not bool(self.opt_config.get("warm_finest_only", False)):
            return False
        self._warm_streak = getattr(self, "_warm_streak", 0) + 1
        every = int(self.opt_config.get("warm_full_every", 0))
        self._wfo_last = not (every > 0 and self._warm_streak % every == 0)
        return self._wfo_last

    def _optimize_warm_finest(self, events_np, ev, w, metric_in=()):
        """Warm finest-only fast path: a warm-started frame skips the
        coarse pyramid scales AND the per-scale init sweeps and runs ONE
        finest-scale Newton solve from the previous frame's finest
        motion; the coarse entries of the returned per-scale dict are
        rebuilt by pyramid_reduce exactly as update_coarse_from_fine
        does on the full path.  Rationale: the coarse scales exist to
        SELECT the basin, and on a warm chain the basin is carried by
        the previous solution — a tracking mode for warm-dominated
        streaming/serving surfaces.  DEVIATION from the reference
        (which always runs every scale, ref patch_contrast_pyramid.py
        sequential scale loop); default off, gated per BENCHMARKS.md.
        """
        s_fin = self.patch_scales - 1
        self.overload_patch_configuration(s_fin)
        spec = self._current_spec()
        grid_shape = tuple(self.patch_image_size)
        if self._uses_banded(spec):
            newton_args = self._banded_newton_args(events_np)
        else:
            newton_args = (ev, w)
        maxiter = self.opt_config.get("max_iter", 25)
        warm = self.previous_frame_best_estimation
        x0 = jnp.asarray(
            np.asarray(warm[s_fin], dtype=np.float64).reshape(-1), self.dtype
        )
        fin_fn = self._get_finest_solver(
            spec, maxiter, 1e-5, bool(metric_in), warm=True
        )
        self.cost_func.enable_history_register()
        out = fin_fn(x0, tuple(metric_in), *newton_args)
        if metric_in:
            bx, bf, it, err = out
            self._last_chain_metrics = {k: float(v) for k, v in err.items()}
        else:
            bx, bf, it = out
            self._last_chain_metrics = None
        self._history_cb(float(bf), None)
        logger.info(
            f"Warm finest-only solve: {int(it)} iters, loss {float(bf):.6f}"
        )
        refined = {
            s_fin: np.asarray(bx, dtype=np.float64).reshape((2,) + grid_shape)
        }
        for i in range(s_fin, self.coarsest_scale, -1):
            refined[i - 1] = pyramid_reduce(refined[i])
        if self.visualizer and self.cost_func.get_history()["loss"]:
            self.visualizer.visualize_scipy_history(
                self.cost_func.get_history(), self.cost_weight
            )
        self.cost_func.clear_history()
        return refined

    def optimize(self, events: np.ndarray) -> Dict[int, np.ndarray]:
        logger.info(f"Start optimization. DoF {self.motion_vector_size * self.total_n_patch}")
        events = np.asarray(events, dtype=np.float64)
        ev, w = self.prepare_events(events)

        if self._chain_ready():
            return self._optimize_chain(events, ev, w)

        if self.opt_config.get("warm_finest_only") and not getattr(
            self, "_warned_wfo", False
        ):
            logger.warning(
                "optimizer.warm_finest_only requires the device chain path "
                "(optimizer.chain with device Newton-CG, >=2 scales); the "
                "per-scale loop runs the full pyramid"
            )
            self._warned_wfo = True

        best_motion_per_scale: Dict[int, np.ndarray] = {}
        sub = self._coarse_events(events)
        for s in range(self.coarsest_scale, self.patch_scales):
            self.overload_patch_configuration(s)
            spec = self._current_spec()
            device_newton = self.opt_method == "Newton-CG" and self.opt_config.get("device", True)
            presearch = self._presearch_motion(s, best_motion_per_scale) if device_newton else None
            # coarse scales may solve on a subsample (banded path only);
            # the finest scale always sees the full frame
            newton_ev = sub if (sub is not None and s < self.patch_scales - 1) else events

            if presearch is None:
                motion0 = self._init_scale(s, events, best_motion_per_scale)

            scale_mi, scale_cg = self._scale_budget(s)
            if presearch is not None:
                # fused path: per-patch init sweep + Newton in ONE device call
                motion0, n_cand = presearch
                self.cost_func.enable_history_register()
                best = self._run_fused_scale_device(
                    spec, events, ev, w, motion0, n_cand,
                    maxiter=scale_mi, gtol=1e-5,
                    newton_events_np=newton_ev, cg_maxiter=scale_cg,
                    finest=s == self.patch_scales - 1,
                    warm=self.previous_frame_best_estimation is not None,
                )
            elif device_newton:
                self.cost_func.enable_history_register()
                best = self._run_newton_device(
                    spec, ev, w, motion0,
                    maxiter=scale_mi, gtol=1e-5,
                    events_np=newton_ev, cg_maxiter=scale_cg,
                    finest=s == self.patch_scales - 1,
                    warm=self.previous_frame_best_estimation is not None,
                )
            elif self.opt_method in SCIPY_OPTIMIZERS:
                self.cost_func.enable_history_register()
                result = self._run_scipy_on_spec(
                    spec,
                    ev,
                    w,
                    motion0,
                    options={
                        "gtol": 1e-5,
                        "disp": False,
                        "maxiter": self.opt_config.get("max_iter", 25),
                    },
                )
                best = result.x
            elif self.opt_method == "optuna":
                best, _ = self._run_sampling_on_spec(spec, ev, w, motion0, self.opt_config["n_iter"])
            elif self.opt_method in TORCH_OPTIMIZERS:
                from .optax_loop import run_first_order

                best, _ = run_first_order(
                    self._get_funs(spec)[0], motion0, self.opt_method, self.opt_config, ev, w, self.dtype
                )
            else:
                raise NotImplementedError(f"Optimizer {self.opt_method} is not supported")

            best_motion_per_scale[s] = np.asarray(best, dtype=np.float64).reshape(
                (self.motion_vector_size,) + tuple(self.patch_image_size)
            )
            logger.info(f"Scale {s} done.")

        refined = self.update_coarse_from_fine(best_motion_per_scale)
        if self.visualizer and self.cost_func.get_history()["loss"]:
            self.visualizer.visualize_scipy_history(self.cost_func.get_history(), self.cost_weight)
        self.cost_func.clear_history()
        return refined

    # ------------------------------------------------- whole-frame chain
    def _chain_ready(self) -> bool:
        """Whether the whole coarse-to-fine solve can run as ONE device
        program: all scales on the device Newton path.  Gate with
        ``optimizer.chain: false`` to fall back to the per-scale loop.

        On a tunneled runtime every dispatch costs 25-120 ms; the chain
        collapses the per-frame dispatch count from one-per-scale to one.
        """
        device_newton = self.opt_method == "Newton-CG" and self.opt_config.get("device", True)
        return (
            device_newton
            and bool(self.opt_config.get("chain", True))
            and (self.patch_scales - self.coarsest_scale) >= 2
        )

    def _optimize_chain(self, events_np: np.ndarray, ev, w, metric_in=()) -> Dict[int, np.ndarray]:
        """All pyramid scales — per-scale init search + Newton-CG, with
        device-side pyramid_expand between scales — in one jitted call.
        Semantics match the per-scale loop (same kernels, same key order);
        only the float64 host round trip between scales is gone.

        ``metric_in = (gt, metric_events, metric_weights, ts)`` appends the
        fused metrics computation (same body as _metrics_fused_fn) on the
        finest result to the same device call; the error dict is stashed in
        ``self._last_chain_metrics``."""
        import jax

        scales = list(range(self.coarsest_scale, self.patch_scales))
        warm0 = self.previous_frame_best_estimation
        # dict-only on the sequential surface: a per-frame warm LIST here
        # is a mis-threaded fleet state — _optimize_warm_finest would
        # integer-index it as warm[s_fin] (review r5)
        if self._warm_finest_active(
            isinstance(warm0, dict) and self._warm_has_finest(warm0, scales[-1])
        ):
            return self._optimize_warm_finest(events_np, ev, w, metric_in)
        specs = {}
        search_meta = {}
        patch_inputs = []
        grid_shapes = {}
        for s in scales:
            self.overload_patch_configuration(s)
            specs[s] = self._current_spec()
            grid_shapes[s] = tuple(self.patch_image_size)
            if s > self.coarsest_scale:
                capacity = self._patch_capacity(len(events_np))
                n_cand = max(4, int(self.opt_config["n_iter"] / max(1, s - self.coarsest_scale)))
                search_meta[s] = (tuple(self.patch_size), int(n_cand), capacity)
                pe, pw, pc = gather_patch_events(events_np, self.patches, capacity)
                patch_inputs.append(
                    (jnp.asarray(pe, self.dtype), jnp.asarray(pw, self.dtype), jnp.asarray(pc))
                )

        # geometry loop ends at the finest scale: metrics use that grid
        metrics_body = self._build_metrics_body() if metric_in else None

        warm = self.previous_frame_best_estimation
        use_warm = warm is not None
        self.overload_patch_configuration(self.coarsest_scale)
        x0 = self._init_scale(self.coarsest_scale, events_np, {})

        maxiter = self.opt_config.get("max_iter", 25)
        coarse_args = ()
        if self._uses_banded(specs[scales[0]]):
            newton_args = self._banded_newton_args(events_np)
            sub = self._coarse_events(events_np)
            if sub is not None:
                coarse_args = self._banded_newton_args(sub)
        else:
            newton_args = (ev, w)
        split = bool(coarse_args)
        coarse_budget = self._scale_budget(scales[0]) if len(scales) >= 2 else None
        if coarse_budget == (maxiter, None):
            coarse_budget = None  # no override configured: keep cache keys stable
        fused = self._get_chain_solver(
            tuple(scales),
            specs,
            search_meta,
            grid_shapes,
            maxiter=maxiter,
            gtol=1e-5,
            use_warm=use_warm,
            metrics_body=None if split else metrics_body,
            split_coarse=split,
            coarse_budget=coarse_budget,
        )
        warm_in = (
            tuple(
                jnp.asarray(np.asarray(warm[s], dtype=np.float64), self.dtype)
                for s in scales[1:]
            )
            if use_warm
            else ()
        )
        keys = jnp.stack([self._next_key() for _ in scales[1:]])
        self.cost_func.enable_history_register()
        out_all = fused(
            jnp.asarray(np.asarray(x0, dtype=np.float64).reshape(-1), self.dtype),
            warm_in,
            tuple(patch_inputs),
            keys,
            tuple(metric_in),
            coarse_args if split else newton_args,
        )
        if split:
            outs_c, fs_c, its_c, x0_fin = out_all
            fin_fn = self._get_finest_solver(
                specs[scales[-1]], maxiter, 1e-5, bool(metric_in),
                warm=use_warm,
            )
            fin_all = fin_fn(x0_fin, tuple(metric_in), *newton_args)
            if metric_in:
                bx, bf, bit, err = fin_all
                self._last_chain_metrics = {k: float(v) for k, v in err.items()}
            else:
                bx, bf, bit = fin_all
                self._last_chain_metrics = None
            outs = list(outs_c) + [bx.reshape((2,) + grid_shapes[scales[-1]])]
            fs = list(np.asarray(fs_c)) + [float(bf)]
            its = list(np.asarray(its_c)) + [int(bit)]
        elif metric_in:
            outs, fs, its, err = out_all
            self._last_chain_metrics = {k: float(v) for k, v in err.items()}
        else:
            outs, fs, its = out_all
            self._last_chain_metrics = None
        fs_np = np.asarray(fs)
        its_np = np.asarray(its)
        best_motion_per_scale: Dict[int, np.ndarray] = {}
        for i, s in enumerate(scales):
            best_motion_per_scale[s] = np.asarray(outs[i], dtype=np.float64)
            self._history_cb(float(fs_np[i]), None)
            logger.info(
                f"Scale {s} done (chained): {int(its_np[i])} iters, loss {fs_np[i]:.6f}"
            )
        self.overload_patch_configuration(scales[-1])

        refined = self.update_coarse_from_fine(best_motion_per_scale)
        if self.visualizer and self.cost_func.get_history()["loss"]:
            self.visualizer.visualize_scipy_history(self.cost_func.get_history(), self.cost_weight)
        self.cost_func.clear_history()
        return refined

    def _get_chain_solver(self, scales, specs, search_meta, grid_shapes, maxiter, gtol,
                          use_warm, metrics_body=None, split_coarse=False,
                          coarse_budget=None):
        import jax

        key = (
            "chain",
            tuple(specs[s] for s in scales),
            tuple(sorted(search_meta.items())),
            maxiter,
            gtol,
            use_warm,
            metrics_body is not None,
            split_coarse,
            coarse_budget,
        )
        if key not in self._fun_cache:
            # split_coarse: the chain covers the COARSE scales only (they
            # solve on the subsampled pack) and ends by returning the
            # finest scale's init vector; the finest solve runs as its own
            # device program on the full pack (_get_finest_solver).  One
            # program holding both packs and every per-shape solver proved
            # too much for the TPU runtime at DSEC scale (480x640/300k:
            # FailedPrecondition at execute); two dispatches cost ~50 ms.
            solve_scales = scales[:-1] if split_coarse else scales

            def _budget(s):
                if coarse_budget is not None and s < scales[-1]:
                    return coarse_budget
                return (maxiter, None)

            solvers = {
                s: self._build_newton(
                    specs[s], _budget(s)[0], gtol, cg_maxiter=_budget(s)[1],
                    finest=s == scales[-1], warm=use_warm,
                )
                for s in solve_scales
            }
            searches = {s: self._get_patch_search(search_meta[s]) for s in scales[1:]}
            dtype = self.dtype

            def chain(x0, warm_fine, patch_inputs, keys, metric_in, newton_args):
                best_x, best_f, iters = [], [], []
                x = x0
                prev = None
                for i, s in enumerate(scales):
                    if i > 0:
                        m0 = pyramid_expand_jax(prev)
                        if use_warm:
                            m0 = (m0 + warm_fine[i - 1]) / 2.0
                        pe, pw, pc = patch_inputs[i - 1]
                        m1 = searches[s](
                            pe, pw, pc, m0.reshape(2, -1).T.astype(dtype), keys[i - 1]
                        )
                        x = m1.T.reshape(-1).astype(dtype)
                    if split_coarse and s == scales[-1]:
                        return tuple(best_x), jnp.stack(best_f), jnp.stack(iters), x
                    bx, bf, it = solvers[s](x, *newton_args)
                    prev = bx.reshape((2,) + grid_shapes[s])
                    best_x.append(prev)
                    best_f.append(bf)
                    iters.append(it)
                    finest_flat = bx
                if metrics_body is None:
                    return tuple(best_x), jnp.stack(best_f), jnp.stack(iters)
                gt, me, mw, ts = metric_in
                err = metrics_body(finest_flat, gt, me, mw, ts)
                return tuple(best_x), jnp.stack(best_f), jnp.stack(iters), err

            self._fun_cache[key] = jax.jit(chain)
        return self._fun_cache[key]

    def _get_finest_solver(self, spec, maxiter, gtol, with_metrics, warm=False):
        """Finest-scale Newton solve (+ optional fused AEE/FWL metrics) as
        one device program — the second dispatch of the split coarse
        chain.  ``warm`` must reach the Newton builder (normalized for
        the cache key like everywhere else): ``hvp_mode:
        analytic-coldfd`` picks FD vs analytic on the FINEST scale by
        warmth, and dropping the flag here silently ran FD on warm
        frames whenever the split-coarse path was active (the round-4
        DSEC gate caught F == B bit-identical)."""
        import jax

        warm = self._warm_key(warm, finest=True)
        key = (spec, "chain_finest", maxiter, gtol, with_metrics, warm)
        if key not in self._fun_cache:
            solve = self._build_newton(spec, maxiter, gtol, warm=warm)
            metrics_body = self._build_metrics_body() if with_metrics else None

            def finest(x0, metric_in, *newton_args):
                bx, bf, it = solve(x0, *newton_args)
                if metrics_body is None:
                    return bx, bf, it
                gt, me, mw, ts = metric_in
                return bx, bf, it, metrics_body(bx, gt, me, mw, ts)

            self._fun_cache[key] = jax.jit(finest)
        return self._fun_cache[key]

    def optimize_with_metrics(self, events, gt_flow, timescale: float, metric_events):
        """Solve + AEE/FWL metrics as ONE device dispatch when the fused
        chain and fused metrics both apply (eval-loop fast path); falls
        back to optimize() + calculate_flow_error() otherwise.  Returns
        (per-scale motion dict, flow-error dict) — identical values to the
        two-call path (same kernels, same order)."""
        fusable = (
            self._chain_ready()
            and self.padding == 0
            and not (self.is_time_aware and self.flow_interpolation in ("nearest", "linear", "cubic"))
            and not (self.out_config or {}).get("trace_dir")
        )
        if not fusable:
            best = self.profiled_optimize(events)
            err = self.calculate_flow_error(best, gt_flow, timescale=timescale, events=metric_events)
            return best, err
        events = np.asarray(events, dtype=np.float64)
        ev, w = self.prepare_events(events)
        padded, wgt = pad_events(np.asarray(metric_events, dtype=np.float64))
        metric_in = (
            jnp.asarray(np.transpose(np.asarray(gt_flow), (2, 0, 1)), self.dtype),
            jnp.asarray(padded, self.dtype),
            jnp.asarray(wgt, self.dtype),
            jnp.asarray(timescale, self.dtype),
        )
        logger.info(f"Start optimization. DoF {self.motion_vector_size * self.total_n_patch}")
        refined = self._optimize_chain(events, ev, w, metric_in=metric_in)
        err = self._last_chain_metrics
        logger.info(f"flow_error = {err} for time period {timescale} sec.")
        return refined, err

    def _presearch_motion(self, s: int, coarser: Dict[int, np.ndarray]):
        """For scales that refine a coarser result via the per-patch
        sampling search, return (pre-search motion0 [2, n_patch], n_cand)
        so the search can be fused into the same device call as the Newton
        solve; None for scales whose init needs no search (coarsest with
        zero/random/warm/grid init).  Mirrors _init_scale's s>coarsest
        branch exactly."""
        if s <= self.coarsest_scale:
            return None
        motion0 = pyramid_expand(coarser[s - 1]).reshape(2, -1)
        expect = self.scaled_patch_image_size[s]
        motion0 = motion0.reshape((2,) + tuple(expect))
        warm = self.previous_frame_best_estimation
        if warm is not None:
            motion0 = (motion0 + warm[s]) / 2.0
        n_cand = max(4, int(self.opt_config["n_iter"] / max(1, s - self.coarsest_scale)))
        return motion0.reshape(2, -1), n_cand

    def _init_scale(self, s: int, events_np: np.ndarray, coarser: Dict[int, np.ndarray]) -> np.ndarray:
        """Initialization per reference run_scipy (pyramid.py:252-301)."""
        warm = self.previous_frame_best_estimation
        if warm is not None and s == self.coarsest_scale:
            return np.copy(warm[s])
        if s > self.coarsest_scale:
            motion0 = pyramid_expand(coarser[s - 1]).reshape(2, -1)
            # guard: expansion shape must match this scale's grid
            expect = self.scaled_patch_image_size[s]
            motion0 = motion0.reshape((2,) + tuple(expect))
            if warm is not None:
                motion0 = (motion0 + warm[s]) / 2.0
            n_cand = max(4, int(self.opt_config["n_iter"] / max(1, s - self.coarsest_scale)))
            return self.initialize_guess_from_patch_search(
                events_np, motion0.reshape(2, -1), n_cand
            )
        init = self.slv_config["patch"]["initialize"]
        if init == "random":
            return self.initialize_random()
        if init == "zero":
            return self.initialize_zeros()
        if init == "optuna-sampling":
            return self.initialize_guess_from_patch_search(
                events_np, self.initialize_zeros(), self.opt_config["n_iter"]
            )
        if init in ("global-best", "grid-best"):
            best = self._grid_best_translation(events_np, step=10 if init == "global-best" else 30)
            return np.tile(best[:, None], (1, self.n_patch))
        raise NotImplementedError(f"Initialization {init!r} not implemented")

    def _grid_best_translation(self, events_np: np.ndarray, step: int) -> np.ndarray:
        import jax
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

    def update_coarse_from_fine(self, motion_per_scale: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """Fine-to-coarse feedback via pyramid_reduce (ref pyramid.py:205-223)."""
        finest = max(motion_per_scale.keys())
        coarsest = min(motion_per_scale.keys())
        refined = {finest: motion_per_scale[finest]}
        for i in range(finest, coarsest, -1):
            refined[i - 1] = pyramid_reduce(refined[i])
        return refined

    # --------------------------------------------------------------- metrics
    def motion_to_dense_flow(self, pyramidal_motion, t_scale: float = 1.0):
        """Finest-scale tiles -> dense flow (+ optional time voxel)
        (ref pyramid.py:464-516).  The whole conversion runs as one
        cached jitted call keyed by the current patch geometry (eager
        per-op dispatch costs seconds through a tunneled runtime);
        host-only voxel schemes (griddata) keep the eager path."""
        finest = np.asarray(
            pyramidal_motion[self.current_scale]
            if isinstance(pyramidal_motion, dict)
            else pyramidal_motion,
            dtype=np.float64,
        )
        from .objective import _JIT_VOXEL_SCHEMES

        jittable = (not self.is_time_aware) or (
            self.flow_interpolation in _JIT_VOXEL_SCHEMES
        )
        if not jittable:
            dense = tile_to_dense_flow(
                jnp.asarray(finest), self.patch_image_size, self.image_shape,
                self.patch_size, self.sliding_window, self.patch_shift,
                self.filter_type,
            )
            scale = float(jnp.max(dense)) if self.scale_later else 1.0
            voxel = construct_dense_flow_voxel(
                dense * t_scale / scale, self.time_bin, self.flow_interpolation,
                t0_location=self.t0_flow_location,
            )
            return np.asarray(voxel * scale / t_scale)

        key = (
            "denseFlowJit", finest.shape, tuple(self.patch_image_size),
            tuple(self.image_shape), tuple(self.patch_size),
            tuple(self.sliding_window), tuple(self.patch_shift),
            self.filter_type, self.is_time_aware,
            getattr(self, "time_bin", 0),
            getattr(self, "flow_interpolation", None),
            getattr(self, "t0_flow_location", None),
            bool(getattr(self, "scale_later", False)),
        )
        if key not in self._fun_cache:
            pis, ims = tuple(self.patch_image_size), tuple(self.image_shape)
            ps, sw = tuple(self.patch_size), tuple(self.sliding_window)
            sh, ft = tuple(self.patch_shift), self.filter_type
            ta, sl = self.is_time_aware, bool(getattr(self, "scale_later", False))
            tb = getattr(self, "time_bin", 0)
            fi = getattr(self, "flow_interpolation", None)
            t0 = getattr(self, "t0_flow_location", None)

            def run(m, ts):
                dense = tile_to_dense_flow(m, pis, ims, ps, sw, sh, ft)
                if not ta:
                    return dense
                scale = jnp.max(dense) if sl else 1.0
                voxel = construct_dense_flow_voxel(
                    dense * ts / scale, tb, fi, t0_location=t0
                )
                return voxel * scale / ts

            self._fun_cache[key] = jax.jit(run)
        return np.asarray(
            self._fun_cache[key](jnp.asarray(finest), jnp.asarray(float(t_scale)))
        )

    def _build_metrics_body(self):
        """Un-jitted metrics body over the CURRENT (finest) scale geometry:
        f(m_flat, gt [2,H,W], events, weights, ts) -> error dict
        (AEE/NPE/AE + GT/PRED FWL + event mask + tile->dense (+voxel)).
        Shared by the standalone fused-metrics call and the solve+metrics
        chain so both produce identical values."""
        from ..flow.metrics import calculate_flow_error as cfe
        from ..ops.warp import Warp as _Warp

        imager = self.imager
        warper = _Warp(self.image_shape, normalize_t=True)
        backend = self.iwe_backend
        geom = (
            tuple(self.patch_image_size), self.image_shape, tuple(self.patch_size),
            tuple(self.sliding_window), tuple(self.patch_shift), self.filter_type,
        )
        ta = self.is_time_aware
        scale_later = getattr(self, "scale_later", False)
        time_bin = getattr(self, "time_bin", 10)
        scheme = getattr(self, "flow_interpolation", "burgers")
        t0_loc = getattr(self, "t0_flow_location", "middle")
        t0_idx = 0 if t0_loc == "first" else time_bin // 2

        def f(m, gt, e, w, ts):
            dense = tile_to_dense_flow(m, *geom)
            orig_iwe = imager.create_iwe(
                e, sigma=1, weight=w, blur_mode="scipy", backend=backend
            )

            def fwl_of(flow, model):
                warped = warper.warp_event(e, flow, model, weights=w)
                wiwe = imager.create_iwe(
                    warped, sigma=1, weight=w, blur_mode="scipy", backend=backend
                )
                ratio = F.normalized_image_variance(
                    wiwe, orig_iwe, omit_boundary=False, ddof=0
                )
                return 1.0 / ratio

            if ta:
                scale = jnp.max(dense) if scale_later else 1.0
                voxel = construct_dense_flow_voxel(
                    dense * ts / scale, time_bin, scheme, t0_location=t0_loc
                )
                pred_full = voxel * scale
                pred_err = pred_full[t0_idx]
                pred_fwl = fwl_of(pred_full, "dense-flow-voxel")
            else:
                pred_full = dense * ts
                pred_err = pred_full
                pred_fwl = fwl_of(pred_full, "dense-flow")
            gt_fwl = fwl_of(gt, "dense-flow")
            mask = imager.create_eventmask(e, weight=w)
            mask = mask[None] if mask.ndim == 3 else mask
            err = dict(cfe(gt[None], pred_err[None], mask))
            err["GT_FWL"] = gt_fwl
            err["PRED_FWL"] = pred_fwl
            return err

        return f

    def _metrics_fused_fn(self, n_pad: int):
        """AEE/NPE/AE + GT/PRED FWL + event mask + tile->dense (+voxel) as
        ONE jitted device call (the unfused path costs ~6 dispatches and
        ~0.46 s/frame through the tunnel).  Values match the composed path
        exactly — same kernels, same order."""
        key = ("metricsF", n_pad, self.current_scale)
        if key not in self._fwl_cache:
            import jax

            self._fwl_cache[key] = jax.jit(self._build_metrics_body())
        return self._fwl_cache[key]

    def calculate_flow_error(self, motion, gt_flow, timescale: float = 1.0, events=None) -> dict:
        """(ref pyramid.py:560-599)"""
        fusable = (
            events is not None
            and self.padding == 0
            and not (self.is_time_aware and self.flow_interpolation in ("nearest", "linear", "cubic"))
        )
        if fusable:
            finest = motion[self.current_scale] if isinstance(motion, dict) else motion
            padded, wgt = pad_events(np.asarray(events, dtype=np.float64))
            fn = self._metrics_fused_fn(len(padded))
            out = fn(
                jnp.asarray(np.asarray(finest, dtype=np.float64).reshape(-1), self.dtype),
                jnp.asarray(np.transpose(np.asarray(gt_flow), (2, 0, 1)), self.dtype),
                jnp.asarray(padded, self.dtype),
                jnp.asarray(wgt, self.dtype),
                jnp.asarray(timescale, self.dtype),
            )
            flow_error = {k: float(v) for k, v in out.items()}
            logger.info(f"{flow_error = } for time period {timescale} sec.")
            return flow_error
        gt_flow = np.transpose(np.asarray(gt_flow), (2, 0, 1))
        pred_flow = self.motion_to_dense_flow(motion, timescale) * timescale
        if self.is_time_aware:
            pred_flow = self.get_original_flow_from_time_aware_flow_voxel(pred_flow)
        pred_flow = pred_flow[None]
        if events is not None:
            event_mask = self._eventmask_np(events)
            if self.padding:
                event_mask = event_mask[..., self.padding : -self.padding, self.padding : -self.padding]
            event_mask = event_mask[None] if event_mask.ndim == 3 else event_mask
            fwl = self.calculate_fwl(motion, gt_flow, timescale, events)
        else:
            event_mask = None
            fwl = {}
        flow_error = calculate_flow_error_numpy(gt_flow[None], pred_flow, event_mask=event_mask)
        flow_error.update(fwl)
        logger.info(f"{flow_error = } for time period {timescale} sec.")
        return flow_error

    def calculate_fwl(self, motion, gt_flow, timescale: float, events) -> dict:
        fwl = {"GT_FWL": self._fwl_of_flow(events, np.asarray(gt_flow), use_voxel=False)}
        fwl.update(self.calculate_fwl_pred(motion, events, timescale))
        return fwl

    def calculate_fwl_pred(self, motion, events, timescale: float = 1.0) -> dict:
        pred_flow = self.motion_to_dense_flow(motion, timescale) * timescale
        return {"PRED_FWL": self._fwl_of_flow(events, pred_flow, use_voxel=self.is_time_aware)}

    # --------------------------------------------------------- visualization
    def visualize_one_batch_warp(self, events, warp=None):
        if self.visualizer is None:
            return
        events = np.asarray(events)
        if warp is None:
            clipped = self.create_clipped_iwe_for_visualization(events, self.iwe_visualize_max_scale)
            self.visualizer.visualize_image(clipped)
            return
        flow = self.motion_to_dense_flow(warp)
        if self.normalize_t_in_batch:
            flow = flow * (np.max(events[:, 2]) - np.min(events[:, 2]))
        clipped, warped, wgt = self._warped_viz_iwe(
            events, flow, self.motion_model_for_dense_warp, return_warped=True
        )
        if self.is_time_aware:
            flow = self.get_original_flow_from_time_aware_flow_voxel(flow)
        self.visualizer.visualize_image(clipped)
        self.visualizer.visualize_optical_flow_on_event_mask(flow, warped[wgt > 0])
        self.visualizer.visualize_overlay_optical_flow_on_event(flow, clipped)

    def visualize_pred_sequential(self, events, warp):
        if self.visualizer is None:
            return
        events = np.asarray(events)
        t_scale = (np.max(events[:, 2]) - np.min(events[:, 2])) if self.normalize_t_in_batch else 1.0
        flow = self.motion_to_dense_flow(warp, t_scale) * t_scale
        clipped, warped, wgt = self._warped_viz_iwe(
            events, flow, self.motion_model_for_dense_warp, direction="middle",
            return_warped=True,
        )
        if self.is_time_aware:
            flow = self.get_original_flow_from_time_aware_flow_voxel(flow)
        self.visualizer.visualize_image(clipped, file_prefix="pred_warp")
        self.visualizer.visualize_optical_flow_on_event_mask(
            flow, warped[wgt > 0], file_prefix="pred_masked"
        )
