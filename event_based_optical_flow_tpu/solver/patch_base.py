"""Patch (tile) based contrast maximization: shared machinery.

Mirrors the reference ``PatchContrastMaximization``
(src/solver/patch_contrast_base.py): tile-grid construction, per-patch
initialization strategies, tile->dense interpolation.  The per-evaluation
cost assembly lives in objective.py (jit-compiled); initialization
searches live in sampling.py (vmapped device sweeps).
"""

import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import tile_to_dense_flow
from ..types import FlowPatch
from .base import SolverBase
from .objective import (
    ObjectiveSpec,
    build_objective,
    build_objective_banded,
    build_orig_iwe_banded,
    build_value_grad_hvp,
    make_cost,
    objective_uses_banded,
    objective_uses_fused,
)
from .sampling import build_patch_search, gather_patch_events
from .scipy_bridge import minimize

logger = logging.getLogger(__name__)


def prepare_patch(
    image_size: Tuple[int, int],
    patch_size: Tuple[int, int],
    sliding_window: Tuple[int, int],
) -> Tuple[Dict[int, FlowPatch], tuple]:
    """Tile-center lattice (ref patch_contrast_base.py:73-105)."""
    image_h, image_w = image_size
    patch_h, patch_w = patch_size
    slide_h, slide_w = sliding_window
    center_x = np.arange(0, image_h - patch_h + slide_h, slide_h) + patch_h / 2
    center_y = np.arange(0, image_w - patch_w + slide_w, slide_w) + patch_w / 2
    xx, yy = np.meshgrid(center_x, center_y)
    patch_shape = xx.T.shape
    xx = xx.T.reshape(-1)
    yy = yy.T.reshape(-1)
    patches = {
        i: FlowPatch(x=xx[i], y=yy[i], shape=patch_size, u=0.0, v=0.0)
        for i in range(len(xx))
    }
    return patches, patch_shape


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, x)))))


class PatchContrastMaximization(SolverBase):
    def __init__(
        self,
        image_shape: tuple,
        calibration_parameter: dict,
        solver_config: dict = {},
        optimizer_config: dict = {},
        output_config: dict = {},
        visualize_module=None,
    ):
        self.patch_shift = (0, 0)
        self.patch_image_size = (0, 0)
        self.n_patch = 0
        self.patches: Dict[int, FlowPatch] = {}
        super().__init__(
            image_shape,
            calibration_parameter,
            solver_config,
            optimizer_config,
            output_config,
            visualize_module,
        )
        self.filter_type = self.slv_config.get("patch", {}).get("filter_type", "bilinear")
        self._fun_cache: Dict = {}
        self._search_cache: Dict = {}
        self._key = jax.random.PRNGKey(int(self.slv_config.get("seed", 0)))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_patch_size_and_sliding_window(self):
        size = self.slv_config["patch"]["size"]
        self.patch_size = (size, size) if isinstance(size, int) else tuple(size)
        sw = self.slv_config["patch"]["sliding_window"]
        self.sliding_window = (sw, sw) if isinstance(sw, int) else tuple(sw)

    # --- initialization strategies ------------------------------------------
    def initialize_random(self):
        """Uniform in the configured parameter box (ref :108-119)."""
        x0 = self._rng.random((self.motion_vector_size, self.n_patch))
        p = self.opt_config["parameters"]
        x0[0] = x0[0] * (p["trans_x"]["max"] - p["trans_x"]["min"]) + p["trans_x"]["min"]
        x0[1] = x0[1] * (p["trans_y"]["max"] - p["trans_y"]["min"]) + p["trans_y"]["min"]
        return x0

    def initialize_zeros(self):
        return np.zeros((self.motion_vector_size, self.n_patch), dtype=np.float64)

    # --- tile -> dense ------------------------------------------------------
    def interpolate_dense_flow_from_patch(self, motion_array) -> np.ndarray:
        return np.asarray(
            tile_to_dense_flow(
                jnp.asarray(np.asarray(motion_array, dtype=np.float64)),
                self.patch_image_size,
                self.image_shape,
                self.patch_size,
                self.sliding_window,
                self.patch_shift,
                self.filter_type,
            )
        )

    def motion_to_dense_flow(self, motion_array):
        return self.interpolate_dense_flow_from_patch(motion_array)

    # --- objective construction ---------------------------------------------
    def _current_spec(self, time_aware: Optional[bool] = None) -> ObjectiveSpec:
        ta = self.is_time_aware if time_aware is None else time_aware
        return ObjectiveSpec(
            image_shape=self.image_shape,
            outer_padding=self.padding,
            patch_image_size=tuple(self.patch_image_size),
            patch_size=tuple(self.patch_size),
            sliding_window=tuple(self.sliding_window),
            patch_shift=tuple(self.patch_shift),
            filter_type=self.filter_type,
            iwe_method=self.iwe_config["method"],
            blur_sigma=self.iwe_config["blur_sigma"],
            cost_name=self.slv_config["cost"],
            cost_with_weight=(
                tuple(self.slv_config["cost_with_weight"].items())
                if self.slv_config["cost"] == "hybrid"
                else None
            ),
            time_aware=ta,
            time_bin=getattr(self, "time_bin", 10),
            flow_interpolation=getattr(self, "flow_interpolation", "burgers"),
            t0_location=getattr(self, "t0_flow_location", "middle"),
            scale_later=getattr(self, "scale_later", False),
            iwe_backend=self.iwe_backend,
            motion_model=getattr(self, "objective_motion_model", "tiles"),
        )

    def _get_funs(self, spec: ObjectiveSpec):
        if spec not in self._fun_cache:
            self._fun_cache[spec] = build_value_grad_hvp(spec)
        return self._fun_cache[spec]

    def _history_cb(self, loss, components):
        if not self.cost_func.store_history:
            return
        self.cost_func.history["loss"].append(float(loss))
        if components and hasattr(self.cost_func, "cost_func"):
            for name, val in components.items():
                if name in self.cost_func.cost_func:
                    self.cost_func.cost_func[name]["func"].history["loss"].append(float(val))

    # --- on-device Newton-CG ------------------------------------------------
    def _uses_banded(self, spec) -> bool:
        return objective_uses_banded(spec)

    def _want_analytic(self, warm: bool, finest: bool) -> bool:
        """THE hvp-mode routing table (single-sourced for the sequential
        AND fleet Newton builders): does a solver for this (warmth,
        scale) pair use the v10 analytic HVP kernels?  See
        _build_newton's mode docs for the measured rationale."""
        mode = str(self.opt_config.get("hvp_mode", "fd")).lower()
        if mode in ("analytic-all", "analytic-full"):
            return True
        if mode == "analytic":
            return bool(finest)
        if mode == "analytic-warm":
            return bool(finest or warm)
        if mode == "analytic-coldfd":
            return bool(warm and finest)
        return False

    def _warm_key(self, warm: bool, finest: bool = True) -> bool:
        """Normalize the per-call warm flag for solver cache keys:
        include warm only when the built program for THIS scale actually
        differs by warmth (analytic-warm: coarse scales only;
        analytic-coldfd: finest scale only) — otherwise the first warm
        frame pays a full redundant retrace of bit-identical solvers
        (measured: +17-34 s/arm in the DSEC hvp A/B before this guard)."""
        return bool(warm) and (
            self._want_analytic(True, finest)
            != self._want_analytic(False, finest)
        )

    def _get_newton_solver(self, spec, maxiter: int, gtol: float, cg_maxiter=None,
                           finest=True, warm=False):
        warm = self._warm_key(warm, finest)
        key = (spec, "newton", maxiter, gtol, cg_maxiter, self._uses_banded(spec),
               finest, warm)
        if key not in self._fun_cache:
            self._fun_cache[key] = jax.jit(
                self._build_newton(spec, maxiter, gtol, cg_maxiter=cg_maxiter,
                                   finest=finest, warm=warm)
            )
        return self._fun_cache[key]

    def _banded_newton_args(self, events_np: np.ndarray, g_round: int = 0):
        """Packed banded args for this exact event array (identity-cached,
        2 slots: the full frame and an optional coarse-scale subsample —
        strong references, so ids cannot be reused while cached)."""
        cache = getattr(self, "_banded_cache", None)
        if cache is None:
            cache = self._banded_cache = []
        for ref, args in cache:
            if ref is events_np:
                return args
        if not g_round and events_np is getattr(self, "_coarse_sub", None):
            # coarse-scale subsample: its chunk count varies frame to
            # frame more than the full pack's, so bucket G coarser (each
            # unseen bucket is a fresh jit of the whole Newton program)
            g_round = 32
        args = self._pack_banded(events_np, g_round=g_round)
        cache.append((events_np, args))
        if len(cache) > 2:
            cache.pop(0)
        return args

    def _pack_banded(self, events_np: np.ndarray, g_round: int = 0):
        """Per-frame host packing for the banded kernel (cached per frame
        via the caller); returns device args + scalar t_scale.  On a mesh,
        the chunk axis is padded to a multiple of the event-shard count
        (extra chunks are inert) and the arrays are placed pre-sharded so
        the solve's shard_map starts without a reshard collective."""
        from ..ops.pallas_objective_banded import (
            pack_events_by_band_bin,
            pack_events_dense,
        )
        from ..types import pad_events

        padded, wgt = pad_events(np.asarray(events_np, dtype=np.float64))
        t = padded[:, 2]
        t_min = t[wgt > 0].min()
        t_max = t[wgt > 0].max()
        span = (t_max - t_min) or 1.0
        dtf = (t - t_min) / span
        if self.is_time_aware:
            packed = pack_events_by_band_bin(
                padded, wgt, dtf, self.image_shape[0], getattr(self, "time_bin", 10)
            )
        else:
            packed = pack_events_dense(
                padded, wgt, dtf, self.image_shape[0], self.image_shape[1],
                g_round=g_round,
            )
        if self.mesh is not None and self.n_event_shards > 1:
            from jax.sharding import NamedSharding

            from ..parallel.sharded import pad_chunks_for_sharding
            from .objective import _chunk_specs

            packed = pad_chunks_for_sharding(packed, self.n_event_shards)
            chunk_spec, band_spec = _chunk_specs(self.is_time_aware)
            specs = (chunk_spec,) * 4 + (band_spec,)
            x2, y2, d2, w2, bands = (
                jax.device_put(
                    jnp.asarray(a, self.dtype if a.dtype.kind == "f" else None),
                    NamedSharding(self.mesh, s),
                )
                for a, s in zip(packed, specs)
            )
        else:
            x2, y2, d2, w2, bands = packed
            x2 = jnp.asarray(x2, self.dtype)
            y2 = jnp.asarray(y2, self.dtype)
            d2 = jnp.asarray(d2, self.dtype)
            w2 = jnp.asarray(w2, self.dtype)
            bands = jnp.asarray(bands)
        return (x2, y2, d2, w2, bands, jnp.asarray(t_max - t_min, self.dtype))

    def _build_newton(self, spec, maxiter: int, gtol: float, cg_maxiter=None,
                      finest=True, warm=False):
        """Newton-CG solve fn(x0, *banded_or_event_args).  On the banded
        path with an orig-dependent cost, the motion-independent orig IWE
        is computed ONCE up front (build_orig_iwe_banded) instead of as a
        4th vote inside every objective evaluation of the Newton loop
        (~25% of the forward vote FLOPs).

        ``cg_maxiter`` overrides ``optimizer.cg_maxiter`` for this solver
        instance (the pyramid's coarse-scale budget knob).  ``finest``:
        whether this solver runs the pyramid's finest scale (True for
        single-scale solvers) — ``hvp_mode: analytic`` is a per-scale
        HYBRID that keeps the FD HVP on the coarse scales (see below)."""
        from .newton_cg import build_newton_cg

        orig_fn = None
        hvp_fn = None
        hvp_prep_fn = None
        hvp_mode_cfg = str(self.opt_config.get("hvp_mode", "fd")).lower()
        if hvp_mode_cfg not in ("fd", "analytic", "analytic-warm",
                                "analytic-coldfd", "analytic-all",
                                "analytic-full") \
                and not getattr(self, "_warned_hvp_mode", False):
            logger.warning(
                f"optimizer.hvp_mode: {hvp_mode_cfg!r} is not recognized "
                "(fd | analytic | analytic-warm | analytic-coldfd | "
                "analytic-all | analytic-full) — using fd"
            )
            self._warned_hvp_mode = True
        # "analytic" = the ADOPTABLE hybrid: Gauss-Newton curvature via the
        # v10 fused JVP+HVP kernels on the FINEST scale only; coarse scales
        # keep the central-FD HVP.  Measured (tools/ab_policy.py
        # hvp-analytic): warm frames match central-FD accuracy at ~2.6x
        # speed, but full-chain analytic misroutes COLD starts (the GN/full
        # curvature misses the washboard's floor-crossing delta curvature,
        # so coarse-scale basin selection overshoots) — hence the hybrid.
        # "analytic-warm" = the streaming speed mode: cold frames run the
        # hybrid, WARM frames (a previous-frame estimate seeds every
        # scale) run analytic GN on every scale — measured safe warm and
        # 2.6x the central-FD wall (ab_policy hvp-analytic arm C, warm
        # rounds).  "analytic-coldfd" = the accuracy-first hybrid: COLD
        # frames run central-FD on every scale (the rot cold-frame
        # basin-selection regression of the plain hybrid is cold-only —
        # round-4 rot CG study), warm frames run the hybrid (analytic
        # finest).  "analytic-all"/"analytic-full" run GN / full-H
        # analytic on every scale unconditionally (study modes).
        want_analytic = self._want_analytic(warm, finest)
        if self._uses_banded(spec):
            mesh = self.mesh if self.n_event_shards > 1 else None
            hoist = "orig_iwe" in make_cost(spec).required_keys
            obj = build_objective_banded(spec, precomputed_orig=hoist, mesh=mesh)
            if hoist:
                orig_fn = build_orig_iwe_banded(spec, mesh=mesh)
            if want_analytic:
                from .objective import (
                    build_objective_banded_hvp_staged,
                    objective_supports_analytic_hvp,
                )

                gn = hvp_mode_cfg != "analytic-full"
                if objective_supports_analytic_hvp(spec, gauss_newton=gn):
                    # staged: the value images are computed once per CG
                    # solve (hvp_prep_fn); every HVP runs the tangent-only
                    # JVP kernel + the HVP-backward kernel.  Under an
                    # event mesh the kernels shard like the objective.
                    # Time-aware specs route to the voxel JVP/HVP kernels
                    # (Gauss-Newton assembly only).
                    hvp_prep_fn, hvp_fn = build_objective_banded_hvp_staged(
                        spec, precomputed_orig=hoist, gauss_newton=gn,
                        mesh=mesh,
                    )
                elif not getattr(self, "_warned_analytic_hvp", False):
                    logger.warning(
                        "optimizer.hvp_mode: analytic is not supported for "
                        "this objective (time-aware: analytic-full, or a "
                        "voxel too large for the HVP's VMEM footprint) — "
                        "falling back to the FD HVP"
                    )
                    self._warned_analytic_hvp = True
        else:
            if want_analytic and not getattr(self, "_warned_analytic_hvp", False):
                logger.warning(
                    "optimizer.hvp_mode: analytic requires the fused banded "
                    "objective (backend %s, default backend %s) — falling "
                    "back to the %s HVP",
                    spec.iwe_backend or "auto", jax.default_backend(),
                    "FD" if objective_uses_fused(spec) else "autodiff",
                )
                self._warned_analytic_hvp = True
            if self.mesh is not None and not getattr(self, "_warned_mesh_unused", False):
                logger.warning(
                    "a 'parallel' mesh is configured but the objective does "
                    "not route through the fused banded kernel (backend "
                    f"{spec.iwe_backend or 'auto'}, time_aware={spec.time_aware}); "
                    "the solve runs single-device"
                )
                self._warned_mesh_unused = True
            obj = build_objective(spec)
        value_fn = lambda x, *a: obj(x, *a)[0]
        kind = str(self.opt_config.get("device_solver", "newton-cg")).lower()
        if kind == "lbfgs":
            # cheap-iteration alternative (one gradient per iteration vs
            # 1 + 2*cg_maxiter for central-FD truncated Newton) — the
            # large-event-count (DSEC) lever; budget via max_iter (counts
            # L-BFGS iterations: expect ~2-4x the Newton value)
            from .newton_cg import build_lbfgs

            ignored = [
                k for k in ("cg_maxiter", "coarse_cg_maxiter", "hvp_central",
                            "hvp_mode", "fd_polish")
                if k in self.opt_config
            ]
            if ignored and not getattr(self, "_warned_lbfgs_ignored", False):
                logger.warning(
                    f"optimizer keys {ignored} have no effect under "
                    "device_solver: lbfgs (no CG inner loop / no HVPs)"
                )
                self._warned_lbfgs_ignored = True

            solve_inner = build_lbfgs(
                value_fn,
                maxiter=maxiter,
                xtol=1e-5,
                gtol=gtol,
                memory=int(self.opt_config.get("lbfgs_memory", 8)),
            )
        else:
            if hvp_fn is not None:
                hvp_mode = "analytic"
            elif self._uses_banded(spec) or objective_uses_fused(spec):
                hvp_mode = "fd"
            else:
                hvp_mode = "autodiff"
            max_step = None
            if hvp_fn is not None:
                # analytic curvature needs the trust safeguard (see
                # build_newton_cg's max_step doc); px/s units
                max_step = float(self.opt_config.get("hvp_max_step", 10.0))
            solve_inner = build_newton_cg(
                value_fn,
                maxiter=maxiter,
                cg_maxiter=int(
                    cg_maxiter if cg_maxiter is not None
                    else self.opt_config.get("cg_maxiter", 32)
                ),
                xtol=1e-5,
                gtol=gtol,
                hvp_mode=hvp_mode,
                fd_central=bool(self.opt_config.get("hvp_central", True)),
                hvp_fn=hvp_fn,
                hvp_prep_fn=hvp_prep_fn,
                max_step=max_step,
                # optimizer.fd_polish: K central-FD refinement iterations
                # appended to the ANALYTIC solve, FINEST scale only (the
                # GN freeze it fixes is a final-sub-pixel-refinement
                # phenomenon; polishing coarse scales doubled the
                # analytic-warm wall for zero EPE — r5 awpolish gate) —
                # inert on FD/autodiff paths
                fd_polish=(
                    int(self.opt_config.get("fd_polish", 0))
                    if hvp_fn is not None and finest else 0
                ),
            )
        if orig_fn is None:
            return solve_inner

        def solve(x0, *args):
            return solve_inner(x0, orig_fn(*args), *args)

        return solve

    def _get_fused_scale_solver(self, spec, search_key, maxiter: int, gtol: float,
                                cg_maxiter=None, finest=True, warm=False):
        """Per-patch init sweep + Newton-CG as ONE jitted device program.

        Through a tunneled runtime every dispatch costs 25-120 ms; fusing
        the two per-scale calls halves that overhead.  Signature:
        fused(patch_events, weights, counts, motion0 [P,2], key, *newton_args)
          -> (best_x, best_f, n_iter)."""
        warm = self._warm_key(warm, finest)
        key = (spec, "fused_scale", search_key, maxiter, gtol, cg_maxiter,
               self._uses_banded(spec), finest, warm)
        if key not in self._fun_cache:
            search = self._get_patch_search(search_key)
            solve = self._build_newton(spec, maxiter, gtol, cg_maxiter=cg_maxiter,
                                       finest=finest, warm=warm)

            def fused(patch_events, weights, counts, motion0, key_, *newton_args):
                m1 = search(patch_events, weights, counts, motion0, key_)
                x0 = m1.T.reshape(-1).astype(self.dtype)
                return solve(x0, *newton_args)

            self._fun_cache[key] = jax.jit(fused)
        return self._fun_cache[key]

    def _run_fused_scale_device(self, spec, events_np, ev, w, motion0, n_candidates,
                                maxiter, gtol, patch_size=None, newton_events_np=None,
                                cg_maxiter=None, finest=True, warm=False):
        """Host glue for the fused scale step: gather per-patch events,
        assemble Newton args (banded pack or padded events), one call.
        ``newton_events_np`` (optional) substitutes a different event set
        for the Newton solve only (coarse-scale subsampling); the init
        search always sees the full frame."""
        patch_size = tuple(patch_size or self.patch_size)
        capacity = self._patch_capacity(len(events_np))
        patch_events, weights, counts = gather_patch_events(events_np, self.patches, capacity)
        search_key = (patch_size, int(n_candidates), capacity)
        fused = self._get_fused_scale_solver(spec, search_key, maxiter, gtol,
                                             cg_maxiter=cg_maxiter, finest=finest,
                                             warm=warm)
        if self._uses_banded(spec):
            newton_args = self._banded_newton_args(
                events_np if newton_events_np is None else newton_events_np
            )
        else:
            newton_args = (ev, w)
        best_x, best_f, n_iter = fused(
            jnp.asarray(patch_events, self.dtype),
            jnp.asarray(weights, self.dtype),
            jnp.asarray(counts),
            jnp.asarray(np.asarray(motion0, dtype=np.float64).reshape(2, -1).T, self.dtype),
            self._next_key(),
            *newton_args,
        )
        best_f = float(best_f)
        self._history_cb(best_f, None)
        logger.info(f"device fused search+Newton: {int(n_iter)} iters, loss {best_f:.6f}")
        return np.asarray(best_x, dtype=np.float64)

    def _run_newton_device(self, spec, events_dev, weights_dev, motion0, maxiter, gtol,
                           events_np=None, cg_maxiter=None, finest=True, warm=False):
        """Whole Newton-CG solve as one device program (solver/newton_cg.py):
        replaces ~100 host round trips per scale with one."""
        solve = self._get_newton_solver(spec, maxiter, gtol, cg_maxiter=cg_maxiter,
                                        finest=finest, warm=warm)
        x0 = jnp.asarray(np.asarray(motion0, dtype=np.float64).reshape(-1), self.dtype)
        if self._uses_banded(spec):
            best_x, best_f, n_iter = solve(x0, *self._banded_newton_args(events_np))
        else:
            best_x, best_f, n_iter = solve(x0, events_dev, weights_dev)
        best_f = float(best_f)
        self._history_cb(best_f, None)
        logger.info(f"device Newton-CG: {int(n_iter)} iters, loss {best_f:.6f}")
        return np.asarray(best_x, dtype=np.float64)

    # --- scipy path ---------------------------------------------------------
    def _run_scipy_on_spec(self, spec, events_dev, weights_dev, motion0, options):
        vg, hvp, hess = self._get_funs(spec)
        dt = self.dtype

        def vg_np(x):
            loss, grad, aux = vg(jnp.asarray(x, dt), events_dev, weights_dev)
            return loss, grad, aux

        result = minimize(
            vg_np,
            np.asarray(motion0, dtype=np.float64).reshape(-1),
            method=self.opt_method,
            options=options,
            hvp=lambda x, p: hvp(jnp.asarray(x, dt), jnp.asarray(p, dt), events_dev, weights_dev),
            hess=lambda x: hess(jnp.asarray(x, dt), events_dev, weights_dev),
            history_cb=self._history_cb,
        )
        return result

    # --- sampling ("optuna") path -------------------------------------------
    def _run_sampling_on_spec(self, spec, events_dev, weights_dev, motion0, n_iter: int,
                              n_rounds: int = 4):
        """Joint sampling optimizer standing in for the reference's Optuna
        studies (ref base.py:738-787): rounds of per-patch perturbed
        candidates, each evaluated with the full jitted objective; the
        incumbent always survives."""
        import dataclasses

        # candidates are vmapped through the objective: keep the XLA
        # matmul backend (the fused pallas kernel doesn't support vmap)
        obj = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
        p = self.opt_config["parameters"]
        lo = np.array([p["trans_x"]["min"], p["trans_y"]["min"]])
        hi = np.array([p["trans_x"]["max"], p["trans_y"]["max"]])
        k_per_round = max(1, n_iter // n_rounds)
        best = np.asarray(motion0, dtype=np.float64).reshape(-1)
        eval_batch = jax.jit(jax.vmap(lambda x: obj(x, events_dev, weights_dev)[0]))

        best_loss = float(eval_batch(jnp.asarray(best[None], self.dtype))[0])
        scale = 1.0
        for r in range(n_rounds):
            if r == 0 and self.sampling_method in ("TPE", "random"):
                cands = self._rng.random((k_per_round, best.size))
                box_lo = np.tile(lo, best.size // 2)
                box_hi = np.tile(hi, best.size // 2)
                cands = cands * (box_hi - box_lo) + box_lo
            else:
                sigma = (np.tile(hi - lo, best.size // 2)) / 8.0 * scale
                cands = best[None] + self._rng.standard_normal((k_per_round, best.size)) * sigma
            losses = np.asarray(eval_batch(jnp.asarray(cands, self.dtype)))
            i = int(np.nanargmin(losses))
            if losses[i] < best_loss:
                best_loss = float(losses[i])
                best = cands[i]
            scale *= 0.5
            self._history_cb(best_loss, None)
        return best, best_loss

    # --- per-patch init search ----------------------------------------------
    def _patch_capacity(self, n_events: int) -> int:
        guess = 2 * n_events // max(1, self.n_patch)
        return int(min(max(512, _next_pow2(guess)), _next_pow2(n_events)))

    def _get_patch_search(self, key):
        if key not in self._search_cache:
            patch_size, n_candidates, capacity = key
            self._search_cache[key] = build_patch_search(
                patch_size,
                n_candidates,
                blur_sigma=self.iwe_config["blur_sigma"],
                iwe_method=self.iwe_config["method"],
                outer_padding=self.padding,
                iwe_backend=self.iwe_backend,
            )
        return self._search_cache[key]

    def initialize_guess_from_patch_search(
        self, events_np: np.ndarray, motion0: np.ndarray, n_candidates: int,
        patch_size: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        """Per-patch refinement of motion0 [2, n_patch] via the device
        sampling sweep (replaces ref initialize_guess_from_optuna_sampling,
        patch_contrast_pyramid.py:320-361)."""
        patch_size = tuple(patch_size or self.patch_size)
        capacity = self._patch_capacity(len(events_np))
        patch_events, weights, counts = gather_patch_events(events_np, self.patches, capacity)
        search = self._get_patch_search((patch_size, int(n_candidates), capacity))
        motion1 = search(
            jnp.asarray(patch_events, self.dtype),
            jnp.asarray(weights, self.dtype),
            jnp.asarray(counts),
            jnp.asarray(np.asarray(motion0, dtype=np.float64).reshape(2, -1).T, self.dtype),
            self._next_key(),
        )
        return np.asarray(motion1, dtype=np.float64).T  # [2, n_patch]
