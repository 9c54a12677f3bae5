"""Fleet solving: many frames through one device program.

The reference eval loop is strictly sequential (one frame at a time,
reference main.py:59); without warm-start chaining the frames are
independent, so a fleet of B frames can be initialized, Newton-solved and
measured together: per pyramid scale, ONE batched init sweep and ONE
batched Newton-CG whose iterations run in lockstep (finished frames are
frozen).  This amortizes per-call overhead and keeps the MXU fed.

Components:
* ``build_batched_objective`` — losses [B] of motion [B, M] over events
  [B, N, 4] (natively batched fused kernel on TPU, vmapped XLA elsewhere)
* ``build_newton_cg_batched`` — per-frame truncated Newton in lockstep
* ``FleetPyramidalSolver`` — optimize_batch(list of event arrays)
"""

import logging
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blur import gaussian_blur3
from ..ops.interp import tile_to_dense_flow
from ..types import pad_events
from .objective import (
    ObjectiveSpec,
    build_objective,
    make_cost,
    objective_uses_banded,
    objective_uses_fused,
)
from .pyramid import (
    COARSE_SUBSAMPLE_MIN_EVENTS,
    PyramidalPatchContrastMaximization,
    coarse_subsample,
)

from ..costs.functional import nan_to_penalty

logger = logging.getLogger(__name__)

Array = jax.Array


def pack_fleet_banded(events_list, image_height: int, dtype=np.float64,
                      time_bin: int = 0, image_width: int = 0,
                      g_round: int = 0):
    """Host packing of a fleet for the batched-banded kernel: returns
    (x, y, dtf, wt [B,G,1,C], band_rows [B,G,1,128], t_scales [B]).
    With ``time_bin`` > 0 (time-aware), packs per (bin, band) instead and
    returns [B,T,G,1,C] chunks with [B,T,G,1,128] band rows, all frames
    padded to the fleet-wide max chunk count.  With ``image_width`` > 0
    (dense path only) packs via ``pack_events_dense`` — the objective
    packing policy (OBJECTIVE_DENSE_PACKING) — matching the ``col_bands``
    flag build_batched_objective_banded passes (see CLAUDE.md packing
    conventions).  ``g_round`` > 0 rounds the fleet-wide chunk count up
    to a multiple (coarse subsample packs bucket at 32 to bound jit
    retraces, mirroring patch_base._banded_newton_args)."""
    from ..ops.pallas_objective_banded import (
        pack_events_by_band,
        pack_events_by_band_bin,
        pack_events_dense,
    )

    if time_bin > 0 and image_width > 0:
        raise ValueError("tile packing (image_width) is dense-path only")
    target_n = max(len(e) for e in events_list)
    target_n = ((target_n + 4095) // 4096) * 4096
    xs, ys, ds, ws, bs, scales = [], [], [], [], [], []
    for e in events_list:
        padded, wgt = pad_events(np.asarray(e, dtype=np.float64), target_n=target_n)
        t = padded[:, 2]
        t_min = t[wgt > 0].min()
        t_max = t[wgt > 0].max()
        span = (t_max - t_min) or 1.0
        dtf = (t - t_min) / span
        if time_bin > 0:
            x2, y2, d2, w2, bands = pack_events_by_band_bin(
                padded, wgt, dtf, image_height, time_bin
            )
        elif image_width > 0:
            x2, y2, d2, w2, bands = pack_events_dense(
                padded, wgt, dtf, image_height, image_width
            )
        else:
            x2, y2, d2, w2, bands = pack_events_by_band(padded, wgt, dtf, image_height)
        xs.append(x2); ys.append(y2); ds.append(d2); ws.append(w2)
        bs.append(bands)
        scales.append(t_max - t_min)
    if time_bin > 0:
        # frames may need different per-bin chunk counts: pad to the max
        g_max = max(a.shape[1] for a in xs)
        if g_round > 0:
            g_max = -(-g_max // g_round) * g_round

        def _pad(a, fill):
            out = np.full(a.shape[:1] + (g_max,) + a.shape[2:], fill, a.dtype)
            out[:, : a.shape[1]] = a
            return out

        xs = [_pad(a, -10.0) for a in xs]
        ys = [_pad(a, -10.0) for a in ys]
        ds = [_pad(a, 0.0) for a in ds]
        ws = [_pad(a, 0.0) for a in ws]
        bs = [
            np.broadcast_to(_pad(b, 0).astype(np.int32)[:, :, None, None], (time_bin, g_max, 1, 128))
            for b in bs
        ]
    else:
        # flex packing gives data-dependent per-frame chunk counts: pad
        # every frame to the fleet max with inert sentinel chunks
        g_max = max(a.shape[0] for a in xs)
        if g_round > 0:
            g_max = -(-g_max // g_round) * g_round

        def _pad0(a, fill):
            out = np.full((g_max,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        xs = [_pad0(a, -10.0) for a in xs]
        ys = [_pad0(a, -10.0) for a in ys]
        ds = [_pad0(a, 0.0) for a in ds]
        ws = [_pad0(a, 0.0) for a in ws]
        bs = [
            np.broadcast_to(_pad0(b, 0).astype(np.int32)[:, None, None], (g_max, 1, 128))
            for b in bs
        ]
    return (
        np.stack(xs), np.stack(ys), np.stack(ds), np.stack(ws),
        np.stack(bs), np.asarray(scales),
    )


def build_orig_iwe_banded_batched(spec: ObjectiveSpec):
    """Fleet analog of objective.build_orig_iwe_banded: the per-frame
    motion-independent blurred orig IWEs [B, H, W] from pre-packed fleet
    chunks, computed once per batched solve instead of as a vote in
    every lockstep evaluation."""
    import jax.numpy as jnp

    from .. import config as evconfig
    from ..ops.blur import gaussian_blur3
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded_batched,
        fused_multi_iwe_banded_voxel_batched,
        objective_dense_col_bands,
        objective_row_scale,
        objective_row_window,
        objective_tent,
    )

    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    use_bf16 = backend_raw in ("auto", "pallas_bf16")
    h, w = spec.image_shape

    def orig_fn(x, y, dtf, wt, band_rows, *_rest):
        bsz = x.shape[0]
        if spec.time_aware:
            zeros = jnp.zeros((bsz, x.shape[1], 2, h, w), x.dtype)
            imgs = fused_multi_iwe_banded_voxel_batched(
                zeros, x, y, dtf, wt, band_rows, spec.image_shape, (), True,
                1e-6, use_bf16, objective_row_window(h), objective_tent(use_bf16),
            )
        else:
            zeros = jnp.zeros((bsz, 2, h, w), x.dtype)
            imgs = fused_multi_iwe_banded_batched(
                zeros, x, y, dtf, wt, band_rows, spec.image_shape, (), True,
                1e-6, use_bf16, objective_dense_col_bands(w),
                objective_row_window(h), objective_row_scale(w),
                objective_tent(use_bf16),
            )
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        return jax.lax.stop_gradient(imgs[:, 0])

    return orig_fn


def build_batched_objective_banded(spec: ObjectiveSpec, precomputed_orig: bool = False):
    """Fleet objective over pre-packed banded chunks:
    fn(motion [B,M], x, y, dtf, wt, band_rows, t_scales) -> losses [B].
    With ``precomputed_orig`` the signature gains a leading
    orig [B, H, W] (build_orig_iwe_banded_batched) after ``motion`` and
    the kernels skip the orig vote."""
    from .. import config as evconfig
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded_batched,
        fused_multi_iwe_banded_voxel_batched,
        objective_dense_col_bands,
        objective_row_scale,
        objective_row_window,
        objective_tent,
    )

    cost = make_cost(spec)
    required = set(cost.required_keys)
    directions = []
    if required & {"iwe", "backward_iwe"}:
        directions.append(("backward", 0.0))
    if "forward_iwe" in required:
        directions.append(("forward", 1.0))
    if "middle_iwe" in required:
        directions.append(("middle", 0.5))
    need_orig = "orig_iwe" in required
    kernel_orig = need_orig and not precomputed_orig
    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    use_bf16 = backend_raw in ("auto", "pallas_bf16")

    def _batched_body(motion, orig_b, x, y, dtf, wt, band_rows, t_scales):
        from .objective import motion_to_dense_flow

        flows = jax.vmap(
            lambda m, ts: motion_to_dense_flow(spec, m, ts) * ts
        )(motion, t_scales)
        if spec.time_aware:
            imgs = fused_multi_iwe_banded_voxel_batched(
                flows, x, y, dtf, wt, band_rows, spec.image_shape,
                tuple(d for _, d in directions), kernel_orig, 1e-6, use_bf16,
                objective_row_window(spec.image_shape[0]),
                objective_tent(use_bf16),
            )
        else:
            # dense fleet chunks come from pack_fleet_banded(image_width=w)
            # -> pack_events_dense; the flags match the policy by design
            imgs = fused_multi_iwe_banded_batched(
                flows, x, y, dtf, wt, band_rows, spec.image_shape,
                tuple(d for _, d in directions), kernel_orig, 1e-6, use_bf16,
                objective_dense_col_bands(spec.image_shape[1]),
                objective_row_window(spec.image_shape[0]),
                objective_row_scale(spec.image_shape[1]),
                objective_tent(use_bf16),
            )
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        if orig_b is None:
            orig_b = jnp.zeros((motion.shape[0],) + tuple(spec.image_shape), imgs.dtype)

        def per_frame(img_k, orig_k, m):
            arg = {"omit_boundary": True, "clip": True}
            k = 0
            if kernel_orig:
                arg["orig_iwe"] = img_k[0]
                k = 1
            elif need_orig:
                arg["orig_iwe"] = orig_k
            for name, _ in directions:
                if name == "backward":
                    arg.update({"iwe": img_k[k], "backward_iwe": img_k[k]})
                else:
                    arg[f"{name}_iwe"] = img_k[k]
                k += 1
            if "flow" in required:
                arg["flow"] = m.reshape((2,) + tuple(spec.patch_image_size))
            loss = cost.calculate(arg)
            return nan_to_penalty(loss)

        return jax.vmap(per_frame)(imgs, orig_b, motion)

    if precomputed_orig:
        def batched(motion, orig_b, x, y, dtf, wt, band_rows, t_scales):
            return _batched_body(motion, orig_b, x, y, dtf, wt, band_rows, t_scales)
    else:
        def batched(motion, x, y, dtf, wt, band_rows, t_scales):
            return _batched_body(motion, None, x, y, dtf, wt, band_rows, t_scales)

    return batched


def build_batched_objective_banded_hvp(spec: ObjectiveSpec,
                                       precomputed_orig: bool = False,
                                       gauss_newton: bool = True,
                                       staged: bool = False):
    """Fleet analog of objective.build_objective_banded_hvp (v10):
    hvp(motion [B,M], p [B,M], [orig_b [B,H,W],] x, y, dtf, wt,
    band_rows, t_scales) -> H @ p per frame [B,M].

    One fused batched JVP pass + one fused batched HVP-backward pass per
    lockstep CG iteration replaces central FD's 2 batched gradient
    evaluations.  Same decomposition and caveats as the single-frame
    builder (Gauss-Newton default; the analytic modes run under the
    batched Newton's per-frame step cap).  Time-aware specs route to the
    batched voxel JVP/HVP kernels (grid (B, T, G); Gauss-Newton assembly
    only — the motion->voxel map is nonlinear).  Requires
    objective_supports_analytic_hvp(spec).  ``staged=True`` returns
    ``(prep, hvp)`` where prep computes the per-frame value images once
    per CG solve and hvp runs the tangent-only JVP kernel (see
    objective.build_objective_banded_hvp_staged)."""
    from .. import config as evconfig
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded_hvp_bwd_batched,
        fused_multi_iwe_banded_jvp_batched,
        fused_multi_iwe_banded_voxel_hvp_bwd_batched,
        fused_multi_iwe_banded_voxel_jvp_batched,
        objective_dense_col_bands,
        objective_row_scale,
        objective_row_window,
    )
    from .objective import motion_to_dense_flow, objective_supports_analytic_hvp

    assert objective_supports_analytic_hvp(spec, gauss_newton=gauss_newton,
                                            fleet=True)
    assert spec.outer_padding == 0
    cost = make_cost(spec)
    required = set(cost.required_keys)
    directions = []
    if required & {"iwe", "backward_iwe"}:
        directions.append(("backward", 0.0))
    if "forward_iwe" in required:
        directions.append(("forward", 1.0))
    if "middle_iwe" in required:
        directions.append(("middle", 0.5))
    need_orig = "orig_iwe" in required
    assert precomputed_orig or not need_orig, (
        "batched analytic HVP requires the per-frame orig IWEs hoisted "
        "(build_orig_iwe_banded_batched)"
    )
    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    use_bf16 = backend_raw in ("auto", "pallas_bf16")
    h, w = spec.image_shape
    offsets = tuple(d for _, d in directions)
    flags = dict(
        eps=1e-6,
        use_bf16=use_bf16,
        col_bands=objective_dense_col_bands(w),
        row_window=objective_row_window(h),
        # The batched forward kernel (fused_multi_iwe_banded_batched, used
        # for the staged prep images and the fleet objective/gradient) has
        # no col_window capability — keep the analytic curvature kernels on
        # the same routing so value and tangent stay consistent.
        col_window=None,
        row_scale=objective_row_scale(w),
    )

    def cost_of(imgs, motion_flat, orig_blurred):
        # one frame's cost from its RAW direction images — mirrors
        # build_batched_objective_banded's per_frame exactly
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        arg = {"omit_boundary": True, "clip": True}
        if need_orig:
            arg["orig_iwe"] = orig_blurred
        for k, (name, _) in enumerate(directions):
            if name == "backward":
                arg.update({"iwe": imgs[k], "backward_iwe": imgs[k]})
            else:
                arg[f"{name}_iwe"] = imgs[k]
        if "flow" in required:
            arg["flow"] = motion_flat.reshape((2,) + tuple(spec.patch_image_size))
        return nan_to_penalty(cost.calculate(arg))

    grad_cost = jax.grad(cost_of, argnums=(0, 1))

    def _flow_of(m, ts):
        return motion_to_dense_flow(spec, m, ts) * ts

    def _hvp_body(images, motion, p, orig_b, x, y, dtf, wt, band_rows,
                  t_scales):
        flows, dflows = jax.vmap(
            lambda m, pp, ts: jax.jvp(lambda mm: _flow_of(mm, ts), (m,), (pp,))
        )(motion, p, t_scales)
        if spec.time_aware:
            # voxel kernels (grid (B, T, G)); GN only — asserted above
            vox_kw = dict(eps=flags["eps"], use_bf16=use_bf16,
                          row_window=flags["row_window"])
            if images is None:
                images, dimages = fused_multi_iwe_banded_voxel_jvp_batched(
                    flows, dflows, x, y, dtf, wt, band_rows,
                    spec.image_shape, offsets, **vox_kw
                )
            else:
                dimages = fused_multi_iwe_banded_voxel_jvp_batched(
                    flows, dflows, x, y, dtf, wt, band_rows,
                    spec.image_shape, offsets, emit_value=False, **vox_kw
                )
        elif images is None:
            images, dimages = fused_multi_iwe_banded_jvp_batched(
                flows, dflows, x, y, dtf, wt, band_rows, spec.image_shape,
                offsets, **flags
            )
        else:
            # staged: value images precomputed once per CG solve
            dimages = fused_multi_iwe_banded_jvp_batched(
                flows, dflows, x, y, dtf, wt, band_rows, spec.image_shape,
                offsets, emit_value=False, **flags
            )
        if orig_b is None:
            orig_b = jnp.zeros((motion.shape[0], h, w), images.dtype)

        def cost_jvp(img_k, m, pp, dimg_k, orig_k):
            (g1, _), (g2, dgm) = jax.jvp(
                lambda ii, mm: grad_cost(ii, mm, orig_k),
                (img_k, m), (dimg_k, pp),
            )
            return g1, g2, dgm

        g1, g2, dgm = jax.vmap(cost_jvp)(images, motion, p, dimages, orig_b)
        if spec.time_aware:
            dgflow = fused_multi_iwe_banded_voxel_hvp_bwd_batched(
                flows, dflows, g1, g2, x, y, dtf, wt, band_rows,
                spec.image_shape, offsets, term_a=not gauss_newton,
                eps=flags["eps"], use_bf16=use_bf16,
                row_window=flags["row_window"],
            )
        else:
            dgflow = fused_multi_iwe_banded_hvp_bwd_batched(
                flows, dflows, g1, g2, x, y, dtf, wt, band_rows,
                spec.image_shape, offsets, term_a=not gauss_newton, **flags
            )

        def back(m, ts, df):
            _, f_vjp = jax.vjp(lambda mm: _flow_of(mm, ts), m)
            return f_vjp(df)[0]

        return jax.vmap(back)(motion, t_scales, dgflow) + dgm

    def _prep_body(motion, x, y, dtf, wt, band_rows, t_scales):
        flows = jax.vmap(_flow_of)(motion, t_scales)
        from ..ops.pallas_objective_banded import (
            fused_multi_iwe_banded_batched,
            fused_multi_iwe_banded_voxel_batched,
        )

        # tent=False always: the JVP kernel's value half has no tent
        # support, and the staged analytic HVP documents value/tangent
        # consistency (mirrors the single-frame staged builder).
        if spec.time_aware:
            return fused_multi_iwe_banded_voxel_batched(
                flows, x, y, dtf, wt, band_rows, spec.image_shape, offsets,
                False, flags["eps"], use_bf16, flags["row_window"], False,
            )
        return fused_multi_iwe_banded_batched(
            flows, x, y, dtf, wt, band_rows, spec.image_shape, offsets,
            False, flags["eps"], use_bf16, flags["col_bands"],
            flags["row_window"], flags["row_scale"],
            False,
        )

    if precomputed_orig:
        def hvp(motion, p, orig_b, x, y, dtf, wt, band_rows, t_scales):
            return _hvp_body(None, motion, p, orig_b, x, y, dtf, wt,
                             band_rows, t_scales)

        def prep(motion, orig_b, x, y, dtf, wt, band_rows, t_scales):
            return _prep_body(motion, x, y, dtf, wt, band_rows, t_scales)

        def hvp_staged(aux, motion, p, orig_b, x, y, dtf, wt, band_rows,
                       t_scales):
            return _hvp_body(aux, motion, p, orig_b, x, y, dtf, wt,
                             band_rows, t_scales)
    else:
        def hvp(motion, p, x, y, dtf, wt, band_rows, t_scales):
            return _hvp_body(None, motion, p, None, x, y, dtf, wt,
                             band_rows, t_scales)

        def prep(motion, x, y, dtf, wt, band_rows, t_scales):
            return _prep_body(motion, x, y, dtf, wt, band_rows, t_scales)

        def hvp_staged(aux, motion, p, x, y, dtf, wt, band_rows, t_scales):
            return _hvp_body(aux, motion, p, None, x, y, dtf, wt, band_rows,
                             t_scales)

    if staged:
        return prep, hvp_staged
    return hvp


def build_batched_objective(spec: ObjectiveSpec):
    """fn(motion [B, M], events [B, N, 4], weights [B, N]) -> losses [B]."""
    if objective_uses_fused(spec):
        from .. import config as evconfig
        from ..ops.pallas_objective_batched import fused_multi_iwe_batched

        cost = make_cost(spec)
        required = set(cost.required_keys)
        directions = []
        if required & {"iwe", "backward_iwe"}:
            directions.append(("backward", 0.0))
        if "forward_iwe" in required:
            directions.append(("forward", 1.0))
        if "middle_iwe" in required:
            directions.append(("middle", 0.5))
        need_orig = "orig_iwe" in required
        backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
        use_bf16 = backend_raw in ("auto", "pallas_bf16")

        def batched(motion, events, weights):
            t = events[..., 2]
            big = jnp.finfo(t.dtype).max
            t_min = jnp.min(jnp.where(weights > 0, t, big), axis=1)
            t_max = jnp.max(jnp.where(weights > 0, t, -big), axis=1)
            t_scale = jnp.where(t_max > t_min, t_max - t_min, 1.0)

            flows = jax.vmap(
                lambda m: tile_to_dense_flow(
                    m, spec.patch_image_size, spec.image_shape, spec.patch_size,
                    spec.sliding_window, spec.patch_shift, spec.filter_type,
                )
            )(motion) * t_scale[:, None, None, None]

            imgs = fused_multi_iwe_batched(
                events, flows, spec.image_shape,
                offsets=tuple(d for _, d in directions),
                weights=weights, include_orig=need_orig, use_bf16=use_bf16,
            )
            if spec.blur_sigma > 0:
                imgs = gaussian_blur3(imgs, spec.blur_sigma)

            def per_frame(img_k, m):
                arg = {"omit_boundary": True, "clip": True}
                k = 0
                if need_orig:
                    arg["orig_iwe"] = img_k[0]
                    k = 1
                for name, _ in directions:
                    if name == "backward":
                        arg.update({"iwe": img_k[k], "backward_iwe": img_k[k]})
                    else:
                        arg[f"{name}_iwe"] = img_k[k]
                    k += 1
                if "flow" in required:
                    arg["flow"] = m.reshape((2,) + tuple(spec.patch_image_size))
                loss = cost.calculate(arg)
                return nan_to_penalty(loss)

            return jax.vmap(per_frame)(imgs, motion)

        return batched

    # CPU / generic: vmap the single-frame objective (matmul backend)
    import dataclasses

    single = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))

    def batched(motion, events, weights):
        return jax.vmap(lambda m, e, w: single(m, e, w)[0])(motion, events, weights)

    return batched


def _batched_line_search(batched_value_fn, x, f0, g, p, args, ls_maxiter,
                         armijo_c1):
    """Per-frame two-sided backtracking in lockstep — the batched analog
    of newton_cg._line_search: each level tries x +- a*p, a frame exits
    (freezes) once the Armijo-style sufficient decrease holds for its
    current level."""
    gtp_abs = jnp.abs(jnp.sum(g * p, axis=-1))  # [B]

    def cond(state):
        alpha, f_cur, accepted, i = state
        return (i < ls_maxiter) & jnp.any(~accepted)

    def body(state):
        alpha, f_cur, accepted, i = state
        a = jnp.where(i == 0, jnp.ones_like(alpha), jnp.abs(alpha) * 0.5)
        f_plus = batched_value_fn(x + a[:, None] * p, *args)
        f_minus = batched_value_fn(x - a[:, None] * p, *args)
        take_minus = f_minus < f_plus
        f_cand = jnp.where(take_minus, f_minus, f_plus)
        a_signed = jnp.where(take_minus, -a, a)
        new_alpha = jnp.where(accepted, alpha, a_signed)
        new_f = jnp.where(accepted, f_cur, f_cand)
        new_accepted = accepted | (new_f < f0 - armijo_c1 * jnp.abs(new_alpha) * gtp_abs)
        return (new_alpha, new_f, new_accepted, i + 1)

    bsz = f0.shape[0]
    init = (
        jnp.ones(bsz, x.dtype),
        jnp.full(bsz, jnp.inf, x.dtype),
        jnp.zeros(bsz, bool),
        0,
    )
    alpha, f_new, accepted, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(accepted, alpha, 0.0), jnp.where(accepted, f_new, f0)


def _batched_escape_probe(batched_value_fn, x, f0, p, args):
    """Per-frame outward two-sided exponential probe along p-hat for
    frames whose backtracking failed (see newton_cg._escape_probe)."""
    p_hat = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)

    def cond(state):
        mag, best_a, best_f, i = state
        return (i < 9) & jnp.any(best_f >= f0)

    def body(state):
        mag, best_a, best_f, i = state
        f_plus = batched_value_fn(x + mag[:, None] * p_hat, *args)
        f_minus = batched_value_fn(x - mag[:, None] * p_hat, *args)
        take_minus = f_minus < f_plus
        f_cand = jnp.where(take_minus, f_minus, f_plus)
        a_cand = jnp.where(take_minus, -mag, mag)
        better = f_cand < best_f
        return (
            mag * 2.0,
            jnp.where(better, a_cand, best_a),
            jnp.where(better, f_cand, best_f),
            i + 1,
        )

    bsz = f0.shape[0]
    init = (jnp.ones(bsz, x.dtype), jnp.zeros(bsz, x.dtype), f0, 0)
    _, a, f_new, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(f_new < f0, a, 0.0), p_hat


def _batched_value_grad(batched_value_fn, x, args):
    """Per-frame losses [B] + gradient of the sum [B, M] from ONE forward
    evaluation: frames are independent, so grad of the sum is the
    per-frame grads, and ``has_aux`` returns the per-frame losses from
    the same evaluation instead of re-running the batched objective
    (which XLA does not reliably CSE across pallas custom calls)."""

    def _sum_aux(xx):
        fv = batched_value_fn(xx, *args)
        return jnp.sum(fv), fv

    (_, fv), g = jax.value_and_grad(_sum_aux, has_aux=True)(x)
    return fv, g


def build_newton_cg_batched(
    batched_value_fn: Callable,
    maxiter: int = 25,
    cg_maxiter: int = 32,
    xtol: float = 1e-5,
    gtol: float = 1e-5,
    ls_maxiter: int = 16,
    armijo_c1: float = 1e-4,
    fd_hvp: bool = True,
    fd_central: bool = True,
    hvp_fn=None,
    hvp_prep_fn=None,
    max_step=None,
    fd_polish: int = 0,
):
    """Lockstep per-frame truncated Newton.

    batched_value_fn(x [B, M], *args) -> [B] losses.
    Returns solve(x0 [B, M], *args) -> (x_best [B, M], f_best [B], iters).
    ``fd_central``: central-difference HVPs (2 gradients each) — the
    accuracy default; one-sided (vs the iterate's gradient, 1 gradient)
    is the measured-speed knob (optimizer.hvp_central: false).
    ``hvp_fn(x [B,M], d [B,M], *args) -> [B,M]``: analytic batched HVP
    (the v10 fused-kernel path, build_batched_objective_banded_hvp) —
    overrides fd_hvp; requires ``max_step`` (per-frame inf-norm Newton
    step cap, same trust safeguard as newton_cg.build_newton_cg).
    ``fd_polish``: with an analytic hvp_fn, append up to K lockstep
    central-FD Newton iterations from the best iterates (the
    sequential-path fd_polish; see newton_cg.build_newton_cg).
    """

    def _sum_fn(x, args):
        return jnp.sum(batched_value_fn(x, *args))

    def value_grad(x, args):
        return _batched_value_grad(batched_value_fn, x, args)

    def grad_only(x, args):
        return jax.grad(_sum_fn)(x, args)

    def rdot(a, b):
        return jnp.sum(a * b, axis=-1)  # [B]

    def hvp(x, d, g0, args, aux=None, analytic=None, force_central=False):
        analytic = (hvp_fn is not None) if analytic is None else analytic
        if analytic and hvp_fn is not None:
            if hvp_prep_fn is not None:
                return hvp_fn(aux, x, d, *args)
            return hvp_fn(x, d, *args)
        if not fd_hvp and not analytic:
            def gsum_dot(xx):
                return jnp.sum(jax.grad(_sum_fn)(xx, args) * d)

            return jax.grad(gsum_dot)(x)
        from .newton_cg import _FD_EPS_SCALE

        d_norm = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
        eps = _FD_EPS_SCALE * (1.0 + 1e-3 * jnp.linalg.norm(x, axis=-1, keepdims=True)) / d_norm
        g_plus = grad_only(x + eps * d, args)
        if fd_central or force_central:
            # force_central: the fd_polish loop is gated on central
            # differences only (see newton_cg "fd-central")
            g_minus = grad_only(x - eps * d, args)
            return (g_plus - g_minus) / (2.0 * eps)
        return (g_plus - g0) / eps

    def cg_solve(x, g, args, analytic=None, force_central=False):
        analytic = (hvp_fn is not None) if analytic is None else analytic
        g_norm = jnp.linalg.norm(g, axis=-1)  # [B]
        eta = jnp.minimum(0.5, jnp.sqrt(g_norm)) * g_norm
        # staged analytic: per-frame value images hoisted out of the CG loop
        aux = (
            hvp_prep_fn(x, *args)
            if hvp_prep_fn is not None and analytic else None
        )

        def cond(state):
            i, r, d, p, done = state
            active = (~done) & (jnp.linalg.norm(r, axis=-1) > eta)
            return (i < cg_maxiter) & jnp.any(active)

        def body(state):
            i, r, d, p, done = state
            active = (~done) & (jnp.linalg.norm(r, axis=-1) > eta)
            hd = hvp(x, d, g, args, aux=aux, analytic=analytic,
                     force_central=force_central)
            curv = rdot(d, hd)
            rs = rdot(r, r)
            neg = curv <= 1e-16 * rdot(d, d)
            p_fb = jnp.where(
                (i == 0), (rs / jnp.where(curv == 0, 1.0, curv))[:, None] * d, p
            )
            alpha = rs / jnp.where(neg, 1.0, curv)
            p_new = p + alpha[:, None] * d
            r_new = r + alpha[:, None] * hd
            beta = rdot(r_new, r_new) / jnp.where(rs == 0, 1.0, rs)
            d_new = -r_new + beta[:, None] * d
            p_out = jnp.where(neg[:, None], p_fb, p_new)
            # frozen frames keep their state
            upd = active[:, None]
            return (
                i + 1,
                jnp.where(upd, r_new, r),
                jnp.where(upd, d_new, d),
                jnp.where(upd, p_out, p),
                done | (neg & active),
            )

        bsz = g.shape[0]
        state = (0, g, -g, jnp.zeros_like(g), jnp.zeros(bsz, bool))
        _, _, _, p, _ = jax.lax.while_loop(cond, body, state)
        p = jnp.where(rdot(p, p)[:, None] > 0, p, -g)
        return p

    def line_search(x, f0, g, p, args):
        return _batched_line_search(
            batched_value_fn, x, f0, g, p, args, ls_maxiter, armijo_c1
        )

    def escape_probe(x, f0, p, args):
        return _batched_escape_probe(batched_value_fn, x, f0, p, args)

    def make_body(analytic, cap, args, escape=True, force_central=False):
        """Lockstep outer-iteration body for one curvature model (see
        newton_cg.make_body; ``escape`` off for the FD polish loop)."""

        def body(state):
            x, f, g, k, done, bx, bf = state
            p = cg_solve(x, g, args, analytic=analytic,
                         force_central=force_central)
            if cap is not None:
                # per-component clip (see newton_cg: a per-frame inf-norm
                # rescale crushes small-tile steps on rot/zoom fields)
                ms = jnp.asarray(cap, x.dtype)
                p = jnp.clip(p, -ms, ms)
            alpha, f_ls = line_search(x, f, g, p, args)
            # plateau escape per frame: backtracking failed OR the first
            # iteration only found a negligible decrease (flat/zero inits
            # near a stationary point; see newton_cg.build_newton_cg).
            # Masked by ~done: a frozen frame's step is discarded anyway,
            # but its alpha==0 would otherwise re-fire the (up to 18
            # batched evals) probe on EVERY remaining lockstep iteration.
            trigger = ~done & (
                (alpha == 0.0)
                | ((k == 0) & (f - f_ls <= 1e-6 * (1.0 + jnp.abs(f))))
            )
            if not escape:
                trigger = jnp.zeros_like(trigger)
            a_esc, p_hat = jax.lax.cond(
                jnp.any(trigger),
                lambda: escape_probe(x, f, p, args),
                lambda: (jnp.zeros_like(alpha), p),
            )
            use_esc = trigger & (a_esc != 0.0)
            alpha = jnp.where(use_esc, 1.0, alpha)
            step = jnp.where(use_esc[:, None], a_esc[:, None] * p_hat, alpha[:, None] * p)
            x_new = jnp.where(done[:, None], x, x + step)
            f_new, g_new = value_grad(x_new, args)
            improved = f_new < bf
            bx = jnp.where(improved[:, None], x_new, bx)
            bf = jnp.where(improved, f_new, bf)
            small_step = jnp.sum(jnp.abs(step), axis=-1) <= xtol
            small_grad = jnp.max(jnp.abs(g_new), axis=-1) <= gtol
            done_new = done | small_step | small_grad | (alpha == 0.0)
            return (x_new, f_new, g_new, k + 1, done_new, bx, bf)

        return body

    def solve(x0, *args):
        f0, g0 = value_grad(x0, args)

        def cond(state):
            x, f, g, k, done, bx, bf = state
            return (k < maxiter) & jnp.any(~done)

        bsz = x0.shape[0]
        state = (x0, f0, g0, 0, jnp.zeros(bsz, bool), x0, f0)
        x, f, g, k, done, bx, bf = jax.lax.while_loop(
            cond, make_body(None, max_step, args), state
        )
        if fd_polish > 0 and hvp_fn is not None:
            # bounded lockstep central-FD refinement from the best
            # iterates (the batched fd_polish — newton_cg doc)
            fb, gb = value_grad(bx, args)

            def cond_pol(state):
                x_, f_, g_, k_, done_, bx_, bf_ = state
                return (k_ < fd_polish) & jnp.any(~done_)

            _, _, _, k2, _, bx, bf = jax.lax.while_loop(
                cond_pol, make_body(False, None, args, escape=False,
                                    force_central=True),
                (bx, fb, gb, 0, jnp.zeros(bsz, bool), bx, fb),
            )
            k = k + k2
        return bx, bf, k

    return solve


def build_lbfgs_batched(
    batched_value_fn: Callable,
    maxiter: int = 100,
    gtol: float = 1e-5,
    xtol: float = 1e-5,
    memory: int = 8,
    ls_maxiter: int = 16,
    armijo_c1: float = 1e-4,
):
    """Lockstep per-frame L-BFGS (the fleet analog of
    newton_cg.build_lbfgs): one fresh gradient per iteration per frame,
    shared two-sided backtracking + plateau-escape machinery, per-frame
    circular (s, y) buffers with curvature-safeguarded updates.  Same
    contract as build_newton_cg_batched: solve(x0 [B, M], *args) ->
    (best_x [B, M], best_f [B], iters)."""
    m = int(memory)

    def value_grad(x, args):
        return _batched_value_grad(batched_value_fn, x, args)

    def _take(A, idx):
        # A [B, m, ...], idx [B] -> [B, ...]
        if A.ndim == 3:
            return jnp.take_along_axis(A, idx[:, None, None], axis=1)[:, 0]
        return jnp.take_along_axis(A, idx[:, None], axis=1)[:, 0]

    def direction(g, S, Y, rho, nk):
        """-H.g via the two-loop recursion, vectorized over frames; age
        j = 0 (newest) .. m-1, slot (nk-1-j) mod m, valid while
        nk-1-j >= 0 (numpy modulo keeps negative ages in range; the
        validity mask zeroes their contribution)."""

        def bwd(j, carry):
            q, al = carry
            age = nk - 1 - j  # [B]
            idx = age % m
            valid = age >= 0
            Sj = _take(S, idx)
            Yj = _take(Y, idx)
            rj = _take(rho, idx)
            a = jnp.where(valid, rj * jnp.sum(Sj * q, axis=-1), 0.0)
            return q - a[:, None] * Yj, al.at[:, j].set(a)

        bsz = g.shape[0]
        q, al = jax.lax.fori_loop(
            0, m, bwd, (g, jnp.zeros((bsz, m), g.dtype))
        )
        idx0 = (nk - 1) % m
        S0 = _take(S, idx0)
        Y0 = _take(Y, idx0)
        ys = jnp.sum(S0 * Y0, axis=-1)
        yy = jnp.sum(Y0 * Y0, axis=-1)
        gamma = jnp.where(nk > 0, ys / jnp.where(yy > 0, yy, 1.0), 1.0)
        r = gamma[:, None] * q

        def fwd(j, r):
            jj = m - 1 - j  # oldest first
            age = nk - 1 - jj
            idx = age % m
            valid = age >= 0
            Sj = _take(S, idx)
            Yj = _take(Y, idx)
            rj = _take(rho, idx)
            b = jnp.where(valid, rj * jnp.sum(Yj * r, axis=-1), 0.0)
            coef = jnp.where(valid, al[:, jj] - b, 0.0)
            return r + coef[:, None] * Sj

        r = jax.lax.fori_loop(0, m, fwd, r)
        return -r

    def solve(x0, *args):
        f0, g0 = value_grad(x0, args)
        bsz, n = x0.shape
        S0 = jnp.zeros((bsz, m, n), x0.dtype)
        Y0 = jnp.zeros((bsz, m, n), x0.dtype)
        rho0 = jnp.zeros((bsz, m), x0.dtype)
        nk0 = jnp.zeros((bsz,), jnp.int32)

        def cond(state):
            x, f, g, S, Y, rho, nk, k, done, bx, bf = state
            return (k < maxiter) & jnp.any(~done)

        def body(state):
            x, f, g, S, Y, rho, nk, k, done, bx, bf = state
            p = direction(g, S, Y, rho, nk)
            alpha, f_ls = _batched_line_search(
                batched_value_fn, x, f, g, p, args, ls_maxiter, armijo_c1
            )
            # ~done mask: see build_newton_cg_batched — a frozen frame's
            # alpha==0 must not re-fire the escape probe every iteration
            trigger = ~done & (
                (alpha == 0.0)
                | ((k == 0) & (f - f_ls <= 1e-6 * (1.0 + jnp.abs(f))))
            )
            a_esc, p_hat = jax.lax.cond(
                jnp.any(trigger),
                lambda: _batched_escape_probe(batched_value_fn, x, f, p, args),
                lambda: (jnp.zeros_like(alpha), p),
            )
            use_esc = trigger & (a_esc != 0.0)
            alpha = jnp.where(use_esc, 1.0, alpha)
            step = jnp.where(
                use_esc[:, None], a_esc[:, None] * p_hat, alpha[:, None] * p
            )
            step = jnp.where(done[:, None], 0.0, step)
            x_new = x + step
            f_new, g_new = value_grad(x_new, args)
            improved = f_new < bf
            bx = jnp.where(improved[:, None], x_new, bx)
            bf = jnp.where(improved, f_new, bf)
            # curvature-safeguarded pair update (frozen frames produce
            # step = 0 -> y = 0 -> skipped)
            y = g_new - g
            sy = jnp.sum(step * y, axis=-1)
            good = sy > 1e-10 * (
                jnp.linalg.norm(step, axis=-1) * jnp.linalg.norm(y, axis=-1)
                + 1e-30
            )
            slot_hot = (
                jax.lax.broadcasted_iota(jnp.int32, (bsz, m), 1)
                == (nk % m)[:, None]
            ) & good[:, None]
            S = jnp.where(slot_hot[:, :, None], step[:, None, :], S)
            Y = jnp.where(slot_hot[:, :, None], y[:, None, :], Y)
            rho = jnp.where(
                slot_hot, (1.0 / jnp.where(sy == 0, 1.0, sy))[:, None], rho
            )
            nk = nk + good.astype(nk.dtype)
            small_step = jnp.sum(jnp.abs(step), axis=-1) <= xtol
            small_grad = jnp.max(jnp.abs(g_new), axis=-1) <= gtol
            done_new = done | small_step | small_grad | (alpha == 0.0)
            return (x_new, f_new, g_new, S, Y, rho, nk, k + 1, done_new, bx, bf)

        state0 = (
            x0, f0, g0, S0, Y0, rho0, nk0, 0,
            jnp.zeros(bsz, bool), x0, f0,
        )
        out = jax.lax.while_loop(cond, body, state0)
        return out[9], out[10], out[7]

    return solve


class FleetPyramidalSolver(PyramidalPatchContrastMaximization):
    """Pyramidal CMax over a fleet of frames: per scale, one batched init
    sweep and one batched Newton solve.  Use when warm-start chaining is
    off (frames independent); per-frame results match the sequential
    solver up to line-search scheduling."""

    def _setup_parallel(self, parallel_config: dict):
        super()._setup_parallel(parallel_config)
        self.n_data_shards = 1
        if self.mesh is not None:
            from ..parallel.sharded import make_mesh

            if self.n_event_shards > 1:
                logger.info(
                    "fleet solver: frames shard over ALL parallel devices "
                    "(data x event collapsed onto 'data'); its batched "
                    "kernels do not event-shard within a frame"
                )
            # repurpose every configured device as a frame shard
            n_total = int(self.mesh.size)
            self.mesh = make_mesh(n_total, data=n_total, event=1)
            self.n_data_shards = n_total
            self.n_event_shards = 1
            if self.n_data_shards <= 1:
                self.mesh = None

    def _coarse_events_list(self, events_list):
        """Per-frame stride subsamples for the coarse pyramid scales
        (fleet analog of pyramid._coarse_events), or None when
        ``optimizer.coarse_event_fraction`` is off or there is no coarse
        scale to apply it to.  A frame whose subsample would drop below
        the statistical floor keeps its FULL events in the coarse pack
        (per-frame degradation, like the sequential path) — returning
        None for the whole batch would also flip the chain cache key's
        split_coarse flag between batches and retrace the fleet chain.
        Banded (fused) path only — the unfused fleet objective ignores
        it with a warning."""
        frac = float(self.opt_config.get("coarse_event_fraction", 1.0))
        if frac >= 1.0:
            return None
        if self.patch_scales - self.coarsest_scale < 2:
            return None  # finest-only pyramid: nothing coarse to speed up
        subs = [coarse_subsample(e, frac) for e in events_list]
        if all(s is None for s in subs):
            return None
        n_floor = sum(s is None for s in subs)
        if n_floor:
            logger.info(
                f"coarse_event_fraction: {n_floor}/{len(subs)} frames below "
                f"the {COARSE_SUBSAMPLE_MIN_EVENTS}-event subsample floor "
                "solve their coarse scales on all events"
            )
        return [
            s if s is not None else np.asarray(e)
            for s, e in zip(subs, events_list)
        ]

    def _build_fleet_newton(self, spec, maxiter: int, gtol: float, cg_maxiter=None,
                            finest=True, warm=False):
        """Batched lockstep Newton fn(x0 [B,M], *fleet_args); on the
        banded path with an orig-dependent cost, the per-frame
        motion-independent orig IWEs are hoisted out of the lockstep loop
        (see patch_base._build_newton for the single-frame analog).
        ``cg_maxiter`` overrides optimizer.cg_maxiter (the pyramid's
        coarse-scale budget knob).  ``finest``: as in
        patch_base._build_newton — ``hvp_mode: analytic`` is the per-scale
        hybrid (v10 analytic GN HVP on the finest scale, FD on coarse)."""
        orig_fn = None
        hvp_fn = None
        hvp_prep_fn = None
        hvp_mode_cfg = str(self.opt_config.get("hvp_mode", "fd")).lower()
        # routing is single-sourced with the sequential builder so the
        # fleet and per-frame paths can never diverge on a new mode
        want_analytic = self._want_analytic(warm, finest)
        if objective_uses_banded(spec):
            hoist = "orig_iwe" in make_cost(spec).required_keys
            batched = build_batched_objective_banded(spec, precomputed_orig=hoist)
            if hoist:
                orig_fn = build_orig_iwe_banded_batched(spec)
            if want_analytic:
                from .objective import objective_supports_analytic_hvp

                gn = hvp_mode_cfg != "analytic-full"
                if objective_supports_analytic_hvp(spec, gauss_newton=gn,
                                                   fleet=True):
                    hvp_prep_fn, hvp_fn = build_batched_objective_banded_hvp(
                        spec, precomputed_orig=hoist, gauss_newton=gn,
                        staged=True,
                    )
                elif not getattr(self, "_warned_analytic_hvp", False):
                    logger.warning(
                        "optimizer.hvp_mode: analytic is not supported for "
                        "this fleet objective (time-aware: analytic-full, "
                        "or a voxel too large for the HVP's VMEM "
                        "footprint) — falling back to the FD HVP"
                    )
                    self._warned_analytic_hvp = True
        else:
            batched = build_batched_objective(spec)
            if want_analytic and not getattr(self, "_warned_analytic_hvp", False):
                logger.warning(
                    "optimizer.hvp_mode: analytic requires the fused banded "
                    "fleet objective — falling back to the FD HVP"
                )
                self._warned_analytic_hvp = True
        if str(self.opt_config.get("device_solver", "newton-cg")).lower() == "lbfgs":
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
            solve_inner = build_lbfgs_batched(
                batched,
                maxiter=maxiter,
                gtol=gtol,
                memory=int(self.opt_config.get("lbfgs_memory", 8)),
            )
        else:
            solve_inner = build_newton_cg_batched(
                batched,
                maxiter=maxiter,
                cg_maxiter=int(
                    cg_maxiter if cg_maxiter is not None
                    else self.opt_config.get("cg_maxiter", 32)
                ),
                gtol=gtol,
                fd_hvp=objective_uses_banded(spec) or objective_uses_fused(spec),
                fd_central=bool(self.opt_config.get("hvp_central", True)),
                hvp_fn=hvp_fn,
                hvp_prep_fn=hvp_prep_fn,
                max_step=(
                    float(self.opt_config.get("hvp_max_step", 10.0))
                    if hvp_fn is not None else None
                ),
                # finest scale only — see patch_base._build_newton
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

    def _get_fleet_solver(self, spec, bsz: int, maxiter: int, gtol: float,
                          cg_maxiter=None, finest=True, warm=False):
        warm = self._warm_key(warm, finest)
        key = (spec, "fleet", bsz, maxiter, gtol, cg_maxiter, finest, warm)
        if key not in self._fun_cache:
            self._fun_cache[key] = jax.jit(
                self._build_fleet_newton(spec, maxiter, gtol,
                                         cg_maxiter=cg_maxiter, finest=finest,
                                         warm=warm)
            )
        return self._fun_cache[key]

    def optimize_batch(self, events_list: List[np.ndarray]):
        """Solve B frames together; returns a list of per-scale motion dicts.

        With a ``parallel:`` mesh, frames shard over the devices (chain
        path; the batch pads to a shard multiple with copies of the last
        frame, dropped from the results)."""
        orig_bsz = len(events_list)
        if self.mesh is not None and orig_bsz % self.n_data_shards:
            pad_n = -(-orig_bsz // self.n_data_shards) * self.n_data_shards - orig_bsz
            events_list = list(events_list) + [events_list[-1]] * pad_n
        bsz = len(events_list)
        use_banded = objective_uses_banded(self._current_spec())
        coarse_args = ()
        if use_banded:
            pack_kw = dict(
                time_bin=getattr(self, "time_bin", 10) if self.is_time_aware else 0,
                image_width=0 if self.is_time_aware else self.image_shape[1],
            )
            x2, y2, d2, w2, brows, scales = pack_fleet_banded(
                events_list, self.image_shape[0], **pack_kw
            )
            solver_args = (
                jnp.asarray(x2, self.dtype), jnp.asarray(y2, self.dtype),
                jnp.asarray(d2, self.dtype), jnp.asarray(w2, self.dtype),
                jnp.asarray(brows), jnp.asarray(scales, self.dtype),
            )
            subs = self._coarse_events_list(events_list)
            if subs is not None:
                # second (subsampled) fleet pack for the COARSE scales —
                # the fleet analog of pyramid._coarse_events; the solve
                # splits into a coarse and a finest device program just
                # like the sequential chain (one program holding both
                # packs fails at DSEC scale; see _get_chain_solver)
                cx, cy, cd, cw, cb, cs = pack_fleet_banded(
                    subs, self.image_shape[0], g_round=32, **pack_kw
                )
                coarse_args = (
                    jnp.asarray(cx, self.dtype), jnp.asarray(cy, self.dtype),
                    jnp.asarray(cd, self.dtype), jnp.asarray(cw, self.dtype),
                    jnp.asarray(cb), jnp.asarray(cs, self.dtype),
                )
        else:
            if (
                float(self.opt_config.get("coarse_event_fraction", 1.0)) < 1.0
                and not getattr(self, "_warned_coarse_frac", False)
            ):
                logger.warning(
                    "optimizer.coarse_event_fraction applies to the fused "
                    "(banded) objective only; this unfused fleet path "
                    "solves every scale on all events"
                )
                self._warned_coarse_frac = True
            target_n = max(len(e) for e in events_list)
            target_n = ((target_n + 4095) // 4096) * 4096
            evs, wgts = [], []
            for e in events_list:
                p, w = pad_events(np.asarray(e, dtype=np.float64), target_n=target_n)
                evs.append(p)
                wgts.append(w)
            solver_args = (
                jnp.asarray(np.stack(evs), self.dtype),
                jnp.asarray(np.stack(wgts), self.dtype),
            )

        self._coarse_fleet_applied = bool(coarse_args)
        if self._chain_ready():
            return self._optimize_batch_chain(
                events_list, solver_args, coarse_args, orig_bsz=orig_bsz
            )[:orig_bsz]
        if self.previous_frame_best_estimation is not None:
            logger.warning(
                "fleet batch warm start is only supported on the chain path "
                "(optimizer.chain with device Newton-CG); falling back to "
                "cold initialization for this batch"
            )
            self.previous_frame_best_estimation = None

        best_per_scale = {}
        for s in range(self.coarsest_scale, self.patch_scales):
            self.overload_patch_configuration(s)
            spec = self._current_spec()
            motion0 = np.stack(
                [self._init_scale_single(s, events_list[b], best_per_scale, b) for b in range(bsz)]
            )
            scale_mi, scale_cg = self._scale_budget(s)
            solve = self._get_fleet_solver(spec, bsz, scale_mi, 1e-5, cg_maxiter=scale_cg,
                                           finest=s == self.patch_scales - 1,
                                           warm=self.previous_frame_best_estimation is not None)
            # coarse scales may solve on the subsampled pack (banded
            # path); the finest scale always sees the full fleet pack
            args_s = (
                coarse_args
                if coarse_args and s < self.patch_scales - 1
                else solver_args
            )
            bx, bf, _ = solve(jnp.asarray(motion0.reshape(bsz, -1), self.dtype), *args_s)
            best_per_scale[s] = np.asarray(bx, np.float64).reshape(
                (bsz, self.motion_vector_size) + tuple(self.patch_image_size)
            )
            logger.info(f"fleet scale {s} done ({bsz} frames).")

        results = []
        for b in range(bsz):
            per_frame = {s: best_per_scale[s][b] for s in best_per_scale}
            results.append(self.update_coarse_from_fine(per_frame))
        return results[:orig_bsz]

    # ---------------------------------------------- whole-fleet device chain
    def _optimize_batch_chain(self, events_list: List[np.ndarray], solver_args,
                              coarse_args=(), orig_bsz=None):
        """Every pyramid scale of every frame in ONE device program: the
        init search runs batched over frames x patches (vs. B sequential
        host calls per scale in the loop path), coarse->fine expansion is
        a vmapped device pyramid_expand, and each scale's lockstep batched
        Newton follows — one dispatch per fleet batch instead of
        ~scales*(B+1).

        When ``previous_frame_best_estimation`` holds a per-scale motion
        dict (set by the caller between batches — ``warm_start: "batch"``
        in the eval config), every frame warm-starts from it exactly like
        the sequential chain: coarsest x0 from the warm coarsest motion,
        finer scales averaged with the device pyramid_expand result.
        Lockstep Newton then converges in far fewer iterations."""
        from ..ops.interp import pyramid_expand_jax  # noqa: F401 (used in chain)
        from .sampling import gather_patch_events

        bsz = len(events_list)
        scales = list(range(self.coarsest_scale, self.patch_scales))

        warm = self.previous_frame_best_estimation
        # warm modes: a single per-scale motion dict (every frame starts
        # from it — consecutive batches of ONE sequence), or a LIST of
        # per-frame dicts (frame b starts from its own motion — the
        # multi-stream serving case, one independent stream per slot)
        per_frame_warm = (
            isinstance(warm, (list, tuple))
            and len(warm) > 0
            and all(isinstance(w, dict) and all(s in w for s in scales) for w in warm)
        )
        if isinstance(warm, (list, tuple)) and 0 < len(warm) < bsz:
            # mesh padding pads frames (harmless for lists the full chain
            # later rejects: they stay unused)
            warm = list(warm) + [warm[-1]] * (bsz - len(warm))
        use_warm = per_frame_warm or (
            isinstance(warm, dict) and all(s in warm for s in scales)
        )
        warm_mode = ("per_frame" if per_frame_warm else "shared") if use_warm else None

        # the fast-path gate uses the SHARED warmth predicate (finest-scale
        # presence, pyramid._warm_has_finest) so streak accounting matches
        # the sequential surface for the same stream
        if self._warm_finest_active(self._warm_has_finest(warm, scales[-1])):
            # warm finest-only fast path: skips the coarse chain, the
            # per-frame patch-event gathers, and the init sweeps
            return self._optimize_batch_warm_finest(
                solver_args, warm, isinstance(warm, (list, tuple)), bsz, scales,
                orig_bsz=orig_bsz,
            )

        specs, search_meta, grid_shapes = {}, {}, {}
        patch_inputs = []
        max_n = max(len(e) for e in events_list)
        for s in scales:
            self.overload_patch_configuration(s)
            specs[s] = self._current_spec()
            grid_shapes[s] = tuple(self.patch_image_size)
            if s > self.coarsest_scale:
                capacity = self._patch_capacity(max_n)
                n_cand = max(4, int(self.opt_config["n_iter"] / max(1, s - self.coarsest_scale)))
                search_meta[s] = (tuple(self.patch_size), int(n_cand), capacity)
                pes, pws, pcs = [], [], []
                for e in events_list:
                    pe, pw, pc = gather_patch_events(
                        np.asarray(e, dtype=np.float64), self.patches, capacity
                    )
                    pes.append(pe); pws.append(pw); pcs.append(pc)
                patch_inputs.append((
                    jnp.asarray(np.stack(pes), self.dtype),
                    jnp.asarray(np.stack(pws), self.dtype),
                    jnp.asarray(np.stack(pcs)),
                ))

        self.overload_patch_configuration(self.coarsest_scale)
        if per_frame_warm:
            x0 = np.stack([
                np.asarray(w[scales[0]], dtype=np.float64).reshape(-1) for w in warm
            ])
        elif use_warm:
            x0 = np.tile(
                np.asarray(warm[scales[0]], dtype=np.float64).reshape(1, -1),
                (bsz, 1),
            )
        else:
            init = self.slv_config["patch"]["initialize"]
            x0 = np.stack([
                self.initialize_zeros() if init == "zero" else self.initialize_random()
                for _ in range(bsz)
            ]).reshape(bsz, -1)

        maxiter = self.opt_config.get("max_iter", 25)
        coarse_budget = self._scale_budget(scales[0]) if len(scales) >= 2 else None
        if coarse_budget == (maxiter, None):
            coarse_budget = None  # no override configured: keep cache keys stable
        split = bool(coarse_args)
        fused = self._get_fleet_chain_solver(
            tuple(scales), specs, search_meta, grid_shapes, bsz,
            maxiter=maxiter, gtol=1e-5,
            warm_mode=warm_mode, split_coarse=split, coarse_budget=coarse_budget,
        )
        keys = jnp.stack([self._next_key() for _ in scales[1:]]) if len(scales) > 1 else jnp.zeros((0, 2), jnp.uint32)
        if per_frame_warm:
            warm_in = tuple(
                jnp.asarray(
                    np.stack([np.asarray(w[s], dtype=np.float64) for w in warm]),
                    self.dtype,
                )
                for s in scales[1:]
            )
        elif use_warm:
            warm_in = tuple(
                jnp.asarray(np.asarray(warm[s], dtype=np.float64), self.dtype)
                for s in scales[1:]
            )
        else:
            warm_in = ()
        out_all = fused(
            jnp.asarray(x0, self.dtype), warm_in, tuple(patch_inputs), keys,
            *(coarse_args if split else solver_args),
        )
        if split:
            # second device program: the finest scale's lockstep Newton on
            # the FULL fleet pack (the coarse program solved on the
            # subsampled pack and returned the finest init vectors)
            outs_c, fs_c, x0_fin = out_all
            fin = self._get_fleet_finest_solver(
                specs[scales[-1]], bsz, maxiter, gtol=1e-5, warm=use_warm
            )
            bx, bf = fin(x0_fin, *solver_args)
            outs = list(outs_c) + [
                bx.reshape((bsz, 2) + grid_shapes[scales[-1]])
            ]
            fs = jnp.concatenate(
                [jnp.asarray(fs_c), jnp.asarray(bf)[:, None]], axis=-1
            )
        else:
            outs, fs = out_all
        self.overload_patch_configuration(scales[-1])

        best_per_scale = {}
        for i, s in enumerate(scales):
            best_per_scale[s] = np.asarray(outs[i], np.float64)
        fs_np = np.asarray(fs)
        logger.info(f"fleet chain done ({bsz} frames, {len(scales)} scales); losses {fs_np[:, -1]}")
        results = []
        for b in range(bsz):
            per_frame = {s: best_per_scale[s][b] for s in best_per_scale}
            results.append(self.update_coarse_from_fine(per_frame))
        return results

    def _optimize_batch_warm_finest(self, solver_args, warm, per_frame_warm,
                                    bsz, scales, orig_bsz=None):
        """Fleet warm finest-only fast path (``optimizer.warm_finest_only``):
        every frame solves ONLY the finest scale from its own previous
        motion (per-frame warm — the multi-stream serving case) or the
        shared one, on the FULL fleet pack, as one batched Newton
        program.  Coarse entries of the per-frame result dicts are
        rebuilt by pyramid_reduce (same semantics as
        update_coarse_from_fine on the full path, and the next batch's
        warm detection needs every scale present).  See
        pyramid._optimize_warm_finest for rationale and gating."""
        from ..ops.interp import pyramid_reduce

        s_fin = scales[-1]
        self.overload_patch_configuration(s_fin)
        spec = self._current_spec()
        grid_shape = tuple(self.patch_image_size)
        maxiter = self.opt_config.get("max_iter", 25)
        if per_frame_warm:
            x0 = np.stack([
                np.asarray(w_[s_fin], dtype=np.float64).reshape(-1) for w_ in warm
            ])
        else:
            x0 = np.tile(
                np.asarray(warm[s_fin], dtype=np.float64).reshape(1, -1), (bsz, 1)
            )
        fin = self._get_fleet_finest_solver(spec, bsz, maxiter, gtol=1e-5, warm=True)
        bx, bf = fin(jnp.asarray(x0, self.dtype), *solver_args)
        bx = np.asarray(bx, np.float64).reshape((bsz, 2) + grid_shape)
        n_real = bsz if orig_bsz is None else int(orig_bsz)
        losses = np.asarray(bf)[:n_real]  # mesh-padding duplicates excluded
        logger.info(
            f"fleet warm finest-only done ({n_real} frames"
            + (f", {bsz} with mesh padding" if bsz != n_real else "")
            + f"); losses {losses}"
        )
        results = []
        for b in range(bsz):
            refined = {s_fin: bx[b]}
            for i in range(s_fin, self.coarsest_scale, -1):
                refined[i - 1] = pyramid_reduce(refined[i])
            results.append(refined)
        return results

    def _get_fleet_chain_solver(self, scales, specs, search_meta, grid_shapes, bsz,
                                maxiter, gtol, warm_mode=None, split_coarse=False,
                                coarse_budget=None):
        from ..ops.interp import pyramid_expand_jax

        use_warm = warm_mode is not None
        key = (
            "fleet_chain",
            tuple(specs[s] for s in scales),
            tuple(sorted(search_meta.items())),
            bsz, maxiter, gtol, warm_mode, split_coarse, coarse_budget,
        )
        if key not in self._fun_cache:
            # split_coarse: this program covers the COARSE scales (they
            # solve on the subsampled pack) plus the finest scale's init
            # search, and returns the finest x0; the finest Newton runs
            # as its own program on the full pack
            # (_get_fleet_finest_solver) — same two-program split as the
            # sequential chain (pyramid._get_chain_solver).
            solve_scales = scales[:-1] if split_coarse else scales

            def _budget(s):
                if coarse_budget is not None and s < scales[-1]:
                    return coarse_budget
                return (maxiter, None)

            solvers = {
                s: self._build_fleet_newton(
                    specs[s], _budget(s)[0], gtol, cg_maxiter=_budget(s)[1],
                    finest=s == scales[-1], warm=use_warm,
                )
                for s in solve_scales
            }
            searches = {s: self._get_patch_search(search_meta[s]) for s in scales[1:]}
            dtype = self.dtype

            def chain(x0, warm_fine, patch_inputs, keys, *newton_args):
                best_x, best_f = [], []
                x = x0  # [B, M_coarsest]
                prev = None  # [B, 2, hp, wp]
                for i, s in enumerate(scales):
                    if i > 0:
                        m0 = jax.vmap(pyramid_expand_jax)(prev)
                        if use_warm:
                            # sequential-chain semantics: average the
                            # expanded coarser motion with the warm one
                            # (shared warm [2,h,w] broadcasts over B;
                            # per-frame warm is already [B,2,h,w])
                            w_i = warm_fine[i - 1]
                            if warm_mode == "shared":
                                w_i = w_i[None]
                            m0 = (m0 + w_i) / 2.0
                        pe, pw, pc = patch_inputs[i - 1]  # [B, P, C, 4] / [B, P, C] / [B, P]
                        B, P = pe.shape[0], pe.shape[1]
                        m0_flat = (
                            m0.reshape(B, 2, -1).transpose(0, 2, 1).reshape(B * P, 2)
                        )
                        m1 = searches[s](
                            pe.reshape((B * P,) + pe.shape[2:]),
                            pw.reshape(B * P, -1),
                            pc.reshape(B * P),
                            m0_flat.astype(dtype),
                            keys[i - 1],
                        )
                        x = (
                            m1.reshape(B, P, 2).transpose(0, 2, 1).reshape(B, -1).astype(dtype)
                        )
                    if split_coarse and s == scales[-1]:
                        return tuple(best_x), jnp.stack(best_f, axis=-1), x
                    bx, bf, _ = solvers[s](x, *newton_args)
                    # local batch size: under shard_map this is B / n_data
                    prev = bx.reshape((bx.shape[0], 2) + grid_shapes[s])
                    best_x.append(prev)
                    best_f.append(bf)
                return tuple(best_x), jnp.stack(best_f, axis=-1)

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                # frames shard over 'data'; each shard runs its own chain
                # (embarrassingly parallel — no collectives); warm motions
                # and search keys replicate.  pallas_call carries no vma
                # metadata -> check_vma off (parity covered by tests).
                # *newton_args tail: banded = (x, y, dtf, wt, band_rows,
                # t_scales); unfused = (events, weights) — all [B, ...]
                n_args = 6 if objective_uses_banded(specs[scales[0]]) else 2
                # shared warm motions replicate; per-frame warm shards
                # with its frames
                warm_spec = P("data") if warm_mode == "per_frame" else P()
                out_specs = (
                    (tuple(P("data") for _ in scales[:-1]), P("data"), P("data"))
                    if split_coarse
                    else (tuple(P("data") for _ in scales), P("data"))
                )
                chain_sharded = jax.shard_map(
                    chain,
                    mesh=self.mesh,
                    in_specs=(P("data"), warm_spec, P("data"), P()) + (P("data"),) * n_args,
                    out_specs=out_specs,
                    check_vma=False,
                )
                self._fun_cache[key] = jax.jit(chain_sharded)
            else:
                self._fun_cache[key] = jax.jit(chain)
        return self._fun_cache[key]

    def _get_fleet_finest_solver(self, spec, bsz, maxiter, gtol, warm=False):
        """Finest-scale lockstep Newton on the full fleet pack — the
        second dispatch of the split coarse fleet chain (mirrors
        pyramid._get_finest_solver; shards over 'data' like the chain).
        ``warm`` must reach the builder: ``hvp_mode: analytic-coldfd``
        picks FD vs analytic on the finest scale by warmth (same
        round-4 bug as the sequential finest solver)."""
        warm = self._warm_key(warm, finest=True)
        key = (spec, "fleet_finest", bsz, maxiter, gtol,
               self.mesh is not None, warm)
        if key not in self._fun_cache:
            solve_inner = self._build_fleet_newton(spec, maxiter, gtol,
                                                   warm=warm)

            def finest(x0, *newton_args):
                bx, bf, _ = solve_inner(x0, *newton_args)
                return bx, bf

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                n_args = 6 if objective_uses_banded(spec) else 2
                finest = jax.shard_map(
                    finest,
                    mesh=self.mesh,
                    in_specs=(P("data"),) + (P("data"),) * n_args,
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                )
            self._fun_cache[key] = jax.jit(finest)
        return self._fun_cache[key]

    def _init_scale_single(self, s, events_np, best_per_scale, b):
        from ..ops.interp import pyramid_expand

        if s > self.coarsest_scale:
            motion0 = pyramid_expand(best_per_scale[s - 1][b]).reshape(2, -1)
            n_cand = max(4, int(self.opt_config["n_iter"] / max(1, s - self.coarsest_scale)))
            return self.initialize_guess_from_patch_search(np.asarray(events_np), motion0, n_cand)
        init = self.slv_config["patch"]["initialize"]
        if init == "zero":
            return self.initialize_zeros()
        return self.initialize_random()
