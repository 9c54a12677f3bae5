"""Jit-compiled CMax objectives.

In the reference, every objective evaluation crosses
numpy -> torch(device) -> autograd -> numpy through a vendored
scipy-autograd bridge (reference ``src/solver/scipy_autograd/``,
``patch_contrast_pyramid.py:430-462``).  Here the entire inner loop —
tile->dense interpolation, (optional) Burgers/upwind voxelization, three
warps, four IWEs, Sobel costs — is a single jit-compiled
``value_and_grad`` (plus a forward-over-reverse HVP for Newton-CG),
compiled once per (scale, event-buffer-size) and reused across frames.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import costs as costs_mod
from ..flow.voxel import construct_dense_flow_voxel
from ..ops.interp import tile_to_dense_flow
from ..ops.iwe import EventImageConverter
from ..ops.warp import Warp, multi_direction_dense_warp

from ..costs.functional import nan_to_penalty

Array = jax.Array


@dataclass(frozen=True)
class ObjectiveSpec:
    """Static description of one CMax objective (one pyramid scale)."""

    image_shape: Tuple[int, int]
    outer_padding: int
    patch_image_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    sliding_window: Tuple[int, int]
    patch_shift: Tuple[int, int]
    filter_type: str
    iwe_method: str
    blur_sigma: float
    cost_name: str
    cost_with_weight: Optional[Tuple[Tuple[str, object], ...]]  # for hybrid
    time_aware: bool = False
    time_bin: int = 10
    flow_interpolation: str = "burgers"
    t0_location: str = "middle"
    scale_later: bool = False
    iwe_backend: Optional[str] = None
    # "tiles" (default): motion = per-patch 2-DoF translations interpolated
    # to dense flow.  A global motion-model name ("2d-translation" /
    # "4-param-similarity") makes motion the model's parameter vector and
    # the dense flow its analytic field (solver/global_motion.py).
    motion_model: str = "tiles"
    # per-parameter scale applied before the model mapping: the optimizer
    # then works in pixel-equivalent units (rot/zoom rates are ~R times
    # "stiffer" than translations — unscaled, the Newton line search and
    # plateau-escape probes, tuned to pixel-scale washboards, miss the
    # basin entirely; see GlobalMotionContrastMaximization)
    param_scale: Optional[Tuple[float, ...]] = None
    # (f_row, f_col, c_row, c_col) — calibrated models only ("3-rotation")
    calib: Optional[Tuple[float, float, float, float]] = None


def make_cost(spec: ObjectiveSpec):
    if spec.cost_name == "hybrid":
        return costs_mod.HybridCost(
            direction="minimize", cost_with_weight=dict(spec.cost_with_weight)
        )
    return costs_mod.functions[spec.cost_name](direction="minimize")


def motion_to_dense_flow(spec: ObjectiveSpec, motion_flat: Array, t_scale) -> Array:
    """Tile motion -> dense flow (optionally a time voxel), matching
    reference ``PyramidalPatchContrastMaximization.motion_to_dense_flow``
    (patch_contrast_pyramid.py:464-516); global motion models map their
    parameter vector to the analytic dense field instead."""
    if spec.motion_model != "tiles":
        from ..ops.warp import (
            flow_from_2d_translation,
            flow_from_rotation,
            flow_from_similarity,
        )

        if spec.param_scale is not None:
            motion_flat = motion_flat * jnp.asarray(spec.param_scale, motion_flat.dtype)
        if spec.motion_model == "4-param-similarity":
            dense = flow_from_similarity(motion_flat, spec.image_shape)
        elif spec.motion_model == "3-rotation":
            dense = flow_from_rotation(motion_flat, spec.image_shape, spec.calib)
        elif spec.motion_model in ("2d-translation", "rigid-optical-flow"):
            dense = flow_from_2d_translation(motion_flat, spec.image_shape)
        else:
            raise NotImplementedError(
                f"objective motion model {spec.motion_model!r} not implemented"
            )
    else:
        dense = tile_to_dense_flow(
            motion_flat,
            spec.patch_image_size,
            spec.image_shape,
            spec.patch_size,
            spec.sliding_window,
            spec.patch_shift,
            spec.filter_type,
        )
    if not spec.time_aware:
        return dense
    scale = jnp.max(dense) if spec.scale_later else 1.0
    voxel = construct_dense_flow_voxel(
        dense * t_scale / scale,
        spec.time_bin,
        spec.flow_interpolation,
        t0_location=spec.t0_location,
    )
    return voxel * scale / t_scale


def objective_uses_fused(spec: ObjectiveSpec) -> bool:
    """Whether build_objective will route through the fused Pallas kernel
    (whose custom-vjp backward is not twice-differentiable — callers pick
    finite-difference HVPs accordingly)."""
    from .. import config as evconfig

    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    if backend_raw == "auto":
        import jax as _jax

        fused = _jax.default_backend() == "tpu"
    else:
        fused = backend_raw in ("pallas", "pallas_bf16")
    cost = make_cost(spec)
    required = set(cost.required_keys)
    return (
        fused
        and not spec.time_aware
        and spec.iwe_method == "bilinear_vote"
        and spec.outer_padding == 0
        and not (required & {"backward_warp", "forward_warp"})
    )


# voxel schemes that compile under jit (host griddata schemes can't)
_JIT_VOXEL_SCHEMES = ("upwind", "burgers", "same", "bilinear", "max")
_VOXEL_VMEM_LIMIT = 12 * 1024 * 1024  # bytes; v5e VMEM is ~16 MB/core


def _voxel_vmem_bytes(spec: ObjectiveSpec) -> int:
    """Peak VMEM of the voxel kernel's backward step: one bin slice + its
    cotangent + the IWE-stack cotangent (the bin is a grid dimension, so
    the whole voxel is never resident)."""
    h, w = spec.image_shape
    hp_flow = -(-h // 64) * 64
    wp = -(-(w + 1) // 128) * 128
    slice_bytes = 2 * hp_flow * wp * 4
    iwe_stack = 4 * (h + 8) * wp * 4
    return 2 * slice_bytes + 2 * iwe_stack


def objective_uses_banded(spec: ObjectiveSpec) -> bool:
    """Whether the banded fused kernel applies: like objective_uses_fused
    but time-aware objectives also qualify when the voxelization scheme is
    jittable and a bin slice + cotangents fit VMEM (the voxel kernel grids
    over time bins, so even T=10 MVSEC-sized voxels qualify)."""
    from .. import config as evconfig

    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    if backend_raw == "auto":
        import jax as _jax

        fused = _jax.default_backend() == "tpu"
    else:
        fused = backend_raw in ("pallas", "pallas_bf16")
    cost = make_cost(spec)
    required = set(cost.required_keys)
    base = (
        fused
        and spec.iwe_method == "bilinear_vote"
        and spec.outer_padding == 0
        and not (required & {"backward_warp", "forward_warp"})
    )
    if not spec.time_aware:
        return base
    return (
        base
        and spec.flow_interpolation in _JIT_VOXEL_SCHEMES
        and _voxel_vmem_bytes(spec) <= _VOXEL_VMEM_LIMIT
    )


def build_objective(spec: ObjectiveSpec):
    """Return pure fn(motion_flat, events, weights) -> (loss, components).

    Semantics of one evaluation (reference call stack SURVEY §3.1):
      t_scale = t.max - t.min over valid events
      flow    = interp(tiles) * t_scale  (voxelized if time-aware)
      IWEs    = orig + {first,last,middle}-warped bilinear votes, blur
      loss    = cost (hybrid: multi-focal + TV on raw tile motions)
      nan -> large-penalty guard (deviation from ref
      patch_contrast_base.py:283-287's nan->0 — see nan_to_penalty)
    """
    from .. import config as evconfig

    cost = make_cost(spec)
    required = set(cost.required_keys)
    if spec.motion_model != "tiles" and "flow" in required:
        raise ValueError(
            "cost key 'flow' (total_variation) requires tile motion; "
            "global motion models have no tile grid to regularize"
        )
    pad = spec.outer_padding
    imager = EventImageConverter(spec.image_shape, outer_padding=pad)
    warper = Warp(spec.image_shape, normalize_t=True)
    motion_model = "dense-flow-voxel" if spec.time_aware else "dense-flow"
    n_motion = 2
    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    if backend_raw == "auto":
        import jax as _jax

        fused_choice = "pallas_bf16" if _jax.default_backend() == "tpu" else None
    else:
        fused_choice = backend_raw if backend_raw in ("pallas", "pallas_bf16") else None
    backend = "matmul" if backend_raw in ("auto", "pallas", "pallas_bf16") else backend_raw
    # fully fused gather+warp+vote kernel: dense flow, bilinear votes,
    # no outer padding (shipped-config fast path)
    use_fused = (
        fused_choice is not None
        and not spec.time_aware
        and spec.iwe_method == "bilinear_vote"
        and pad == 0
        and not (required & {"backward_warp", "forward_warp"})
    )

    def iwe_of(events, weights):
        return imager.create_iwe(
            events,
            spec.iwe_method,
            spec.blur_sigma,
            weight=weights,
            blur_mode="torch",
            backend=spec.iwe_backend,
        )

    def objective(motion_flat: Array, events: Array, weights: Optional[Array]):
        t = events[:, 2]
        if weights is None:
            t_scale = jnp.max(t) - jnp.min(t)
        else:
            big = jnp.finfo(t.dtype).max
            t_scale = jnp.max(jnp.where(weights > 0, t, -big)) - jnp.min(
                jnp.where(weights > 0, t, big)
            )
        flow = motion_to_dense_flow(spec, motion_flat, t_scale) * t_scale

        # one shared flow gather feeds every warp direction
        directions = []
        if required & {"iwe", "backward_iwe", "backward_warp"}:
            directions.append(("backward", 0.0))
        if required & {"forward_iwe", "forward_warp"}:
            directions.append(("forward", 1.0))
        if "middle_iwe" in required:
            directions.append(("middle", 0.5))
        need_orig = "orig_iwe" in required

        arg = {"omit_boundary": True, "clip": True}
        if use_fused:
            from ..ops.blur import gaussian_blur3
            from ..ops.pallas_objective import fused_multi_iwe

            imgs = fused_multi_iwe(
                events,
                flow,
                spec.image_shape,
                offsets=tuple(d for _, d in directions),
                weights=weights,
                include_orig=need_orig,
                use_bf16=fused_choice == "pallas_bf16",
            )
            if spec.blur_sigma > 0:
                imgs = gaussian_blur3(imgs, spec.blur_sigma)
            k = 0
            if need_orig:
                arg["orig_iwe"] = imgs[0]
                k = 1
            for name, _ in directions:
                if name == "backward":
                    arg.update({"iwe": imgs[k], "backward_iwe": imgs[k]})
                else:
                    arg[f"{name}_iwe"] = imgs[k]
                k += 1
        else:
            warped = multi_direction_dense_warp(
                events,
                flow,
                [d for _, d in directions],
                spec.image_shape,
                weights=weights,
                time_aware=spec.time_aware,
            )
            warped = dict(zip([n for n, _ in directions], warped))
            if need_orig:
                arg["orig_iwe"] = iwe_of(events, weights)
            if "backward" in warped:
                biwe = iwe_of(warped["backward"], weights)
                arg.update({"iwe": biwe, "backward_iwe": biwe, "backward_warp": warped["backward"]})
            if "forward" in warped:
                arg.update({"forward_iwe": iwe_of(warped["forward"], weights), "forward_warp": warped["forward"]})
            if "middle" in warped:
                arg["middle_iwe"] = iwe_of(warped["middle"], weights)
        if "flow" in required:
            arg["flow"] = motion_flat.reshape((n_motion,) + tuple(spec.patch_image_size))

        if isinstance(cost, costs_mod.HybridCost):
            loss, components = cost.calculate_with_components(arg)
        else:
            loss = cost.calculate(arg)
            components = {cost.name: loss}
        loss = nan_to_penalty(loss)
        return loss, components

    return objective


def _chunk_specs(time_aware: bool):
    """shard_map PartitionSpecs for the packed chunk arrays: the chunk axis
    ([G, 1, C] dense / [T, G, 1, C] voxel; bands [G] / [T, G]) shards over
    the mesh's "event" axis."""
    from jax.sharding import PartitionSpec as P

    chunk = P(None, "event", None, None) if time_aware else P("event", None, None)
    band = P(None, "event") if time_aware else P("event")
    return chunk, band


def _shard_kernel_over_events(kernel_images, mesh, time_aware: bool):
    """Wrap ``kernel_images(flow, x, y, dtf, wt, bands) -> imgs`` so the
    packed chunks shard over the mesh's "event" axis: every device
    rasterizes a partial IWE stack with the fused kernel and the stacks
    combine with ``psum`` — bilinear voting is an associative sum, so the
    result equals the single-device kernel exactly (fp32 summation order
    aside).  The flow is replicated; gradients transpose through the psum
    and come out replicated too."""
    from jax.sharding import PartitionSpec as P

    chunk_spec, band_spec = _chunk_specs(time_aware)

    def body(flow, x, y, dtf, wt, bands):
        return jax.lax.psum(kernel_images(flow, x, y, dtf, wt, bands), "event")

    # pallas_call does not annotate varying-mesh-axes metadata: disable the
    # vma (replication) check; correctness is covered by the parity tests
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), chunk_spec, chunk_spec, chunk_spec, chunk_spec, band_spec),
        out_specs=P(),
        check_vma=False,
    )


def build_orig_iwe_banded(spec: ObjectiveSpec, mesh=None):
    """Motion-independent (blurred) original IWE from pre-packed banded
    chunks: fn(x, y, dtf, wt, bands, *rest) -> [H, W].

    The orig image is 1 of the objective's 4 votes but never depends on
    the candidate motion; hoisting it out of the Newton loop (computed
    once per solve inside the same jitted program) removes ~25% of the
    forward vote FLOPs from every objective/line-search evaluation (see
    build_objective_banded(precomputed_orig=True)).  With ``mesh`` the
    chunks shard over the "event" axis (psum-combined partial votes)."""
    from .. import config as evconfig
    from ..ops.blur import gaussian_blur3
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded,
        fused_multi_iwe_banded_voxel,
        objective_dense_col_bands,
        objective_row_scale,
        objective_tent,
        objective_row_window,
    )

    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    use_bf16 = backend_raw in ("auto", "pallas_bf16")
    h, w = spec.image_shape

    def kernel_images(_flow, x, y, dtf, wt, bands):
        if spec.time_aware:
            t_bins = x.shape[0]
            zeros = jnp.zeros((t_bins, 2, h, w), x.dtype)
            return fused_multi_iwe_banded_voxel(
                zeros, x, y, dtf, wt, bands, spec.image_shape, (), True,
                1e-6, use_bf16, objective_row_window(h), objective_tent(use_bf16),
            )
        zeros = jnp.zeros((2, h, w), x.dtype)
        # pregather=False: the orig-only call (offsets=()) never consumes
        # the gathered u/v, but pallas operands cannot be DCE'd — streaming
        # the precomputed tables here would pay their full HBM cost for
        # nothing when OBJECTIVE_PREGATHER is enabled
        return fused_multi_iwe_banded(
            zeros, x, y, dtf, wt, bands, spec.image_shape, (), True,
            1e-6, use_bf16, objective_dense_col_bands(w),
            objective_row_window(h), None, 1, False, objective_row_scale(w),
            objective_tent(use_bf16), False,
        )

    images = (
        _shard_kernel_over_events(kernel_images, mesh, spec.time_aware)
        if mesh is not None
        else kernel_images
    )

    def orig_fn(x, y, dtf, wt, bands, *_rest):
        # the flow operand is unused for the orig-only call; a scalar
        # placeholder keeps the shard_map signature uniform
        imgs = images(jnp.zeros((), x.dtype), x, y, dtf, wt, bands)
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        return jax.lax.stop_gradient(imgs[0])

    return orig_fn


def build_objective_banded(spec: ObjectiveSpec, precomputed_orig: bool = False, mesh=None):
    """Banded-kernel variant: fn(motion, x, y, dtf, wt, bands, t_scale)
    -> (loss, components), over chunks pre-packed host-side with
    ops.pallas_objective_banded.pack_events_by_band.  Semantically equal
    to build_objective at fp32 summation tolerance; the row-band-local
    gathers are ~4x cheaper.  Time-aware specs route to the voxel kernel
    (events pre-packed by (band, time-bin) with pack_events_by_band_bin;
    the Burgers/upwind voxelization runs in plain jnp inside the jit, so
    gradients traverse the whole PDE chain).

    With ``precomputed_orig`` the signature gains a leading
    ``orig_blurred`` array (from build_orig_iwe_banded) after ``motion``
    and the kernel skips the orig vote entirely — the caller hoists the
    motion-independent image out of its optimization loop.

    With ``mesh`` (a jax Mesh with an "event" axis) the packed chunks
    shard over "event": each device rasterizes a partial IWE stack and
    the stacks psum-combine (bilinear voting is associative), so the
    loss/gradient equal the single-device kernel; the chunk axis must be
    divisible by the event-axis size (parallel.sharded.
    pad_chunks_for_sharding) and the blur + scalar cost run replicated."""
    from .. import config as evconfig
    from ..ops.blur import gaussian_blur3
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded,
        fused_multi_iwe_banded_voxel,
        objective_col_window,
        objective_dense_col_bands,
        objective_pregather,
        objective_row_scale,
        objective_tent,
        objective_row_window,
    )

    cost = make_cost(spec)
    required = set(cost.required_keys)
    if spec.motion_model != "tiles" and "flow" in required:
        raise ValueError(
            "cost key 'flow' (total_variation) requires tile motion; "
            "global motion models have no tile grid to regularize"
        )
    assert spec.outer_padding == 0
    if spec.time_aware:
        assert spec.flow_interpolation in _JIT_VOXEL_SCHEMES
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

    kernel_orig = need_orig and not precomputed_orig

    def kernel_images(flow, x, y, dtf, wt, bands):
        if spec.time_aware:
            return fused_multi_iwe_banded_voxel(
                flow, x, y, dtf, wt, bands, spec.image_shape,
                tuple(d for _, d in directions), kernel_orig, 1e-6, use_bf16,
                objective_row_window(spec.image_shape[0]),
                objective_tent(use_bf16),
            )
        # dense chunks come from pack_events_dense (policy switch:
        # OBJECTIVE_DENSE_PACKING) — the flags here match by design
        return fused_multi_iwe_banded(
            flow, x, y, dtf, wt, bands, spec.image_shape,
            tuple(d for _, d in directions), kernel_orig, 1e-6, use_bf16,
            objective_dense_col_bands(spec.image_shape[1]),
            objective_row_window(spec.image_shape[0]),
            objective_col_window(*spec.image_shape),
            1, False, objective_row_scale(spec.image_shape[1]),
            objective_tent(use_bf16), objective_pregather(use_bf16),
        )

    images = (
        _shard_kernel_over_events(kernel_images, mesh, spec.time_aware)
        if mesh is not None
        else kernel_images
    )

    def _objective_body(motion_flat, orig_blurred, x, y, dtf, wt, bands, t_scale):
        flow = motion_to_dense_flow(spec, motion_flat, t_scale) * t_scale
        imgs = images(flow, x, y, dtf, wt, bands)
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        arg = {"omit_boundary": True, "clip": True}
        k = 0
        if kernel_orig:
            arg["orig_iwe"] = imgs[0]
            k = 1
        elif need_orig:
            arg["orig_iwe"] = orig_blurred
        for name, _ in directions:
            if name == "backward":
                arg.update({"iwe": imgs[k], "backward_iwe": imgs[k]})
            else:
                arg[f"{name}_iwe"] = imgs[k]
            k += 1
        if "flow" in required:
            arg["flow"] = motion_flat.reshape((2,) + tuple(spec.patch_image_size))
        if isinstance(cost, costs_mod.HybridCost):
            loss, components = cost.calculate_with_components(arg)
        else:
            loss = cost.calculate(arg)
            components = {cost.name: loss}
        loss = nan_to_penalty(loss)
        return loss, components

    if precomputed_orig:
        def objective(motion_flat, orig_blurred, x, y, dtf, wt, bands, t_scale):
            return _objective_body(motion_flat, orig_blurred, x, y, dtf, wt, bands, t_scale)
    else:
        def objective(motion_flat, x, y, dtf, wt, bands, t_scale):
            return _objective_body(motion_flat, None, x, y, dtf, wt, bands, t_scale)

    return objective


def _voxel_hvp_vmem_bytes(spec: ObjectiveSpec) -> int:
    """Peak VMEM of the voxel HVP-backward step: the bin slice, its
    tangent, AND the per-bin output slice resident together, plus the
    doubled (g1, g2) cotangent stack."""
    h, w = spec.image_shape
    hp_flow = -(-h // 64) * 64
    wp = -(-(w + 1) // 128) * 128
    slice_bytes = 2 * hp_flow * wp * 4
    iwe_stack = 4 * (h + 8) * wp * 4
    return 3 * slice_bytes + 2 * iwe_stack


def objective_supports_analytic_hvp(spec: ObjectiveSpec,
                                    gauss_newton: bool = True,
                                    fleet: bool = False) -> bool:
    """Whether build_objective_banded_hvp applies: the banded kernel
    path with a motion->flow map whose curvature the assembly handles.

    Every shipped DENSE map is LINEAR in the parameters — tile
    interpolation and the global similarity/rotation fields are fixed
    spatial coefficient fields contracted with the parameter vector
    (ops/warp.py flow_from_similarity/flow_from_rotation) — so the
    transpose-of-jvp assembly is exact there, full Hessian included.

    The TIME-AWARE voxel chain routes to the voxel JVP/HVP kernels
    (fleet included — the batched voxel JVP/HVP pair grids over
    (B, T, G)) but its motion->voxel map (Burgers/upwind propagation) is
    NONLINEAR, so it qualifies for the Gauss-Newton assembly only
    (``gauss_newton``; the flow-curvature term d2voxel/dm2 is never
    built) and needs the larger HVP VMEM footprint to fit (slice +
    tangent + output slice resident together — per grid step, so the
    same bound applies batched).  A future genuinely nonlinear dense
    model (e.g. a homography) must also be gated to gauss_newton.
    ``fleet`` is kept for callers and future fleet-only gates; today it
    does not change the answer."""
    del fleet  # batched voxel JVP/HVP kernels exist since round 4
    if not objective_uses_banded(spec):
        return False
    if spec.motion_model not in (
        "tiles", "2d-translation", "rigid-optical-flow",
        "4-param-similarity", "3-rotation",
    ):
        return False
    if not spec.time_aware:
        return True
    return (
        gauss_newton
        and _voxel_hvp_vmem_bytes(spec) <= _VOXEL_VMEM_LIMIT
    )


def build_objective_banded_hvp(spec: ObjectiveSpec, precomputed_orig: bool = False,
                               gauss_newton: bool = True):
    """Analytic Hessian-vector product of the banded objective (v10):
    hvp(motion, p, [orig_blurred,] x, y, dtf, wt, bands, t_scale) -> H @ p.

    Replaces the central-FD HVP's 2 full gradient evaluations per CG
    iteration with one fused JVP pass + one fused HVP-backward pass
    (~1.3 evaluation-equivalents) and no finite-difference step error.

    ``gauss_newton`` (DEFAULT): curvature through the cost only (the
    vote-Hessian term A dropped in the kernel).  The full a.e. vote
    Hessian is available with gauss_newton=False but is NOT the useful
    curvature of this objective: the bilinear vote's second derivative
    concentrates in delta functions at the floor crossings which the
    a.e. form misses, so the "exact" H under-curves on the washboard
    (measured 3.4x smaller HVP norms than central FD at a cold start,
    with matching cold-start misconvergence); GN keeps the exact,
    well-conditioned part.

    Decomposition (L(m) = C(blur(F(flow(m))), m), flow linear in m):
      H p = J_flow^T [ dK(flow)[dflow]^T g1  +  K(flow)^T g2 ]  +  dC_mm
    where dflow = J_flow p, (g1, g2) = (dC/dimages, its directional
    derivative via jax.jvp of the cost gradient), both kernel terms
    computed by ops.pallas_objective_banded.fused_multi_iwe_banded_hvp_bwd
    and the images + their tangent by fused_multi_iwe_banded_jvp.  The
    cost (blur/Sobel/hybrid/TV) and the tile->dense interpolation are
    plain XLA, differentiated by jax directly.  Requires
    objective_supports_analytic_hvp(spec); the event-sharded mesh path is
    not wired (callers keep FD under a mesh)."""
    from .. import config as evconfig
    from ..ops.blur import gaussian_blur3
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded_hvp_bwd,
        fused_multi_iwe_banded_jvp,
        fused_multi_iwe_banded_voxel_hvp_bwd,
        fused_multi_iwe_banded_voxel_jvp,
        objective_col_window,
        objective_dense_col_bands,
        objective_row_scale,
        objective_row_window,
    )

    assert objective_supports_analytic_hvp(spec, gauss_newton=gauss_newton)
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
        "analytic HVP requires the motion-independent orig IWE hoisted "
        "(build_orig_iwe_banded) — the kernels compute direction images only"
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
        col_window=objective_col_window(h, w),
        row_scale=objective_row_scale(w),
    )

    def cost_of(imgs, motion_flat, orig_blurred):
        """The objective's cost as a function of the RAW direction
        images and the motion (for the TV 'flow' key) — mirrors
        build_objective_banded._objective_body exactly."""
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

    def _hvp_body(motion_flat, p, orig_blurred, x, y, dtf, wt, bands, t_scale):
        flow_fn = lambda m: motion_to_dense_flow(spec, m, t_scale) * t_scale
        flow, dflow = jax.jvp(flow_fn, (motion_flat,), (p,))
        if spec.time_aware:
            # voxel kernels (grid (T, G)); GN only — asserted above
            images, dimages = fused_multi_iwe_banded_voxel_jvp(
                flow, dflow, x, y, dtf, wt, bands, spec.image_shape, offsets,
                eps=flags["eps"], use_bf16=use_bf16,
                row_window=flags["row_window"],
            )
        else:
            images, dimages = fused_multi_iwe_banded_jvp(
                flow, dflow, x, y, dtf, wt, bands, spec.image_shape, offsets,
                **flags
            )
        (g1, _), (g2, dgm) = jax.jvp(
            lambda ii, mm: grad_cost(ii, mm, orig_blurred),
            (images, motion_flat),
            (dimages, p),
        )
        if spec.time_aware:
            dgflow = fused_multi_iwe_banded_voxel_hvp_bwd(
                flow, dflow, g1, g2, x, y, dtf, wt, bands, spec.image_shape,
                offsets, eps=flags["eps"], use_bf16=use_bf16,
                row_window=flags["row_window"], term_a=not gauss_newton,
            )
        else:
            dgflow = fused_multi_iwe_banded_hvp_bwd(
                flow, dflow, g1, g2, x, y, dtf, wt, bands, spec.image_shape,
                offsets, term_a=not gauss_newton, **flags
            )
        # transpose the motion->flow map back to motion space (exact for
        # the linear dense maps; the GN linearization for the voxel chain)
        _, flow_vjp = jax.vjp(flow_fn, motion_flat)
        return flow_vjp(dgflow)[0] + dgm

    if precomputed_orig:
        def hvp(motion_flat, p, orig_blurred, x, y, dtf, wt, bands, t_scale):
            return _hvp_body(motion_flat, p, orig_blurred, x, y, dtf, wt, bands, t_scale)
    else:
        def hvp(motion_flat, p, x, y, dtf, wt, bands, t_scale):
            return _hvp_body(motion_flat, p, None, x, y, dtf, wt, bands, t_scale)

    return hvp


def build_objective_banded_hvp_staged(spec: ObjectiveSpec,
                                      precomputed_orig: bool = False,
                                      gauss_newton: bool = True,
                                      mesh=None):
    """Staged variant of :func:`build_objective_banded_hvp` for the CG
    inner loop: returns ``(prep, hvp)`` where

      aux = prep(motion, [orig_blurred,] x, y, dtf, wt, bands, t_scale)
      Hp  = hvp(aux, motion, p, [orig_blurred,] ...same args)

    ``prep`` computes the direction VALUE images once per CG solve (they
    depend on the iterate x only, not on the CG direction p), so each of
    the cg_maxiter HVPs runs the tangent-ONLY JVP kernel
    (``emit_value=False``: one MXU dot fewer per direction and half the
    accumulator VMEM) plus the HVP-backward kernel.  Numerically
    identical to the unstaged builder (the JVP kernel's value half is
    bit-identical to the forward kernel; tested).  Support surface:
    ``objective_supports_analytic_hvp(spec)``.  With ``mesh`` the packed
    chunks shard over the "event" axis exactly like the objective
    (every kernel here is an associative sum over events, so partial
    results psum to the single-device values; flow/tangents/cotangents
    replicated)."""
    from .. import config as evconfig
    from ..ops.blur import gaussian_blur3
    from ..ops.pallas_objective_banded import (
        fused_multi_iwe_banded,
        fused_multi_iwe_banded_hvp_bwd,
        fused_multi_iwe_banded_jvp,
        fused_multi_iwe_banded_voxel,
        fused_multi_iwe_banded_voxel_hvp_bwd,
        fused_multi_iwe_banded_voxel_jvp,
        objective_col_window,
        objective_dense_col_bands,
        objective_row_scale,
        objective_row_window,
    )

    assert objective_supports_analytic_hvp(spec, gauss_newton=gauss_newton)
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
    assert precomputed_orig or not need_orig
    backend_raw = spec.iwe_backend or evconfig.raw_iwe_backend()
    use_bf16 = backend_raw in ("auto", "pallas_bf16")
    h, w = spec.image_shape
    offsets = tuple(d for _, d in directions)
    flags = dict(
        eps=1e-6,
        use_bf16=use_bf16,
        col_bands=objective_dense_col_bands(w),
        row_window=objective_row_window(h),
        col_window=objective_col_window(h, w),
        row_scale=objective_row_scale(w),
    )

    def cost_of(imgs, motion_flat, orig_blurred):
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

    if spec.time_aware:
        # voxel kernels, grid (T, G) — one bin slice of the voxel and of
        # its tangent VMEM-resident at a time; GN only (asserted above)
        def call_fwd(flow, x, y, dtf, wt, bands):
            return fused_multi_iwe_banded_voxel(
                flow, x, y, dtf, wt, bands, spec.image_shape, offsets,
                False, flags["eps"], use_bf16, flags["row_window"], False,
            )

        def call_jvp_tangent(flow, dflow, x, y, dtf, wt, bands):
            return fused_multi_iwe_banded_voxel_jvp(
                flow, dflow, x, y, dtf, wt, bands, spec.image_shape,
                offsets, eps=flags["eps"], use_bf16=use_bf16,
                row_window=flags["row_window"], emit_value=False,
            )

        def call_hvp_bwd(flow, dflow, g1, g2, x, y, dtf, wt, bands):
            return fused_multi_iwe_banded_voxel_hvp_bwd(
                flow, dflow, g1, g2, x, y, dtf, wt, bands, spec.image_shape,
                offsets, eps=flags["eps"], use_bf16=use_bf16,
                row_window=flags["row_window"], term_a=not gauss_newton,
            )
    else:
        def call_fwd(flow, x, y, dtf, wt, bands):
            # same call shape as the objective's kernel_images (dense
            # branch): the value images are bit-identical to the JVP
            # kernel's value half
            return fused_multi_iwe_banded(
                flow, x, y, dtf, wt, bands, spec.image_shape, offsets, False,
                flags["eps"], use_bf16, flags["col_bands"], flags["row_window"],
                flags["col_window"], 1, False, flags["row_scale"], False, False,
            )

        def call_jvp_tangent(flow, dflow, x, y, dtf, wt, bands):
            return fused_multi_iwe_banded_jvp(
                flow, dflow, x, y, dtf, wt, bands, spec.image_shape, offsets,
                emit_value=False, **flags
            )

        def call_hvp_bwd(flow, dflow, g1, g2, x, y, dtf, wt, bands):
            return fused_multi_iwe_banded_hvp_bwd(
                flow, dflow, g1, g2, x, y, dtf, wt, bands, spec.image_shape,
                offsets, term_a=not gauss_newton, **flags
            )

    if mesh is not None:
        # chunks shard over the "event" mesh axis; each kernel's partial
        # result sums over shards (vote images, tangent images, and the
        # per-pixel dgflow contributions are all event-additive)
        from jax.sharding import PartitionSpec as P

        chunk_spec, band_spec = _chunk_specs(spec.time_aware)
        rep = lambda n: (P(),) * n
        cs4 = (chunk_spec,) * 4

        def _wrap(fn, n_rep):
            def body(*a):
                return jax.lax.psum(fn(*a), "event")

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=rep(n_rep) + cs4 + (band_spec,),
                out_specs=P(), check_vma=False,
            )

        call_fwd = _wrap(call_fwd, 1)
        call_jvp_tangent = _wrap(call_jvp_tangent, 2)
        call_hvp_bwd = _wrap(call_hvp_bwd, 4)

    def _prep_body(motion_flat, x, y, dtf, wt, bands, t_scale):
        flow = motion_to_dense_flow(spec, motion_flat, t_scale) * t_scale
        return call_fwd(flow, x, y, dtf, wt, bands)

    def _hvp_body(images, motion_flat, p, orig_blurred, x, y, dtf, wt, bands,
                  t_scale):
        flow_fn = lambda m: motion_to_dense_flow(spec, m, t_scale) * t_scale
        flow, dflow = jax.jvp(flow_fn, (motion_flat,), (p,))
        dimages = call_jvp_tangent(flow, dflow, x, y, dtf, wt, bands)
        (g1, _), (g2, dgm) = jax.jvp(
            lambda ii, mm: grad_cost(ii, mm, orig_blurred),
            (images, motion_flat),
            (dimages, p),
        )
        dgflow = call_hvp_bwd(flow, dflow, g1, g2, x, y, dtf, wt, bands)
        _, flow_vjp = jax.vjp(flow_fn, motion_flat)
        return flow_vjp(dgflow)[0] + dgm

    if precomputed_orig:
        def prep(motion_flat, orig_blurred, x, y, dtf, wt, bands, t_scale):
            return _prep_body(motion_flat, x, y, dtf, wt, bands, t_scale)

        def hvp(aux, motion_flat, p, orig_blurred, x, y, dtf, wt, bands, t_scale):
            return _hvp_body(aux, motion_flat, p, orig_blurred, x, y, dtf, wt,
                             bands, t_scale)
    else:
        def prep(motion_flat, x, y, dtf, wt, bands, t_scale):
            return _prep_body(motion_flat, x, y, dtf, wt, bands, t_scale)

        def hvp(aux, motion_flat, p, x, y, dtf, wt, bands, t_scale):
            return _hvp_body(aux, motion_flat, p, None, x, y, dtf, wt, bands,
                             t_scale)

    return prep, hvp


def build_value_grad_hvp(spec: ObjectiveSpec, jit: bool = True):
    """Return (value_and_grad_fn, hvp_fn) over the flat motion vector.

    value_and_grad_fn(x, events, weights) -> (loss, grad, components)
    hvp_fn(x, p, events, weights)         -> H @ p   (forward-over-reverse)
    """
    obj = build_objective(spec)

    def vg(x, events, weights):
        (loss, components), grad = jax.value_and_grad(obj, has_aux=True)(x, events, weights)
        return loss, grad, components

    fused = objective_uses_fused(spec)

    def hvp(x, p, events, weights):
        if fused:
            # the fused kernel's custom-vjp backward is not itself
            # differentiable; central-difference of gradients instead
            p_norm = jnp.linalg.norm(p) + 1e-12
            eps = jnp.asarray(1e-3, x.dtype) * (1.0 + jnp.linalg.norm(x)) / p_norm
            gf = lambda m: jax.grad(lambda mm: obj(mm, events, weights)[0])(m)
            return (gf(x + eps * p) - gf(x - eps * p)) / (2.0 * eps)

        # reverse-over-reverse: grad of <grad, p>
        def gdotp(m):
            g = jax.grad(lambda mm: obj(mm, events, weights)[0])(m)
            return jnp.vdot(g, p)

        return jax.grad(gdotp)(x)

    def hess(x, events, weights):
        return jax.hessian(lambda m: obj(m, events, weights)[0])(x)

    if jit:
        vg = jax.jit(vg)
        hvp = jax.jit(hvp)
        hess = jax.jit(hess)
    return vg, hvp, hess
