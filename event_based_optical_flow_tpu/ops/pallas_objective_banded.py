"""Banded (v2) fused CMax rasterizer: row-band-local flow gathers.

The v1 fused kernel's gather matmuls contract over the full padded image
height (Hp ~ 264 rows) even though each event reads exactly one pixel.
Events sorted into aligned 64-row bands make every chunk's gather a
64-row contraction — ~4x fewer gather FLOPs — while the vote stays
full-image (warped positions can leave the band).

Host-side ``pack_events_by_band`` groups events by band and pads each
band to whole 512-event chunks (sentinel events are inert); the kernel
reads each chunk's flow band with a dynamic slice of the VMEM-resident
flow.  IWE accumulation is order-independent and the time statistics are
computed before packing, so results match the unsorted kernel exactly.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_objective import (
    _CHUNK,
    _corner,
    _corner_deriv,
    _dot,
    _gather_uv,
    _onehot_int,
    _round_up,
)

Array = jax.Array

BAND = 64
COLBAND = 128  # lane-dim gather window; dynamic lane slices must be 128-aligned


def max_chunks(n_events: int, height: int) -> int:
    """Static chunk-count bound for packing: each band adds at most one
    partially-filled chunk."""
    n_bands = _round_up(height, BAND) // BAND
    return (n_events + _CHUNK - 1) // _CHUNK + n_bands


def pack_events_by_band(
    events: np.ndarray,
    weights: np.ndarray,
    dtf: np.ndarray,
    height: int,
):
    """Host-side packing: sort events into aligned 64-row bands, pad each
    band to whole chunks.  Returns (x [G,1,C], y, dtf, wt, band_ids [G])
    with G = max_chunks (trailing chunks empty)."""
    n = len(events)
    g_max = max_chunks(n, height)
    x_out = np.full((g_max, _CHUNK), -10.0, dtype=np.float64)
    y_out = np.full((g_max, _CHUNK), -10.0, dtype=np.float64)
    d_out = np.zeros((g_max, _CHUNK), dtype=np.float64)
    w_out = np.zeros((g_max, _CHUNK), dtype=np.float64)
    band_ids = np.zeros(g_max, dtype=np.int32)

    x = events[:, 0]
    band_of = np.clip(x.astype(np.int64) // BAND, 0, _round_up(height, BAND) // BAND - 1)
    valid = weights > 0
    g = 0
    for b in range(_round_up(height, BAND) // BAND):
        sel = np.nonzero(valid & (band_of == b))[0]
        for start in range(0, len(sel), _CHUNK):
            idx = sel[start : start + _CHUNK]
            k = len(idx)
            x_out[g, :k] = events[idx, 0]
            y_out[g, :k] = events[idx, 1]
            d_out[g, :k] = dtf[idx]
            w_out[g, :k] = weights[idx]
            band_ids[g] = b
            g += 1
    shape = (g_max, 1, _CHUNK)
    return (
        x_out.reshape(shape),
        y_out.reshape(shape),
        d_out.reshape(shape),
        w_out.reshape(shape),
        band_ids,
    )


def n_col_bands(width: int) -> int:
    return _round_up(width + 1, 128) // COLBAND


def max_chunks_tile(n_events: int, height: int, width: int, chunk: int = _CHUNK) -> int:
    """Chunk bound for (row band, column band) tile packing."""
    n_tiles = (_round_up(height, BAND) // BAND) * n_col_bands(width)
    return (n_events + chunk - 1) // chunk + n_tiles


def pack_events_by_tile(
    events: np.ndarray,
    weights: np.ndarray,
    dtf: np.ndarray,
    height: int,
    width: int,
    chunk: int = _CHUNK,
):
    """Host-side packing by (64-row band, 128-column band): the kernel's
    gather then contracts 128 columns instead of the padded width (~3x
    fewer gather FLOPs, the dominant cost — see BENCHMARKS.md).  Returns
    (x [G,1,C], y, dtf, wt, band_ids [G]) with combined band id
    ``row_band * n_col_bands(width) + col_band``."""
    n = len(events)
    n_rows = _round_up(height, BAND) // BAND
    n_cols = n_col_bands(width)
    g_max = max_chunks_tile(n, height, width, chunk)
    x_out = np.full((g_max, chunk), -10.0, dtype=np.float64)
    y_out = np.full((g_max, chunk), -10.0, dtype=np.float64)
    d_out = np.zeros((g_max, chunk), dtype=np.float64)
    w_out = np.zeros((g_max, chunk), dtype=np.float64)
    band_ids = np.zeros(g_max, dtype=np.int32)

    x = events[:, 0]
    y = events[:, 1]
    row_of = np.clip(x.astype(np.int64) // BAND, 0, n_rows - 1)
    col_of = np.clip(y.astype(np.int64) // COLBAND, 0, n_cols - 1)
    tile_of = row_of * n_cols + col_of
    valid = weights > 0
    g = 0
    for tile in range(n_rows * n_cols):
        sel = np.nonzero(valid & (tile_of == tile))[0]
        for start in range(0, len(sel), chunk):
            idx = sel[start : start + chunk]
            k = len(idx)
            x_out[g, :k] = events[idx, 0]
            y_out[g, :k] = events[idx, 1]
            d_out[g, :k] = dtf[idx]
            w_out[g, :k] = weights[idx]
            band_ids[g] = tile
            g += 1
    shape = (g_max, 1, chunk)
    return (
        x_out.reshape(shape),
        y_out.reshape(shape),
        d_out.reshape(shape),
        w_out.reshape(shape),
        band_ids,
    )


def _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0=None):
    """(u, v) via a band-local gather matmul: A_band [BAND, C] against the
    64-row flow slice at table row ``band_row0``; ``x_base`` is the row
    the slice's first entry represents spatially (== band_row0 for a plain
    [2, H, W] flow; == band_row0 mod hp_flow for a flattened voxel table,
    where the time-bin offset is part of band_row0 but not of x).

    With ``col0`` (tile mode) the gather also restricts to a 128-column
    window at ``col0`` (events pre-packed by (row band, column band)):
    the contraction shrinks wp -> 128, ~3x fewer gather FLOPs.

    Returns (u, v, a_band, b_loc) — b_loc is the column one-hot actually
    used, for reuse in the backward scatter."""
    dtype = x.dtype
    x_local = x - x_base.astype(dtype)
    a_band = _onehot_int(x_local, BAND)
    if col0 is None:
        b_loc = _onehot_int(y, wp)
        flow_u = flow_ref[0, pl.ds(band_row0, BAND), :]
        flow_v = flow_ref[1, pl.ds(band_row0, BAND), :]
    else:
        b_loc = _onehot_int(y - col0.astype(dtype), COLBAND)
        flow_u = flow_ref[0, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)]
        flow_v = flow_ref[1, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)]
    b_int = b_loc

    def gather_ch(f):
        if use_bf16:
            b16 = b_int.astype(jnp.bfloat16)
            hi = f.astype(jnp.bfloat16)
            lo = (f - hi.astype(dtype)).astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                hi, b16, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            ) + jax.lax.dot_general(
                lo, b16, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )
        else:
            p = jax.lax.dot_general(
                f, b_int, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.sum(a_band * p, axis=0, keepdims=True)

    return gather_ch(flow_u), gather_ch(flow_v), a_band, b_loc


def _fwd_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, out_ref, *,
                hp, wp, eps, offsets, include_orig, use_bf16, chunk_axis=0,
                bands_mod=None, init_axes=None, col_bands=None):
    i = pl.program_id(chunk_axis)
    init = i == 0
    for ax in init_axes or ():
        if ax != chunk_axis:
            init = init & (pl.program_id(ax) == 0)

    @pl.when(init)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]
    y = y_ref[:]
    dtf = dtf_ref[:]
    wt = w_ref[:]
    dtype = x.dtype
    band_id = band_ref[0, 0]
    if col_bands is None:
        band_row0 = band_id * BAND  # aligned: flow padded to 64-row multiples
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * BAND
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0 if bands_mod is None else (band_id % bands_mod) * BAND

    u, v, _, _ = _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0)

    k0 = 0
    if include_orig:
        r0 = _corner(x, wt, hp, eps)
        c0 = _corner(y, None, wp, eps)
        out_ref[0] += _dot(r0, c0, ((1,), (1,)), use_bf16, dtype)
        k0 = 1
    for k, off in enumerate(offsets):
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        r = _corner(xw, wt, hp, eps)
        c = _corner(yw, None, wp, eps)
        out_ref[k0 + k] += _dot(r, c, ((1,), (1,)), use_bf16, dtype)


def _bwd_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, g_ref, dflow_ref, *,
                hp, wp, eps, offsets, include_orig, use_bf16, chunk_axis=0,
                bands_mod=None, col_bands=None):
    i = pl.program_id(chunk_axis)

    @pl.when(i == 0)
    def _():
        dflow_ref[:] = jnp.zeros_like(dflow_ref)

    x = x_ref[:]
    y = y_ref[:]
    dtf = dtf_ref[:]
    wt = w_ref[:]
    dtype = x.dtype
    band_id = band_ref[0, 0]
    if col_bands is None:
        band_row0 = band_id * BAND
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * BAND
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0 if bands_mod is None else (band_id % bands_mod) * BAND

    u, v, a_band, b_loc = _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0)

    du = jnp.zeros_like(x)
    dv = jnp.zeros_like(x)
    k0 = 1 if include_orig else 0
    for k, off in enumerate(offsets):
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        r = _corner(xw, wt, hp, eps)
        c = _corner(yw, None, wp, eps)
        rd = _corner_deriv(xw, wt, hp, eps)
        cd = _corner_deriv(yw, None, wp, eps)
        gk = g_ref[k0 + k]
        p = _dot(gk, c, ((1,), (0,)), use_bf16, dtype)
        pd = _dot(gk, cd, ((1,), (0,)), use_bf16, dtype)
        dxw = jnp.sum(rd * p, axis=0, keepdims=True)
        dyw = jnp.sum(r * pd, axis=0, keepdims=True)
        du += -dt * dxw
        dv += -dt * dyw

    if col_bands is None:
        dflow_ref[0, pl.ds(band_row0, BAND), :] += _dot(
            a_band * du, b_loc, ((1,), (1,)), use_bf16, dtype
        )
        dflow_ref[1, pl.ds(band_row0, BAND), :] += _dot(
            a_band * dv, b_loc, ((1,), (1,)), use_bf16, dtype
        )
    else:
        dflow_ref[0, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)] += _dot(
            a_band * du, b_loc, ((1,), (1,)), use_bf16, dtype
        )
        dflow_ref[1, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)] += _dot(
            a_band * dv, b_loc, ((1,), (1,)), use_bf16, dtype
        )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _band_rows(band_ids: Array) -> Array:
    """[G] int32 -> [G, 1, 128] replicated rows (a VMEM-legal layout for a
    per-chunk scalar)."""
    return jnp.broadcast_to(band_ids.astype(jnp.int32)[:, None, None], (band_ids.shape[0], 1, 128))


def _row_spec(chunk: int = _CHUNK):
    return pl.BlockSpec((None, 1, chunk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands=None):
    h, w = image_size
    # votes only need one extra row; the flow (gather table) pads to whole
    # 64-row bands so dynamic band slices stay Mosaic-vectorizable
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[0]
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    k_total = len(offsets) + (1 if include_orig else 0)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, col_bands=col_bands,
        ),
        grid=(g_chunks,),
        in_specs=[
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[_row_spec(x.shape[-1])] * 4,
            pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_total, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_total, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(_band_rows(band_ids), x, y, dtf, wt, flow_p)
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_multi_iwe_banded(flow, x, y, dtf, wt, band_ids, image_size, offsets,
                           include_orig=True, eps=1e-6, use_bf16=True, col_bands=None):
    """Banded fused rasterizer over pre-packed chunks (pack_events_by_band,
    or pack_events_by_tile with ``col_bands=n_col_bands(w)`` for the
    column-windowed gather fast path).

    flow [2, H, W]; x/y/dtf/wt [G, 1, CHUNK]; band_ids [G] int32.
    Returns [(orig?) + len(offsets), H, W]; differentiable w.r.t. flow.
    """
    return _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands)


def _vjp_fwd(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands):
    out = _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands)
    return out, (flow, x, y, dtf, wt, band_ids)


def _vjp_bwd(image_size, offsets, include_orig, eps, use_bf16, col_bands, res, g):
    flow, x, y, dtf, wt, band_ids = res
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[0]
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    k_total = g.shape[0]
    g_p = jnp.zeros((k_total, hp, wp), g.dtype).at[:, :h, :w].set(g)

    dflow_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, col_bands=col_bands,
        ),
        grid=(g_chunks,),
        in_specs=[
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[_row_spec(x.shape[-1])] * 4,
            pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_total, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp_flow, wp), flow.dtype),
        interpret=_interpret(),
    )(_band_rows(band_ids), x, y, dtf, wt, flow_p, g_p)
    dflow = dflow_p[:, :h, :w]
    z = jnp.zeros_like
    return dflow, z(x), z(y), z(dtf), z(wt), None


fused_multi_iwe_banded.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Time-aware (voxel) variant: the time bin is a grid dimension.
#
# A [T, 2, H, W] time-binned voxel (ref warp.py:315-396 semantics: events
# bucketed by normalized time into T bins, each warped by its own slice)
# is rasterized on a (T, chunks_per_bin) grid: grid step (t, i) keeps only
# bin t's [2, hp_flow, wp] slice in VMEM (not the whole voxel — the
# backward pass needs the slice AND its cotangent resident, which for
# MVSEC-sized frames at T=10 would not fit), and events are packed per
# (bin, 64-row band) so gathers stay band-local.  Consecutive inner steps
# share the bin slice, so the voxel streams through VMEM exactly once.


def n_bands_of(height: int) -> int:
    return _round_up(height, BAND) // BAND


def pack_events_by_band_bin(
    events: np.ndarray,
    weights: np.ndarray,
    dtf: np.ndarray,
    height: int,
    n_bin: int,
    g_bucket: int = 4,
):
    """Host-side packing for the voxel kernel: group events by
    (time-bin, 64-row band), pad each group to whole chunks, and pad every
    bin to the same chunk count G (rounded up to ``g_bucket`` to bound jit
    retraces).  Returns (x/y/dtf/wt [T, G, 1, C], band_ids [T, G]) with
    band_ids the SPATIAL band (the bin is the leading axis).  Bin id
    matches ops.warp._warp_voxel_single: ``clip(floor(dtf * n_bin), 0,
    n_bin - 1)`` with dtf normalized to [0, 1] over valid events."""
    bands_per_bin = n_bands_of(height)
    x = events[:, 0]
    band_of = np.clip(x.astype(np.int64) // BAND, 0, bands_per_bin - 1)
    bin_of = np.clip(np.floor(dtf * n_bin).astype(np.int64), 0, n_bin - 1)
    valid = weights > 0

    groups = {}
    g_needed = 1
    for t in range(n_bin):
        n_chunks = 0
        for b in range(bands_per_bin):
            sel = np.nonzero(valid & (band_of == b) & (bin_of == t))[0]
            groups[(t, b)] = sel
            n_chunks += (len(sel) + _CHUNK - 1) // _CHUNK
        g_needed = max(g_needed, n_chunks)
    g_max = -(-g_needed // g_bucket) * g_bucket

    x_out = np.full((n_bin, g_max, _CHUNK), -10.0, dtype=np.float64)
    y_out = np.full((n_bin, g_max, _CHUNK), -10.0, dtype=np.float64)
    d_out = np.zeros((n_bin, g_max, _CHUNK), dtype=np.float64)
    w_out = np.zeros((n_bin, g_max, _CHUNK), dtype=np.float64)
    band_ids = np.zeros((n_bin, g_max), dtype=np.int32)

    for t in range(n_bin):
        g = 0
        for b in range(bands_per_bin):
            sel = groups[(t, b)]
            for start in range(0, len(sel), _CHUNK):
                idx = sel[start : start + _CHUNK]
                k = len(idx)
                x_out[t, g, :k] = events[idx, 0]
                y_out[t, g, :k] = events[idx, 1]
                d_out[t, g, :k] = dtf[idx]
                w_out[t, g, :k] = weights[idx]
                band_ids[t, g] = b
                g += 1
    shape = (n_bin, g_max, 1, _CHUNK)
    return (
        x_out.reshape(shape),
        y_out.reshape(shape),
        d_out.reshape(shape),
        w_out.reshape(shape),
        band_ids,
    )


def _band_rows_2d(band_ids: Array) -> Array:
    t, g = band_ids.shape
    return jnp.broadcast_to(band_ids.astype(jnp.int32)[:, :, None, None], (t, g, 1, 128))


def _vox_specs(hp, hp_flow, wp, k_total):
    band = pl.BlockSpec((None, None, 1, 128), lambda t, i: (t, i, 0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((None, None, 1, _CHUNK), lambda t, i: (t, i, 0, 0), memory_space=pltpu.VMEM)
    flow = pl.BlockSpec((None, 2, hp_flow, wp), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((k_total, hp, wp), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM)
    return band, row, flow, out


def _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16):
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    t_bins, g_chunks = x.shape[0], x.shape[1]
    voxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(voxel)
    k_total = len(offsets) + (1 if include_orig else 0)
    band, row, flow_spec, out_spec = _vox_specs(hp, hp_flow, wp, k_total)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16,
            chunk_axis=1, init_axes=(0, 1),
        ),
        grid=(t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k_total, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(_band_rows_2d(band_ids), x, y, dtf, wt, voxel_p)
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_multi_iwe_banded_voxel(voxel, x, y, dtf, wt, band_ids, image_size, offsets,
                                 include_orig=True, eps=1e-6, use_bf16=True):
    """Time-aware banded fused rasterizer over (bin, band)-packed chunks
    (pack_events_by_band_bin).

    voxel [T, 2, H, W]; x/y/dtf/wt [T, G, 1, CHUNK]; band_ids [T, G].
    Returns [(orig?) + len(offsets), H, W]; differentiable w.r.t. voxel
    (the custom-vjp backward emits per-bin slice gradients, and autodiff
    carries them back through the Burgers/upwind lax.scan chain)."""
    return _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16)


def _vox_vjp_fwd(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16):
    out = _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16)
    return out, (voxel, x, y, dtf, wt, band_ids)


def _vox_vjp_bwd(image_size, offsets, include_orig, eps, use_bf16, res, g):
    voxel, x, y, dtf, wt, band_ids = res
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    t_bins, g_chunks = x.shape[0], x.shape[1]
    voxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(voxel)
    k_total = g.shape[0]
    g_p = jnp.zeros((k_total, hp, wp), g.dtype).at[:, :h, :w].set(g)
    band, row, flow_spec, _ = _vox_specs(hp, hp_flow, wp, k_total)
    g_spec = pl.BlockSpec((k_total, hp, wp), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM)
    dvox_spec = pl.BlockSpec((None, 2, hp_flow, wp), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM)

    dvox_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
        ),
        grid=(t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, g_spec],
        out_specs=dvox_spec,
        out_shape=jax.ShapeDtypeStruct((t_bins, 2, hp_flow, wp), voxel.dtype),
        interpret=_interpret(),
    )(_band_rows_2d(band_ids), x, y, dtf, wt, voxel_p, g_p)
    dvoxel = dvox_p[:, :, :h, :w]
    z = jnp.zeros_like
    return dvoxel, z(x), z(y), z(dtf), z(wt), None


fused_multi_iwe_banded_voxel.defvjp(_vox_vjp_fwd, _vox_vjp_bwd)


# ----- fleet variant of the voxel kernel: grid (B, time_bin, chunks) -------


def _vox_specs_batched(hp, hp_flow, wp, k_total):
    band = pl.BlockSpec((None, None, None, 1, 128), lambda b, t, i: (b, t, i, 0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((None, None, None, 1, _CHUNK), lambda b, t, i: (b, t, i, 0, 0), memory_space=pltpu.VMEM)
    flow = pl.BlockSpec((None, None, 2, hp_flow, wp), lambda b, t, i: (b, t, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((None, k_total, hp, wp), lambda b, t, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    return band, row, flow, out


def _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16):
    bsz, t_bins, g_chunks = x.shape[0], x.shape[1], x.shape[2]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    voxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(voxel)
    k_total = len(offsets) + (1 if include_orig else 0)
    band, row, flow_spec, out_spec = _vox_specs_batched(hp, hp_flow, wp, k_total)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16,
            chunk_axis=2, init_axes=(1, 2),
        ),
        grid=(bsz, t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_total, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, voxel_p)
    return out[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_multi_iwe_banded_voxel_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets,
                                         include_orig=True, eps=1e-6, use_bf16=True):
    """Fleet time-aware variant: voxel [B,T,2,H,W]; x/y/dtf/wt
    [B,T,G,1,CHUNK]; band_rows [B,T,G,1,128] int32.  One launch for all B
    frames x T bins; differentiable w.r.t. voxel."""
    return _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16)


def _vox_vjp_fwd_b(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16):
    out = _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16)
    return out, (voxel, x, y, dtf, wt, band_rows)


def _vox_vjp_bwd_b(image_size, offsets, include_orig, eps, use_bf16, res, g):
    voxel, x, y, dtf, wt, band_rows = res
    bsz, t_bins, g_chunks = x.shape[0], x.shape[1], x.shape[2]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    voxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(voxel)
    k_total = g.shape[1]
    g_p = jnp.zeros((bsz, k_total, hp, wp), g.dtype).at[:, :, :h, :w].set(g)
    band, row, flow_spec, _ = _vox_specs_batched(hp, hp_flow, wp, k_total)
    g_spec = pl.BlockSpec((None, k_total, hp, wp), lambda b, t, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dvox_spec = pl.BlockSpec((None, None, 2, hp_flow, wp), lambda b, t, i: (b, t, 0, 0, 0), memory_space=pltpu.VMEM)
    dvox_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=2,
        ),
        grid=(bsz, t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, g_spec],
        out_specs=dvox_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, t_bins, 2, hp_flow, wp), voxel.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, voxel_p, g_p)
    dvoxel = dvox_p[:, :, :, :h, :w]
    z = jnp.zeros_like
    return dvoxel, z(x), z(y), z(dtf), z(wt), None


fused_multi_iwe_banded_voxel_batched.defvjp(_vox_vjp_fwd_b, _vox_vjp_bwd_b)


# --------------------------------------------------------------------------
# Batched-banded: one launch rasterizes a fleet of frames (grid (B, chunks)).


def _specs_batched(hp, hp_flow, wp, k_total):
    band = pl.BlockSpec((None, None, 1, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((None, None, 1, _CHUNK), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    flow = pl.BlockSpec((None, 2, hp_flow, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    return band, row, flow, out


def _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16):
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = len(offsets) + (1 if include_orig else 0)
    band, row, flow_spec, out_spec = _specs_batched(hp, hp_flow, wp, k_total)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
        ),
        grid=(bsz, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_total, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, flow_p)
    return out[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_multi_iwe_banded_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets,
                                   include_orig=True, eps=1e-6, use_bf16=True):
    """Fleet variant: flow [B,2,H,W]; x/y/dtf/wt [B,G,1,CHUNK];
    band_rows [B,G,1,128] int32 (see _band_rows).  One kernel launch for
    all B frames; differentiable w.r.t. flow."""
    return _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16)


def _vjp_fwd_b(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16):
    out = _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16)
    return out, (flow, x, y, dtf, wt, band_rows)


def _vjp_bwd_b(image_size, offsets, include_orig, eps, use_bf16, res, g):
    flow, x, y, dtf, wt, band_rows = res
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = g.shape[1]
    g_p = jnp.zeros((bsz, k_total, hp, wp), g.dtype).at[:, :, :h, :w].set(g)
    band, row, flow_spec, _ = _specs_batched(hp, hp_flow, wp, k_total)
    g_spec = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dflow_spec = pl.BlockSpec((None, 2, hp_flow, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dflow_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
        ),
        grid=(bsz, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, g_spec],
        out_specs=dflow_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 2, hp_flow, wp), flow.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, flow_p, g_p)
    dflow = dflow_p[:, :, :h, :w]
    z = jnp.zeros_like
    return dflow, z(x), z(y), z(dtf), z(wt), None


fused_multi_iwe_banded_batched.defvjp(_vjp_fwd_b, _vjp_bwd_b)
