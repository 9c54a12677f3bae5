"""Banded fused CMax rasterizer family (v2-v4): locality-windowed
gathers and votes with exact full-size fallbacks.

v2 — row-banded gathers: the v1 fused kernel's gather matmuls contract
over the full padded image height (Hp ~ 264 rows) even though each
event reads exactly one pixel.  Events sorted into aligned 64-row bands
make every chunk's gather a 64-row contraction (~4x fewer gather
FLOPs).

v3 — (row, column)-tile packing: on wide frames the gather also
restricts to a 128-column window (``col_bands``); the width-aware
policy (``objective_dense_packing``) picks band vs tile per geometry
from measured A/Bs.

v4 — predicated windowed VOTES: near convergence every warped row lands
close to its source band, so votes accumulate into a
``row_window``-row slice (and optionally a ``col_window`` column slice)
instead of the full padded image — with an EXACT full-size fallback
selected per chunk by ONE data-dependent predicate across all warp
directions (per-direction predicates measured slower than no windowing;
see BENCHMARKS.md).  Both paths place weights from one shared
floor/frac decision, so results are bit-identical to the unwindowed
kernel.

The motion-independent original IWE can be skipped entirely
(``include_orig=False``) when the caller hoists it out of its
optimization loop (solver.objective.build_orig_iwe_banded).

Host-side packers (``pack_events_by_band`` / ``_by_tile`` /
``_by_band_bin``) group events by band/tile/(bin, band) and pad each
group to whole 512-event chunks (sentinel events are inert), running
through the native C++ counting-sort packer (native/packer.cpp) with a
byte-identical Python fallback.  IWE accumulation is order-independent
and the time statistics are computed before packing, so results match
the unsorted kernel exactly.  Variants: single-frame dense
(``fused_multi_iwe_banded``), time-aware voxel (bin as a grid
dimension), and fleet-batched versions of both.
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
    _corner_block,
    _corner_block_tent,
    _corner_deriv,
    _corner_deriv_block,
    _corner_deriv_block_tent_bf16,
    _dot,
    _fl_frac,
    _gather_uv,
    _onehot_int,
    _onehot_int_tent_bf16,
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


def _pack_native(events, weights, dtf, n_rows: int, n_cols: int, n_bins: int,
                 g_max: int, chunk: int):
    """Native C++ packing with inline group computation; None -> caller
    falls back to the numpy group formula + _pack_grouped loop (identical
    layout, tested byte-equal)."""
    from .. import native

    return native.pack_events(
        np.asarray(events, np.float64), weights, dtf,
        BAND, n_rows, COLBAND, n_cols, n_bins, chunk, g_max,
    )


def _pack_grouped(x, y, dtf, wt, group_of, valid, n_groups: int, g_max: int,
                  chunk: int):
    """Pure-Python stable grouped chunk packing (fallback for
    native/packer.cpp): chunks are emitted in ascending group order,
    events keep their input order, each group pads its last chunk with
    inert sentinels.

    Returns (x, y, dtf, wt [g_max, chunk] float64, chunk_group [g_max],
    n_chunks_used)."""
    x_out = np.full((g_max, chunk), -10.0, dtype=np.float64)
    y_out = np.full((g_max, chunk), -10.0, dtype=np.float64)
    d_out = np.zeros((g_max, chunk), dtype=np.float64)
    w_out = np.zeros((g_max, chunk), dtype=np.float64)
    chunk_group = np.zeros(g_max, dtype=np.int32)
    g = 0
    for b in range(n_groups):
        sel = np.nonzero(valid & (group_of == b))[0]
        for start in range(0, len(sel), chunk):
            idx = sel[start : start + chunk]
            k = len(idx)
            x_out[g, :k] = x[idx]
            y_out[g, :k] = y[idx]
            d_out[g, :k] = dtf[idx]
            w_out[g, :k] = wt[idx]
            chunk_group[g] = b
            g += 1
    return x_out, y_out, d_out, w_out, chunk_group, g


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
    n_bands = _round_up(height, BAND) // BAND
    res = _pack_native(events, weights, dtf, n_bands, 1, 1, g_max, _CHUNK)
    if res is None:
        band_of = np.clip(events[:, 0].astype(np.int64) // BAND, 0, n_bands - 1)
        res = _pack_grouped(
            events[:, 0], events[:, 1], dtf, weights, band_of, weights > 0,
            n_bands, g_max, _CHUNK,
        )
    x_out, y_out, d_out, w_out, band_ids, _ = res
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


# Dense packing policy for the OBJECTIVE paths (single-frame Newton,
# event-sharded, fleet).  Round-2 CALIBRATED probes (tools/
# probe_objective.py, 0.3% reproducibility — superseding round 1's
# noisy-slope "band beats tile at MVSEC width" conclusion) measured the
# fwd+bwd objective shape: MVSEC 260x346/30k: tile512:rw96 0.3594 ms vs
# band:rw128 0.3801 / tile512:rw128 0.3775 / band:rw96 0.3631; DSEC
# 480x640/300k: tile1024:rw96 4.66 vs tile512:rw128 5.08.  Late round 2:
# FLEX packing (fill-balanced DP row bands, pack_events_by_tile_flex)
# cuts grid steps at every geometry — a step costs the same whether its
# chunk is events or padding (standalone-vote probes: tile1024 451 ->
# flex1280 670 Mev/s).  Policy: FLEX packing, row window 96; chunk per
# objective_dense_chunk (objective-shape A/B numbers in BENCHMARKS.md).
# Packer and kernel flags MUST agree; these helpers keep every
# objective-path consumer consistent.
OBJECTIVE_DENSE_PACKING = "flex"  # "band" | "tile" | "flex"


# Windowed votes (v4): near convergence, warped positions stay close to
# the source tile, so votes can accumulate into a row (and, with tile
# packing, column) window instead of the full padded image — with an
# exact full-size fallback predicated per chunk for far-flung candidates
# (init sweeps, line-search probes).  ROW window: multiple of 16 (keeps
# the 8-aligned start provable); 96 = band +-16 rows — covers the
# displacements of near-convergent solves, and the calibrated probes
# measured it faster than 128 on the objective shape at BOTH geometries
# (vote MXU M pads to 128 either way; the saving is the VPU corner
# build).  COL window: (COLBAND - cw)/2 must be a multiple of 128 (lane
# alignment), i.e. cw in {128, 384, 640, ...}; DISABLED by default —
# same-session DSEC-geometry A/B measured tile+row 4.86 ms vs
# tile+row+col 5.41 ms per objective eval (the row window already
# removes the dominant vote cost; the narrower lane dim only shrinks
# already-cheap dots and adds predicate work).  The kernel capability +
# bit-exactness tests remain for future hardware.
OBJECTIVE_ROW_WINDOW = 96
OBJECTIVE_COL_WINDOW = None
# v8: bf16 tent-arithmetic vote corner blocks for the single-frame dense
# objective kernels — False (select builds), True (forward blocks only,
# fused_multi_iwe_banded(..., tent=True)), or "all" (forward blocks AND
# the backward's dot-consumed column blocks; see _bwd_one_chunk).  OFF
# until the calibrated TPU probe decides (see _corner_block_tent)
OBJECTIVE_TENT = False
# v9: stream precomputed motion-independent gather one-hots from HBM
# instead of rebuilding them on the VPU every evaluation (bit-identical;
# see _gather_tables).  OFF until the calibrated TPU probe decides.
OBJECTIVE_PREGATHER = False
# wp threshold above which the dense objective packs 1024-event chunks
# (DSEC-geometry probe: 4.66 vs 4.74 ms; at MVSEC width 512 wins)
_WIDE_TILE_WP = 512


def objective_row_window(height: int) -> Optional[int]:
    """Row window for the objective kernels; None when the frame is small
    enough that the window would not shrink the vote."""
    hp = _round_up(max(height + 1, BAND), 8)
    return OBJECTIVE_ROW_WINDOW if hp > OBJECTIVE_ROW_WINDOW else None


def objective_dense_packing(width: int) -> str:
    """'band' | 'tile' | 'flex' for the dense objective paths."""
    if OBJECTIVE_DENSE_PACKING == "flex":
        return "flex"
    wp = _round_up(width + 1, 128)
    if OBJECTIVE_DENSE_PACKING == "tile" or wp >= _WIDE_TILE_WP:
        return "tile"
    return "band"


def objective_dense_col_bands(width: int) -> Optional[int]:
    """``col_bands`` kernel flag matching ``pack_events_dense``."""
    return n_col_bands(width) if objective_dense_packing(width) != "band" else None


def objective_tent(use_bf16: bool):
    """``tent`` kernel flag for the single-frame dense objective path
    (bf16 kernels only; the select path is the exact/parity build).
    Returns False, True (forward tent) or "all" (forward + backward
    tent) per the OBJECTIVE_TENT policy."""
    return OBJECTIVE_TENT if use_bf16 else False


def objective_row_scale(width: int) -> int:
    """``row_scale`` kernel flag matching ``pack_events_dense``."""
    return FLEX_ROW_SCALE if objective_dense_packing(width) == "flex" else BAND


def objective_pregather(use_bf16: bool) -> bool:
    """``pregather`` kernel flag for the single-frame dense objective
    path (bf16 kernels only — the streamed tables target the adopted
    fused path; the exact/parity f32 path keeps in-kernel builds)."""
    return OBJECTIVE_PREGATHER if use_bf16 else False


def objective_col_window(height: int, width: int) -> Optional[int]:
    """Column window for the dense objective kernels (requires tile
    packing and an active row window); None unless OBJECTIVE_COL_WINDOW
    is enabled (see the policy note above)."""
    if OBJECTIVE_COL_WINDOW is None:
        return None
    wp = _round_up(width + 1, 128)
    if (
        objective_row_window(height) is not None
        and objective_dense_packing(width) == "tile"
        and wp > OBJECTIVE_COL_WINDOW
    ):
        return OBJECTIVE_COL_WINDOW
    return None


def objective_dense_chunk(width: int) -> int:
    """Chunk size for the dense objective packing.  Fixed-lattice tile:
    1024 wide / 512 narrow (round-2 probes).  Flex packing keeps fill
    high at wide chunks: 1024 everywhere (calibrated objective A/Bs —
    MVSEC 0.271 ms at 1024 vs 0.281 at 1280; DSEC 3.28 at 1024 vs 3.30
    at 1280 / 3.31 at 1536; BENCHMARKS.md).  The standalone-vote bench
    shape prefers 1280 (bench.py packs explicitly)."""
    if objective_dense_packing(width) == "flex":
        return 1024
    wp = _round_up(width + 1, 128)
    return 1024 if wp >= _WIDE_TILE_WP else _CHUNK


# G-bucket for flex packing on the objective paths: the chunk count is
# data-dependent, so it rounds up to a multiple of this (inert sentinel
# chunks) to bound jit retraces across frames of similar density.
_FLEX_G_ROUND = 8


def pack_events_dense(events, weights, dtf, height: int, width: int, chunk: int = 0,
                      g_round: int = 0):
    """Dense-path packing for the objective consumers; the matching kernel
    flags are ``objective_dense_col_bands`` / ``objective_row_window`` /
    ``objective_col_window`` / ``objective_row_scale`` (chunk defaults to
    the width policy ``objective_dense_chunk``).  ``g_round`` overrides the
    flex G bucket (callers whose event count varies call-to-call — e.g.
    coarse-scale subsamples — pass a coarser bucket to bound retraces)."""
    chunk = chunk or objective_dense_chunk(width)
    packing = objective_dense_packing(width)
    if packing == "flex":
        return pack_events_by_tile_flex(
            events, weights, dtf, height, width, chunk,
            g_round=g_round or _FLEX_G_ROUND,
        )
    if packing == "tile":
        return pack_events_by_tile(events, weights, dtf, height, width, chunk)
    return pack_events_by_band(events, weights, dtf, height)


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
    res = _pack_native(events, weights, dtf, n_rows, n_cols, 1, g_max, chunk)
    if res is None:
        row_of = np.clip(events[:, 0].astype(np.int64) // BAND, 0, n_rows - 1)
        col_of = np.clip(events[:, 1].astype(np.int64) // COLBAND, 0, n_cols - 1)
        res = _pack_grouped(
            events[:, 0], events[:, 1], dtf, weights, row_of * n_cols + col_of,
            weights > 0, n_rows * n_cols, g_max, chunk,
        )
    x_out, y_out, d_out, w_out, band_ids, _ = res
    shape = (g_max, 1, chunk)
    return (
        x_out.reshape(shape),
        y_out.reshape(shape),
        d_out.reshape(shape),
        w_out.reshape(shape),
        band_ids,
    )


def _stack_uv_hilo(flow_p):
    """[2, hp_flow, wp] f32 flow table -> [4*hp_flow, wp] bf16 gather table
    with per-64-row-band interleaving: rows [256b, 256b+256) hold
    [u_hi; v_hi; u_lo; lo_v] of band b.  The kernel slices ONE 256-row
    tile per chunk and issues ONE gather dot at full MXU M (the round-2
    "M=128 stacking" probe lost to IN-KERNEL concat cost; pre-stacking on
    the host removes the concat and also hoists the per-chunk f32->bf16
    hi/lo split out of the kernel).  The hi+lo sum is accumulated in f32
    outside the dot, so results are bit-identical to the unstacked bf16
    gather."""
    dtype = flow_p.dtype
    hi = flow_p.astype(jnp.bfloat16)
    lo = (flow_p - hi.astype(dtype)).astype(jnp.bfloat16)
    hp_flow, wp = flow_p.shape[1], flow_p.shape[2]
    nb = hp_flow // BAND
    s = jnp.stack([hi, lo])  # [2 (hi/lo), 2 (u/v), hp_flow, wp]
    s = s.reshape(2, 2, nb, BAND, wp).transpose(2, 0, 1, 3, 4)
    return s.reshape(nb * 4 * BAND, wp)


def _banded_gather_uv_stacked(stable_ref, band_row0, x_base, x, y, wp, col0=None):
    """(u, v) from the pre-stacked hi/lo gather table (_stack_uv_hilo):
    one [256, COLBAND-or-wp] tile slice, one bf16 dot, f32 accumulation.
    Bit-identical to _banded_gather_uv(use_bf16=True)."""
    dtype = x.dtype
    x_local = x - x_base.astype(dtype)
    a_band = _onehot_int(x_local, BAND)
    row0 = pl.multiple_of(band_row0 * 4, 4 * BAND)
    if col0 is None:
        b_loc = _onehot_int(y, wp)
        tile = stable_ref[pl.ds(row0, 4 * BAND), :]
    else:
        b_loc = _onehot_int(y - col0.astype(dtype), COLBAND)
        tile = stable_ref[pl.ds(row0, 4 * BAND), pl.ds(col0, COLBAND)]
    p = jax.lax.dot_general(
        tile, b_loc.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    )  # [256, C]
    p_u = p[0 * BAND : 1 * BAND] + p[2 * BAND : 3 * BAND]
    p_v = p[1 * BAND : 2 * BAND] + p[3 * BAND : 4 * BAND]
    u = jnp.sum(a_band * p_u, axis=0, keepdims=True)
    v = jnp.sum(a_band * p_v, axis=0, keepdims=True)
    return u, v, a_band, b_loc


FLEX_ROW_SCALE = 8  # band-id row units for pack_events_by_tile_flex


def pack_events_by_tile_flex(
    events: np.ndarray,
    weights: np.ndarray,
    dtf: np.ndarray,
    height: int,
    width: int,
    chunk: int = _CHUNK,
    g_round: int = 1,
):
    """Fill-balanced tile packing (v7): per 128-column band, row bands are
    VARIABLE-height (8-aligned starts, <= 64 rows — the gather slice only
    needs sublane alignment), chosen greedily so each band's event count
    fills whole chunks.  A grid step costs the same whether its chunk is
    full or padding, so fewer, fuller chunks is a direct win over the
    fixed 64-row lattice (which e.g. at H=260 makes a 4-row fifth band and
    packs the bench shape at 67% fill).

    Returns (x [G,1,C], y, dtf, wt, band_ids [G]) with band_id =
    (row_start // 8) * n_col_bands + col_band; pass
    ``row_scale=FLEX_ROW_SCALE`` to the kernel.  ``g_round`` pads G up to
    a multiple (inert sentinel chunks) to bound jit retraces."""
    n_cols = n_col_bands(width)
    n_slabs = _round_up(height, 8) // 8
    x = np.asarray(events[:, 0], np.float64)
    y = np.asarray(events[:, 1], np.float64)
    wt = np.asarray(weights, np.float64)
    d = np.asarray(dtf, np.float64)
    valid = wt > 0
    col_of = np.clip(y.astype(np.int64) // COLBAND, 0, n_cols - 1)
    slab_of = np.clip(x.astype(np.int64) // FLEX_ROW_SCALE, 0, n_slabs - 1)
    order = np.argsort(col_of * n_slabs + slab_of, kind="stable")
    order = order[valid[order]]

    xs, ys, ds, ws, ids = [], [], [], [], []
    for c in range(n_cols):
        sel = order[col_of[order] == c]
        if len(sel) == 0:
            continue
        counts = np.bincount(slab_of[sel], minlength=n_slabs)
        # optimal band partition (exact DP, O(n_slabs * 8)): bands are
        # <= 8 consecutive slabs; minimize total emitted chunks, ties to
        # the longer band (fuller last chunks)
        max_span = BAND // FLEX_ROW_SCALE
        best = np.zeros(n_slabs + 1, dtype=np.int64)
        nxt = np.zeros(n_slabs, dtype=np.int64)
        for s in range(n_slabs - 1, -1, -1):
            cum = 0
            best[s] = np.iinfo(np.int64).max
            for e in range(s + 1, min(s + max_span, n_slabs) + 1):
                cum += int(counts[e - 1])
                cand = best[e] + -(-cum // chunk)
                if cand <= best[s]:
                    best[s] = cand
                    nxt[s] = e
        pos = 0
        s = 0
        while s < n_slabs:
            e = int(nxt[s])
            cnt = int(counts[s:e].sum())
            band = sel[pos : pos + cnt]
            pos += cnt
            for st in range(0, cnt, chunk):
                idx = band[st : st + chunk]
                k = len(idx)
                pad = chunk - k
                xs.append(np.concatenate([x[idx], np.full(pad, -10.0)]))
                ys.append(np.concatenate([y[idx], np.full(pad, -10.0)]))
                ds.append(np.concatenate([d[idx], np.zeros(pad)]))
                ws.append(np.concatenate([wt[idx], np.zeros(pad)]))
                ids.append(s * n_cols + c)
            s = e
    g = len(xs)
    g_max = max(-(-g // g_round) * g_round, g_round)
    for _ in range(g_max - g):
        xs.append(np.full(chunk, -10.0))
        ys.append(np.full(chunk, -10.0))
        ds.append(np.zeros(chunk))
        ws.append(np.zeros(chunk))
        ids.append(0)
    shape = (g_max, 1, chunk)
    return (
        np.stack(xs).reshape(shape),
        np.stack(ys).reshape(shape),
        np.stack(ds).reshape(shape),
        np.stack(ws).reshape(shape),
        np.asarray(ids, np.int32),
    )


def _gather_tables(x, y, band_ids, col_bands, row_scale, wp, dtype,
                   bands_mod=None):
    """v9 ``pregather``: the gather one-hots are MOTION-INDEPENDENT (they
    depend only on the packed event positions), yet the kernel rebuilds
    them on the VPU in EVERY forward and backward call — hundreds of
    times per Newton solve on one fixed pack.  Precompute them ONCE per
    pack on the XLA side and stream them from HBM per grid step:
    a_tab [G, BAND, C] (row mask, consumed elementwise in f32) and
    b_tab [G, BW, C] bf16 (column one-hot, consumed by the MXU dots —
    {0, 1} is exact in bf16, so results are bit-identical to the
    in-kernel builds)."""
    band = band_ids.astype(jnp.int32)
    if col_bands is None:
        row0 = band * row_scale
        col0 = jnp.zeros_like(band)
        bw = wp
    else:
        row0 = (band // col_bands) * row_scale
        col0 = (band % col_bands) * COLBAND
        bw = COLBAND
    x_base = row0 if bands_mod is None else (band % bands_mod) * row_scale
    xl = (x[:, 0, :] - x_base[:, None].astype(x.dtype)).astype(jnp.int32)
    a_tab = (
        jnp.arange(BAND, dtype=jnp.int32)[None, :, None] == xl[:, None, :]
    ).astype(dtype)
    yl = (y[:, 0, :] - col0[:, None].astype(y.dtype)).astype(jnp.int32)
    b_tab = (
        jnp.arange(bw, dtype=jnp.int32)[None, :, None] == yl[:, None, :]
    ).astype(jnp.bfloat16)
    return a_tab, b_tab


def _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0=None,
                      tent=False, pre=None):
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
    if pre is not None:
        # v9 pregather: streamed precomputed one-hots (see _gather_tables);
        # the (None, R, C) block specs squeeze the chunk dim
        a_band = pre[0][:]
        b_loc = pre[1][:]
    else:
        x_local = x - x_base.astype(dtype)
        a_band = _onehot_int(x_local, BAND)
        # tent (v8): build the column one-hot directly in bf16 (exact —
        # see _onehot_int_tent_bf16), skipping the f32 select build + convert
        onehot_b = _onehot_int_tent_bf16 if (tent and use_bf16) else _onehot_int
        b_loc = onehot_b(y if col0 is None else y - col0.astype(dtype),
                         wp if col0 is None else COLBAND)
    if col0 is None:
        flow_u = flow_ref[0, pl.ds(band_row0, BAND), :]
        flow_v = flow_ref[1, pl.ds(band_row0, BAND), :]
    else:
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


def _window_start(x_base, hp, row_window):
    """8-aligned start of the vote row window centered on the source band
    (x_base is 64-aligned, row_window a multiple of 16, hp of 8 — every
    candidate value is 8-aligned, clipping included).  The clipped window
    always covers the band itself: unwarped (orig) votes are in-window by
    construction."""
    lo = x_base + (BAND // 2 - row_window // 2)
    return jnp.clip(lo, 0, hp - row_window)


def _col_window_start(col_base, wp, col_window):
    """128-aligned start of the vote column window centered on the source
    column band (col_base is 128-aligned; col_window must satisfy
    (COLBAND - col_window) // 2 ≡ 0 mod 128, e.g. 384; wp is a multiple
    of 128).  Covers the column band itself, so unwarped votes are
    col-in-window by construction."""
    lo = col_base + (COLBAND - col_window) // 2
    return jnp.clip(lo, 0, wp - col_window)


def _ds_lane_aligned(c0, size):
    """Dynamic lane slice with the 128-alignment assertion (see
    _col_window_start)."""
    return pl.ds(pl.multiple_of(c0, 128), size)


def _ds_aligned(w0, size):
    """Dynamic sublane slice with the 8-alignment assertion Mosaic cannot
    derive through the clip in _window_start (every term is a multiple
    of 8)."""
    return pl.ds(pl.multiple_of(w0, 8), size)


def _fwd_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, *rest,
                hp, wp, eps, offsets, include_orig, use_bf16, chunk_axis=0,
                bands_mod=None, init_axes=None, col_bands=None, row_window=None,
                col_window=None, chunks_per_step=1, stack_uv=False,
                row_scale=BAND, tent=False, pregather=False):
    assert col_window is None or (row_window is not None and col_bands is not None)
    if pregather:
        a_ref, b_ref, out_ref = rest
    else:
        (out_ref,) = rest
        a_ref = b_ref = None
    i = pl.program_id(chunk_axis)
    init = i == 0
    for ax in init_axes or ():
        if ax != chunk_axis:
            init = init & (pl.program_id(ax) == 0)

    @pl.when(init)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # chunks_per_step > 1: the block carries several independent chunks
    # ([k, C] rows); unrolling them in one grid step gives the instruction
    # scheduler independent VPU (one-hot/corner builds) and MXU (gather/
    # vote dots) streams to dual-issue — within a single chunk the
    # build -> dot chain is serial
    for j in range(chunks_per_step):
        _fwd_one_chunk(
            band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, out_ref, j,
            hp=hp, wp=wp, eps=eps, offsets=offsets, include_orig=include_orig,
            use_bf16=use_bf16, bands_mod=bands_mod, col_bands=col_bands,
            row_window=row_window, col_window=col_window, stack_uv=stack_uv,
            row_scale=row_scale, tent=tent,
            pre=None if a_ref is None else (a_ref, b_ref),
        )


def _fwd_one_chunk(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, out_ref, j, *,
                   hp, wp, eps, offsets, include_orig, use_bf16,
                   bands_mod=None, col_bands=None, row_window=None,
                   col_window=None, stack_uv=False, row_scale=BAND, tent=False,
                   pre=None):
    # tent=True (v8, bf16 kernel only): vote corner blocks are built by
    # bf16 tent arithmetic instead of f32 selects + convert (see
    # _corner_block_tent); floors/predicates and the backward pass are
    # unchanged, so windowed/full routing stays shared
    cb = _corner_block_tent if (tent and use_bf16) else _corner_block
    x = x_ref[j : j + 1, :]
    y = y_ref[j : j + 1, :]
    dtf = dtf_ref[j : j + 1, :]
    wt = w_ref[j : j + 1, :]
    dtype = x.dtype
    band_id = band_ref[j, 0]
    if col_bands is None:
        band_row0 = band_id * row_scale  # 8-aligned: sublane-legal slices
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * row_scale
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0 if bands_mod is None else (band_id % bands_mod) * row_scale

    if stack_uv:
        u, v, _, _ = _banded_gather_uv_stacked(flow_ref, band_row0, x_base, x, y, wp, col0)
    else:
        u, v, _, _ = _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0,
                                       tent=tent, pre=pre)

    w0 = None if row_window is None else _window_start(x_base, hp, row_window)
    c0w = None if col_window is None else _col_window_start(col0, wp, col_window)
    k0 = 0
    if include_orig:
        fl0, fr0 = _fl_frac(x, eps)
        cl0, cf0 = _fl_frac(y, eps)
        if row_window is None:
            r0 = cb(fl0, fr0, wt, hp)
            c0 = cb(cl0, cf0, None, wp)
            out_ref[0] += _dot(r0, c0, ((1,), (1,)), use_bf16, dtype)
        else:
            # unwarped rows/cols are inside their band, hence in-window
            r0 = cb(fl0 - w0, fr0, wt, row_window)
            if col_window is None:
                c0 = cb(cl0, cf0, None, wp)
                out_ref[0, _ds_aligned(w0, row_window), :] += _dot(
                    r0, c0, ((1,), (1,)), use_bf16, dtype
                )
            else:
                c0 = cb(cl0 - c0w, cf0, None, col_window)
                out_ref[0, _ds_aligned(w0, row_window), _ds_lane_aligned(c0w, col_window)] += _dot(
                    r0, c0, ((1,), (1,)), use_bf16, dtype
                )
        k0 = 1
    warped = []
    for k, off in enumerate(offsets):
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        warped.append((_fl_frac(xw, eps), _fl_frac(yw, eps)))
    if row_window is None or not warped:  # orig-only calls have no predicate
        for k, ((fl_i, frac), (cl_i, cfr)) in enumerate(warped):
            r = cb(fl_i, frac, wt, hp)
            c = cb(cl_i, cfr, None, wp)
            out_ref[k0 + k] += _dot(r, c, ((1,), (1,)), use_bf16, dtype)
    else:
        # ONE chunk-level predicate across every direction (scalar syncs
        # and branch transitions are the overhead, not the votes): a vote
        # is inert iff the event is padding or lands fully off the padded
        # image on either axis; otherwise it must sit strictly inside the
        # window (both touched rows/cols) for the windowed fast path
        ok = None
        for (fl_i, _), (cl_i, _) in warped:
            inert = (wt <= 0) | (fl_i <= -2) | (fl_i >= hp)
            in_win = (fl_i >= w0) & (fl_i <= w0 + row_window - 2)
            if col_window is not None:
                inert = inert | (cl_i <= -2) | (cl_i >= wp)
                in_win = in_win & (cl_i >= c0w) & (cl_i <= c0w + col_window - 2)
            this = inert | in_win
            ok = this if ok is None else (ok & this)
        all_ok = jnp.all(ok)

        @pl.when(all_ok)
        def _():
            for k, ((fl_i, frac), (cl_i, cfr)) in enumerate(warped):
                r = cb(fl_i - w0, frac, wt, row_window)
                if col_window is None:
                    c = cb(cl_i, cfr, None, wp)
                    out_ref[k0 + k, _ds_aligned(w0, row_window), :] += _dot(
                        r, c, ((1,), (1,)), use_bf16, dtype
                    )
                else:
                    c = cb(cl_i - c0w, cfr, None, col_window)
                    out_ref[k0 + k, _ds_aligned(w0, row_window), _ds_lane_aligned(c0w, col_window)] += _dot(
                        r, c, ((1,), (1,)), use_bf16, dtype
                    )

        @pl.when(~all_ok)
        def _():
            for k, ((fl_i, frac), (cl_i, cfr)) in enumerate(warped):
                r = cb(fl_i, frac, wt, hp)
                c = cb(cl_i, cfr, None, wp)
                out_ref[k0 + k] += _dot(r, c, ((1,), (1,)), use_bf16, dtype)


def _bwd_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, g_ref, *rest,
                hp, wp, eps, offsets, include_orig, use_bf16, chunk_axis=0,
                bands_mod=None, col_bands=None, row_window=None, col_window=None,
                chunks_per_step=1, stack_uv=False, row_scale=BAND, tent=False,
                pregather=False):
    assert col_window is None or (row_window is not None and col_bands is not None)
    if pregather:
        a_ref, b_ref, dflow_ref = rest
    else:
        (dflow_ref,) = rest
        a_ref = b_ref = None
    i = pl.program_id(chunk_axis)

    @pl.when(i == 0)
    def _():
        dflow_ref[:] = jnp.zeros_like(dflow_ref)

    for j in range(chunks_per_step):
        _bwd_one_chunk(
            band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, g_ref, dflow_ref, j,
            hp=hp, wp=wp, eps=eps, offsets=offsets, include_orig=include_orig,
            use_bf16=use_bf16, bands_mod=bands_mod, col_bands=col_bands,
            row_window=row_window, col_window=col_window, stack_uv=stack_uv,
            row_scale=row_scale, tent=tent,
            pre=None if a_ref is None else (a_ref, b_ref),
        )


def _bwd_one_chunk(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, g_ref, dflow_ref, j, *,
                   hp, wp, eps, offsets, include_orig, use_bf16,
                   bands_mod=None, col_bands=None, row_window=None,
                   col_window=None, stack_uv=False, row_scale=BAND, tent=False,
                   pre=None):
    x = x_ref[j : j + 1, :]
    y = y_ref[j : j + 1, :]
    dtf = dtf_ref[j : j + 1, :]
    wt = w_ref[j : j + 1, :]
    dtype = x.dtype
    band_id = band_ref[j, 0]
    if col_bands is None:
        band_row0 = band_id * row_scale
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * row_scale
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0 if bands_mod is None else (band_id % bands_mod) * row_scale

    if stack_uv:
        u, v, a_band, b_loc = _banded_gather_uv_stacked(flow_ref, band_row0, x_base, x, y, wp, col0)
        x_local = x - x_base.astype(dtype)
    else:
        # tent gathers are bit-identical (exact bf16 one-hot), so the
        # backward may share the flag without changing gradients
        u, v, a_band, b_loc = _banded_gather_uv(flow_ref, band_row0, x_base, x, y, wp,
                                                use_bf16, col0, tent=tent, pre=pre)

    w0 = None if row_window is None else _window_start(x_base, hp, row_window)
    c0w = None if col_window is None else _col_window_start(col0, wp, col_window)
    k0 = 1 if include_orig else 0
    warped = []
    for k, off in enumerate(offsets):
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        warped.append((dt, _fl_frac(xw, eps), _fl_frac(yw, eps)))

    # tent == "all" (v8 backward): the DOT-consumed column blocks (c, cd —
    # the full-lane-width [csize, C] builds, the big VPU work here) are
    # built directly in bf16 by tent arithmetic: cd is bit-identical
    # (_corner_deriv_block_tent_bf16), c carries the same ~2^-9 rounding
    # shift as the forward tent blocks.  The row blocks r/rd stay
    # select-based f32: they are consumed ELEMENTWISE against the f32 dot
    # outputs (sum(rd * p)), where a bf16 build would just add converts.
    tent_bwd = (tent == "all") and use_bf16
    cb_b = _corner_block_tent if tent_bwd else _corner_block

    def accumulate(win: bool):
        """Sum per-direction du/dv; ``win`` selects the windowed or
        full-size cotangent slice.  Rows/cols outside the window only
        ever carry zero corner weights, so slicing the cotangent is
        exact."""
        du = jnp.zeros_like(x)
        dv = jnp.zeros_like(x)
        size = row_window if win else hp
        csize = col_window if (win and col_window is not None) else wp
        for k, (dt, (fl_i, frac), (cl_i, cfr)) in enumerate(warped):
            cl_loc = cl_i - c0w if csize != wp else cl_i
            c = cb_b(cl_loc, cfr, None, csize)
            cd = (
                _corner_deriv_block_tent_bf16(cl_loc, None, csize)
                if tent_bwd
                else _corner_deriv_block(cl_loc, None, csize, dtype)
            )
            fl_loc = fl_i - w0 if win else fl_i
            r = _corner_block(fl_loc, frac, wt, size)
            rd = _corner_deriv_block(fl_loc, wt, size, dtype)
            if win:
                if col_window is None:
                    gk = g_ref[k0 + k, _ds_aligned(w0, row_window), :]
                else:
                    gk = g_ref[k0 + k, _ds_aligned(w0, row_window), _ds_lane_aligned(c0w, col_window)]
            else:
                gk = g_ref[k0 + k]
            p = _dot(gk, c, ((1,), (0,)), use_bf16, dtype)
            pd = _dot(gk, cd, ((1,), (0,)), use_bf16, dtype)
            du += -dt * jnp.sum(rd * p, axis=0, keepdims=True)
            dv += -dt * jnp.sum(r * pd, axis=0, keepdims=True)
        return du, dv

    if row_window is None or not warped:  # orig-only: nothing to predicate
        du, dv = accumulate(False)
    else:
        # ONE chunk-level predicate across every direction (forward's
        # routing condition; see _fwd_kernel)
        ok = None
        for _dt, (fl_i, _), (cl_i, _) in warped:
            inert = (wt <= 0) | (fl_i <= -2) | (fl_i >= hp)
            in_win = (fl_i >= w0) & (fl_i <= w0 + row_window - 2)
            if col_window is not None:
                inert = inert | (cl_i <= -2) | (cl_i >= wp)
                in_win = in_win & (cl_i >= c0w) & (cl_i <= c0w + col_window - 2)
            this = inert | in_win
            ok = this if ok is None else (ok & this)
        du, dv = jax.lax.cond(
            jnp.all(ok), lambda: accumulate(True), lambda: accumulate(False)
        )

    if stack_uv:
        # stacked M=128 scatter into the interleaved [2*hp_flow, wp] dflow
        # layout (u band rows then v band rows per 64-row band; the host
        # de-interleaves).  a2 holds du at the event's local row and dv at
        # local row + BAND — the same bf16(du) summands the two-dot path
        # contracts, so the de-interleaved result is bit-identical.
        xi = x_local.astype(jnp.int32)
        grid2 = jax.lax.broadcasted_iota(jnp.int32, (2 * BAND, x.shape[-1]), 0)
        a2 = jnp.where(grid2 == xi, du, 0.0) + jnp.where(grid2 == xi + BAND, dv, 0.0)
        r0s = pl.multiple_of(band_row0 * 2, 2 * BAND)
        if col_bands is None:
            dflow_ref[pl.ds(r0s, 2 * BAND), :] += _dot(
                a2, b_loc, ((1,), (1,)), use_bf16, dtype
            )
        else:
            dflow_ref[pl.ds(r0s, 2 * BAND), pl.ds(col0, COLBAND)] += _dot(
                a2, b_loc, ((1,), (1,)), use_bf16, dtype
            )
    elif col_bands is None:
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


def _group_chunks(x, y, dtf, wt, band_ids, k: int):
    """Regroup [G, 1, C] chunk arrays into [G/k, k, C] blocks of k
    independent chunks per grid step (padding with inert sentinel chunks
    to a multiple of k); returns (x, y, dtf, wt [G/k, k, C],
    band_rows [G/k, k, 128], n_steps)."""
    g = x.shape[0]
    c = x.shape[-1]
    g_pad = -(-g // k) * k
    if g_pad != g:
        widths = ((0, g_pad - g), (0, 0), (0, 0))
        x = jnp.pad(x, widths, constant_values=-10.0)
        y = jnp.pad(y, widths, constant_values=-10.0)
        dtf = jnp.pad(dtf, widths)
        wt = jnp.pad(wt, widths)
        band_ids = jnp.pad(band_ids, (0, g_pad - g))
    steps = g_pad // k
    rows = jnp.broadcast_to(
        band_ids.astype(jnp.int32).reshape(steps, k)[:, :, None], (steps, k, 128)
    )
    shape = (steps, k, c)
    return (x.reshape(shape), y.reshape(shape), dtf.reshape(shape),
            wt.reshape(shape), rows, steps)


def _flow_pad_rows(h: int, row_scale: int) -> int:
    """Gather-table height: whole 64-row bands for the aligned packers;
    for flex packing (row_scale=8) every 8-aligned band start up to
    round_up(h,8)-8 must have a full BAND-row slice below it."""
    if row_scale == BAND:
        return _round_up(h, BAND)
    return _round_up(h, row_scale) - row_scale + BAND


def _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands=None, row_window=None, col_window=None, chunks_per_step=1, stack_uv=False, row_scale=BAND, tent=False, pregather=False):
    assert not stack_uv or use_bf16, "stack_uv is the hi/lo-bf16 gather layout"
    assert not stack_uv or row_scale == BAND, "stack_uv requires 64-aligned bands"
    assert not pregather or (use_bf16 and not stack_uv and chunks_per_step == 1), \
        "pregather targets the adopted bf16 single-chunk-per-step path"
    h, w = image_size
    # votes only need one extra row; the flow (gather table) pads to whole
    # 64-row bands so dynamic band slices stay Mosaic-vectorizable
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    k = chunks_per_step
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    k_total = len(offsets) + (1 if include_orig else 0)
    xs, ys, ds, ws, rows, steps = _group_chunks(x, y, dtf, wt, band_ids, k)
    if stack_uv:
        flow_in = _stack_uv_hilo(flow_p)
        flow_spec = pl.BlockSpec((4 * hp_flow, wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        flow_in = flow_p
        flow_spec = pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    extra_in = []
    extra_specs = []
    if pregather:
        a_tab, b_tab = _gather_tables(x, y, band_ids, col_bands, row_scale, wp,
                                      flow.dtype)
        extra_in = [a_tab, b_tab]
        extra_specs = [
            pl.BlockSpec((None, BAND, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b_tab.shape[1], x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, col_bands=col_bands,
            row_window=row_window, col_window=col_window, chunks_per_step=k,
            stack_uv=stack_uv, row_scale=row_scale, tent=tent, pregather=pregather,
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((None, k, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((None, k, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 4,
            flow_spec,
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((k_total, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_total, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(rows, xs, ys, ds, ws, flow_in, *extra_in)
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18))
def fused_multi_iwe_banded(flow, x, y, dtf, wt, band_ids, image_size, offsets,
                           include_orig=True, eps=1e-6, use_bf16=True, col_bands=None,
                           row_window=None, col_window=None, chunks_per_step=1,
                           stack_uv=False, row_scale=BAND, tent=False,
                           pregather=False):
    """Banded fused rasterizer over pre-packed chunks (pack_events_by_band,
    or pack_events_by_tile with ``col_bands=n_col_bands(w)`` for the
    column-windowed gather fast path).

    flow [2, H, W]; x/y/dtf/wt [G, 1, CHUNK]; band_ids [G] int32.
    Returns [(orig?) + len(offsets), H, W]; differentiable w.r.t. flow.

    ``row_window`` (v4): votes accumulate into a ``row_window``-row slice
    centered on each chunk's source band whenever every event's warped
    row lands inside it, with an exact full-height fallback per
    (chunk, direction) otherwise (predicated in-kernel) — ~hp/row_window
    fewer vote FLOPs near convergence, bit-identical results.

    ``chunks_per_step`` (v5): process this many independent chunks per
    grid step so the scheduler can overlap one chunk's VPU one-hot
    builds with another's MXU dots; bit-identical (same per-chunk math,
    same accumulation order).

    ``stack_uv`` (v6): the gather table ships pre-interleaved hi/lo-bf16
    (u/v bands adjacent, _stack_uv_hilo) so the gather is ONE M=256 dot
    and the backward scatter ONE M=128 dot instead of four/two M=64 dots;
    bit-identical to ``use_bf16=True`` (same summands, f32 accumulation).

    ``row_scale`` (v7): the units of a band id's row part.  64 for the
    aligned packers; 8 for fill-balanced flex packing
    (pack_events_by_tile_flex), whose 8-aligned variable-height row bands
    pack chunks near-full — grid steps cost the same whether a chunk is
    full or padding, so fewer, fuller chunks is a direct win.

    ``tent`` (v8, bf16 kernel only): forward vote corner blocks are
    built by bf16 tent arithmetic (relu(1-|i-z|), no boolean selects —
    see _corner_block_tent) instead of f32 selects + bf16 convert.
    NOT bit-identical to tent=False: the bf16 rounding enters on d
    rather than on the final weight (same ~2^-9 magnitude).  With
    tent=True the backward pass is unchanged (select-based, f32
    floors); tent="all" additionally tent-builds the backward's
    dot-consumed column blocks (deriv blocks bit-identical, corner
    blocks within the same bf16 rounding — see _bwd_one_chunk).
    """
    return _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, col_window, chunks_per_step, stack_uv, row_scale, tent, pregather)


def _vjp_fwd(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, col_window, chunks_per_step, stack_uv, row_scale, tent, pregather):
    out = _fwd_impl(flow, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, col_window, chunks_per_step, stack_uv, row_scale, tent, pregather)
    return out, (flow, x, y, dtf, wt, band_ids)


def _vjp_bwd(image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, col_window, chunks_per_step, stack_uv, row_scale, tent, pregather, res, g):
    flow, x, y, dtf, wt, band_ids = res
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    k = chunks_per_step
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    k_total = g.shape[0]
    g_p = jnp.zeros((k_total, hp, wp), g.dtype).at[:, :h, :w].set(g)
    xs, ys, ds, ws, rows, steps = _group_chunks(x, y, dtf, wt, band_ids, k)
    if stack_uv:
        flow_in = _stack_uv_hilo(flow_p)
        flow_spec = pl.BlockSpec((4 * hp_flow, wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((2 * hp_flow, wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2 * hp_flow, wp), flow.dtype)
    else:
        flow_in = flow_p
        flow_spec = pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, hp_flow, wp), flow.dtype)

    extra_in = []
    extra_specs = []
    if pregather:
        a_tab, b_tab = _gather_tables(x, y, band_ids, col_bands, row_scale, wp,
                                      flow.dtype)
        extra_in = [a_tab, b_tab]
        extra_specs = [
            pl.BlockSpec((None, BAND, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b_tab.shape[1], x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
    dflow_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, col_bands=col_bands,
            row_window=row_window, col_window=col_window, chunks_per_step=k,
            stack_uv=stack_uv, row_scale=row_scale, tent=tent, pregather=pregather,
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((None, k, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((None, k, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 4,
            flow_spec,
            pl.BlockSpec((k_total, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(rows, xs, ys, ds, ws, flow_in, g_p, *extra_in)
    if stack_uv:
        # de-interleave [2*hp_flow, wp] (u band rows; v band rows) -> [2, hp_flow, wp]
        nb = hp_flow // BAND
        dflow_p = (
            dflow_p.reshape(nb, 2, BAND, wp).transpose(1, 0, 2, 3).reshape(2, hp_flow, wp)
        )
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
    n = len(events)
    g_max_flat = (n + _CHUNK - 1) // _CHUNK + n_bin * bands_per_bin
    res = _pack_native(events, weights, dtf, bands_per_bin, 1, n_bin,
                       g_max_flat, _CHUNK)
    if res is None:
        band_of = np.clip(events[:, 0].astype(np.int64) // BAND, 0, bands_per_bin - 1)
        bin_of = np.clip(np.floor(dtf * n_bin).astype(np.int64), 0, n_bin - 1)
        res = _pack_grouped(
            events[:, 0], events[:, 1], dtf, weights,
            bin_of * bands_per_bin + band_of,  # ascending (bin, band)
            weights > 0, n_bin * bands_per_bin, g_max_flat, _CHUNK,
        )
    xf, yf, df, wf, cg, used = res
    # redistribute the flat (bin-major) chunk list into per-bin rows
    counts = np.bincount(cg[:used] // bands_per_bin, minlength=n_bin)
    g_needed = max(1, int(counts.max()) if used else 1)
    g_max = -(-g_needed // g_bucket) * g_bucket

    x_out = np.full((n_bin, g_max, _CHUNK), -10.0, dtype=np.float64)
    y_out = np.full((n_bin, g_max, _CHUNK), -10.0, dtype=np.float64)
    d_out = np.zeros((n_bin, g_max, _CHUNK), dtype=np.float64)
    w_out = np.zeros((n_bin, g_max, _CHUNK), dtype=np.float64)
    band_ids = np.zeros((n_bin, g_max), dtype=np.int32)
    start = 0
    for t in range(n_bin):
        k = int(counts[t])
        x_out[t, :k] = xf[start : start + k]
        y_out[t, :k] = yf[start : start + k]
        d_out[t, :k] = df[start : start + k]
        w_out[t, :k] = wf[start : start + k]
        band_ids[t, :k] = cg[start : start + k] % bands_per_bin
        start += k
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


def _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, row_window=None, tent=False):
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
            chunk_axis=1, init_axes=(0, 1), row_window=row_window, tent=tent,
        ),
        grid=(t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k_total, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(_band_rows_2d(band_ids), x, y, dtf, wt, voxel_p)
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_multi_iwe_banded_voxel(voxel, x, y, dtf, wt, band_ids, image_size, offsets,
                                 include_orig=True, eps=1e-6, use_bf16=True,
                                 row_window=None, tent=False):
    """Time-aware banded fused rasterizer over (bin, band)-packed chunks
    (pack_events_by_band_bin).

    voxel [T, 2, H, W]; x/y/dtf/wt [T, G, 1, CHUNK]; band_ids [T, G].
    Returns [(orig?) + len(offsets), H, W]; differentiable w.r.t. voxel
    (the custom-vjp backward emits per-bin slice gradients, and autodiff
    carries them back through the Burgers/upwind lax.scan chain).
    ``tent`` as in fused_multi_iwe_banded (v8)."""
    return _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, row_window, tent)


def _vox_vjp_fwd(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, row_window, tent):
    out = _vox_fwd_impl(voxel, x, y, dtf, wt, band_ids, image_size, offsets, include_orig, eps, use_bf16, row_window, tent)
    return out, (voxel, x, y, dtf, wt, band_ids)


def _vox_vjp_bwd(image_size, offsets, include_orig, eps, use_bf16, row_window, tent, res, g):
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
            row_window=row_window, tent=tent,
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


def _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, row_window=None, tent=False):
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
            chunk_axis=2, init_axes=(1, 2), row_window=row_window, tent=tent,
        ),
        grid=(bsz, t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_total, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, voxel_p)
    return out[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_multi_iwe_banded_voxel_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets,
                                         include_orig=True, eps=1e-6, use_bf16=True,
                                         row_window=None, tent=False):
    """Fleet time-aware variant: voxel [B,T,2,H,W]; x/y/dtf/wt
    [B,T,G,1,CHUNK]; band_rows [B,T,G,1,128] int32.  One launch for all B
    frames x T bins; differentiable w.r.t. voxel.  ``tent`` as in
    fused_multi_iwe_banded (v8)."""
    return _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, row_window, tent)


def _vox_vjp_fwd_b(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, row_window, tent):
    out = _vox_fwd_impl_batched(voxel, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, row_window, tent)
    return out, (voxel, x, y, dtf, wt, band_rows)


def _vox_vjp_bwd_b(image_size, offsets, include_orig, eps, use_bf16, row_window, tent, res, g):
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
            row_window=row_window, tent=tent,
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


def _specs_batched(hp, hp_flow, wp, k_total, chunk=_CHUNK):
    band = pl.BlockSpec((None, None, 1, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((None, None, 1, chunk), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    flow = pl.BlockSpec((None, 2, hp_flow, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    return band, row, flow, out


def _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, col_bands=None, row_window=None, row_scale=BAND, tent=False):
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = len(offsets) + (1 if include_orig else 0)
    band, row, flow_spec, out_spec = _specs_batched(hp, hp_flow, wp, k_total, x.shape[-1])
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
            col_bands=col_bands, row_window=row_window, row_scale=row_scale,
            tent=tent,
        ),
        grid=(bsz, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_total, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, flow_p)
    return out[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_multi_iwe_banded_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets,
                                   include_orig=True, eps=1e-6, use_bf16=True, col_bands=None,
                                   row_window=None, row_scale=BAND, tent=False):
    """Fleet variant: flow [B,2,H,W]; x/y/dtf/wt [B,G,1,CHUNK];
    band_rows [B,G,1,128] int32 (see _band_rows).  One kernel launch for
    all B frames; differentiable w.r.t. flow.  With ``col_bands`` the
    chunks must be tile-packed (pack_events_by_tile / pack_fleet_banded
    with ``image_width``): gathers use 128-column windows.  With
    ``row_scale=FLEX_ROW_SCALE`` the chunks come from the fill-balanced
    flex packer (pack_events_by_tile_flex).  ``tent`` as in
    fused_multi_iwe_banded (v8)."""
    return _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, row_scale, tent)


def _vjp_fwd_b(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, row_scale, tent):
    out = _fwd_impl_batched(flow, x, y, dtf, wt, band_rows, image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, row_scale, tent)
    return out, (flow, x, y, dtf, wt, band_rows)


def _vjp_bwd_b(image_size, offsets, include_orig, eps, use_bf16, col_bands, row_window, row_scale, tent, res, g):
    flow, x, y, dtf, wt, band_rows = res
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = g.shape[1]
    g_p = jnp.zeros((bsz, k_total, hp, wp), g.dtype).at[:, :, :h, :w].set(g)
    band, row, flow_spec, _ = _specs_batched(hp, hp_flow, wp, k_total, x.shape[-1])
    g_spec = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dflow_spec = pl.BlockSpec((None, 2, hp_flow, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dflow_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
            col_bands=col_bands, row_window=row_window, row_scale=row_scale,
            tent=tent,
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


# --------------------------------------------------------------------------
# v10: analytic second-order support (JVP + HVP-backward kernels).
#
# The bilinear vote is piecewise-BILINEAR in the gathered flow (u, v):
# within a linear region (fixed floors) its Hessian w.r.t. (u_e, v_e) has
# ONLY the mixed term d2F/du dv = dt^2 * (rd ⊗ cd), so both the
# directional derivative of the forward (JVP) and the directional
# derivative of the implemented backward (the exact Hessian-vector
# product a.e.) are small extensions of the existing kernels:
#
#   dimage_k = (rd ∘ dxw) @ c^T + r @ (cd ∘ dyw)^T                (JVP)
#   du_hvp_e = -dt Σ_p rd·(g2@c)  +  dt² (Σ_p rd·(g1@cd)) · dv_g  (HVP)
#   dv_hvp_e = -dt Σ_p r·(g2@cd)  +  dt² (Σ_p rd·(g1@cd)) · du_g
#
# where (du_g, dv_g) is the tangent flow gathered at the event's source
# pixel, g1 is the cost cotangent ∂C/∂images at the point, and g2 its
# directional derivative d(∂C/∂images) along the tangent (the cost and
# the motion→flow interpolation are XLA code, so
# solver.objective.build_objective_banded_hvp differentiates them with
# plain jax.jvp and assembles the full Hessian-vector product around
# these two kernels).  Replaces the central-FD HVP's 2 full gradient
# evaluations per CG iteration with ~1.3 evaluation-equivalents, with no
# finite-difference step-size error.  These kernels are explicit calls
# in the HVP assembly — they are never themselves differentiated.
# Supported on the adopted dense policy surface (flex/tile packing, row
# and column windows, bf16 or f32 dots); chunks_per_step/stack_uv/tent/
# pregather are intentionally out of scope (all DONE-NEGATIVE or
# non-default).


def _jvp_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, dflow_ref,
                out_ref, *, hp, wp, eps, offsets, use_bf16, col_bands=None,
                row_window=None, col_window=None, row_scale=BAND, chunk_axis=0,
                init_axes=None, emit_value=True):
    assert col_window is None or (row_window is not None and col_bands is not None)
    i = pl.program_id(chunk_axis)
    init = i == 0
    # voxel grids share one image accumulator across the bin axis too
    for ax in init_axes or ():
        if ax != chunk_axis:
            init = init & (pl.program_id(ax) == 0)

    @pl.when(init)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[0:1, :]
    y = y_ref[0:1, :]
    dtf = dtf_ref[0:1, :]
    wt = w_ref[0:1, :]
    dtype = x.dtype
    band_id = band_ref[0, 0]
    if col_bands is None:
        band_row0 = band_id * row_scale
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * row_scale
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0

    u, v, a_band, b_loc = _banded_gather_uv(
        flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0
    )
    du_g, dv_g, _, _ = _banded_gather_uv(
        dflow_ref, band_row0, x_base, x, y, wp, use_bf16, col0,
        pre=(a_band, b_loc),
    )

    w0 = None if row_window is None else _window_start(x_base, hp, row_window)
    c0w = None if col_window is None else _col_window_start(col0, wp, col_window)
    n_k = len(offsets)
    warped = []
    for off in offsets:
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        warped.append((dt, _fl_frac(xw, eps), _fl_frac(yw, eps)))

    def emit(win: bool):
        size = row_window if win else hp
        csize = col_window if (win and col_window is not None) else wp
        for k, (dt, (fl_i, frac), (cl_i, cfr)) in enumerate(warped):
            fl_loc = fl_i - w0 if win else fl_i
            cl_loc = cl_i - c0w if csize != wp else cl_i
            r = _corner_block(fl_loc, frac, wt, size)
            c = _corner_block(cl_loc, cfr, None, csize)
            rd = _corner_deriv_block(fl_loc, wt, size, dtype)
            cd = _corner_deriv_block(cl_loc, None, csize, dtype)
            tan = _dot(rd * (-dt * du_g), c, ((1,), (1,)), use_bf16, dtype) + _dot(
                r, cd * (-dt * dv_g), ((1,), (1,)), use_bf16, dtype
            )
            if not emit_value:
                # tangent-only (the staged HVP path: the value images and
                # cost cotangent are hoisted out of the CG loop) — one
                # MXU dot fewer per direction and half the out VMEM
                if win:
                    rows = _ds_aligned(w0, row_window)
                    if col_window is None:
                        out_ref[k, rows, :] += tan
                    else:
                        out_ref[k, rows, _ds_lane_aligned(c0w, col_window)] += tan
                else:
                    out_ref[k] += tan
                continue
            img = _dot(r, c, ((1,), (1,)), use_bf16, dtype)
            if win:
                if col_window is None:
                    out_ref[k, _ds_aligned(w0, row_window), :] += img
                    out_ref[n_k + k, _ds_aligned(w0, row_window), :] += tan
                else:
                    rows = _ds_aligned(w0, row_window)
                    cols = _ds_lane_aligned(c0w, col_window)
                    out_ref[k, rows, cols] += img
                    out_ref[n_k + k, rows, cols] += tan
            else:
                out_ref[k] += img
                out_ref[n_k + k] += tan

    if row_window is None:
        emit(False)
    else:
        # shared routing predicate — identical to _fwd_kernel so the
        # value votes stay bit-identical to the forward kernel's
        ok = None
        for _dt, (fl_i, _), (cl_i, _) in warped:
            inert = (wt <= 0) | (fl_i <= -2) | (fl_i >= hp)
            in_win = (fl_i >= w0) & (fl_i <= w0 + row_window - 2)
            if col_window is not None:
                inert = inert | (cl_i <= -2) | (cl_i >= wp)
                in_win = in_win & (cl_i >= c0w) & (cl_i <= c0w + col_window - 2)
            this = inert | in_win
            ok = this if ok is None else (ok & this)
        all_ok = jnp.all(ok)

        @pl.when(all_ok)
        def _():
            emit(True)

        @pl.when(~all_ok)
        def _():
            emit(False)


def fused_multi_iwe_banded_jvp(flow, dflow, x, y, dtf, wt, band_ids, image_size,
                               offsets, eps=1e-6, use_bf16=True, col_bands=None,
                               row_window=None, col_window=None, row_scale=BAND,
                               emit_value=True):
    """Forward votes AND their directional derivative along ``dflow`` in
    one fused pass: returns (images [K, H, W], dimages [K, H, W]) for the
    direction ``offsets`` (no orig slice — the orig IWE is
    motion-independent, so its tangent is zero and callers hoist it).
    The images half is bit-identical to ``fused_multi_iwe_banded`` with
    the same flags (same gathers, same floor/frac decisions, same
    accumulation order).  ``emit_value=False`` returns the tangent images
    ONLY (the staged-HVP fast path: the value images are loop-invariant
    across a CG solve and hoisted by the caller) — one MXU dot fewer per
    direction."""
    assert offsets, "jvp kernel computes direction images (no orig slice)"
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    dflow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(dflow)
    n_k = len(offsets)
    k_out = (2 if emit_value else 1) * n_k
    xs, ys, ds, ws, rows, steps = _group_chunks(x, y, dtf, wt, band_ids, 1)
    flow_spec = pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _jvp_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, col_bands=col_bands, row_window=row_window,
            col_window=col_window, row_scale=row_scale, emit_value=emit_value,
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((None, 1, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 4,
            flow_spec,
            flow_spec,
        ],
        out_specs=pl.BlockSpec((k_out, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_out, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(rows, xs, ys, ds, ws, flow_p, dflow_p)
    if not emit_value:
        return out[:, :h, :w]
    return out[:n_k, :h, :w], out[n_k:, :h, :w]


def _hvp_bwd_kernel(band_ref, x_ref, y_ref, dtf_ref, w_ref, flow_ref, dflow_ref,
                    g_ref, dflow_out_ref, *, hp, wp, eps, offsets, use_bf16,
                    col_bands=None, row_window=None, col_window=None,
                    row_scale=BAND, term_a=True, chunk_axis=0):
    assert col_window is None or (row_window is not None and col_bands is not None)
    i = pl.program_id(chunk_axis)

    @pl.when(i == 0)
    def _():
        dflow_out_ref[:] = jnp.zeros_like(dflow_out_ref)

    x = x_ref[0:1, :]
    y = y_ref[0:1, :]
    dtf = dtf_ref[0:1, :]
    wt = w_ref[0:1, :]
    dtype = x.dtype
    band_id = band_ref[0, 0]
    if col_bands is None:
        band_row0 = band_id * row_scale
        col0 = None
    else:
        band_row0 = (band_id // col_bands) * row_scale
        col0 = (band_id % col_bands) * COLBAND
    x_base = band_row0

    u, v, a_band, b_loc = _banded_gather_uv(
        flow_ref, band_row0, x_base, x, y, wp, use_bf16, col0
    )
    if term_a:
        du_g, dv_g, _, _ = _banded_gather_uv(
            dflow_ref, band_row0, x_base, x, y, wp, use_bf16, col0,
            pre=(a_band, b_loc),
        )

    w0 = None if row_window is None else _window_start(x_base, hp, row_window)
    c0w = None if col_window is None else _col_window_start(col0, wp, col_window)
    n_k = len(offsets)
    warped = []
    for off in offsets:
        dt = dtf - off
        xw = x - dt * u
        yw = y - dt * v
        warped.append((dt, _fl_frac(xw, eps), _fl_frac(yw, eps)))

    def accumulate(win: bool):
        du = jnp.zeros_like(x)
        dv = jnp.zeros_like(x)
        size = row_window if win else hp
        csize = col_window if (win and col_window is not None) else wp
        for k, (dt, (fl_i, frac), (cl_i, cfr)) in enumerate(warped):
            cl_loc = cl_i - c0w if csize != wp else cl_i
            c = _corner_block(cl_loc, cfr, None, csize)
            cd = _corner_deriv_block(cl_loc, None, csize, dtype)
            fl_loc = fl_i - w0 if win else fl_i
            r = _corner_block(fl_loc, frac, wt, size)
            rd = _corner_deriv_block(fl_loc, wt, size, dtype)
            if win:
                rows = _ds_aligned(w0, row_window)
                if col_window is None:
                    g1k = g_ref[k, rows, :]
                    g2k = g_ref[n_k + k, rows, :]
                else:
                    cols = _ds_lane_aligned(c0w, col_window)
                    g1k = g_ref[k, rows, cols]
                    g2k = g_ref[n_k + k, rows, cols]
            else:
                g1k = g_ref[k]
                g2k = g_ref[n_k + k]
            p2 = _dot(g2k, c, ((1,), (0,)), use_bf16, dtype)
            pd2 = _dot(g2k, cd, ((1,), (0,)), use_bf16, dtype)
            du += -dt * jnp.sum(rd * p2, axis=0, keepdims=True)
            dv += -dt * jnp.sum(r * pd2, axis=0, keepdims=True)
            if term_a:
                pd1 = _dot(g1k, cd, ((1,), (0,)), use_bf16, dtype)
                s = jnp.sum(rd * pd1, axis=0, keepdims=True)
                du += dt * dt * s * dv_g
                dv += dt * dt * s * du_g
        return du, dv

    if row_window is None:
        du, dv = accumulate(False)
    else:
        ok = None
        for _dt, (fl_i, _), (cl_i, _) in warped:
            inert = (wt <= 0) | (fl_i <= -2) | (fl_i >= hp)
            in_win = (fl_i >= w0) & (fl_i <= w0 + row_window - 2)
            if col_window is not None:
                inert = inert | (cl_i <= -2) | (cl_i >= wp)
                in_win = in_win & (cl_i >= c0w) & (cl_i <= c0w + col_window - 2)
            this = inert | in_win
            ok = this if ok is None else (ok & this)
        du, dv = jax.lax.cond(
            jnp.all(ok), lambda: accumulate(True), lambda: accumulate(False)
        )

    if col_bands is None:
        dflow_out_ref[0, pl.ds(band_row0, BAND), :] += _dot(
            a_band * du, b_loc, ((1,), (1,)), use_bf16, dtype
        )
        dflow_out_ref[1, pl.ds(band_row0, BAND), :] += _dot(
            a_band * dv, b_loc, ((1,), (1,)), use_bf16, dtype
        )
    else:
        dflow_out_ref[0, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)] += _dot(
            a_band * du, b_loc, ((1,), (1,)), use_bf16, dtype
        )
        dflow_out_ref[1, pl.ds(band_row0, BAND), pl.ds(col0, COLBAND)] += _dot(
            a_band * dv, b_loc, ((1,), (1,)), use_bf16, dtype
        )


def fused_multi_iwe_banded_hvp_bwd(flow, dflow, g1, g2, x, y, dtf, wt, band_ids,
                                   image_size, offsets, eps=1e-6, use_bf16=True,
                                   col_bands=None, row_window=None,
                                   col_window=None, row_scale=BAND,
                                   term_a=True):
    """Directional derivative of the implemented backward pass: the exact
    (a.e.) flow-space Hessian-vector product contribution of the vote
    kernel, given the tangent flow ``dflow``, the cost cotangent ``g1``
    (∂C/∂images at the point) and its directional derivative ``g2``
    [each [K, H, W]].  Returns [2, H, W].  See the section comment for
    the term decomposition (B: cotangent-tangent through the cost; A:
    the vote's mixed second derivative).

    ``term_a=False`` drops the vote-Hessian term entirely — the
    Gauss-Newton curvature (cost curvature through the vote Jacobians
    only).  The a.e. vote Hessian MISSES the delta-function curvature
    concentrated at the bilinear floor crossings (the washboard), so the
    full analytic H under-curves far from convergence (measured: 3.4x
    smaller HVP norms than the 0.1-step central-FD smoothing at a
    cold-start point, and cold-start misconvergence on TPU); the GN form
    is the well-behaved default for the analytic mode."""
    assert offsets, "hvp kernel computes direction contributions (no orig)"
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    n_k = len(offsets)
    flow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(flow)
    dflow_p = jnp.zeros((2, hp_flow, wp), flow.dtype).at[:, :h, :w].set(dflow)
    g_p = (
        jnp.zeros((2 * n_k, hp, wp), flow.dtype)
        .at[:n_k, :h, :w].set(g1)
        .at[n_k:, :h, :w].set(g2)
    )
    xs, ys, ds, ws, rows, steps = _group_chunks(x, y, dtf, wt, band_ids, 1)
    flow_spec = pl.BlockSpec((2, hp_flow, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _hvp_bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, col_bands=col_bands, row_window=row_window,
            col_window=col_window, row_scale=row_scale, term_a=term_a,
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec((None, 1, x.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 4,
            flow_spec,
            flow_spec,
            pl.BlockSpec((2 * n_k, hp, wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=flow_spec,
        out_shape=jax.ShapeDtypeStruct((2, hp_flow, wp), flow.dtype),
        interpret=_interpret(),
    )(rows, xs, ys, ds, ws, flow_p, dflow_p, g_p)
    return out[:, :h, :w]


def fused_multi_iwe_banded_jvp_batched(flow, dflow, x, y, dtf, wt, band_rows,
                                       image_size, offsets, eps=1e-6,
                                       use_bf16=True, col_bands=None,
                                       row_window=None, col_window=None,
                                       row_scale=BAND, emit_value=True):
    """Fleet variant of ``fused_multi_iwe_banded_jvp``: flow/dflow
    [B,2,H,W], packed chunks [B,G,1,CHUNK] (pack_fleet_banded), grid
    (B, G).  Returns (images [B,K,H,W], dimages [B,K,H,W]); the images
    half is bit-identical to ``fused_multi_iwe_banded_batched`` with the
    same flags.  ``emit_value=False``: tangent images only (staged HVP)."""
    assert offsets, "jvp kernel computes direction images (no orig slice)"
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    n_k = len(offsets)
    k_out = (2 if emit_value else 1) * n_k
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    dflow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(dflow)
    band, row, flow_spec, _ = _specs_batched(hp, hp_flow, wp, k_out, x.shape[-1])
    out_spec = pl.BlockSpec((None, k_out, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _jvp_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, col_bands=col_bands, row_window=row_window,
            col_window=col_window, row_scale=row_scale, chunk_axis=1,
            emit_value=emit_value,
        ),
        grid=(bsz, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_out, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, flow_p, dflow_p)
    if not emit_value:
        return out[:, :, :h, :w]
    return out[:, :n_k, :h, :w], out[:, n_k:, :h, :w]


def fused_multi_iwe_banded_hvp_bwd_batched(flow, dflow, g1, g2, x, y, dtf, wt,
                                           band_rows, image_size, offsets,
                                           eps=1e-6, use_bf16=True,
                                           col_bands=None, row_window=None,
                                           col_window=None, row_scale=BAND,
                                           term_a=True):
    """Fleet variant of ``fused_multi_iwe_banded_hvp_bwd``: per-frame
    tangents/cotangents [B,...]; grid (B, G).  Returns [B,2,H,W]."""
    assert offsets, "hvp kernel computes direction contributions (no orig)"
    bsz = x.shape[0]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _flow_pad_rows(h, row_scale)
    wp = _round_up(w + 1, 128)
    g_chunks = x.shape[1]
    n_k = len(offsets)
    flow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    dflow_p = jnp.zeros((bsz, 2, hp_flow, wp), flow.dtype).at[:, :, :h, :w].set(dflow)
    g_p = (
        jnp.zeros((bsz, 2 * n_k, hp, wp), flow.dtype)
        .at[:, :n_k, :h, :w].set(g1)
        .at[:, n_k:, :h, :w].set(g2)
    )
    band, row, flow_spec, _ = _specs_batched(hp, hp_flow, wp, 2 * n_k, x.shape[-1])
    g_spec = pl.BlockSpec((None, 2 * n_k, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _hvp_bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, col_bands=col_bands, row_window=row_window,
            col_window=col_window, row_scale=row_scale, term_a=term_a,
            chunk_axis=1,
        ),
        grid=(bsz, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec, g_spec],
        out_specs=flow_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 2, hp_flow, wp), flow.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, flow_p, dflow_p, g_p)
    return out[:, :, :h, :w]


# ----- voxel (time-aware) variants of the JVP / HVP-backward kernels -------
# Same kernel bodies as the dense v10 pair: the bin is a grid dimension
# (grid (T, G), as in fused_multi_iwe_banded_voxel), so only one bin
# slice of the voxel AND of its tangent is VMEM-resident per step.  The
# motion->voxel map (tile interpolation + Burgers/upwind propagation) is
# NONLINEAR in the motion, so the solver-level assembly around these
# kernels is Gauss-Newton ONLY (solver.objective gates analytic-full off
# for time-aware specs — the flow-map curvature term is never built).


def fused_multi_iwe_banded_voxel_jvp(voxel, dvoxel, x, y, dtf, wt, band_ids,
                                     image_size, offsets, eps=1e-6,
                                     use_bf16=True, row_window=None,
                                     emit_value=True):
    """Time-aware variant of ``fused_multi_iwe_banded_jvp``: voxel /
    dvoxel [T,2,H,W], (bin, band)-packed chunks [T,G,1,CHUNK]
    (pack_events_by_band_bin), grid (T, G).  Returns (images, dimages)
    [K,H,W] for the direction ``offsets`` (tangents only with
    ``emit_value=False`` — the staged-HVP fast path); the images half is
    bit-identical to ``fused_multi_iwe_banded_voxel`` with the same
    flags."""
    assert offsets, "jvp kernel computes direction images (no orig slice)"
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    t_bins, g_chunks = x.shape[0], x.shape[1]
    n_k = len(offsets)
    k_out = (2 if emit_value else 1) * n_k
    voxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(voxel)
    dvoxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(dvoxel)
    band, row, flow_spec, out_spec = _vox_specs(hp, hp_flow, wp, k_out)
    out = pl.pallas_call(
        functools.partial(
            _jvp_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, row_window=row_window, chunk_axis=1,
            init_axes=(0, 1), emit_value=emit_value,
        ),
        grid=(t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((k_out, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(_band_rows_2d(band_ids), x, y, dtf, wt, voxel_p, dvoxel_p)
    if not emit_value:
        return out[:, :h, :w]
    return out[:n_k, :h, :w], out[n_k:, :h, :w]


def fused_multi_iwe_banded_voxel_hvp_bwd(voxel, dvoxel, g1, g2, x, y, dtf, wt,
                                         band_ids, image_size, offsets,
                                         eps=1e-6, use_bf16=True,
                                         row_window=None, term_a=True):
    """Time-aware variant of ``fused_multi_iwe_banded_hvp_bwd``: the
    directional derivative of the implemented voxel backward, emitted as
    PER-BIN flow-space contributions [T,2,H,W] (the caller's jax.vjp of
    the motion->voxel map carries them back through the Burgers/upwind
    chain).  ``term_a=False`` = the Gauss-Newton form (see the dense
    kernel's doc) — the only form the solver assembles for time-aware
    objectives (the motion->voxel map is nonlinear)."""
    assert offsets, "hvp kernel computes direction contributions (no orig)"
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    t_bins, g_chunks = x.shape[0], x.shape[1]
    n_k = len(offsets)
    voxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(voxel)
    dvoxel_p = jnp.zeros((t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :h, :w].set(dvoxel)
    g_p = (
        jnp.zeros((2 * n_k, hp, wp), voxel.dtype)
        .at[:n_k, :h, :w].set(g1)
        .at[n_k:, :h, :w].set(g2)
    )
    band, row, flow_spec, _ = _vox_specs(hp, hp_flow, wp, 2 * n_k)
    g_spec = pl.BlockSpec((2 * n_k, hp, wp), lambda t, i: (0, 0, 0), memory_space=pltpu.VMEM)
    dvox_spec = pl.BlockSpec((None, 2, hp_flow, wp), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _hvp_bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, row_window=row_window, term_a=term_a,
            chunk_axis=1,
        ),
        grid=(t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec, g_spec],
        out_specs=dvox_spec,
        out_shape=jax.ShapeDtypeStruct((t_bins, 2, hp_flow, wp), voxel.dtype),
        interpret=_interpret(),
    )(_band_rows_2d(band_ids), x, y, dtf, wt, voxel_p, dvoxel_p, g_p)
    return out[:, :, :h, :w]


def fused_multi_iwe_banded_voxel_jvp_batched(voxel, dvoxel, x, y, dtf, wt,
                                             band_rows, image_size, offsets,
                                             eps=1e-6, use_bf16=True,
                                             row_window=None, emit_value=True):
    """Fleet time-aware variant of ``fused_multi_iwe_banded_voxel_jvp``:
    voxel / dvoxel [B,T,2,H,W], (frame, bin, band)-packed chunks
    [B,T,G,1,CHUNK] (pack_fleet_banded with a time_bin), band_rows
    [B,T,G,1,128]; grid (B, T, G) with each frame's image accumulator
    shared across its bin axis.  Returns (images [B,K,H,W], dimages
    [B,K,H,W]); the images half is bit-identical to
    ``fused_multi_iwe_banded_voxel_batched`` with the same flags.
    ``emit_value=False``: tangent images only (the staged-HVP fast
    path)."""
    assert offsets, "jvp kernel computes direction images (no orig slice)"
    bsz, t_bins, g_chunks = x.shape[0], x.shape[1], x.shape[2]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    n_k = len(offsets)
    k_out = (2 if emit_value else 1) * n_k
    voxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(voxel)
    dvoxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(dvoxel)
    band, row, flow_spec, out_spec = _vox_specs_batched(hp, hp_flow, wp, k_out)
    out = pl.pallas_call(
        functools.partial(
            _jvp_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, row_window=row_window, chunk_axis=2,
            init_axes=(1, 2), emit_value=emit_value,
        ),
        grid=(bsz, t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_out, hp, wp), voxel.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, voxel_p, dvoxel_p)
    if not emit_value:
        return out[:, :, :h, :w]
    return out[:, :n_k, :h, :w], out[:, n_k:, :h, :w]


def fused_multi_iwe_banded_voxel_hvp_bwd_batched(voxel, dvoxel, g1, g2, x, y,
                                                 dtf, wt, band_rows,
                                                 image_size, offsets, eps=1e-6,
                                                 use_bf16=True,
                                                 row_window=None, term_a=True):
    """Fleet time-aware variant of ``fused_multi_iwe_banded_voxel_hvp_bwd``:
    per-frame tangents [B,T,2,H,W] and cotangents g1/g2 [B,K,H,W]; grid
    (B, T, G).  Returns PER-BIN flow-space contributions [B,T,2,H,W]
    (the caller's per-frame jax.vjp of the motion->voxel map carries
    them back through the Burgers/upwind chain).  ``term_a=False`` = the
    Gauss-Newton form, the only form the fleet solver assembles for
    time-aware objectives (the motion->voxel map is nonlinear)."""
    assert offsets, "hvp kernel computes direction contributions (no orig)"
    bsz, t_bins, g_chunks = x.shape[0], x.shape[1], x.shape[2]
    h, w = image_size
    hp = _round_up(max(h + 1, BAND), 8)
    hp_flow = _round_up(h, BAND)
    wp = _round_up(w + 1, 128)
    n_k = len(offsets)
    voxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(voxel)
    dvoxel_p = jnp.zeros((bsz, t_bins, 2, hp_flow, wp), voxel.dtype).at[:, :, :, :h, :w].set(dvoxel)
    g_p = (
        jnp.zeros((bsz, 2 * n_k, hp, wp), voxel.dtype)
        .at[:, :n_k, :h, :w].set(g1)
        .at[:, n_k:, :h, :w].set(g2)
    )
    band, row, flow_spec, _ = _vox_specs_batched(hp, hp_flow, wp, 2 * n_k)
    g_spec = pl.BlockSpec((None, 2 * n_k, hp, wp), lambda b, t, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dvox_spec = pl.BlockSpec((None, None, 2, hp_flow, wp), lambda b, t, i: (b, t, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _hvp_bwd_kernel, hp=hp, wp=wp, eps=eps, offsets=offsets,
            use_bf16=use_bf16, row_window=row_window, term_a=term_a,
            chunk_axis=2,
        ),
        grid=(bsz, t_bins, g_chunks),
        in_specs=[band, row, row, row, row, flow_spec, flow_spec, g_spec],
        out_specs=dvox_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, t_bins, 2, hp_flow, wp), voxel.dtype),
        interpret=_interpret(),
    )(band_rows, x, y, dtf, wt, voxel_p, dvoxel_p, g_p)
    return out[:, :, :, :h, :w]
