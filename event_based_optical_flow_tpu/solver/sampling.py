"""Device-side sampling searches replacing the reference's Optuna loops.

The reference initializes each tile of the finer pyramid scales with a
*sequential, per-patch* Optuna TPE study of ~13-40 trials on the CPU
(ref patch_contrast_pyramid.py:320-361), and supports optuna/grid/random
studies as whole-solver optimizers (ref solver/base.py:738-787).  On TPU
the natural replacement is a batched candidate sweep: all patches x all
candidates are evaluated in one vmapped, jit-compiled call, with a second
refinement round around the per-patch argmin standing in for TPE's
exploitation phase.

Per-patch candidate cost mirrors the reference 'small patch' objective
(ref patch_contrast_pyramid.py:363-415): middle-direction 2-DoF warp of
the patch-cropped events, bilinear-vote IWE at patch resolution with
blur, NormalizedGradientMagnitude (minimize), nan -> 0.
"""

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..costs import functional as F
from ..ops.iwe import EventImageConverter
from ..ops.warp import calculate_reftime, warp_2dof

from ..costs.functional import nan_to_penalty

logger = logging.getLogger(__name__)

Array = jax.Array


def gather_patch_events(
    events: np.ndarray, patches: dict, capacity: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: crop events per tile, origin-shift, pad to ``capacity``.

    Patches with more than ``capacity`` events are evenly subsampled —
    acceptable for the statistical init search (the full-objective
    refinement still sees every event).

    Non-overlapping lattice grids (every pyramid scale) take a fully
    vectorized path: per-event patch ids + one stable argsort, instead of
    P boolean scans of the whole event buffer.  Overlapping/irregular
    patch dicts fall back to the per-patch loop with identical results.

    Returns (patch_events [P, C, 4], weights [P, C], counts [P]).
    """
    n_patch = len(patches)
    fast = _gather_lattice_fast(events, patches, capacity)
    if fast is not None:
        return fast
    out = np.zeros((n_patch, capacity, 4), dtype=np.float64)
    wgt = np.zeros((n_patch, capacity), dtype=np.float64)
    counts = np.zeros(n_patch, dtype=np.int64)
    x = events[:, 0]
    y = events[:, 1]
    for i in range(n_patch):
        p = patches[i]
        mask = (p.x_min <= x) & (x < p.x_max) & (p.y_min <= y) & (y < p.y_max)
        sel = events[mask]
        counts[i] = len(sel)
        if len(sel) > capacity:
            idx = np.linspace(0, len(sel) - 1, capacity).astype(np.int64)
            sel = sel[idx]
        k = len(sel)
        if k:
            out[i, :k] = sel - np.array([p.x_min, p.y_min, 0.0, 0.0])
            out[i, k:, 2] = sel[:, 2].min()
            wgt[i, :k] = 1.0
    return out, wgt, counts


def _gather_lattice_fast(events: np.ndarray, patches: dict, capacity: int):
    """Vectorized gather for a non-overlapping row-major patch lattice
    (prepare_patch's layout — note the reference's FlowPatch rounding can
    make edge tiles narrower, so the bins come from the actual per-patch
    [min, max) bounds, not from the nominal patch size); returns None
    when the patch dict isn't such a lattice."""
    n_patch = len(patches)
    if n_patch == 0:
        return None
    x_mins = np.array([patches[i].x_min for i in range(n_patch)])
    y_mins = np.array([patches[i].y_min for i in range(n_patch)])
    x_maxs = np.array([patches[i].x_max for i in range(n_patch)])
    y_maxs = np.array([patches[i].y_max for i in range(n_patch)])
    xm = np.unique(x_mins)
    ym = np.unique(y_mins)
    nx, ny = len(xm), len(ym)
    if nx * ny != n_patch:
        return None
    # row-major layout with per-row/col consistent bounds
    if not (
        np.array_equal(x_mins, np.repeat(xm, ny))
        and np.array_equal(y_mins, np.tile(ym, nx))
    ):
        return None
    xx = x_maxs[::ny]  # one x_max per row
    yx = y_maxs[:ny]  # one y_max per column
    if not (
        np.array_equal(x_maxs, np.repeat(xx, ny))
        and np.array_equal(y_maxs, np.tile(yx, nx))
    ):
        return None
    # non-overlapping (an event belongs to at most one tile)
    if np.any(xx[:-1] > xm[1:]) or np.any(yx[:-1] > ym[1:]):
        return None
    row = np.searchsorted(xm, events[:, 0], side="right") - 1
    col = np.searchsorted(ym, events[:, 1], side="right") - 1
    ok = (row >= 0) & (col >= 0)
    row_c = np.clip(row, 0, nx - 1)
    col_c = np.clip(col, 0, ny - 1)
    ok &= (events[:, 0] < xx[row_c]) & (events[:, 1] < yx[col_c])
    pid = (row_c * ny + col_c)[ok]
    sel = events[ok].astype(np.float64, copy=True)
    sel[:, 0] -= x_mins[pid]
    sel[:, 1] -= y_mins[pid]
    order = np.argsort(pid, kind="stable")
    pid_s = pid[order]
    sel_s = sel[order]
    counts = np.bincount(pid_s, minlength=n_patch).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = np.zeros((n_patch, capacity, 4), dtype=np.float64)
    wgt = np.zeros((n_patch, capacity), dtype=np.float64)
    rank = np.arange(len(pid_s)) - starts[pid_s]
    fits = counts[pid_s] <= capacity
    out[pid_s[fits], rank[fits]] = sel_s[fits]
    wgt_k = np.minimum(counts, capacity)
    col = np.arange(capacity)
    wgt[col[None, :] < wgt_k[:, None]] = 1.0
    # pad rows carry the patch's min timestamp (keeps t_scale intact)
    nz = counts > 0
    t_min_acc = np.full(n_patch, np.inf)
    np.minimum.at(t_min_acc, pid_s, sel_s[:, 2])
    t_min = np.where(nz, t_min_acc, 0.0)
    pad_mask = (col[None, :] >= wgt_k[:, None]) & nz[:, None]
    out[..., 2] = np.where(pad_mask, t_min[:, None], out[..., 2])
    # oversubscribed patches: evenly subsample, exactly like the loop
    for i in np.nonzero(counts > capacity)[0]:
        seg = sel_s[starts[i] : starts[i] + counts[i]]
        idx = np.linspace(0, counts[i] - 1, capacity).astype(np.int64)
        out[i] = seg[idx]
    return out, wgt, counts


def _patch_cost_fn(patch_size: Tuple[int, int], blur_sigma: float, iwe_method: str,
                   outer_padding: int, backend: Optional[str]):
    """Cost of one candidate translation on one patch (lower = better)."""
    imager = EventImageConverter(patch_size, outer_padding=outer_padding)

    def orig_stats(events, weights):
        iwe = imager.create_iwe(events, iwe_method, blur_sigma, weight=weights,
                                blur_mode="torch", backend=backend)
        return F.gradient_magnitude(iwe, omit_boundary=False)

    def cost(candidate, events, weights, t_scale, orig_mag):
        ref = calculate_reftime(events, 0.5, weights)
        warped = warp_2dof(events, candidate * t_scale, ref, normalize_t=True, weights=weights)
        iwe = imager.create_iwe(warped, iwe_method, blur_sigma, weight=weights,
                                blur_mode="torch", backend=backend)
        mag = F.gradient_magnitude(iwe, omit_boundary=False)
        loss = orig_mag / mag  # NormalizedGradientMagnitude, minimize
        return nan_to_penalty(loss)

    return orig_stats, cost


def build_patch_search(
    patch_size: Tuple[int, int],
    n_candidates: int,
    blur_sigma: float = 1.0,
    iwe_method: str = "bilinear_vote",
    outer_padding: int = 0,
    abs_range: float = 10.0,
    rel_range: Tuple[float, float] = (0.8, 1.2),
    min_events: int = 10,
    iwe_backend: Optional[str] = None,
):
    """Build the jitted per-scale init search.

    fn(patch_events [P,C,4], weights [P,C], counts [P], motion0 [P,2], key)
      -> refined motion [P, 2]

    Search range per dim: [min, max] of {0.8*m0, m0-10, 1.2*m0, m0+10}
    (ref patch_contrast_pyramid.py:417-428).  Round 1 samples uniformly,
    round 2 samples a gaussian around the round-1 best (TPE-style
    exploitation); the incumbent m0 always competes.
    """
    orig_stats, cost = _patch_cost_fn(patch_size, blur_sigma, iwe_method, outer_padding, iwe_backend)
    k1 = max(1, n_candidates // 2)
    k2 = max(1, n_candidates - k1)

    def search_one(events, weights, count, motion0, key):
        t = events[:, 2]
        big = jnp.finfo(t.dtype).max
        t_max = jnp.max(jnp.where(weights > 0, t, -big))
        t_min = jnp.min(jnp.where(weights > 0, t, big))
        t_scale = jnp.where(count > 0, t_max - t_min, 1.0)
        t_scale = jnp.where(t_scale > 0, t_scale, 1.0)
        orig_mag = orig_stats(events, weights)

        bounds = jnp.stack(
            [
                jnp.minimum(rel_range[0] * motion0, motion0 - abs_range),
                jnp.maximum(rel_range[1] * motion0, motion0 + abs_range),
            ]
        )  # [2(lo,hi), 2(dim)]
        lo, hi = bounds[0], bounds[1]

        eval_cands = jax.vmap(lambda c: cost(c, events, weights, t_scale, orig_mag))

        key1, key2 = jax.random.split(key)
        cands1 = jax.random.uniform(key1, (k1, 2), dtype=events.dtype) * (hi - lo) + lo
        cands1 = jnp.concatenate([motion0[None], cands1], axis=0)
        losses1 = eval_cands(cands1)
        best1 = cands1[jnp.argmin(losses1)]

        sigma = (hi - lo) / 8.0
        cands2 = best1 + jax.random.normal(key2, (k2, 2), dtype=events.dtype) * sigma
        cands2 = jnp.clip(cands2, lo, hi)
        losses2 = eval_cands(cands2)

        all_cands = jnp.concatenate([cands1, cands2], axis=0)
        all_losses = jnp.concatenate([losses1, losses2], axis=0)
        best = all_cands[jnp.argmin(all_losses)]
        return jnp.where(count > min_events, best, motion0)

    @jax.jit
    def search(patch_events, weights, counts, motion0, key):
        keys = jax.random.split(key, patch_events.shape[0])
        return jax.vmap(search_one)(patch_events, weights, counts, motion0, keys)

    return search


def build_global_search(
    image_shape: Tuple[int, int],
    objective,
    sampling_field: np.ndarray,
):
    """Dense 2-D grid sweep of a global 2-DoF translation, vmapped —
    replaces the reference's python double loop
    (ref patch_contrast_base.py:126-187)."""
    grid = np.stack(np.meshgrid(sampling_field, sampling_field, indexing="ij"), -1).reshape(-1, 2)

    @jax.jit
    def search(events, weights):
        losses = jax.vmap(lambda c: objective(c, events, weights))(jnp.asarray(grid))
        best = jnp.argmin(losses)
        return jnp.asarray(grid)[best], losses[best]

    return search
