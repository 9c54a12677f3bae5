"""Pallas fused IWE (interpret mode on CPU) and multi-device sharding.

The sharded paths must reproduce the single-device kernels exactly:
event-sharded IWE (psum of partial votes) and the fleet loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import ops
from event_based_optical_flow_tpu.ops.pallas_iwe import bilinear_vote_pallas
from event_based_optical_flow_tpu.parallel.sharded import (
    build_fleet_step,
    fleet_shardings,
    make_mesh,
    sharded_iwe,
)
from event_based_optical_flow_tpu.types import pad_events

H, W = 16, 20


def _events(n=300, seed=0):
    rng = np.random.default_rng(seed)
    ev = np.stack(
        [
            rng.uniform(-1, H + 1, n),
            rng.uniform(-1, W + 1, n),
            np.sort(rng.uniform(0, 1, n)),
            rng.integers(0, 2, n).astype(float),
        ],
        1,
    )
    return ev


def test_pallas_forward_matches_scatter():
    ev = _events(700)
    wt = np.random.default_rng(1).uniform(0.2, 1.5, 700)
    ref = np.asarray(ops.bilinear_vote(jnp.asarray(ev), (H, W), weight=jnp.asarray(wt), backend="scatter"))
    out = np.asarray(bilinear_vote_pallas(jnp.asarray(ev), (H, W), weight=jnp.asarray(wt)))
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_pallas_gradient_matches_scatter():
    ev = jnp.asarray(_events(300))
    wt = jnp.asarray(np.random.default_rng(1).uniform(0.2, 1.5, 300))

    def loss(fn):
        return lambda e: (fn(e) ** 2).sum()

    gp = jax.grad(loss(lambda e: bilinear_vote_pallas(e, (H, W), weight=wt)))(ev)
    gs = jax.grad(loss(lambda e: ops.bilinear_vote(e, (H, W), weight=wt, backend="scatter")))(ev)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=1e-8)


def test_banded_kernel_matches_scatter():
    """Banded fused kernel (pack + band-local gathers) vs the composed
    scatter-backend reference on CPU interpret mode."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
    from event_based_optical_flow_tpu.ops.warp import multi_direction_dense_warp

    ev = _events(600, seed=5)
    ev[:, 0] = np.clip(np.round(ev[:, 0]), 0, H - 1)
    ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
    padded, wgt = pad_events(ev, target_n=1024)
    flow = np.random.default_rng(6).uniform(-4, 4, (2, H, W))

    t = padded[:, 2]
    dtf = (t - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    x2, y2, d2, w2, bands = PB.pack_events_by_band(padded, wgt, dtf, H)
    out = np.asarray(
        PB.fused_multi_iwe_banded(
            jnp.asarray(flow), jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (H, W), (0.0, 1.0, 0.5), True, 1e-6, False,
        )
    )
    events_j = jnp.asarray(padded)
    weights_j = jnp.asarray(wgt)
    warped = multi_direction_dense_warp(events_j, jnp.asarray(flow), [0.0, 1.0, 0.5], (H, W), weights=weights_j)
    ref = [bilinear_vote(events_j, (H, W), weight=weights_j, backend="scatter")]
    ref += [bilinear_vote(wv, (H, W), weight=weights_j, backend="scatter") for wv in warped]
    np.testing.assert_allclose(out, np.stack([np.asarray(r) for r in ref]), atol=1e-8)


@pytest.mark.parametrize("flow_mag", [4.0, 200.0, "mixed"])
def test_row_windowed_votes_match_full(flow_mag):
    """v4 row-windowed votes == full-height votes, forward and flow-grad:
    small motions take the windowed fast path, huge motions the exact
    in-kernel fallback, 'mixed' exercises both per (chunk, direction)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 260, 60  # hp=264 > window=128; narrow W keeps CPU time low
    rng = np.random.default_rng(21)
    n = 700
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=1024)
    if flow_mag == "mixed":
        flow = rng.uniform(-4, 4, (2, Ht, Wt))
        flow[:, :128] = rng.uniform(150, 250, (2, 128, Wt))  # top half blows out
    else:
        flow = rng.uniform(-flow_mag, flow_mag, (2, Ht, Wt))
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    x2, y2, d2, w2, bands = PB.pack_events_by_band(padded, wgt, dtf, Ht)

    def run(fl, rw):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (Ht, Wt), (0.0, 0.5), True,
            1e-6, False, None, rw,
        )

    fl = jnp.asarray(flow)
    rw = PB.objective_row_window(Ht)
    assert rw == 96  # policy value (round-2 calibrated probes)
    np.testing.assert_array_equal(
        np.asarray(run(fl, rw)), np.asarray(run(fl, None))
    )
    g_w = jax.grad(lambda f: jnp.sum(run(f, rw) ** 2))(fl)
    g_f = jax.grad(lambda f: jnp.sum(run(f, None) ** 2))(fl)
    np.testing.assert_array_equal(np.asarray(g_w), np.asarray(g_f))

    # orig-only call (offsets empty — the hoisted-orig fast path) must
    # work with the window active too (regression: jnp.all(None) crash)
    def run_orig(fl, rw):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (Ht, Wt), (), True,
            1e-6, False, None, rw,
        )

    np.testing.assert_array_equal(
        np.asarray(run_orig(fl, 128)), np.asarray(run_orig(fl, None))
    )


@pytest.mark.parametrize("flow_mag", [4.0, 300.0])
def test_col_windowed_votes_match_full(flow_mag):
    """Row+column windowed votes (wide-frame tile packing) == full votes,
    forward and flow-grad; huge motions exercise the exact fallback."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 130, 500  # hp=136 > 128 row window; wp=512 > 384 col window
    assert PB.objective_col_window(Ht, Wt) is None  # disabled by default (A/B regression)
    rng = np.random.default_rng(31)
    n = 600
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=1024)
    flow = rng.uniform(-flow_mag, flow_mag, (2, Ht, Wt))
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    x2, y2, d2, w2, bands = PB.pack_events_by_tile(padded, wgt, dtf, Ht, Wt)
    cb = PB.n_col_bands(Wt)

    def run(fl, rw, cw):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (Ht, Wt), (0.0, 0.5), True,
            1e-6, False, cb, rw, cw,
        )

    fl = jnp.asarray(flow)
    np.testing.assert_array_equal(
        np.asarray(run(fl, 128, 384)), np.asarray(run(fl, None, None))
    )
    g_w = jax.grad(lambda f: jnp.sum(run(f, 128, 384) ** 2))(fl)
    g_f = jax.grad(lambda f: jnp.sum(run(f, None, None) ** 2))(fl)
    np.testing.assert_array_equal(np.asarray(g_w), np.asarray(g_f))


def test_row_windowed_voxel_votes_match_full():
    """v4 row windows on the time-aware (bin-grid) voxel kernel: windowed
    == full, forward and voxel-grad, with per-bin flows mixing small and
    huge motions (both in-kernel paths)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt, T = 260, 60, 3
    rng = np.random.default_rng(23)
    n = 600
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=1024)
    voxel = rng.uniform(-4, 4, (T, 2, Ht, Wt))
    voxel[1] = rng.uniform(150, 250, (2, Ht, Wt))  # bin 1 blows out
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    x2, y2, d2, w2, bands = PB.pack_events_by_band_bin(padded, wgt, dtf, Ht, T)

    def run(vox, rw):
        return PB.fused_multi_iwe_banded_voxel(
            vox, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (Ht, Wt), (0.0, 0.5), True,
            1e-6, False, rw,
        )

    vox = jnp.asarray(voxel)
    np.testing.assert_array_equal(np.asarray(run(vox, 128)), np.asarray(run(vox, None)))
    g_w = jax.grad(lambda v: jnp.sum(run(v, 128) ** 2))(vox)
    g_f = jax.grad(lambda v: jnp.sum(run(v, None) ** 2))(vox)
    np.testing.assert_array_equal(np.asarray(g_w), np.asarray(g_f))


def test_tile_packed_kernel_matches_band_packed():
    """Tile packing (row x 128-column windows, the standalone-vote fast
    path — bench.py) == band packing, forward and flow-grad, on a frame
    wide enough for multiple column bands."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 130, 200  # 3 row bands, 2 column bands
    rng = np.random.default_rng(11)
    n = 500
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=1024)
    flow = rng.uniform(-4, 4, (2, Ht, Wt))
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())

    xb, yb, db, wb, bandsb = PB.pack_events_by_band(padded, wgt, dtf, Ht)
    xt, yt, dt, wt2, bandst = PB.pack_events_by_tile(padded, wgt, dtf, Ht, Wt)

    def run_band(fl):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(db),
            jnp.asarray(wb), jnp.asarray(bandsb), (Ht, Wt), (0.0, 0.5), True, 1e-6, False,
        )

    def run_tile(fl):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(dt),
            jnp.asarray(wt2), jnp.asarray(bandst), (Ht, Wt), (0.0, 0.5), True, 1e-6, False,
            PB.n_col_bands(Wt),
        )

    fl = jnp.asarray(flow)
    np.testing.assert_allclose(np.asarray(run_tile(fl)), np.asarray(run_band(fl)), atol=1e-9)
    gt_ = jax.grad(lambda f: jnp.sum(run_tile(f) ** 2))(fl)
    gb_ = jax.grad(lambda f: jnp.sum(run_band(f) ** 2))(fl)
    np.testing.assert_allclose(np.asarray(gt_), np.asarray(gb_), atol=1e-8)


def test_flex_packed_kernel_matches_band_packed():
    """Fill-balanced flex tile packing (v7: variable-height 8-aligned row
    bands, row_scale=8) == band packing, forward and flow-grad, windowed
    and not, plus the orig-only (hoisted) call."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 130, 200  # non-64-multiple height, 2 column bands
    rng = np.random.default_rng(13)
    n = 500
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=1024)
    flow = rng.uniform(-4, 4, (2, Ht, Wt))
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())

    xb, yb, db, wb, bandsb = PB.pack_events_by_band(padded, wgt, dtf, Ht)
    pf = PB.pack_events_by_tile_flex(padded, wgt, dtf, Ht, Wt, chunk=256, g_round=4)
    assert pf[0].shape[0] % 4 == 0  # g_round honored
    assert pf[0].shape[0] <= xb.shape[0] + 4  # fill-balanced: no blow-up

    def run_band(fl):
        return PB.fused_multi_iwe_banded(
            fl, jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(db),
            jnp.asarray(wb), jnp.asarray(bandsb), (Ht, Wt), (0.0, 0.5), True, 1e-6, False,
        )

    def run_flex(fl, rw=None, offsets=(0.0, 0.5)):
        return PB.fused_multi_iwe_banded(
            fl, *(jnp.asarray(a) for a in pf), (Ht, Wt), offsets, True, 1e-6,
            False, PB.n_col_bands(Wt), rw, None, 1, False, PB.FLEX_ROW_SCALE,
        )

    fl = jnp.asarray(flow)
    ref = np.asarray(run_band(fl))
    np.testing.assert_allclose(np.asarray(run_flex(fl)), ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(run_flex(fl, rw=96)), ref, atol=1e-9)
    gf = jax.grad(lambda f: jnp.sum(run_flex(f, rw=96) ** 2))(fl)
    gb_ = jax.grad(lambda f: jnp.sum(run_band(f) ** 2))(fl)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gb_), atol=1e-8)
    # orig-only hoisted call with flex band ids
    np.testing.assert_allclose(
        np.asarray(run_flex(fl, rw=96, offsets=()))[0], ref[0], atol=1e-9
    )


def test_stack_uv_gather_bit_identical():
    """v6 stacked hi/lo-bf16 gather/scatter layout is bit-identical to the
    unstacked bf16 kernel (same summands, f32 accumulation), fwd + grad.
    Kept as a tested capability; round-2 probes measured it SLOWER on the
    bench shape (406 vs 452 Mev/s) so no policy uses it."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 130, 200
    rng = np.random.default_rng(17)
    n = 400
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=512)
    flow = rng.uniform(-4, 4, (2, Ht, Wt))
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    pk = PB.pack_events_by_tile(padded, wgt, dtf, Ht, Wt, chunk=256)

    def run(fl, stacked):
        return PB.fused_multi_iwe_banded(
            fl, *(jnp.asarray(a) for a in pk), (Ht, Wt), (0.0, 0.5), True,
            1e-6, True, PB.n_col_bands(Wt), 96, None, 1, stacked,
        )

    fl = jnp.asarray(flow)
    np.testing.assert_array_equal(np.asarray(run(fl, True)), np.asarray(run(fl, False)))
    gs = jax.grad(lambda f: jnp.sum(run(f, True) ** 2))(fl)
    gu = jax.grad(lambda f: jnp.sum(run(f, False) ** 2))(fl)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(gu))


@pytest.mark.parametrize("height", [H, 130])  # 1 band / 3 bands (non-64-multiple)
def test_banded_voxel_kernel_matches_composed(height):
    """Time-aware banded fused kernel ((bin, band)-packed chunks, per-bin
    grid slices) vs composed voxel-warp + scatter vote, values and
    voxel-gradients, on CPU interpret mode."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.ops.iwe import bilinear_vote
    from event_based_optical_flow_tpu.ops.warp import multi_direction_dense_warp

    H = height  # shadow module constant: exercise multi-band packing too
    n_bin = 4
    ev = _events(600, seed=7)
    ev[:, 0] = np.clip(np.round(ev[:, 0] * (H / 16.0)), 0, H - 1)
    ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
    padded, wgt = pad_events(ev, target_n=1024)
    voxel = np.random.default_rng(8).uniform(-4, 4, (n_bin, 2, H, W))

    t = padded[:, 2]
    dtf = (t - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    x2, y2, d2, w2, bands = PB.pack_events_by_band_bin(padded, wgt, dtf, H, n_bin)
    offsets = (0.0, 1.0, 0.5)

    def fused(vox):
        return PB.fused_multi_iwe_banded_voxel(
            vox, jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2),
            jnp.asarray(w2), jnp.asarray(bands), (H, W), offsets, True, 1e-6, False,
        )

    def composed(vox):
        events_j = jnp.asarray(padded)
        weights_j = jnp.asarray(wgt)
        warped = multi_direction_dense_warp(
            events_j, vox, list(offsets), (H, W), weights=weights_j, time_aware=True
        )
        ref = [bilinear_vote(events_j, (H, W), weight=weights_j, backend="matmul")]
        ref += [bilinear_vote(wv, (H, W), weight=weights_j, backend="matmul") for wv in warped]
        return jnp.stack(ref)

    vox_j = jnp.asarray(voxel)
    np.testing.assert_allclose(np.asarray(fused(vox_j)), np.asarray(composed(vox_j)), atol=1e-8)

    g = jnp.asarray(np.random.default_rng(9).standard_normal((4, H, W)))
    grad_fused = jax.grad(lambda v: jnp.sum(fused(v) * g))(vox_j)
    grad_comp = jax.grad(lambda v: jnp.sum(composed(v) * g))(vox_j)
    np.testing.assert_allclose(np.asarray(grad_fused), np.asarray(grad_comp), atol=1e-7)


@pytest.mark.slow
def test_banded_time_aware_objective_matches_unfused():
    """Full time-aware objective through the banded voxel kernel (tile
    interp -> Burgers voxel -> fused warp+vote -> hybrid cost) vs the
    unfused build_objective, loss and motion-gradient."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.objective import (
        ObjectiveSpec,
        build_objective,
        build_objective_banded,
    )

    spec = ObjectiveSpec(
        image_shape=(H, W),
        outer_padding=0,
        patch_image_size=(2, 2),
        patch_size=(H // 2, W // 2),
        sliding_window=(H // 2, W // 2),
        patch_shift=(0, 0),
        filter_type="bilinear",
        iwe_method="bilinear_vote",
        blur_sigma=1.0,
        cost_name="hybrid",
        cost_with_weight=(
            ("multi_focal_normalized_gradient_magnitude", 1.0),
            ("total_variation", 0.01),
        ),
        time_aware=True,
        time_bin=4,
        flow_interpolation="burgers",
        iwe_backend="pallas",
    )
    ev = _events(800, seed=11)
    ev[:, 0] = np.clip(np.round(ev[:, 0]), 0, H - 1)
    ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
    padded, wgt = pad_events(ev, target_n=1024)
    t = padded[:, 2]
    span = ev[:, 2].max() - ev[:, 2].min()
    dtf = (t - ev[:, 2].min()) / span
    x2, y2, d2, w2, bands = PB.pack_events_by_band_bin(padded, wgt, dtf, H, spec.time_bin)

    motion = jnp.asarray(np.random.default_rng(12).uniform(-6, 6, 8))
    banded = build_objective_banded(spec)
    unfused = build_objective(spec)
    args_b = (jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(d2), jnp.asarray(w2),
              jnp.asarray(bands), jnp.asarray(span))
    loss_b = banded(motion, *args_b)[0]
    loss_u = unfused(motion, jnp.asarray(padded), jnp.asarray(wgt))[0]
    np.testing.assert_allclose(float(loss_b), float(loss_u), atol=1e-9)

    g_b = jax.grad(lambda m: banded(m, *args_b)[0])(motion)
    g_u = jax.grad(lambda m: unfused(m, jnp.asarray(padded), jnp.asarray(wgt))[0])(motion)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_u), atol=1e-8)


def test_banded_voxel_batched_matches_single():
    """Fleet voxel kernel (grid (B, T, G)) == per-frame voxel kernel,
    values and voxel-gradients."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    n_bin, bsz = 3, 2
    rng = np.random.default_rng(21)
    xs, ys, ds, ws, bs, voxes = [], [], [], [], [], []
    for b in range(bsz):
        ev = _events(500 + 100 * b, seed=30 + b)
        ev[:, 0] = np.clip(np.round(ev[:, 0]), 0, H - 1)
        ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
        padded, wgt = pad_events(ev, target_n=1024)
        t = padded[:, 2]
        dtf = (t - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
        x2, y2, d2, w2, bands = PB.pack_events_by_band_bin(padded, wgt, dtf, H, n_bin)
        xs.append(x2); ys.append(y2); ds.append(d2); ws.append(w2); bs.append(bands)
        voxes.append(rng.uniform(-4, 4, (n_bin, 2, H, W)))
    g_max = max(a.shape[1] for a in xs)

    def _pad(a, fill):
        out = np.full(a.shape[:1] + (g_max,) + a.shape[2:], fill, a.dtype)
        out[:, : a.shape[1]] = a
        return out

    x_b = np.stack([_pad(a, -10.0) for a in xs])
    y_b = np.stack([_pad(a, -10.0) for a in ys])
    d_b = np.stack([_pad(a, 0.0) for a in ds])
    w_b = np.stack([_pad(a, 0.0) for a in ws])
    brows = np.stack([
        np.broadcast_to(_pad(b_, 0).astype(np.int32)[:, :, None, None], (n_bin, g_max, 1, 128))
        for b_ in bs
    ])
    vox_b = jnp.asarray(np.stack(voxes))
    offsets = (0.0, 0.5)

    def fused_b(v):
        return PB.fused_multi_iwe_banded_voxel_batched(
            v, jnp.asarray(x_b), jnp.asarray(y_b), jnp.asarray(d_b),
            jnp.asarray(w_b), jnp.asarray(brows), (H, W), offsets, True, 1e-6, False,
        )

    out_b = np.asarray(fused_b(vox_b))
    gcot = jnp.asarray(np.random.default_rng(22).standard_normal(out_b.shape))
    grad_b = np.asarray(jax.grad(lambda v: jnp.sum(fused_b(v) * gcot))(vox_b))
    for b in range(bsz):
        def fused_one(v, b=b):
            return PB.fused_multi_iwe_banded_voxel(
                v, jnp.asarray(_pad(xs[b], -10.0)), jnp.asarray(_pad(ys[b], -10.0)),
                jnp.asarray(_pad(ds[b], 0.0)), jnp.asarray(_pad(ws[b], 0.0)),
                jnp.asarray(_pad(bs[b], 0)), (H, W), offsets, True, 1e-6, False,
            )

        one = np.asarray(fused_one(jnp.asarray(voxes[b])))
        np.testing.assert_allclose(out_b[b], one, atol=1e-10)
        g_one = np.asarray(
            jax.grad(lambda v: jnp.sum(fused_one(v) * gcot[b]))(jnp.asarray(voxes[b]))
        )
        np.testing.assert_allclose(grad_b[b], g_one, atol=1e-10)


def test_multi_direction_warp_matches_single():
    from event_based_optical_flow_tpu.ops.warp import Warp, multi_direction_dense_warp

    ev = _events(200)
    ev[:, 0] = np.clip(np.round(ev[:, 0]), 0, H - 1)
    ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
    flow = np.random.default_rng(2).uniform(-5, 5, (2, H, W))
    warper = Warp((H, W), normalize_t=True)
    multi = multi_direction_dense_warp(jnp.asarray(ev), jnp.asarray(flow), [0.0, 1.0, 0.5], (H, W))
    for got, direction in zip(multi, ["first", "last", "middle"]):
        want = warper.warp_event(jnp.asarray(ev), jnp.asarray(flow), "dense-flow", direction)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)
    # voxel variant
    voxel = np.random.default_rng(3).uniform(-5, 5, (4, 2, H, W))
    multi = multi_direction_dense_warp(
        jnp.asarray(ev), jnp.asarray(voxel), [0.0, 0.5], (H, W), time_aware=True
    )
    for got, direction in zip(multi, ["first", "middle"]):
        want = warper.warp_event(jnp.asarray(ev), jnp.asarray(voxel), "dense-flow-voxel", direction)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_iwe_matches_single_device():
    mesh = make_mesh(8, data=1, event=8)
    ev = _events(512)
    padded, wgt = pad_events(ev, target_n=1024)
    ref = np.asarray(ops.bilinear_vote(jnp.asarray(padded), (H, W), weight=jnp.asarray(wgt)))
    out = np.asarray(sharded_iwe(jnp.asarray(padded), jnp.asarray(wgt), (H, W), mesh))
    np.testing.assert_allclose(out, ref, atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fleet_step_runs_and_descends():
    mesh = make_mesh(8, data=4, event=2)
    n_frames, n_events = 8, 512
    evs, wgts = [], []
    for b in range(n_frames):
        ev = _events(n_events - 40, seed=b)
        p, wgt = pad_events(ev, target_n=n_events)
        evs.append(p)
        wgts.append(wgt)
    sh_m, sh_e, sh_w = fleet_shardings(mesh)
    events = jax.device_put(jnp.asarray(np.stack(evs)), sh_e)
    weights = jax.device_put(jnp.asarray(np.stack(wgts)), sh_w)
    motions = jax.device_put(jnp.zeros((n_frames, 8)), sh_m)

    step = build_fleet_step(mesh, (H, W), (2, 2), (8, 10), (8, 10), lr=0.1)
    m1, loss1 = step(motions, events, weights)
    m2, loss2 = step(m1, events, weights)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss1) + 1e-6


def test_voxel_grid_padded_rows_inert():
    from event_based_optical_flow_tpu.models import events_to_voxel_grid

    ev = _events(400)
    padded, wgt = pad_events(ev, target_n=512)
    vox = events_to_voxel_grid(jnp.asarray(padded), (H, W), n_bin=4, weights=jnp.asarray(wgt))
    assert vox.shape == (H, W, 4)
    # padded events contribute nothing
    vox2 = events_to_voxel_grid(jnp.asarray(ev), (H, W), n_bin=4)
    np.testing.assert_allclose(np.asarray(vox), np.asarray(vox2), atol=1e-10)


@pytest.mark.slow
def test_evflownet_forward_shapes():
    # the model-forward compile dominates (~25 s on CPU); the training
    # tests in test_models.py cover the same forward — slow tier
    from event_based_optical_flow_tpu.models import EVFlowNet

    model = EVFlowNet(n_bin=4)
    x = jnp.zeros((1, 32, 32, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    flows = model.apply(params, x)
    assert flows["flow3"].shape == (1, 2, 32, 32)
    assert flows["flow0"].shape == (1, 2, 4, 4)


# both variants are fast-tier outliers (19-25 s); the orig-hoist
# capability keeps kernel-level fast coverage via
# test_banded_voxel_kernel_matches_composed and runs here in the full tier
@pytest.mark.slow
@pytest.mark.parametrize("time_aware", [False, True])
def test_precomputed_orig_objective_matches(time_aware):
    """Hoisted motion-independent orig IWE (build_orig_iwe_banded +
    build_objective_banded(precomputed_orig=True)) == the fused-orig
    objective exactly, loss and motion-grad."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded,
        build_orig_iwe_banded,
    )
    from tests.test_solver import _spec, _synthetic_events

    spec = dataclasses.replace(_spec(time_aware), iwe_backend="pallas")
    ev = _synthetic_events(np.asarray([9.0, -5.0]), n=1200, seed=71)
    padded, wgt = pad_events(ev, target_n=2048)
    Hs, Ws = spec.image_shape
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    if time_aware:
        packed = PB.pack_events_by_band_bin(padded, wgt, dtf, Hs, spec.time_bin)
    else:
        packed = PB.pack_events_dense(padded, wgt, dtf, Hs, Ws)
    args = tuple(jnp.asarray(a) for a in packed) + (
        jnp.asarray(ev[:, 2].max() - ev[:, 2].min()),
    )
    motion = jnp.asarray(np.random.default_rng(5).uniform(-5, 5, 8))

    fused = build_objective_banded(spec)
    hoisted = build_objective_banded(spec, precomputed_orig=True)
    orig = build_orig_iwe_banded(spec)(*args)

    want, gw = jax.value_and_grad(lambda m: fused(m, *args)[0])(motion)
    got, gg = jax.value_and_grad(lambda m: hoisted(m, orig, *args)[0])(motion)
    assert float(got) == float(want)
    np.testing.assert_array_equal(np.asarray(gg), np.asarray(gw))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("time_aware", [False, True])
@pytest.mark.slow
def test_sharded_banded_objective_matches_single(time_aware):
    """Event-sharded banded objective (chunks over the 'event' mesh axis,
    partial IWEs psum'ed) == single-device banded objective, loss + grad."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.parallel.sharded import (
        build_objective_banded_sharded,
        pad_chunks_for_sharding,
    )
    from event_based_optical_flow_tpu.solver.objective import (
        ObjectiveSpec,
        build_objective_banded,
    )

    spec = ObjectiveSpec(
        image_shape=(H, W), outer_padding=0, patch_image_size=(2, 2),
        patch_size=(H // 2, W // 2), sliding_window=(H // 2, W // 2),
        patch_shift=(0, 0), filter_type="bilinear", iwe_method="bilinear_vote",
        blur_sigma=1.0, cost_name="hybrid",
        cost_with_weight=(
            ("multi_focal_normalized_gradient_magnitude", 1.0),
            ("total_variation", 0.01),
        ),
        time_aware=time_aware, time_bin=3, flow_interpolation="burgers",
        iwe_backend="pallas",
    )
    ev = _events(400, seed=13)
    ev[:, 0] = np.clip(np.round(ev[:, 0]), 0, H - 1)
    ev[:, 1] = np.clip(np.round(ev[:, 1]), 0, W - 1)
    padded, wgt = pad_events(ev, target_n=512)
    t = padded[:, 2]
    span = ev[:, 2].max() - ev[:, 2].min()
    dtf = (t - ev[:, 2].min()) / span
    if time_aware:
        packed = PB.pack_events_by_band_bin(padded, wgt, dtf, H, spec.time_bin)
    else:
        packed = PB.pack_events_dense(padded, wgt, dtf, H, W)
    packed = pad_chunks_for_sharding(packed, 8)
    args = tuple(jnp.asarray(a) for a in packed) + (jnp.asarray(span),)

    mesh = make_mesh(8, data=1, event=8)
    sharded = build_objective_banded_sharded(spec, mesh)
    single = build_objective_banded(spec)
    motion = jnp.asarray(np.random.default_rng(14).uniform(-5, 5, 8))

    loss_s, _ = sharded(motion, *args)
    loss_1, _ = single(motion, *args)
    np.testing.assert_allclose(float(loss_s), float(loss_1), atol=1e-9)
    g_s = jax.grad(lambda m: sharded(m, *args)[0])(motion)
    g_1 = jax.grad(lambda m: single(m, *args)[0])(motion)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_1), atol=1e-8)


def test_tent_corner_blocks_match_select_at_bf16():
    """v8 candidate: tent-arithmetic vote corner blocks (bf16-native,
    no boolean selects) agree with the select-based bf16 blocks to bf16
    rounding, stay exactly windowed==full (shared floor routing), and
    leave the backward pass untouched (select-based, bit-identical
    gradients)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 200, 140
    rng = np.random.default_rng(7)
    n = 2000
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=2048)
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    pf = PB.pack_events_by_tile_flex(padded, wgt, dtf, Ht, Wt, chunk=256)
    pk = tuple(
        jnp.asarray(a, jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
        for a in pf
    )
    flow = jnp.asarray(rng.uniform(-10, 10, (2, Ht, Wt)), jnp.float32)

    def run(fl, tent, rw):
        return PB.fused_multi_iwe_banded(
            fl, *pk, (Ht, Wt), (0.0, 0.5, 1.0), True, 1e-6, True,
            PB.n_col_bands(Wt), rw, None, 1, False, PB.FLEX_ROW_SCALE, tent,
        )

    sel = np.asarray(run(flow, False, 96))
    tw = np.asarray(run(flow, True, 96))
    tf = np.asarray(run(flow, True, None))
    # bf16 rounding enters on d instead of the final weight: same order
    np.testing.assert_allclose(tw, sel, atol=4e-2)
    assert np.abs(tw - sel).max() > 0  # genuinely a different build
    np.testing.assert_array_equal(tw, tf)  # windowed == full, exactly
    g_sel = jax.grad(lambda f: run(f, False, 96).sum())(flow)
    g_tent = jax.grad(lambda f: run(f, True, 96).sum())(flow)
    np.testing.assert_array_equal(np.asarray(g_sel), np.asarray(g_tent))


def test_tent_all_backward_blocks():
    """v8 backward candidate (tent="all"): the backward's dot-consumed
    column blocks are tent-built in bf16 — forward output bit-identical
    to tent=True, gradients within bf16 rounding of the select build,
    and windowed == full gradients exactly (shared floor routing)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 200, 140
    rng = np.random.default_rng(11)
    n = 2000
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=2048)
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    pf = PB.pack_events_by_tile_flex(padded, wgt, dtf, Ht, Wt, chunk=256)
    pk = tuple(
        jnp.asarray(a, jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
        for a in pf
    )
    flow = jnp.asarray(rng.uniform(-10, 10, (2, Ht, Wt)), jnp.float32)

    def run(fl, tent, rw):
        return PB.fused_multi_iwe_banded(
            fl, *pk, (Ht, Wt), (0.0, 0.5, 1.0), True, 1e-6, True,
            PB.n_col_bands(Wt), rw, None, 1, False, PB.FLEX_ROW_SCALE, tent,
        )

    fwd_tent = np.asarray(run(flow, True, 96))
    fwd_all = np.asarray(run(flow, "all", 96))
    np.testing.assert_array_equal(fwd_tent, fwd_all)  # same forward build

    # cotangent through a contrast-like cost so g varies over pixels
    def loss(fl, tent, rw):
        iwe = run(fl, tent, rw)
        return jnp.sum(iwe * iwe)

    g_sel = np.asarray(jax.grad(lambda f: loss(f, False, 96))(flow))
    g_all = np.asarray(jax.grad(lambda f: loss(f, "all", 96))(flow))
    g_all_full = np.asarray(jax.grad(lambda f: loss(f, "all", None))(flow))
    scale = np.abs(g_sel).max()
    assert np.abs(g_all - g_sel).max() > 0  # genuinely a different build
    np.testing.assert_allclose(g_all, g_sel, atol=2e-2 * scale)
    np.testing.assert_array_equal(g_all, g_all_full)  # windowed == full


def test_tent_corner_deriv_block_bit_identical():
    """_corner_deriv_block_tent_bf16 == _corner_deriv_block(...)
    .astype(bf16) exactly, for in-range, sentinel, boundary and
    out-of-range floors, with and without a {0, 1} weight row."""
    from event_based_optical_flow_tpu.ops.pallas_objective import (
        _corner_deriv_block,
        _corner_deriv_block_tent_bf16,
    )

    fl = jnp.asarray([[-10, -2, -1, 0, 1, 62, 63, 254, 255, 700]], jnp.int32)
    wt = jnp.asarray([[1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0, 1.0, 0.0, 1.0]], jnp.float32)
    for size in (64, 768):
        for w in (None, wt):
            ref = _corner_deriv_block(fl, w, size, jnp.float32).astype(jnp.bfloat16)
            tent = _corner_deriv_block_tent_bf16(fl, w, size)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(tent))


def test_tent_int_onehot_bit_identical():
    """_onehot_int_tent_bf16 == _onehot_int(...).astype(bf16) exactly, for
    in-range, negative (sentinel -10), boundary and out-of-range coords —
    integer-spaced tent distances survive bf16 rounding without crossing
    the |d| < 1 support."""
    from event_based_optical_flow_tpu.ops.pallas_objective import (
        _onehot_int,
        _onehot_int_tent_bf16,
    )

    coords = jnp.asarray(
        [[-10.0, -1.0, 0.0, 1.0, 63.2, 255.0, 256.0, 700.7, 767.0, 800.0]],
        jnp.float32,
    )
    for size in (64, 768):
        ref = _onehot_int(coords, size).astype(jnp.bfloat16)
        tent = _onehot_int_tent_bf16(coords, size)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(tent))


@pytest.mark.slow
def test_pregather_tables_bit_identical():
    """v9 candidate: streamed precomputed gather one-hots (HBM tables,
    _gather_tables) are BIT-IDENTICAL to the in-kernel VPU builds —
    forward and backward, windowed and full, with and without orig —
    on flex packing (the adopted objective path)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    Ht, Wt = 200, 140
    rng = np.random.default_rng(11)
    n = 2000
    ev = np.stack([
        rng.uniform(0, Ht - 1, n), rng.uniform(0, Wt - 1, n),
        np.sort(rng.uniform(0, 1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    padded, wgt = pad_events(ev, target_n=2048)
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    pf = PB.pack_events_by_tile_flex(padded, wgt, dtf, Ht, Wt, chunk=256)
    pk = tuple(
        jnp.asarray(a, jnp.float32 if np.asarray(a).dtype.kind == "f" else None)
        for a in pf
    )
    flow = jnp.asarray(rng.uniform(-10, 10, (2, Ht, Wt)), jnp.float32)

    def run(fl, pre, rw, orig=True):
        return PB.fused_multi_iwe_banded(
            fl, *pk, (Ht, Wt), (0.0, 0.5, 1.0), orig, 1e-6, True,
            PB.n_col_bands(Wt), rw, None, 1, False, PB.FLEX_ROW_SCALE,
            False, pre,
        )

    for rw in (96, None):
        base = np.asarray(run(flow, False, rw))
        pre = np.asarray(run(flow, True, rw))
        np.testing.assert_array_equal(base, pre)
        g0 = jax.grad(lambda f: (run(f, False, rw) ** 2).sum())(flow)
        g1 = jax.grad(lambda f: (run(f, True, rw) ** 2).sum())(flow)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    # orig-only call (offsets present but include_orig toggled off)
    np.testing.assert_array_equal(
        np.asarray(run(flow, False, 96, orig=False)),
        np.asarray(run(flow, True, 96, orig=False)),
    )


# --------------------------------------------------------------------
# v10 analytic second-order kernels (JVP + HVP-backward)
# --------------------------------------------------------------------


def _v10_pack(H, W, n=900, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(1, H - 2, n)
    y = rng.uniform(1, W - 2, n)
    t = np.sort(rng.uniform(0, 1, n))
    wt = np.ones(n)
    wt[-n // 10:] = 0.0  # padded rows must be inert
    ev = np.stack([x, y, t, rng.integers(0, 2, n)], 1)
    dtf = (t - t.min()) / (t.max() - t.min())
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    return PB.pack_events_by_tile_flex(ev, wt, dtf, H, W, chunk=256)


@pytest.mark.parametrize("row_window", [None, 128])
def test_v10_jvp_kernel_matches_forward_and_fd(row_window):
    """fused_multi_iwe_banded_jvp: the images half is bit-identical to
    the forward kernel; the tangent half matches a central difference of
    the forward along the tangent flow (f64, interpret mode)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    H, W = (40, 52) if row_window is None else (200, 72)
    xs, ys, ds, ws, bands = _v10_pack(H, W)
    rng = np.random.default_rng(7)
    flow = jnp.asarray(rng.normal(0, 8.0, (2, H, W)))
    dflow = jnp.asarray(rng.normal(0, 1.0, (2, H, W)))
    offsets = (0.0, 0.5, 1.0)
    cb = PB.n_col_bands(W)
    rs = PB.FLEX_ROW_SCALE

    def images_of(fl):
        return PB.fused_multi_iwe_banded(
            fl, xs, ys, ds, ws, bands, (H, W), offsets, False,
            1e-6, False, cb, row_window, None, 1, False, rs, False, False,
        )

    imgs, dimgs = PB.fused_multi_iwe_banded_jvp(
        flow, dflow, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, col_bands=cb, row_window=row_window,
        row_scale=rs,
    )
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(images_of(flow)))
    h = 1e-6
    fd = (images_of(flow + h * dflow) - images_of(flow - h * dflow)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dimgs), np.asarray(fd), atol=1e-6)


@pytest.mark.parametrize("row_window", [None, 128])
def test_v10_hvp_bwd_kernel_matches_fd_of_vjp(row_window):
    """fused_multi_iwe_banded_hvp_bwd == d/dh [vjp(flow + h*dflow)(g1 +
    h*g2)] at h=0 (central difference, f64): the directional derivative
    of the implemented backward pass, i.e. term A (the vote's mixed
    second derivative against g1) + term B (the backward against g2)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    H, W = (40, 52) if row_window is None else (200, 72)
    xs, ys, ds, ws, bands = _v10_pack(H, W, seed=5)
    rng = np.random.default_rng(11)
    flow = jnp.asarray(rng.normal(0, 8.0, (2, H, W)))
    dflow = jnp.asarray(rng.normal(0, 1.0, (2, H, W)))
    offsets = (0.0, 1.0)
    g1 = jnp.asarray(rng.normal(0, 1, (2, H, W)))
    g2 = jnp.asarray(rng.normal(0, 1, (2, H, W)))
    cb = PB.n_col_bands(W)
    rs = PB.FLEX_ROW_SCALE

    def images_of(fl):
        return PB.fused_multi_iwe_banded(
            fl, xs, ys, ds, ws, bands, (H, W), offsets, False,
            1e-6, False, cb, row_window, None, 1, False, rs, False, False,
        )

    def vjp_at(fl, g):
        _, f_vjp = jax.vjp(images_of, fl)
        return f_vjp(g)[0]

    out = PB.fused_multi_iwe_banded_hvp_bwd(
        flow, dflow, g1, g2, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, col_bands=cb, row_window=row_window,
        row_scale=rs,
    )
    h = 1e-6
    fd = (
        vjp_at(flow + h * dflow, g1 + h * g2)
        - vjp_at(flow - h * dflow, g1 - h * g2)
    ) / (2 * h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fd), atol=1e-5)


@pytest.mark.slow
def test_v10_analytic_hvp_matches_autodiff_oracle():
    """build_objective_banded_hvp == jax.jvp of the gradient of the
    UNFUSED (matmul backend, twice-differentiable) objective — the full
    Hessian-vector product of the production objective, exact to f64
    rounding (the banded kernels and the matmul path compute identical
    math; existing parity tests pin that equivalence)."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective,
        build_objective_banded_hvp,
        build_orig_iwe_banded,
        objective_supports_analytic_hvp,
    )
    from tests.test_solver import _spec, _synthetic_events

    spec = dataclasses.replace(_spec(False), iwe_backend="pallas")
    assert objective_supports_analytic_hvp(spec)
    ev = _synthetic_events(np.asarray([9.0, -5.0]), n=1200, seed=71)
    padded, wgt = pad_events(ev, target_n=2048)
    Hs, Ws = spec.image_shape
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    packed = PB.pack_events_dense(padded, wgt, dtf, Hs, Ws)
    args = tuple(jnp.asarray(a) for a in packed) + (
        jnp.asarray(ev[:, 2].max() - ev[:, 2].min()),
    )
    rng = np.random.default_rng(5)
    motion = jnp.asarray(rng.uniform(-5, 5, 8))
    p = jnp.asarray(rng.normal(0, 1, 8))

    oracle_obj = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
    gf = lambda m: jax.grad(
        lambda mm: oracle_obj(mm, jnp.asarray(padded), jnp.asarray(wgt))[0]
    )(m)
    _, oracle = jax.jvp(gf, (motion,), (p,))

    orig = build_orig_iwe_banded(spec)(*args)
    hvp = build_objective_banded_hvp(spec, precomputed_orig=True,
                                     gauss_newton=False)
    got = hvp(motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=1e-12)
    # the Gauss-Newton default differs from the full Hessian exactly by
    # the vote-Hessian term A (dropped by design — see the builder doc)
    gn = build_objective_banded_hvp(spec, precomputed_orig=True)(
        motion, p, orig, *args
    )
    assert gn.shape == got.shape and np.all(np.isfinite(np.asarray(gn)))

    # the STAGED variant (value images hoisted per CG solve, tangent-only
    # JVP kernel per HVP) is numerically identical to the fused form
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded_hvp_staged,
    )

    prep, hvp_staged = build_objective_banded_hvp_staged(
        spec, precomputed_orig=True, gauss_newton=False
    )
    aux = prep(motion, orig, *args)
    got_staged = hvp_staged(aux, motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got_staged), np.asarray(got),
                               atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_analytic_hvp_matches_single():
    """Event-sharded staged analytic HVP (v10 kernels psum'ed over the
    'event' mesh axis, like the objective) == single-device staged HVP."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.parallel.sharded import (
        make_mesh,
        pad_chunks_for_sharding,
    )
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded_hvp_staged,
        build_orig_iwe_banded,
    )
    from tests.test_solver import _spec, _synthetic_events

    spec = dataclasses.replace(_spec(False), iwe_backend="pallas")
    ev = _synthetic_events(np.asarray([9.0, -5.0]), n=1200, seed=23)
    padded, wgt = pad_events(ev, target_n=2048)
    Hs, Ws = spec.image_shape
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    packed = PB.pack_events_dense(padded, wgt, dtf, Hs, Ws)
    packed = pad_chunks_for_sharding(packed, 8)
    args = tuple(jnp.asarray(a) for a in packed) + (
        jnp.asarray(ev[:, 2].max() - ev[:, 2].min()),
    )
    rng = np.random.default_rng(29)
    motion = jnp.asarray(rng.uniform(-5, 5, 8))
    p = jnp.asarray(rng.normal(0, 1, 8))
    orig = build_orig_iwe_banded(spec)(*args)

    prep1, hvp1 = build_objective_banded_hvp_staged(spec, precomputed_orig=True)
    want = hvp1(prep1(motion, orig, *args), motion, p, orig, *args)

    mesh = make_mesh(8, data=1, event=8)
    prep8, hvp8 = build_objective_banded_hvp_staged(
        spec, precomputed_orig=True, mesh=mesh
    )
    got = hvp8(prep8(motion, orig, *args), motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


# full tier only (17-19 s each); the global-model analytic path keeps
# fast coverage via test_global_solver_analytic_hvp_engages
@pytest.mark.slow
@pytest.mark.parametrize("model", ["4-param-similarity", "3-rotation"])
def test_v10_analytic_hvp_global_models_match_oracle(model):
    """The global motion models' flow fields are LINEAR in their
    parameters (fixed spatial coefficient fields — flow_from_similarity
    / flow_from_rotation), so the analytic HVP's transpose-of-jvp
    assembly is exact for them too, full Hessian included.  Full
    analytic HVP == jvp-of-grad of the matmul (twice-differentiable)
    objective; the staged GN form stays finite and staged==unstaged."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective,
        build_objective_banded_hvp,
        build_objective_banded_hvp_staged,
        build_orig_iwe_banded,
        objective_supports_analytic_hvp,
    )
    from tests.test_solver import _spec, _synthetic_events

    n_par = 4 if model == "4-param-similarity" else 3
    spec = dataclasses.replace(
        _spec(False),
        iwe_backend="pallas",
        motion_model=model,
        # the global models have no tile grid: hybrid cost without TV
        cost_with_weight=(("multi_focal_normalized_gradient_magnitude", 1.0),),
        param_scale=tuple([1.0, 1.0, 1 / 14.0, 1 / 14.0][:n_par])
        if model == "4-param-similarity" else (1 / 20.0,) * 3,
        calib=(20.0, 20.0, 11.5, 15.5) if model == "3-rotation" else None,
    )
    assert objective_supports_analytic_hvp(spec)
    ev = _synthetic_events(np.asarray([6.0, -4.0]), n=1200, seed=72)
    padded, wgt = pad_events(ev, target_n=2048)
    Hs, Ws = spec.image_shape
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    packed = PB.pack_events_dense(padded, wgt, dtf, Hs, Ws)
    args = tuple(jnp.asarray(a) for a in packed) + (
        jnp.asarray(ev[:, 2].max() - ev[:, 2].min()),
    )
    rng = np.random.default_rng(6)
    motion = jnp.asarray(rng.uniform(-4, 4, n_par))
    p = jnp.asarray(rng.normal(0, 1, n_par))

    oracle_obj = build_objective(dataclasses.replace(spec, iwe_backend="matmul"))
    gf = lambda m: jax.grad(
        lambda mm: oracle_obj(mm, jnp.asarray(padded), jnp.asarray(wgt))[0]
    )(m)
    _, oracle = jax.jvp(gf, (motion,), (p,))

    orig = build_orig_iwe_banded(spec)(*args)
    hvp = build_objective_banded_hvp(spec, precomputed_orig=True,
                                     gauss_newton=False)
    got = hvp(motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-9, atol=1e-10)

    prep, hvp_staged = build_objective_banded_hvp_staged(
        spec, precomputed_orig=True, gauss_newton=True
    )
    aux = prep(motion, orig, *args)
    gn = hvp_staged(aux, motion, p, orig, *args)
    assert gn.shape == got.shape and np.all(np.isfinite(np.asarray(gn)))


def _v10_vox_pack(H, W, T, n=900, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(1, H - 2, n)
    y = rng.uniform(1, W - 2, n)
    t = np.sort(rng.uniform(0, 1, n))
    wt = np.ones(n)
    wt[-n // 10:] = 0.0  # padded rows must be inert
    ev = np.stack([x, y, t, rng.integers(0, 2, n)], 1)
    dtf = (t - t.min()) / (t.max() - t.min())
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    return PB.pack_events_by_band_bin(ev, wt, dtf, H, T)


@pytest.mark.parametrize("row_window", [None, 128])
def test_v10_voxel_jvp_kernel_matches_forward_and_fd(row_window):
    """fused_multi_iwe_banded_voxel_jvp: the images half is bit-identical
    to the voxel forward kernel; the tangent half matches a central
    difference of the forward along the tangent voxel (f64, interpret)."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    H, W = (40, 52) if row_window is None else (200, 72)
    T = 4
    xs, ys, ds, ws, bands = _v10_vox_pack(H, W, T)
    rng = np.random.default_rng(7)
    voxel = jnp.asarray(rng.normal(0, 8.0, (T, 2, H, W)))
    dvoxel = jnp.asarray(rng.normal(0, 1.0, (T, 2, H, W)))
    offsets = (0.0, 0.5, 1.0)

    def images_of(v):
        return PB.fused_multi_iwe_banded_voxel(
            v, xs, ys, ds, ws, bands, (H, W), offsets, False,
            1e-6, False, row_window, False,
        )

    imgs, dimgs = PB.fused_multi_iwe_banded_voxel_jvp(
        voxel, dvoxel, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, row_window=row_window,
    )
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(images_of(voxel)))
    h = 1e-6
    fd = (images_of(voxel + h * dvoxel) - images_of(voxel - h * dvoxel)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dimgs), np.asarray(fd), atol=1e-6)
    # staged form: tangents only, bit-identical to the fused tangent half
    tan_only = PB.fused_multi_iwe_banded_voxel_jvp(
        voxel, dvoxel, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, row_window=row_window, emit_value=False,
    )
    np.testing.assert_array_equal(np.asarray(tan_only), np.asarray(dimgs))


@pytest.mark.parametrize("row_window", [None, 128])
def test_v10_voxel_hvp_bwd_kernel_matches_fd_of_vjp(row_window):
    """fused_multi_iwe_banded_voxel_hvp_bwd == d/dh [vjp(voxel +
    h*dvoxel)(g1 + h*g2)] at h=0 (central difference, f64) — the
    directional derivative of the implemented voxel backward, per bin."""
    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB

    H, W = (40, 52) if row_window is None else (200, 72)
    T = 4
    xs, ys, ds, ws, bands = _v10_vox_pack(H, W, T, seed=5)
    rng = np.random.default_rng(11)
    voxel = jnp.asarray(rng.normal(0, 8.0, (T, 2, H, W)))
    dvoxel = jnp.asarray(rng.normal(0, 1.0, (T, 2, H, W)))
    offsets = (0.0, 1.0)
    g1 = jnp.asarray(rng.normal(0, 1, (2, H, W)))
    g2 = jnp.asarray(rng.normal(0, 1, (2, H, W)))

    def images_of(v):
        return PB.fused_multi_iwe_banded_voxel(
            v, xs, ys, ds, ws, bands, (H, W), offsets, False,
            1e-6, False, row_window, False,
        )

    def vjp_at(v, g):
        _, f_vjp = jax.vjp(images_of, v)
        return f_vjp(g)[0]

    out = PB.fused_multi_iwe_banded_voxel_hvp_bwd(
        voxel, dvoxel, g1, g2, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, row_window=row_window,
    )
    h = 1e-6
    fd = (
        vjp_at(voxel + h * dvoxel, g1 + h * g2)
        - vjp_at(voxel - h * dvoxel, g1 - h * g2)
    ) / (2 * h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fd), atol=1e-5)
    # Gauss-Newton form drops the vote-Hessian term but stays finite
    gn = PB.fused_multi_iwe_banded_voxel_hvp_bwd(
        voxel, dvoxel, g1, g2, xs, ys, ds, ws, bands, (H, W), offsets,
        eps=1e-6, use_bf16=False, row_window=row_window, term_a=False,
    )
    assert gn.shape == out.shape and np.all(np.isfinite(np.asarray(gn)))


@pytest.mark.slow
def test_v10_time_aware_analytic_gn_hvp_matches_composite_oracle():
    """The time-aware analytic HVP assembly (voxel JVP/HVP kernels +
    jax.jvp/vjp through the Burgers chain; Gauss-Newton only — the
    motion->voxel map is nonlinear) == the same GN quantity assembled
    from INDEPENDENT paths: a central FD of the voxel forward for the
    image tangent, jax autodiff of the cost Hessian, and the voxel
    custom-vjp backward for the transposes.  Also: staged == unstaged,
    and the builders refuse the full-Hessian form for time-aware."""
    import dataclasses

    from event_based_optical_flow_tpu.ops import pallas_objective_banded as PB
    from event_based_optical_flow_tpu.ops.blur import gaussian_blur3
    from event_based_optical_flow_tpu.solver.objective import (
        build_objective_banded_hvp,
        build_objective_banded_hvp_staged,
        build_orig_iwe_banded,
        make_cost,
        motion_to_dense_flow,
        nan_to_penalty,
        objective_supports_analytic_hvp,
    )
    from tests.test_solver import _spec, _synthetic_events

    spec = dataclasses.replace(_spec(True), iwe_backend="pallas")
    assert objective_supports_analytic_hvp(spec, gauss_newton=True)
    assert not objective_supports_analytic_hvp(spec, gauss_newton=False)
    # fleet supported too since round 4 (batched voxel JVP/HVP kernels)
    assert objective_supports_analytic_hvp(spec, gauss_newton=True,
                                           fleet=True)

    ev = _synthetic_events(np.asarray([7.0, -5.0]), n=1200, seed=73)
    padded, wgt = pad_events(ev, target_n=2048)
    Hs, Ws = spec.image_shape
    dtf = (padded[:, 2] - ev[:, 2].min()) / (ev[:, 2].max() - ev[:, 2].min())
    packed = PB.pack_events_by_band_bin(padded, wgt, dtf, Hs, spec.time_bin)
    t_scale = jnp.asarray(ev[:, 2].max() - ev[:, 2].min())
    args = tuple(jnp.asarray(a) for a in packed) + (t_scale,)
    xs, ys, ds, ws, bands = (jnp.asarray(a) for a in packed)
    rng = np.random.default_rng(9)
    motion = jnp.asarray(rng.uniform(-4, 4, 8))
    p = jnp.asarray(rng.normal(0, 1, 8))

    orig = build_orig_iwe_banded(spec)(*args)
    cost = make_cost(spec)
    offsets = (0.0, 1.0, 0.5)  # backward, forward, middle (builder order)

    def images_fn(m):
        voxel = motion_to_dense_flow(spec, m, t_scale) * t_scale
        return PB.fused_multi_iwe_banded_voxel(
            voxel, xs, ys, ds, ws, bands, (Hs, Ws), offsets, False,
            1e-6, False, PB.objective_row_window(Hs), False,
        )

    def cost_of(imgs, m):
        if spec.blur_sigma > 0:
            imgs = gaussian_blur3(imgs, spec.blur_sigma)
        arg = {
            "omit_boundary": True, "clip": True, "orig_iwe": orig,
            "iwe": imgs[0], "backward_iwe": imgs[0],
            "forward_iwe": imgs[1], "middle_iwe": imgs[2],
            "flow": m.reshape((2,) + tuple(spec.patch_image_size)),
        }
        return nan_to_penalty(cost.calculate(arg))

    grad_cost = jax.grad(cost_of, argnums=(0, 1))
    I = images_fn(motion)
    h = 1e-6
    dI = (images_fn(motion + h * p) - images_fn(motion - h * p)) / (2 * h)
    (g1, _), (g2, dgm) = jax.jvp(grad_cost, (I, motion), (dI, p))
    _, vjp_I = jax.vjp(images_fn, motion)
    oracle = vjp_I(g2)[0] + dgm

    hvp = build_objective_banded_hvp(spec, precomputed_orig=True,
                                     gauss_newton=True)
    got = hvp(motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-6, atol=1e-6)

    prep, hvp_staged = build_objective_banded_hvp_staged(
        spec, precomputed_orig=True, gauss_newton=True
    )
    aux = prep(motion, orig, *args)
    got_staged = hvp_staged(aux, motion, p, orig, *args)
    np.testing.assert_allclose(np.asarray(got_staged), np.asarray(got),
                               rtol=1e-12, atol=1e-12)

    with pytest.raises(AssertionError):
        build_objective_banded_hvp(spec, precomputed_orig=True,
                                   gauss_newton=False)
