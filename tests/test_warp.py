"""Warp semantics: hand-computed outcomes, dt normalization, directions,
mask invariance (mirrors reference tests/test_warp.py style)."""

import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import ops
from event_based_optical_flow_tpu.types import pad_events


def _events():
    # (x, y, t, p)
    return jnp.asarray(
        [
            [0.0, 0.0, 0.0, 1.0],
            [1.0, 2.0, 0.5, 0.0],
            [2.0, 3.0, 1.0, 1.0],
        ]
    )


def test_reftime_directions():
    ev = _events()
    assert float(ops.calculate_reftime(ev, "first")) == 0.0
    assert float(ops.calculate_reftime(ev, "middle")) == 0.5
    assert float(ops.calculate_reftime(ev, "last")) == 1.0
    assert float(ops.calculate_reftime(ev, "before")) == -1.0
    assert float(ops.calculate_reftime(ev, "after")) == 2.0
    assert float(ops.calculate_reftime(ev, 0.25)) == 0.25


def test_dt_normalization():
    ev = _events()
    dt = ops.calculate_dt(ev, 0.0, normalize_t=True)
    np.testing.assert_allclose(np.asarray(dt), [0.0, 0.5, 1.0])
    dt = ops.calculate_dt(ev, 0.5, normalize_t=False)
    np.testing.assert_allclose(np.asarray(dt), [-0.5, 0.0, 0.5])


def test_warp_2dof_hand_computed():
    ev = _events()
    out = np.asarray(ops.warp_2dof(ev, jnp.asarray([2.0, -4.0]), 0.0, normalize_t=False))
    # x' = x + dt*tx, y' = y + dt*ty, t' = dt
    np.testing.assert_allclose(out[:, 0], [0.0, 2.0, 4.0])
    np.testing.assert_allclose(out[:, 1], [0.0, 0.0, -1.0])
    np.testing.assert_allclose(out[:, 2], [0.0, 0.5, 1.0])
    np.testing.assert_allclose(out[:, 3], np.asarray(ev)[:, 3])


def test_warp_dense_gathers_at_event_pixel():
    ev = _events()
    flow = np.zeros((2, 4, 5))
    flow[0, 1, 2] = 10.0  # only event 1's pixel has flow
    out = np.asarray(
        ops.warp_dense_flow(ev, jnp.asarray(flow), 0.0, (4, 5), normalize_t=False)
    )
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0 - 0.5 * 10.0, 2.0])
    np.testing.assert_allclose(out[:, 1], [0.0, 2.0, 3.0])


def test_warp_voxel_bins_by_time():
    ev = _events()
    voxel = np.zeros((2, 2, 4, 5))
    voxel[0, 0] = 1.0  # first half: flow u=1 everywhere
    voxel[1, 0] = -1.0  # second half: u=-1
    out = np.asarray(
        ops.warp_voxel_flow(ev, jnp.asarray(voxel), 0.0, (4, 5), normalize_t=True)
    )
    # dt normalized: [0, .5, 1]; bins: [0, .5) -> 0, [.5, inf) -> 1
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0 + 0.5, 2.0 + 1.0])


def test_flow_from_2d_translation_sign():
    flow = np.asarray(ops.flow_from_2d_translation(jnp.asarray([3.0, -2.0]), (2, 2)))
    np.testing.assert_allclose(flow[0], -3.0)
    np.testing.assert_allclose(flow[1], 2.0)


def test_masked_padding_invariance():
    ev = np.asarray(_events())
    padded, weights = pad_events(ev, target_n=8)
    warper = ops.Warp((4, 5), normalize_t=True)
    raw = np.asarray(warper.warp_event(jnp.asarray(ev), jnp.asarray([2.0, 1.0]), "2d-translation", "middle"))
    pad = np.asarray(
        warper.warp_event(
            jnp.asarray(padded), jnp.asarray([2.0, 1.0]), "2d-translation", "middle",
            weights=jnp.asarray(weights),
        )
    )
    np.testing.assert_allclose(pad[:3], raw, atol=1e-12)


def test_batched_warp_matches_loop():
    ev = np.random.uniform(0, 3, (2, 20, 4))
    ev[..., 2] = np.sort(ev[..., 2], axis=-1)
    motion = np.asarray([[1.0, 2.0], [3.0, -1.0]])
    warper = ops.Warp((4, 5), normalize_t=True)
    batched = np.asarray(warper.warp_event(jnp.asarray(ev), jnp.asarray(motion), "2d-translation", "first"))
    for b in range(2):
        single = np.asarray(warper.warp_event(jnp.asarray(ev[b]), jnp.asarray(motion[b]), "2d-translation", "first"))
        np.testing.assert_allclose(batched[b], single, atol=1e-12)


def test_streaming_voxel_warp_matches_materialized():
    """warp_voxel_flow_streaming == propagate-then-warp with the one-extra-
    propagation-step semantics of the reference 'optimized' variant."""
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.flow.voxel import burgers_step
    from event_based_optical_flow_tpu.ops.warp import (
        calculate_reftime,
        warp_voxel_flow,
        warp_voxel_flow_streaming,
    )

    H, W = 12, 16
    rng = np.random.default_rng(0)
    n = 300
    ev = np.stack(
        [
            rng.integers(0, H, n).astype(float),
            rng.integers(0, W, n).astype(float),
            np.sort(rng.uniform(0, 1, n)),
            rng.integers(0, 2, n).astype(float),
        ],
        1,
    )
    flow0 = jnp.asarray(rng.uniform(-0.4, 0.4, (2, H, W)))
    ref_time = calculate_reftime(jnp.asarray(ev), "first")
    n_bin = 4
    out = warp_voxel_flow_streaming(
        jnp.asarray(ev), flow0, n_bin, ref_time, (H, W), normalize_t=True
    )
    # materialize the equivalent voxel: bin k = (k+1)-step propagation
    slices = []
    f = flow0
    for _ in range(n_bin):
        f = burgers_step(f, 1.0 / n_bin)
        slices.append(f)
    voxel = jnp.stack(slices)
    want = warp_voxel_flow(jnp.asarray(ev), voxel, ref_time, (H, W), normalize_t=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-10)


def test_flow_from_rotation_matches_exact_ray_rotation():
    """The "3-rotation" analytic field (ops/warp.flow_from_rotation) must
    be the small-motion limit of the exact calibrated ray rotation used
    by the synthetic rot3d scene (data/synthetic._rotate_pixels): the
    same geometry generates the GT and parameterizes the solver."""
    from event_based_optical_flow_tpu.data.synthetic import SyntheticDataLoader
    from event_based_optical_flow_tpu.ops.warp import calib_tuple, flow_from_rotation

    H, W = 30, 40
    omega = np.array([0.3, -0.2, 0.7])
    loader = SyntheticDataLoader(
        config={"height": H, "width": W, "scene": "rot3d", "omega3": omega.tolist()}
    )
    calib = calib_tuple((H, W), loader.load_calib())
    flow = np.asarray(flow_from_rotation(jnp.asarray(omega, jnp.float64), (H, W), calib))

    rows = np.broadcast_to(np.arange(H, dtype=np.float64)[:, None], (H, W)).ravel()
    cols = np.broadcast_to(np.arange(W, dtype=np.float64)[None, :], (H, W)).ravel()
    dt = 1e-6
    x2, y2 = loader._rotate_pixels(rows, cols, dt)
    g_row = ((x2 - rows) / dt).reshape(H, W)
    g_col = ((y2 - cols) / dt).reshape(H, W)
    # events advect with +g; the dense flow is -g (model convention)
    np.testing.assert_allclose(flow[0], -g_row, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(flow[1], -g_col, atol=1e-4, rtol=1e-4)
