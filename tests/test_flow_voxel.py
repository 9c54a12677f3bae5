"""Flow voxel / PDE propagation semantics (mirrors reference
tests/utils/test_flow_utils.py: t0-slice identity, scheme x location
grid, batch invariance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu.flow import voxel as V
from event_based_optical_flow_tpu.flow.metrics import calculate_flow_error_numpy


@pytest.mark.parametrize("scheme", ["upwind", "burgers"])
@pytest.mark.parametrize("loc,t0_index", [("first", 0), ("middle", 3)])
def test_t0_slice_identity(scheme, loc, t0_index):
    flow = jnp.asarray(np.random.uniform(-0.5, 0.5, (2, 10, 12)))
    vox = np.asarray(V.construct_dense_flow_voxel(flow, 6, scheme, loc))
    assert vox.shape == (6, 2, 10, 12)
    np.testing.assert_allclose(vox[t0_index], np.asarray(flow), atol=1e-12)


@pytest.mark.parametrize("scheme", ["upwind", "burgers"])
def test_batch_invariance(scheme):
    flow = np.random.uniform(-0.5, 0.5, (3, 2, 8, 9))
    batched = np.asarray(V.construct_dense_flow_voxel(jnp.asarray(flow), 4, scheme, "middle"))
    for b in range(3):
        single = np.asarray(V.construct_dense_flow_voxel(jnp.asarray(flow[b]), 4, scheme, "middle"))
        np.testing.assert_allclose(batched[b], single, atol=1e-12)


def test_zero_dt_is_identity():
    flow = jnp.asarray(np.random.uniform(-1, 1, (2, 6, 7)))
    np.testing.assert_allclose(np.asarray(V.upwind_step(flow, 0.0)), np.asarray(flow))
    np.testing.assert_allclose(np.asarray(V.burgers_step(flow, 0.0)), np.asarray(flow))


def test_constant_flow_is_stationary():
    """A spatially constant field self-advects into itself."""
    flow = jnp.ones((2, 6, 7)) * 0.4
    for step in (V.upwind_step, V.burgers_step):
        out = np.asarray(step(flow, 0.1))
        np.testing.assert_allclose(out, 0.4, atol=1e-9)


def test_propagate_same_and_bilinear():
    flow = jnp.asarray(np.random.uniform(-1, 1, (2, 6, 7)))
    same = np.asarray(V.propagate_flow_to_voxel(flow, 0.3, "same"))
    np.testing.assert_allclose(same, np.asarray(flow))
    # zero flow advects nowhere: bilinear resample returns the field itself
    zero = jnp.zeros((2, 6, 7)).at[0, 2, 3].set(0.0)
    bl = np.asarray(V.propagate_flow_to_voxel(zero, 0.5, "bilinear"))
    np.testing.assert_allclose(bl, 0.0, atol=1e-12)


def test_propagate_max_picks_dominant():
    flow = np.zeros((2, 5, 5))
    flow[0, 2, 2] = 3.0  # dominant
    out = np.asarray(V.propagate_flow_to_voxel(jnp.asarray(flow), 0.0, "max"))
    assert out[0, 2, 2] == pytest.approx(3.0)


def test_flow_error_zero_for_identical():
    gt = np.random.uniform(1, 2, (1, 2, 8, 9))
    err = calculate_flow_error_numpy(gt, gt)
    assert err["EPE"] == pytest.approx(0.0, abs=1e-9)
    assert err["1PE"] == 0.0
    assert err["AE"] == pytest.approx(0.0, abs=1e-6)


def test_flow_error_respects_event_mask():
    gt = np.ones((1, 2, 8, 9))
    pred = np.copy(gt)
    pred[0, :, 0, 0] = 10.0  # error only at one pixel
    mask = np.ones((1, 1, 8, 9), dtype=bool)
    mask[0, 0, 0, 0] = False  # ... which the mask removes
    err = calculate_flow_error_numpy(gt, pred, event_mask=mask)
    assert err["EPE"] == pytest.approx(0.0, abs=1e-9)
