"""Hand-computed IWE semantics (mirrors reference
tests/test_event_image_converter.py style: integer, fractional, batched,
out-of-bounds, plus our weight-mask/padding invariance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import ops
from event_based_optical_flow_tpu.types import pad_events


@pytest.mark.parametrize("backend", ["scatter", "matmul"])
def test_integer_coords_one_vote(backend):
    events = jnp.asarray([[1.0, 2.0, 0.0, 1.0]])
    iwe = np.asarray(ops.bilinear_vote(events, (4, 5), backend=backend))
    expected = np.zeros((4, 5))
    expected[1, 2] = 1.0
    np.testing.assert_allclose(iwe, expected, atol=1e-12)


@pytest.mark.parametrize("backend", ["scatter", "matmul"])
def test_fractional_coords_split_vote(backend):
    events = jnp.asarray([[1.25, 2.5, 0.0, 1.0]])
    iwe = np.asarray(ops.bilinear_vote(events, (4, 5), backend=backend))
    expected = np.zeros((4, 5))
    expected[1, 2] = 0.75 * 0.5
    expected[1, 3] = 0.75 * 0.5
    expected[2, 2] = 0.25 * 0.5
    expected[2, 3] = 0.25 * 0.5
    np.testing.assert_allclose(iwe, expected, atol=1e-12)


@pytest.mark.parametrize("backend", ["scatter", "matmul"])
def test_out_of_bounds_partial(backend):
    # x = -0.5: half the vote falls on row 0, half is outside and dropped
    events = jnp.asarray([[-0.5, 2.0, 0.0, 1.0]])
    iwe = np.asarray(ops.bilinear_vote(events, (4, 5), backend=backend))
    expected = np.zeros((4, 5))
    expected[0, 2] = 0.5
    np.testing.assert_allclose(iwe, expected, atol=1e-12)
    # fully outside -> empty image
    events = jnp.asarray([[-5.0, 2.0, 0.0, 1.0], [1.0, 99.0, 0.0, 1.0]])
    iwe = np.asarray(ops.bilinear_vote(events, (4, 5), backend=backend))
    np.testing.assert_allclose(iwe, 0.0, atol=1e-12)


@pytest.mark.parametrize("backend", ["scatter", "matmul"])
def test_batched_matches_loop(backend):
    events = jnp.asarray(np.random.uniform(0, 3, (3, 50, 4)))
    batched = np.asarray(ops.bilinear_vote(events, (4, 5), backend=backend))
    for b in range(3):
        single = np.asarray(ops.bilinear_vote(events[b], (4, 5), backend=backend))
        np.testing.assert_allclose(batched[b], single, atol=1e-12)


@pytest.mark.parametrize("backend", ["scatter", "matmul"])
def test_weight_mask_padding_invariance(backend):
    """Padded events with zero weight must not change the IWE."""
    ev = np.random.uniform(0, 3.5, (37, 4))
    ev[:, 2] = np.sort(ev[:, 2])
    padded, weights = pad_events(ev, target_n=64)
    iwe_raw = np.asarray(ops.bilinear_vote(jnp.asarray(ev), (5, 6), backend=backend))
    iwe_pad = np.asarray(
        ops.bilinear_vote(jnp.asarray(padded), (5, 6), weight=jnp.asarray(weights), backend=backend)
    )
    np.testing.assert_allclose(iwe_pad, iwe_raw, atol=1e-12)


def test_event_mask():
    events = jnp.asarray([[1.0, 2.0, 0.0, 1.0], [3.0, 0.0, 0.1, 0.0]])
    mask = np.asarray(ops.event_mask(events, (4, 5)))
    assert mask.shape == (1, 4, 5)
    assert mask[0, 1, 2] and mask[0, 3, 0]
    assert mask.sum() == 2


def test_backends_agree_on_random_batch():
    ev = np.random.uniform(-1, 8, (200, 4))
    a = np.asarray(ops.bilinear_vote(jnp.asarray(ev), (8, 9), backend="scatter"))
    b = np.asarray(ops.bilinear_vote(jnp.asarray(ev), (8, 9), backend="matmul"))
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_polarity_method():
    from event_based_optical_flow_tpu.ops.iwe import EventImageConverter

    eic = EventImageConverter((4, 5))
    events = jnp.asarray([[1.0, 2.0, 0.0, 1.0], [2.0, 3.0, 0.1, 0.0]])
    img = np.asarray(eic.create_iwe(events, method="polarity", sigma=0))
    assert img.shape == (2, 4, 5)
    assert img[0, 1, 2] == 1.0 and img[1, 2, 3] == 1.0
