"""Cost semantics: blur-vs-sharp ordering under each direction, registry
names, required keys, hybrid composition + history (mirrors reference
tests/costs/* strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu import costs
from event_based_optical_flow_tpu.ops.blur import gaussian_blur3


def _sharp_and_blurred():
    rng = np.random.default_rng(0)
    sharp = np.zeros((16, 20))
    sharp[rng.integers(0, 16, 30), rng.integers(0, 20, 30)] = rng.uniform(1, 3, 30)
    blurred = np.asarray(gaussian_blur3(jnp.asarray(sharp), 2.0))
    return jnp.asarray(sharp), jnp.asarray(blurred)


def test_registry_names():
    expected = {
        "image_variance",
        "gradient_magnitude",
        "normalized_image_variance",
        "normalized_gradient_magnitude",
        "multi_focal_normalized_image_variance",
        "multi_focal_normalized_gradient_magnitude",
        "total_variation",
    }
    assert expected <= set(costs.functions.keys())


@pytest.mark.parametrize("name", ["image_variance", "gradient_magnitude"])
def test_sharp_better_than_blurred_minimize(name):
    sharp, blurred = _sharp_and_blurred()
    cost = costs.functions[name](direction="minimize")
    l_sharp = float(cost.calculate({"iwe": sharp, "omit_boundary": True}))
    l_blur = float(cost.calculate({"iwe": blurred, "omit_boundary": True}))
    assert l_sharp < l_blur  # minimize: lower is better = sharper


@pytest.mark.parametrize(
    "name", ["normalized_image_variance", "normalized_gradient_magnitude"]
)
def test_normalized_ratio_below_one_for_sharper(name):
    sharp, blurred = _sharp_and_blurred()
    cost = costs.functions[name](direction="minimize")
    val = float(cost.calculate({"iwe": sharp, "orig_iwe": blurred, "omit_boundary": False}))
    assert val < 1.0  # sharper than original -> ratio < 1


def test_multi_focal_uses_middle_double_weight():
    sharp, blurred = _sharp_and_blurred()
    cost = costs.functions["multi_focal_normalized_image_variance"](direction="minimize")
    arg = {
        "orig_iwe": blurred,
        "forward_iwe": sharp,
        "backward_iwe": sharp,
        "middle_iwe": sharp,
        "omit_boundary": False,
    }
    with_middle = float(cost.calculate(arg))
    arg2 = {k: v for k, v in arg.items() if k != "middle_iwe"}
    without_middle = float(cost.calculate(arg2))
    single = without_middle / 2
    assert with_middle == pytest.approx(without_middle + 2 * single, rel=1e-9)


def test_total_variation_zero_for_constant_flow():
    flow = jnp.ones((2, 10, 12)) * 3.0
    cost = costs.functions["total_variation"](direction="minimize")
    assert float(cost.calculate({"flow": flow, "omit_boundary": True})) == pytest.approx(0.0, abs=1e-9)


def test_direction_validation():
    with pytest.raises(ValueError):
        costs.ImageVariance(direction="bogus")


def test_hybrid_composition_and_history():
    sharp, blurred = _sharp_and_blurred()
    hybrid = costs.HybridCost(
        direction="minimize",
        cost_with_weight={"image_variance": 2.0, "total_variation": 0.5},
        store_history=True,
    )
    assert set(hybrid.required_keys) >= {"iwe", "flow", "omit_boundary"}
    arg = {"iwe": sharp, "flow": jnp.ones((2, 8, 8)), "omit_boundary": True}
    total = float(hybrid.calculate(arg))
    iv = float(costs.ImageVariance(direction="minimize").calculate(arg))
    tv = float(costs.TotalVariation(direction="minimize").calculate(arg))
    assert total == pytest.approx(2.0 * iv + 0.5 * tv, rel=1e-9)

    hist = hybrid.get_history()
    assert len(hist["loss"]) == 1
    assert len(hist["image_variance"]) == 1
    hybrid.clear_history()
    assert hybrid.get_history()["loss"] == []


def test_hybrid_inv_weight():
    sharp, _ = _sharp_and_blurred()
    hybrid = costs.HybridCost(direction="minimize", cost_with_weight={"image_variance": "inv"})
    arg = {"iwe": sharp, "omit_boundary": True}
    iv = float(costs.ImageVariance(direction="minimize").calculate(arg))
    assert float(hybrid.calculate(arg)) == pytest.approx(1.0 / iv, rel=1e-9)


def test_nan_to_penalty_rejects_nan_basins():
    """NaN losses must map to a LARGE value, not 0: the reference's nan->0
    (patch_contrast_base.py:283-287) makes NaN basins attractive to
    argmin sweeps and line searches (documented deviation)."""
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.costs.functional import nan_to_penalty

    assert float(nan_to_penalty(jnp.asarray(jnp.nan))) == 1e10
    assert float(nan_to_penalty(jnp.asarray(3.5))) == 3.5
    # an argmin over candidates must never pick the NaN one
    losses = nan_to_penalty(jnp.asarray([2.0, jnp.nan, 1.5]))
    assert int(jnp.argmin(losses)) == 2
