"""Cost registry with the reference's class/config surface.

Same names, ``direction`` semantics, ``required_keys`` and history API as
reference ``src/costs`` (base.py:11-77, __init__.py:23-35) — including the
reference's direction quirks (e.g. TotalVariation returns -loss for
'natural', multi-focal 'natural' sums inverted ratios) so behavior under
any config is reproducible.  The math itself lives in functional.py.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from . import functional as F


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


class CostBase:
    required_keys: List[str] = []
    name = "base"

    def __init__(self, direction: str = "minimize", store_history: bool = False, *args, **kwargs):
        if direction not in ("minimize", "maximize", "natural"):
            raise ValueError(f"direction should be minimize/maximize/natural, got {direction}")
        self.direction = direction
        self.store_history = store_history
        self.clear_history()

    # History (host-side; skipped for traced values under jit)
    def clear_history(self) -> None:
        self.history: Dict[str, list] = {"loss": []}

    def get_history(self) -> dict:
        return self.history.copy()

    def enable_history_register(self) -> None:
        self.store_history = True

    def disable_history_register(self) -> None:
        self.store_history = False

    def register(self, loss):
        if self.store_history and not _is_tracer(loss):
            self.history["loss"].append(float(loss))
        return loss

    def calculate(self, arg: dict):
        raise NotImplementedError


class ImageVariance(CostBase):
    """(ref costs/image_variance.py:12-71)"""

    name = "image_variance"
    required_keys = ["iwe", "omit_boundary"]

    def calculate(self, arg: dict):
        loss = F.image_variance(arg["iwe"], arg["omit_boundary"])
        if self.direction == "minimize":
            loss = -loss
        return self.register(loss)


class GradientMagnitude(CostBase):
    """(ref costs/gradient_magnitude.py:14-95)"""

    name = "gradient_magnitude"
    required_keys = ["iwe", "omit_boundary"]

    def calculate(self, arg: dict):
        loss = F.gradient_magnitude(arg["iwe"], arg["omit_boundary"])
        if self.direction == "minimize":
            loss = -loss
        return self.register(loss)


class NormalizedImageVariance(CostBase):
    """(ref costs/normalized_image_variance.py:12-79)"""

    name = "normalized_image_variance"
    required_keys = ["orig_iwe", "iwe", "omit_boundary"]

    def calculate(self, arg: dict):
        ratio = F.normalized_image_variance(arg["iwe"], arg["orig_iwe"], arg["omit_boundary"])
        loss = 1.0 / ratio if self.direction == "minimize" else ratio
        return self.register(loss)


class NormalizedGradientMagnitude(CostBase):
    """(ref costs/normalized_gradient_magnitude.py:12-94)"""

    name = "normalized_gradient_magnitude"
    required_keys = ["orig_iwe", "iwe", "omit_boundary"]

    def calculate(self, arg: dict):
        ratio = F.normalized_gradient_magnitude(arg["iwe"], arg["orig_iwe"], arg["omit_boundary"])
        loss = 1.0 / ratio if self.direction == "minimize" else ratio
        return self.register(loss)


class MultiFocalNormalizedImageVariance(CostBase):
    """(ref costs/multi_focal_normalized_image_variance.py:13-120)"""

    name = "multi_focal_normalized_image_variance"
    required_keys = ["forward_iwe", "backward_iwe", "middle_iwe", "omit_boundary", "orig_iwe"]

    def calculate(self, arg: dict):
        middle = arg.get("middle_iwe", None)
        if self.direction == "minimize" or self.direction == "maximize":
            loss = F.multi_focal_normalized_image_variance(
                arg["orig_iwe"], arg["forward_iwe"], arg["backward_iwe"], middle, arg["omit_boundary"]
            )
            if self.direction == "maximize":
                loss = -loss
        else:  # 'natural' sums the per-warp natural ratios (reference quirk)
            omit = arg["omit_boundary"]
            loss = F.normalized_image_variance(arg["forward_iwe"], arg["orig_iwe"], omit)
            loss = loss + F.normalized_image_variance(arg["backward_iwe"], arg["orig_iwe"], omit)
            if middle is not None:
                loss = loss + 2.0 * F.normalized_image_variance(middle, arg["orig_iwe"], omit)
        return self.register(loss)


class MultiFocalNormalizedGradientMagnitude(CostBase):
    """Cost used by both shipped reference configs
    (ref costs/multi_focal_normalized_gradient_magnitude.py:13-131)."""

    name = "multi_focal_normalized_gradient_magnitude"
    required_keys = ["forward_iwe", "backward_iwe", "middle_iwe", "omit_boundary", "orig_iwe"]

    def calculate(self, arg: dict):
        middle = arg.get("middle_iwe", None)
        if self.direction in ("minimize", "maximize"):
            loss = F.multi_focal_normalized_gradient_magnitude(
                arg["orig_iwe"], arg["forward_iwe"], arg["backward_iwe"], middle, arg["omit_boundary"]
            )
            if self.direction == "maximize":
                loss = -loss
        else:
            omit = arg["omit_boundary"]
            loss = F.normalized_gradient_magnitude(arg["forward_iwe"], arg["orig_iwe"], omit)
            loss = loss + F.normalized_gradient_magnitude(arg["backward_iwe"], arg["orig_iwe"], omit)
            if middle is not None:
                loss = loss + 2.0 * F.normalized_gradient_magnitude(middle, arg["orig_iwe"], omit)
        return self.register(loss)


class TotalVariation(CostBase):
    """(ref costs/total_variation.py:14-151)"""

    name = "total_variation"
    required_keys = ["flow", "omit_boundary"]

    def calculate(self, arg: dict):
        flow = arg["flow"]
        if not isinstance(flow, jax.core.Tracer):
            flow = jnp.asarray(flow)
        loss = F.total_variation(flow, arg["omit_boundary"])
        if self.direction != "minimize":  # reference returns -loss otherwise
            loss = -loss
        return self.register(loss)


functions = {
    k.name: k
    for k in (
        ImageVariance,
        GradientMagnitude,
        NormalizedImageVariance,
        NormalizedGradientMagnitude,
        MultiFocalNormalizedImageVariance,
        MultiFocalNormalizedGradientMagnitude,
        TotalVariation,
    )
}


class HybridCost(CostBase):
    """Weighted composition over named costs, weight "inv" => 1/loss
    (ref costs/hybrid.py:12-79)."""

    name = "hybrid"

    def __init__(self, direction: str, cost_with_weight: dict, store_history: bool = False, *args, **kwargs):
        self.cost_func = {
            key: {
                "func": functions[key](direction=direction, store_history=store_history),
                "weight": value,
            }
            for key, value in cost_with_weight.items()
        }
        super().__init__(direction=direction, store_history=store_history)
        self.required_keys = []
        for name in self.cost_func:
            self.required_keys.extend(self.cost_func[name]["func"].required_keys)

    def update_weight(self, cost_with_weight: dict) -> None:
        assert set(self.cost_func.keys()) == set(cost_with_weight.keys())
        for key, value in cost_with_weight.items():
            self.cost_func[key]["weight"] = value

    def calculate(self, arg: dict):
        loss = 0.0
        for name, entry in self.cost_func.items():
            sub = entry["func"].calculate(arg)
            if entry["weight"] == "inv":
                loss = loss + 1.0 / sub
            else:
                loss = loss + entry["weight"] * sub
        return self.register(loss)

    def calculate_with_components(self, arg: dict):
        """Return (total, {name: unweighted sub-loss}) for history/aux."""
        components = {}
        loss = 0.0
        for name, entry in self.cost_func.items():
            sub = entry["func"].calculate(arg)
            components[name] = sub
            if entry["weight"] == "inv":
                loss = loss + 1.0 / sub
            else:
                loss = loss + entry["weight"] * sub
        return loss, components

    # hybrid history fans out to sub-costs (ref hybrid.py:60-79)
    def clear_history(self) -> None:
        self.history = {"loss": []}
        for name in getattr(self, "cost_func", {}):
            self.cost_func[name]["func"].clear_history()

    def get_history(self) -> dict:
        dic = self.history.copy()
        for name in self.cost_func:
            dic[name] = self.cost_func[name]["func"].get_history()["loss"]
        return dic

    def enable_history_register(self) -> None:
        self.store_history = True
        for name in self.cost_func:
            self.cost_func[name]["func"].store_history = True

    def disable_history_register(self) -> None:
        self.store_history = False
        for name in self.cost_func:
            self.cost_func[name]["func"].store_history = False
