"""L2 objective layer: contrast-maximization cost functions.

Parity targets: reference ``src/costs/*`` — same registry names, same
``direction`` semantics ('minimize' flips signs so lower = better,
'maximize', 'natural'), same ``required_keys`` driving which warped IWEs
the solver assembles (ref costs/base.py:29-77, costs/__init__.py:23-35).

Everything is a pure jax function; the thin class wrappers exist for the
registry / config surface and per-iteration loss history (recorded
host-side by the optimizer bridge, since the math is jit-compiled).
"""

from .functional import (
    gradient_magnitude,
    hybrid_loss,
    image_variance,
    multi_focal_normalized_gradient_magnitude,
    multi_focal_normalized_image_variance,
    normalized_gradient_magnitude,
    normalized_image_variance,
    total_variation,
)
from .registry import (
    CostBase,
    GradientMagnitude,
    HybridCost,
    ImageVariance,
    MultiFocalNormalizedGradientMagnitude,
    MultiFocalNormalizedImageVariance,
    NormalizedGradientMagnitude,
    NormalizedImageVariance,
    TotalVariation,
    functions,
)

__all__ = [
    "CostBase",
    "functions",
    "HybridCost",
    "ImageVariance",
    "GradientMagnitude",
    "NormalizedImageVariance",
    "NormalizedGradientMagnitude",
    "MultiFocalNormalizedImageVariance",
    "MultiFocalNormalizedGradientMagnitude",
    "TotalVariation",
    "image_variance",
    "gradient_magnitude",
    "normalized_image_variance",
    "normalized_gradient_magnitude",
    "multi_focal_normalized_image_variance",
    "multi_focal_normalized_gradient_magnitude",
    "total_variation",
    "hybrid_loss",
]
