"""Global configuration knobs for the framework.

The reference keeps dual numpy/torch code paths; we instead keep one JAX
path with switchable numerics:

* ``iwe_backend``: "matmul" (MXU-friendly hat-function rasterization,
  default) or "scatter" (exact reference semantics including the
  floor(+eps) corner masking; used by parity tests and as the
  gradient-exact path).
* default dtype: follows the inputs.  Tests enable float64 on CPU for
  oracle parity; production on TPU runs float32.
"""

import os

# "auto" | "matmul" | "scatter" | "pallas" | "pallas_bf16"
_IWE_BACKEND = os.environ.get("EVFLOW_IWE_BACKEND", "auto")
_VALID_BACKENDS = ("auto", "matmul", "scatter", "pallas", "pallas_bf16")


def iwe_backend() -> str:
    """Resolve the backend for standalone bilinear_vote calls.  'auto'
    resolves to the XLA matmul form (safe under arbitrary vmap nesting);
    the *fused* Pallas objective kernel is selected separately by the
    solver (see raw_iwe_backend / solver.objective.build_objective)."""
    if _IWE_BACKEND == "auto":
        return "matmul"
    return _IWE_BACKEND


def raw_iwe_backend() -> str:
    return _IWE_BACKEND


def set_iwe_backend(backend: str) -> None:
    global _IWE_BACKEND
    if backend not in _VALID_BACKENDS:
        raise ValueError(f"Unknown IWE backend {backend!r}; valid: {_VALID_BACKENDS}")
    _IWE_BACKEND = backend
