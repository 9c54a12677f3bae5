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

# "matmul" | "scatter"
_IWE_BACKEND = os.environ.get("EVFLOW_IWE_BACKEND", "matmul")


def iwe_backend() -> str:
    return _IWE_BACKEND


def set_iwe_backend(backend: str) -> None:
    global _IWE_BACKEND
    if backend not in ("matmul", "scatter"):
        raise ValueError(f"Unknown IWE backend {backend!r}")
    _IWE_BACKEND = backend
