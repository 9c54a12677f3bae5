"""Host scipy.optimize driving device-compiled objectives.

This replaces the reference's vendored autograd<->scipy bridge
(``src/solver/scipy_autograd/``, ~570 LoC of torch wrapper/packing code):
with jax the bridge is just "call the jitted value_and_grad / HVP and hand
scipy float64 numpy arrays".  The scipy line-search logic runs on host
(negligible — tens of iterations), every objective/gradient/HVP
evaluation is one device execution.

Supported methods match the reference list (ref src/solver/base.py:21-36).
"""

import logging
from typing import Callable, Optional

import numpy as np
import scipy.optimize

logger = logging.getLogger(__name__)

SCIPY_OPTIMIZERS = [
    "Nelder-Mead",
    "Powell",
    "CG",
    "BFGS",
    "Newton-CG",
    "L-BFGS-B",
    "TNC",
    "COBYLA",
    "SLSQP",
    "trust-constr",
    "dogleg",
    "trust-ncg",
    "trust-exact",
    "trust-krylov",
]

_NEEDS_HVP = {"Newton-CG", "trust-ncg", "trust-krylov", "trust-constr"}
_NEEDS_HESS = {"dogleg", "trust-exact"}
_GRAD_FREE = {"Nelder-Mead", "Powell", "COBYLA"}
# Methods whose scipy option set has no "gtol" (the reference passes gtol
# unconditionally, ref src/solver/patch_contrast_mixed.py:150; scipy warns).
_NO_GTOL = {"Nelder-Mead", "Powell", "COBYLA", "SLSQP", "dogleg", "trust-exact"}
# scipy's Newton-CG takes only a step tolerance ("xtol") — translate the
# configured gtol into it rather than dropping the tolerance on the floor.
_GTOL_AS_XTOL = {"Newton-CG"}


def minimize(
    value_and_grad: Callable,
    x0: np.ndarray,
    method: str = "Newton-CG",
    options: Optional[dict] = None,
    hvp: Optional[Callable] = None,
    hess: Optional[Callable] = None,
    bounds=None,
    history_cb: Optional[Callable] = None,
) -> scipy.optimize.OptimizeResult:
    """Minimize a device objective with a scipy method.

    value_and_grad(x) -> (loss, grad[, aux]); hvp(x, p) -> H@p.
    ``history_cb(loss, aux)`` is invoked per objective evaluation to
    record loss history host-side (the reference records it inside the
    cost object; ours is jitted so the bridge does it).
    """
    options = dict(options or {})
    options.pop("eps", None)  # finite-difference step: unused with exact grads
    if method == "L-BFGS-B" and not options.get("disp", False):
        options.pop("disp", None)  # deprecated (scipy 1.18) when merely False
    if method in _NO_GTOL:
        options.pop("gtol", None)
    elif method in _GTOL_AS_XTOL and "gtol" in options:
        gtol = options.pop("gtol")
        if "xtol" not in options:
            options["xtol"] = gtol
            logger.debug("%s: mapped gtol=%g to xtol", method, gtol)
    x0 = np.asarray(x0, dtype=np.float64).reshape(-1)

    def fun(x):
        out = value_and_grad(x)
        if len(out) == 3:
            loss, grad, aux = out
        else:
            (loss, grad), aux = out, None
        loss = float(loss)
        if history_cb is not None:
            history_cb(loss, aux)
        return loss, np.asarray(grad, dtype=np.float64)

    kwargs = {}
    if method in _GRAD_FREE:
        # scipy ignores jac for these; wrap to return loss only
        kwargs["fun"] = lambda x: fun(x)[0]
    else:
        kwargs["fun"] = fun
        kwargs["jac"] = True
    if method in _NEEDS_HVP and hvp is not None:
        kwargs["hessp"] = lambda x, p: np.asarray(hvp(x, p), dtype=np.float64)
    if method in _NEEDS_HESS and hess is not None:
        kwargs["hess"] = lambda x: np.asarray(hess(x), dtype=np.float64)
    if bounds is not None:
        kwargs["bounds"] = bounds

    result = scipy.optimize.minimize(x0=x0, method=method, options=options, **kwargs)
    return result
