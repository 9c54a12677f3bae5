"""First-order optimizer loop (reference torch.optim family -> optax).

Mirrors ``SolverBase.run_torch`` (ref src/solver/base.py:840-881):
n_iter steps at lr 0.05, tracking the best loss seen.  The whole loop
runs on device under ``lax.scan`` — one compiled program instead of
n_iter host round-trips.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def run_first_order(value_and_grad, x0, method: str, opt_config: dict,
                    events_dev, weights_dev, dtype):
    import optax

    from .base import _optax_factory

    lr = float(opt_config.get("lr", 0.05))
    n_iter = int(opt_config["n_iter"])
    tx = _optax_factory(method, lr)

    x0 = jnp.asarray(np.asarray(x0, dtype=np.float64).reshape(-1), dtype)
    opt_state = tx.init(x0)

    def step(carry, _):
        x, state, best_x, best_loss = carry
        loss, grad, _ = value_and_grad(x, events_dev, weights_dev)
        improved = loss < best_loss
        best_x = jnp.where(improved, x, best_x)
        best_loss = jnp.where(improved, loss, best_loss)
        if method == "LBFGS":
            updates, state = tx.update(
                grad, state, x, value=loss, grad=grad,
                value_fn=lambda xx: value_and_grad(xx, events_dev, weights_dev)[0],
            )
        else:
            updates, state = tx.update(grad, state, x)
        x = optax.apply_updates(x, updates)
        return (x, state, best_x, best_loss), loss

    init = (x0, opt_state, x0, jnp.asarray(jnp.inf, dtype))
    (x, _, best_x, best_loss), losses = jax.lax.scan(step, init, None, length=n_iter)
    return np.asarray(best_x, dtype=np.float64), float(best_loss)
