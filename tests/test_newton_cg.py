"""On-device Newton-CG: exactness on a quadratic, convergence on
Rosenbrock, FD-HVP mode, argument passing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu.solver.newton_cg import build_newton_cg


def test_quadratic_exact():
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((8, 8))
    A = jnp.asarray(Q @ Q.T + 0.5 * np.eye(8))
    b = jnp.asarray(rng.standard_normal(8))
    f = lambda x: 0.5 * x @ A @ x - b @ x
    solve = jax.jit(build_newton_cg(lambda x: f(x), maxiter=25, cg_maxiter=32))
    x, fv, k = solve(jnp.zeros(8))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-8)


@pytest.mark.parametrize("hvp_mode", ["autodiff", "fd"])
def test_rosenbrock(hvp_mode):
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    solve = jax.jit(build_newton_cg(lambda x: rosen(x), maxiter=80, cg_maxiter=50, hvp_mode=hvp_mode))
    x, fv, k = solve(jnp.zeros(6))
    # fd mode uses a problem-scale step tuned for pixel-unit CMax tiles;
    # on Rosenbrock it converges to ~1e-4 rather than machine precision
    tol = 1e-6 if hvp_mode == "autodiff" else 1e-3
    assert float(fv) < tol
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=0.05 if hvp_mode == "fd" else 1e-3)


def test_extra_args_threading():
    target = jnp.asarray([3.0, -2.0, 1.0])
    f = lambda x, t: jnp.sum((x - t) ** 2)
    solve = jax.jit(build_newton_cg(f, maxiter=10, cg_maxiter=10))
    x, fv, k = solve(jnp.zeros(3), target)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-8)


def test_negative_curvature_escape():
    """Start on a concave ridge: the 1-D Newton fallback plus the
    two-sided line search must still descend."""
    f = lambda x: jnp.sum(-jnp.cos(x) + 0.01 * x ** 2)
    solve = jax.jit(build_newton_cg(lambda x: f(x), maxiter=40, cg_maxiter=10))
    x0 = jnp.asarray([3.0, 2.9, 3.1])  # near the top of -cos ridge
    x, fv, k = solve(x0)
    assert float(fv) < float(f(x0)) - 0.5


def test_fd_polish_refines_weak_analytic_curvature():
    """optimizer.fd_polish: K central-FD iterations appended to the
    ANALYTIC solve.  With an hvp_fn that grossly UNDER-estimates
    curvature (the warm-frame GN failure shape: near-zero measured
    curvature -> huge capped steps the line search rejects), the main
    loop stalls short of the optimum; the FD polish must close the
    gap.  With hvp_mode fd, fd_polish is inert."""
    A = jnp.asarray(np.diag([2.0, 6.0, 12.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    x_star = np.linalg.solve(np.asarray(A), np.asarray(b))

    weak_hvp = lambda x, p: 1e-4 * (A @ p)  # GN-style under-curvature

    stall = jax.jit(build_newton_cg(
        lambda x: f(x), maxiter=3, cg_maxiter=8, hvp_mode="analytic",
        hvp_fn=weak_hvp, max_step=0.05,
    ))
    x_s, f_s, k_s = stall(jnp.zeros(3))
    assert np.linalg.norm(np.asarray(x_s) - x_star) > 0.3  # genuinely short

    polished = jax.jit(build_newton_cg(
        lambda x: f(x), maxiter=3, cg_maxiter=8, hvp_mode="analytic",
        hvp_fn=weak_hvp, max_step=0.05, fd_polish=4,
    ))
    x_p, f_p, k_p = polished(jnp.zeros(3))
    assert float(f_p) <= float(f_s)
    np.testing.assert_allclose(np.asarray(x_p), x_star, atol=1e-2)
    assert int(k_p) > int(k_s)

    # inert outside analytic mode: identical program results
    base = jax.jit(build_newton_cg(lambda x: f(x), maxiter=10, cg_maxiter=8,
                                   hvp_mode="fd"))
    same = jax.jit(build_newton_cg(lambda x: f(x), maxiter=10, cg_maxiter=8,
                                   hvp_mode="fd", fd_polish=3))
    xb, fb, kb = base(jnp.zeros(3))
    xs2, fs2, ks2 = same(jnp.zeros(3))
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(xs2))
    assert int(kb) == int(ks2)


def test_lbfgs_quadratic_and_rosenbrock():
    """build_lbfgs (optimizer.device_solver: lbfgs): exact on a quadratic
    in few iterations; converges on Rosenbrock; threads extra args."""
    from event_based_optical_flow_tpu.solver.newton_cg import build_lbfgs

    A = jnp.asarray(np.diag([1.0, 4.0, 9.0, 16.0]))
    b = jnp.asarray([1.0, -2.0, 3.0, -4.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    solve = jax.jit(build_lbfgs(f, maxiter=60, gtol=1e-8))
    x, fv, k = solve(jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(x), np.asarray(b / jnp.diag(A)), atol=1e-5)
    assert int(k) < 60  # converged by gtol, not budget

    ros = lambda x: jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
    solve_r = jax.jit(build_lbfgs(ros, maxiter=200, gtol=1e-6))
    xr, fr, kr = solve_r(jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(xr), 1.0, atol=1e-2)

    ft = lambda x, t: jnp.sum((x - t) ** 2)
    solve_t = jax.jit(build_lbfgs(ft, maxiter=30))
    xt, _, _ = solve_t(jnp.zeros(3), jnp.asarray([3.0, -2.0, 1.0]))
    np.testing.assert_allclose(np.asarray(xt), [3.0, -2.0, 1.0], atol=1e-6)
