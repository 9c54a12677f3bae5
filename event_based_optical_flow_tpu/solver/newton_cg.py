"""On-device truncated Newton (Newton-CG) under ``lax.while_loop``.

The reference drives Newton-CG from host scipy, which costs one
host<->device round trip per objective/gradient/HVP evaluation — O(100)
per pyramid scale.  This implementation runs the entire solve (outer
Newton loop, inner CG solve of H p = -g with negative-curvature exit,
Armijo backtracking line search) as ONE jit-compiled device program:
zero host traffic until the result.

Algorithmic shape follows scipy's ``_minimize_newtoncg``: inner CG
terminates at eta = min(0.5, sqrt(|g|)) * |g| (superlinear forcing
sequence) or on negative curvature (falling back to the steepest-descent
direction on the first CG step); the line search is Armijo backtracking
rather than scipy's Wolfe search — same fixed points, slightly different
step acceptance; accuracy parity is asserted by the solver tests.
"""

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

# finite-difference HVP step in parameter units (see build_newton_cg)
_FD_EPS_SCALE = 0.1


def _line_search(value_fn, x, f0, g, p, args, ls_maxiter, armijo_c1):
    """Two-sided backtracking: at each level try x +- alpha*p and accept
    the first strict improvement (largest such alpha).

    CMax landscapes are non-convex washboards, and in negative-curvature
    regions the search direction's *sign* is unreliable (scipy's Wolfe
    search escapes the same situation only through its negative
    initial-step heuristic); probing both signs with a
    sufficient-decrease margin is the robust equivalent and costs two
    objective evaluations per level."""
    gtp_abs = jnp.abs(jnp.vdot(g, p))

    def cond(state):
        alpha, f_best, i = state
        return (f_best >= f0 - armijo_c1 * jnp.abs(alpha) * gtp_abs) & (i < ls_maxiter)

    def body(state):
        alpha, _, i = state
        alpha = jnp.where(i == 0, alpha, alpha * 0.5)
        f_plus = value_fn(x + alpha * p, *args)
        f_minus = value_fn(x - alpha * p, *args)
        take_minus = f_minus < f_plus
        f_best = jnp.where(take_minus, f_minus, f_plus)
        alpha_signed = jnp.where(take_minus, -alpha, alpha)
        return (alpha_signed, f_best, i + 1)

    def body_abs(state):
        alpha, f_best, i = state
        return body((jnp.abs(alpha), f_best, i))

    init = (jnp.asarray(1.0, x.dtype), jnp.asarray(jnp.inf, x.dtype), 0)
    alpha, f_new, i = jax.lax.while_loop(cond, body_abs, init)
    ok = f_new < f0 - armijo_c1 * jnp.abs(alpha) * gtp_abs
    return jnp.where(ok, alpha, 0.0), jnp.where(ok, f_new, f0)


def _escape_probe(value_fn, x, f0, p, args):
    """Outward two-sided exponential search along p-hat when the
    backtracking search failed: CMax plateaus can hide the descent basin
    several pixels away (scipy reaches it only via its
    negative-initial-step quirk).  Returns a signed step length (in
    p-hat units) or 0."""
    p_hat = p / (jnp.linalg.norm(p) + 1e-12)

    def cond(state):
        mag, best_a, best_f, i = state
        return (best_f >= f0) & (i < 9)

    def body(state):
        mag, best_a, best_f, i = state
        f_plus = value_fn(x + mag * p_hat, *args)
        f_minus = value_fn(x - mag * p_hat, *args)
        take_minus = f_minus < f_plus
        f_cand = jnp.where(take_minus, f_minus, f_plus)
        a_cand = jnp.where(take_minus, -mag, mag)
        better = f_cand < best_f
        return (
            mag * 2.0,
            jnp.where(better, a_cand, best_a),
            jnp.where(better, f_cand, best_f),
            i + 1,
        )

    init = (jnp.asarray(1.0, x.dtype), jnp.asarray(0.0, x.dtype), f0, 0)
    _, a, f_new, _ = jax.lax.while_loop(cond, body, init)
    ok = f_new < f0
    return jnp.where(ok, a, 0.0), p_hat


def build_newton_cg(
    value_fn: Callable,
    maxiter: int = 25,
    cg_maxiter: int = 20,
    xtol: float = 1e-5,
    gtol: float = 1e-5,
    ls_maxiter: int = 16,
    armijo_c1: float = 1e-4,
    hvp_mode: str = "autodiff",
    fd_central: bool = True,
    hvp_fn=None,
    hvp_prep_fn=None,
    max_step=None,
    fd_polish: int = 0,
):
    """Return solve(x0, *args) -> (x_best, f_best, n_iters).

    ``fd_polish`` (analytic mode only): append up to K central-FD Newton
    iterations from the analytic solve's best iterate — local
    refinement with the curvature model that still resolves the
    washboard's floor-crossing structure (no step cap, no escape
    probe).  The round-5 candidate fix for the warm-frame GN freeze
    (see BENCHMARKS.md hvp-divergence study).

    value_fn(x, *args) -> scalar loss (pure, jit-able).
    hvp_mode: "autodiff" (grad-of-gradient), "fd" (difference of
    gradients — the fallback when the objective contains custom_vjp
    Pallas kernels, whose backward is not itself differentiable;
    truncated Newton is robust to the approximation), or "analytic"
    (``hvp_fn(x, p, *args) -> H @ p`` supplied by the caller — the v10
    fused-kernel second-order path,
    solver.objective.build_objective_banded_hvp: exact a.e. and ~1.3
    evaluation-equivalents per HVP vs central FD's 2).  ``fd_central``
    (DEFAULT for fd) uses central differences — 2 fresh gradients per
    HVP vs 1 for the one-sided form; measured: one-sided Hessian noise
    on low-contrast (clutter) scenes misroutes the coarse-to-fine
    trajectory (EPE 1.90 vs 0.99 on the 30%-clutter family) while
    central restores full reference parity at ~1.7x solve wall clock.
    Opt out with ``optimizer.hvp_central: false`` for maximum speed on
    clean data.

    ``max_step``: per-iteration trust safeguard — the Newton direction is
    rescaled so no component exceeds ``max_step`` (parameter units, e.g.
    px/s for CMax tiles).  Required with the analytic HVPs: the a.e.
    vote Hessian (and its Gauss-Newton part) measures 3-4x LESS
    curvature than the washboard envelope (the delta curvature at floor
    crossings is invisible to it), so uncapped Newton steps overshoot
    into far basins that the two-sided line search happily accepts
    (measured cold-start misconvergence at MVSEC protocol scale; capped
    steps cannot leap ridges).
    """
    assert hvp_mode != "analytic" or hvp_fn is not None
    assert hvp_prep_fn is None or hvp_mode == "analytic"

    def value_grad(x, args):
        return jax.value_and_grad(lambda xx: value_fn(xx, *args))(x)

    def hvp(x, p, args, g0=None, aux=None, mode=None):
        mode = hvp_mode if mode is None else mode
        if mode == "analytic":
            # staged (build_objective_banded_hvp_staged): ``aux`` holds the
            # CG-solve-invariant value images computed once by hvp_prep_fn
            if hvp_prep_fn is not None:
                return hvp_fn(aux, x, p, *args)
            return hvp_fn(x, p, *args)
        if mode in ("fd", "fd-central"):
            # step ~fd_step in parameter units (pixels for CMax tiles):
            # the objective is piecewise-smooth in sub-pixel structure, so
            # a pixel-scale difference measures the useful curvature and
            # avoids cancellation at flat starts.  "fd-central" (the
            # polish loop) forces central differences regardless of the
            # hvp_central speed knob — the fd_polish gate evidence is
            # central-only, and the one-sided form's Hessian noise is the
            # round-2 misrouting finding.
            p_norm = jnp.linalg.norm(p) + 1e-12
            eps = jnp.asarray(_FD_EPS_SCALE, x.dtype) * (1.0 + 1e-3 * jnp.linalg.norm(x)) / p_norm
            g_plus = jax.grad(lambda m: value_fn(m, *args))(x + eps * p)
            if fd_central or mode == "fd-central":
                g0 = None
            if g0 is not None:
                # one-sided difference against the iterate's gradient:
                # one fresh gradient per HVP instead of two (truncated
                # Newton tolerates the O(eps) Hessian error)
                return (g_plus - g0) / eps
            g_minus = jax.grad(lambda m: value_fn(m, *args))(x - eps * p)
            return (g_plus - g_minus) / (2.0 * eps)

        def gdotp(xx):
            g = jax.grad(lambda m: value_fn(m, *args))(xx)
            return jnp.vdot(g, p)

        return jax.grad(gdotp)(x)

    def cg_solve(x, g, args, mode=None):
        """Truncated CG on H p = -g (scipy forcing sequence + negative
        curvature handling)."""
        mode = hvp_mode if mode is None else mode
        g_norm = jnp.linalg.norm(g)
        eta = jnp.minimum(0.5, jnp.sqrt(g_norm)) * g_norm
        # the staged analytic path hoists the x-dependent (p-independent)
        # value images out of the CG loop: one forward vote here instead
        # of one per HVP
        aux = (
            hvp_prep_fn(x, *args)
            if hvp_prep_fn is not None and mode == "analytic" else None
        )

        def cond(state):
            i, r, d, p, done = state
            return (~done) & (i < cg_maxiter) & (jnp.linalg.norm(r) > eta)

        def body(state):
            i, r, d, p, done = state
            hd = hvp(x, d, args, g0=g, aux=aux, mode=mode)
            curv = jnp.vdot(d, hd)
            rs = jnp.vdot(r, r)
            neg_curv = curv <= 1e-16 * jnp.vdot(d, d)
            # scipy semantics (scipy _minimize_newtoncg): on non-positive
            # curvature, at i==0 take the 1-D Newton step (rs/curv)*d —
            # which points along +g in concave regions — else keep the
            # accumulated p.
            p_fallback = jnp.where(i == 0, (rs / jnp.where(curv == 0, 1.0, curv)) * d, p)
            alpha = rs / jnp.where(neg_curv, 1.0, curv)
            p_new = p + alpha * d
            r_new = r + alpha * hd
            beta = jnp.vdot(r_new, r_new) / rs
            d_new = -r_new + beta * d
            p_out = jnp.where(neg_curv, p_fallback, p_new)
            return (i + 1, r_new, d_new, p_out, done | neg_curv)

        r0 = g
        d0 = -g
        p0 = jnp.zeros_like(g)
        _, _, _, p, _ = jax.lax.while_loop(cond, body, (0, r0, d0, p0, False))
        # if CG produced nothing (eta met immediately), use steepest descent
        p = jnp.where(jnp.vdot(p, p) > 0, p, -g)
        return p

    def line_search(x, f0, g, p, args):
        return _line_search(value_fn, x, f0, g, p, args, ls_maxiter, armijo_c1)

    def escape_probe(x, f0, p, args):
        return _escape_probe(value_fn, x, f0, p, args)

    def make_body(mode, cap, args, escape=True):
        """Newton outer-iteration body for one curvature model; ``cap``
        applies the per-component step clip, ``escape`` arms the
        plateau-escape probe (off for the FD polish loop: polish is pure
        local refinement and must not jump basins)."""

        def body(state):
            x, f, g, k, done, best_x, best_f = state
            p = cg_solve(x, g, args, mode=mode)
            if cap is not None:
                # per-COMPONENT clip, not a global inf-norm rescale: on
                # spatially-varying motion fields (rot/zoom) one tile's
                # large update would otherwise crush every other tile's
                # step to near zero (measured: the rescale cost +13% EPE
                # on the rot family at DSEC geometry; clipping restores
                # parity — BENCHMARKS.md gate table)
                ms = jnp.asarray(cap, x.dtype)
                p = jnp.clip(p, -ms, ms)
            alpha, f_new = line_search(x, f, g, p, args)
            # plateau escape: outward probe when backtracking failed OR the
            # first iteration only found a negligible decrease — flat/zero
            # inits can sit near a stationary point whose basin is several
            # pixels away; a barely-Armijo-accepted micro-step would
            # otherwise stall the whole solve (with one-sided FD-HVPs the
            # Hessian noise sometimes stumbled off such plateaus by luck;
            # central differences exposed the latent stall)
            trigger = (alpha == 0.0) | (
                (k == 0) & (f - f_new <= 1e-6 * (1.0 + jnp.abs(f)))
            )
            if not escape:
                trigger = jnp.asarray(False)
            a_esc, p_hat = jax.lax.cond(
                trigger,
                lambda: escape_probe(x, f, p, args),
                lambda: (jnp.asarray(0.0, x.dtype), p),
            )
            use_esc = trigger & (a_esc != 0.0)
            step_esc = a_esc * p_hat
            alpha = jnp.where(use_esc, 1.0, alpha)
            step = jnp.where(use_esc, step_esc, alpha * p)
            x_new = x + step
            f_new2, g_new = value_grad(x_new, args)
            improved = f_new2 < best_f
            best_x = jnp.where(improved, x_new, best_x)
            best_f = jnp.where(improved, f_new2, best_f)
            small_step = jnp.sum(jnp.abs(step)) <= xtol
            small_grad = jnp.linalg.norm(g_new, ord=jnp.inf) <= gtol
            return (x_new, f_new2, g_new, k + 1, small_step | small_grad | (alpha == 0.0), best_x, best_f)

        return body

    def solve(x0, *args):
        f0, g0 = value_grad(x0, args)

        def cond(state):
            x, f, g, k, done, best_x, best_f = state
            return (~done) & (k < maxiter)

        x, f, g, k, done, best_x, best_f = jax.lax.while_loop(
            cond, make_body(None, max_step, args), (x0, f0, g0, 0, False, x0, f0)
        )
        if fd_polish > 0 and hvp_mode == "analytic":
            # bounded central-FD refinement from the analytic solve's best
            # iterate: the GN a.e. curvature can read ~zero at warm
            # near-stationary points (the washboard's floor-crossing delta
            # curvature is invisible to it) and freeze before the final
            # sub-pixel polish that central differences still resolve —
            # the round-5 candidate fix for the DSEC warm-frame
            # rot/sparse cost (BENCHMARKS.md).  No step cap (FD-arm
            # semantics), no plateau-escape probe (local only).
            fb, gb = value_grad(best_x, args)

            def cond_pol(state):
                x_, f_, g_, k_, done_, bx_, bf_ = state
                return (~done_) & (k_ < fd_polish)

            _, _, _, k2, _, best_x, best_f = jax.lax.while_loop(
                cond_pol, make_body("fd-central", None, args, escape=False),
                (best_x, fb, gb, 0, False, best_x, fb),
            )
            k = k + k2
        return best_x, best_f, k

    return solve


def build_lbfgs(
    value_fn: Callable,
    maxiter: int = 100,
    gtol: float = 1e-5,
    xtol: float = 1e-5,
    memory: int = 8,
    ls_maxiter: int = 16,
    armijo_c1: float = 1e-4,
):
    """On-device L-BFGS with the SAME washboard-tuned machinery as
    build_newton_cg (two-sided Armijo backtracking, plateau-escape
    probe, best-iterate tracking).  Same contract:
    solve(x0, *args) -> (best_x, best_f, n_iters).

    Why it exists: each truncated-Newton iteration costs 1 gradient +
    cg_maxiter HVPs (2 gradients each with central differences) + a line
    search — ~20 objective-gradient evaluations at the DSEC config.  An
    L-BFGS iteration costs ONE fresh gradient + the line search, so at
    very large event counts (DSEC: 300k events -> 3.3 ms/eval) many
    cheap iterations can beat few expensive ones
    (``optimizer.device_solver: lbfgs``; budget via ``max_iter``, which
    counts L-BFGS iterations — expect to need ~2-4x the Newton value).

    The two-loop recursion runs over a static ``memory``-slot circular
    buffer (jit-friendly); pairs with non-positive curvature s.y are
    skipped (standard safeguard — keeps the implicit Hessian SPD).
    """
    m = int(memory)

    def value_grad(x, args):
        return jax.value_and_grad(lambda xx: value_fn(xx, *args))(x)

    def direction(g, S, Y, rho, nk):
        """-H.g via the two-loop recursion; age j = 0 (newest) .. m-1,
        slot (nk-1-j) mod m, valid while nk-1-j >= 0."""

        def bwd(j, carry):
            q, al = carry
            idx = (nk - 1 - j) % m
            valid = (nk - 1 - j) >= 0
            a = jnp.where(valid, rho[idx] * jnp.vdot(S[idx], q), 0.0)
            return q - a * Y[idx], al.at[j].set(a)

        q, al = jax.lax.fori_loop(
            0, m, bwd, (g, jnp.zeros((m,), g.dtype))
        )
        idx0 = (nk - 1) % m
        ys = jnp.vdot(S[idx0], Y[idx0])
        yy = jnp.vdot(Y[idx0], Y[idx0])
        gamma = jnp.where(nk > 0, ys / jnp.where(yy > 0, yy, 1.0), 1.0)
        r = gamma * q

        def fwd(j, r):
            jj = m - 1 - j  # oldest first
            idx = (nk - 1 - jj) % m
            valid = (nk - 1 - jj) >= 0
            b = jnp.where(valid, rho[idx] * jnp.vdot(Y[idx], r), 0.0)
            return r + jnp.where(valid, al[jj] - b, 0.0) * S[idx]

        r = jax.lax.fori_loop(0, m, fwd, r)
        return -r

    def solve(x0, *args):
        f0, g0 = value_grad(x0, args)
        n = x0.shape[0]
        S0 = jnp.zeros((m, n), x0.dtype)
        Y0 = jnp.zeros((m, n), x0.dtype)
        rho0 = jnp.zeros((m,), x0.dtype)

        def cond(state):
            x, f, g, S, Y, rho, nk, k, done, best_x, best_f = state
            return (~done) & (k < maxiter)

        def body(state):
            x, f, g, S, Y, rho, nk, k, done, best_x, best_f = state
            p = direction(g, S, Y, rho, nk)
            alpha, f_new = _line_search(
                value_fn, x, f, g, p, args, ls_maxiter, armijo_c1
            )
            # plateau escape mirrors build_newton_cg: probe outward when
            # backtracking failed, or the first iteration found only a
            # negligible decrease (flat/zero inits near a stationary
            # point whose basin is several pixels away)
            trigger = (alpha == 0.0) | (
                (k == 0) & (f - f_new <= 1e-6 * (1.0 + jnp.abs(f)))
            )
            a_esc, p_hat = jax.lax.cond(
                trigger,
                lambda: _escape_probe(value_fn, x, f, p, args),
                lambda: (jnp.asarray(0.0, x.dtype), p),
            )
            use_esc = trigger & (a_esc != 0.0)
            step = jnp.where(use_esc, a_esc * p_hat, alpha * p)
            alpha = jnp.where(use_esc, 1.0, alpha)
            x_new = x + step
            f_new2, g_new = value_grad(x_new, args)
            improved = f_new2 < best_f
            best_x = jnp.where(improved, x_new, best_x)
            best_f = jnp.where(improved, f_new2, best_f)
            # curvature-safeguarded pair update
            s = step
            y = g_new - g
            sy = jnp.vdot(s, y)
            good = sy > 1e-10 * (
                jnp.linalg.norm(s) * jnp.linalg.norm(y) + 1e-30
            )
            slot = nk % m
            S = S.at[slot].set(jnp.where(good, s, S[slot]))
            Y = Y.at[slot].set(jnp.where(good, y, Y[slot]))
            rho = rho.at[slot].set(
                jnp.where(good, 1.0 / jnp.where(good, sy, 1.0), rho[slot])
            )
            nk = nk + good.astype(nk.dtype)
            small_step = jnp.sum(jnp.abs(step)) <= xtol
            small_grad = jnp.linalg.norm(g_new, ord=jnp.inf) <= gtol
            done = small_step | small_grad | (alpha == 0.0)
            return (x_new, f_new2, g_new, S, Y, rho, nk, k + 1, done, best_x, best_f)

        state0 = (
            x0, f0, g0, S0, Y0, rho0,
            jnp.asarray(0, jnp.int32), 0, False, x0, f0,
        )
        out = jax.lax.while_loop(cond, body, state0)
        x, f, g, S, Y, rho, nk, k, done, best_x, best_f = out
        return best_x, best_f, k

    return solve
