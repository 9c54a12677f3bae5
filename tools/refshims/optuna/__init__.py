"""Functional optuna stand-in for running the reference implementation.

Two samplers are real here:

* ``RandomSampler`` (and ``sampler=None``): uniform random search — used
  for baseline *timing* (real TPE adds per-trial model-fitting overhead,
  so wall-clock measured this way slightly FAVORS the reference).
* ``TPESampler``: a faithful reimplementation of univariate
  Tree-structured Parzen Estimator sampling (Bergstra et al., NeurIPS
  2011; the algorithm behind optuna's default sampler for independent
  float parameters): after ``n_startup_trials`` random trials, each
  parameter is modeled by two truncated-Gaussian Parzen mixtures — l(x)
  over the best ``gamma(n)`` observations (plus a uniform prior
  component) and g(x) over the rest — and the next point maximizes
  l(x)/g(x) over ``n_ei_candidates`` draws from l(x).  Used for the
  init-quality A/B study (tools/tpe_study.py, VERDICT r1 #6), where
  shim-random would misrepresent the reference's adaptive init.
"""
import numpy as np


class _Trial:
    def __init__(self, number, study):
        self.number = number
        self._study = study
        self.params = {}

    def suggest_uniform(self, name, low, high):
        v = self._study._suggest(name, float(low), float(high))
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high):
        return self.suggest_uniform(name, low, high)


class _Sampler:
    def __init__(self, *a, **k):
        pass


class RandomSampler(_Sampler):
    pass


class GridSampler(_Sampler):
    def __init__(self, search_space=None, *a, **k):
        self.search_space = search_space or {}


class TPESampler:
    def __init__(self, n_startup_trials=10, n_ei_candidates=24, seed=0, **_k):
        import os

        self.n_startup_trials = int(n_startup_trials)
        self.n_ei_candidates = int(n_ei_candidates)
        self._rng = np.random.default_rng(seed)
        # A/B switch for the init-quality study (tools/tpe_study): run the
        # reference with its TPE init degraded to pure random sampling
        self._force_random = os.environ.get("REFSHIM_FORCE_RANDOM") == "1"

    @staticmethod
    def _gamma(n):
        # optuna's default-ish split: the best ceil(0.1 n) (capped at 25)
        return min(int(np.ceil(0.1 * n)) or 1, 25)

    def _parzen(self, xs, low, high):
        """Truncated-Gaussian Parzen mixture over observations xs plus a
        uniform prior component; bandwidths from neighbor spacing
        (Bergstra's adaptive scheme, clipped)."""
        xs = np.sort(np.asarray(xs, dtype=np.float64))
        n = len(xs)
        span = high - low
        if n == 0:
            return np.array([]), np.array([]), span
        pts = np.concatenate([[low], xs, [high]])
        sigmas = np.maximum(pts[1:-1] - pts[:-2], pts[2:] - pts[1:-1])
        sigmas = np.clip(sigmas, span / max(min(100.0, 10.0 * n), 1.0), span)
        return xs, sigmas, span

    @staticmethod
    def _logpdf(x, mus, sigmas, low, high, span):
        """log density of the mixture (uniform prior + truncnorm comps)."""
        x = np.asarray(x, dtype=np.float64)[:, None]
        n = len(mus)
        if n == 0:
            return np.full(x.shape[0], -np.log(span))
        z = (x - mus[None, :]) / sigmas[None, :]
        # truncation renormalization over [low, high]
        from math import erf, sqrt

        cdf = lambda v: 0.5 * (1.0 + np.vectorize(erf)(v / sqrt(2.0)))
        norm = cdf((high - mus) / sigmas) - cdf((low - mus) / sigmas)
        norm = np.maximum(norm, 1e-12)
        comp = (
            -0.5 * z**2
            - np.log(sigmas[None, :] * np.sqrt(2 * np.pi) * norm[None, :])
        )
        # weights: uniform over components + one prior component
        w = 1.0 / (n + 1)
        prior = -np.log(span)
        all_log = np.concatenate([comp + np.log(w), np.full((x.shape[0], 1), prior + np.log(w))], axis=1)
        m = all_log.max(axis=1, keepdims=True)
        return (m[:, 0] + np.log(np.exp(all_log - m).sum(axis=1)))

    def sample(self, history_x, history_y, low, high):
        n = len(history_x)
        if self._force_random or n < self.n_startup_trials:
            return float(self._rng.uniform(low, high))
        order = np.argsort(history_y)
        nb = self._gamma(n)
        below = np.asarray(history_x)[order[:nb]]
        above = np.asarray(history_x)[order[nb:]]
        mus_l, sig_l, span = self._parzen(below, low, high)
        mus_g, sig_g, _ = self._parzen(above, low, high)
        # candidates from l(x): pick a component (or the prior), draw, clip
        k = self.n_ei_candidates
        comp = self._rng.integers(0, len(mus_l) + 1, k)
        cand = np.where(
            comp < len(mus_l),
            mus_l[np.minimum(comp, len(mus_l) - 1)]
            + sig_l[np.minimum(comp, len(mus_l) - 1)] * self._rng.standard_normal(k),
            self._rng.uniform(low, high, k),
        )
        cand = np.clip(cand, low, high)
        score = self._logpdf(cand, mus_l, sig_l, low, high, span) - self._logpdf(
            cand, mus_g, sig_g, low, high, span
        )
        return float(cand[int(np.argmax(score))])


class Study:
    def __init__(self, direction="minimize", sampler=None, storage=None):
        self._rng = np.random.default_rng(0)
        self._sampler = sampler
        self.best_value = np.inf
        self.best_params = {}
        self._history = []  # list of (params dict, value)
        self._pending = None

    def _suggest(self, name, low, high):
        if isinstance(self._sampler, TPESampler):
            xs = [p[name] for p, _ in self._history if name in p]
            ys = [v for p, v in self._history if name in p]
            return self._sampler.sample(xs, ys, low, high)
        if isinstance(self._sampler, GridSampler) and name in getattr(
            self._sampler, "search_space", {}
        ):
            grid = self._sampler.search_space[name]
            return float(grid[len(self._history) % len(grid)])
        return float(self._rng.uniform(low, high))

    def optimize(self, objective, n_trials=10, n_jobs=1):
        for i in range(int(n_trials)):
            trial = _Trial(i, self)
            value = float(objective(trial))
            self._history.append((dict(trial.params), value))
            if value < self.best_value or not self.best_params:
                self.best_value = value
                self.best_params = dict(trial.params)


def create_study(direction="minimize", sampler=None, storage=None):
    return Study(direction, sampler, storage)


class samplers:
    TPESampler = TPESampler
    RandomSampler = RandomSampler
    GridSampler = GridSampler


class storages:
    class InMemoryStorage:
        def __init__(self, *a, **k):
            self._lock = None


class distributions:
    class BaseDistribution: pass
    @staticmethod
    def check_distribution_compatibility(*a, **k):
        pass


class logging:
    WARNING = 30
    @staticmethod
    def set_verbosity(*a, **k):
        pass


class study:
    Study = Study
