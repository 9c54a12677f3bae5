"""Functional optuna stand-in for baseline timing of the reference:
random-search Study with the ask/tell surface the reference uses.
(The real TPE sampler adds per-trial model-fitting overhead, so baseline
wall-clock measured with this shim slightly FAVORS the reference.)"""
import numpy as np


class _Trial:
    def __init__(self, number, rng):
        self.number = number
        self._rng = rng
        self.params = {}

    def suggest_uniform(self, name, low, high):
        v = float(self._rng.uniform(low, high))
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high):
        return self.suggest_uniform(name, low, high)


class Study:
    def __init__(self, direction="minimize", sampler=None, storage=None):
        self._rng = np.random.default_rng(0)
        self.best_value = np.inf
        self.best_params = {}

    def optimize(self, objective, n_trials=10, n_jobs=1):
        for i in range(int(n_trials)):
            trial = _Trial(i, self._rng)
            value = float(objective(trial))
            if value < self.best_value or not self.best_params:
                self.best_value = value
                self.best_params = dict(trial.params)


def create_study(direction="minimize", sampler=None, storage=None):
    return Study(direction, sampler, storage)


class _Sampler:
    def __init__(self, *a, **k):
        pass


class samplers:
    TPESampler = _Sampler
    RandomSampler = _Sampler
    GridSampler = _Sampler


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
