"""Misc helpers: config probing, seeding, lightweight profiling.

The reference wraps optimizers in a cProfile decorator dumping
``optimize.prof`` (ref src/utils/misc.py:88-144); for a jit-compiled
pipeline wall-clock sections + optional ``jax.profiler`` traces are the
useful equivalent.
"""

import contextlib
import logging
import os
import random
import time
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def fix_random_seed(seed: int = 46) -> None:
    """Fix host RNG seeds (ref misc.py:18-24).  Device randomness in this
    framework is explicit via jax PRNG keys derived from this seed."""
    random.seed(seed)
    np.random.seed(seed)


def fetch_runtime_info() -> dict:
    """Reproducibility stamp for the run log: repo commit (reference
    parity: ref misc.py:57-85 logs the git hash into every run) plus the
    jax version/backend the results were produced with."""
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    try:
        import jax

        jax_ver, backend = jax.__version__, jax.default_backend()
    except Exception:  # pragma: no cover
        jax_ver, backend = "unknown", "unknown"
    return {"git_commit": commit, "jax": jax_ver, "backend": backend}


def check_key_and_bool(config: dict, key: str) -> bool:
    """True iff key exists and is truthy (ref misc.py:43-54)."""
    return key in config and bool(config[key])


def check_file_utils(path: str) -> bool:
    import os

    return os.path.exists(path)


_TIMINGS: Dict[str, list] = {}


@contextlib.contextmanager
def profile_section(name: str, timings: Optional[Dict[str, list]] = None):
    """Wall-clock section timer; accumulates into a dict for per-stage
    reports (TPU-friendly replacement for the reference cProfile dumps)."""
    store = _TIMINGS if timings is None else timings
    t0 = time.perf_counter()
    try:
        yield
    finally:
        store.setdefault(name, []).append(time.perf_counter() - t0)


def timing_report(timings: Optional[Dict[str, list]] = None) -> str:
    store = _TIMINGS if timings is None else timings
    lines = []
    for name, vals in sorted(store.items()):
        lines.append(
            f"{name}: n={len(vals)} total={sum(vals):.3f}s mean={sum(vals)/len(vals)*1e3:.1f}ms"
        )
    return "\n".join(lines)


def clear_timings() -> None:
    _TIMINGS.clear()
