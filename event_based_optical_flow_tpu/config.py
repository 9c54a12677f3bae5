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


def _host_fingerprint() -> str:
    """Stable per-host cache key: jax version + CPU model + ISA features.

    XLA:CPU persists machine-feature-specific AOT executables whose cache
    keys do NOT include the host CPU features; sharing one cache directory
    across heterogeneous hosts poisons the cache (cpu_aot_loader warns
    "Machine type used for XLA:CPU compilation doesn't match ... could
    lead to execution errors such as SIGILL" and collectives hang/abort).
    Fingerprinting the directory by host CPU makes cross-host reuse
    impossible by construction wherever /proc/cpuinfo exposes the model
    and ISA flags (Linux); elsewhere the key degrades to the platform
    triple + processor string, which still separates hosts of different
    OS/arch but not two same-OS x86_64 boxes with different ISA levels
    — on such hosts set EVFLOW_NO_COMPILE_CACHE=1 if the cache dir is
    shared."""
    import hashlib
    import platform as _plat

    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    flags = line.split(":", 1)[1].strip()
                if model and flags:
                    break
    except OSError:
        # non-Linux / hidden procfs: fall back to the richest portable
        # host descriptors available
        model = _plat.processor() or _plat.platform()
        flags = _plat.version()
    import jax

    raw = "|".join([jax.__version__, _plat.machine(), model, flags])
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: pyramid solvers compile one
    program per (scale, buffer-size) and reuse them across runs; in
    remote-compile environments a cold compile costs minutes.  Opt out
    with EVFLOW_NO_COMPILE_CACHE=1.

    The directory is keyed by a host fingerprint (see _host_fingerprint):
    a shared home directory across heterogeneous hosts must never share
    XLA:CPU AOT executables (root cause of the round-2 multichip-dryrun
    rendezvous abort)."""
    if os.environ.get("EVFLOW_NO_COMPILE_CACHE"):
        return
    import jax

    base = os.environ.get(
        "EVFLOW_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/evflow_jax")
    )
    cache_dir = os.path.join(base, _host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the option: non-fatal
        pass


_AOT_FILTER_INSTALLED = False

# the benign same-host mismatch: XLA tuning prefs (+prefer-no-scatter /
# +prefer-no-gather) sit in the compile-feature list but never in the
# host-feature list, so every load logs exactly these two pseudo-feature
# lines.  A genuine cross-host ISA mismatch logs its own line naming the
# real feature (e.g. +avx512f) and must NOT match.
_AOT_BENIGN_RE = (
    rb"cpu_aot_loader.*feature \+prefer-no-(scatter|gather) is not\s+supported"
)


def suppress_benign_aot_warnings() -> None:
    """Filter fd-2 for the benign XLA:CPU AOT-loader mismatch lines.

    Every XLA:CPU compile-cache load on this jaxlib logs one E-line per
    "unsupported" target feature (cpu_aot_loader.cc:210).  The compile
    feature list includes XLA *tuning preferences* (+prefer-no-scatter,
    +prefer-no-gather) that by construction never appear in the host
    feature list, so SAME-host loads warn on exactly those two pseudo
    features on every load — pure noise that buries real signal in the
    dryrun/bench tails.  A GENUINE cross-host ISA mismatch logs its own
    line naming the real feature (e.g. +avx512f), which this filter
    passes through untouched; cross-host reuse is additionally prevented
    by the host-fingerprinted cache directory (_host_fingerprint).

    The filter is fd-level (the lines are written by C++ TSL logging,
    not Python logging): fd 2 is replaced by a pipe drained by a daemon
    thread that forwards every non-matching line to the original stderr.
    Installed only by the harness entry points (bench.py, dryrun) —
    library imports never touch process-global fds."""
    global _AOT_FILTER_INSTALLED
    if _AOT_FILTER_INSTALLED:
        return
    _AOT_FILTER_INSTALLED = True
    import atexit
    import re
    import sys
    import threading

    pat = re.compile(_AOT_BENIGN_RE)
    r, w = os.pipe()
    orig = os.dup(2)
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                if not pat.search(ln):
                    os.write(orig, ln + b"\n")
        if buf:
            os.write(orig, buf)

    t = threading.Thread(target=pump, daemon=True, name="aot-warn-filter")
    t.start()

    def _restore_stderr():
        # Uncaught-exception tracebacks are printed BEFORE atexit runs,
        # into the pipe; without this drain a crashing process exits
        # with an EMPTY stderr (the daemon pump dies mid-buffer).
        # Restoring fd 2 closes the pipe's last writer, so the pump
        # reads EOF, forwards everything pending (including the
        # traceback), and exits — then later writes go straight to the
        # original stderr.
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(orig, 2)
        t.join(timeout=5)

    atexit.register(_restore_stderr)


def _platform_override() -> None:
    """EVFLOW_PLATFORM=cpu|tpu forces the JAX platform before any device
    op.  This must happen via jax.config (a PJRT plugin that
    self-registers at interpreter startup ignores the JAX_PLATFORMS env
    var), e.g. to run the CLI on CPU while the TPU tunnel is down."""
    platform = os.environ.get("EVFLOW_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_enable_compilation_cache()
_platform_override()

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
