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
