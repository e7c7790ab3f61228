"""Global configuration for pyiga_tpu.

The reference library's entire config system is a global thread count
(/root/reference/pyiga/__init__.py:10-19).  On TPU the analogous global
knobs are the compute dtype used on device and the backend/device selection,
plus an escape hatch to force all Pallas kernels into interpreter mode
(useful on CPU test runs).
"""

import os

import numpy as np


class _State:
    # process-wide, like the reference's module-global thread count —
    # settings made on one thread must be visible to worker threads
    pass


_state = _State()

_DEFAULTS = dict(
    # dtype used for device-side assembly/solver computation.  float64 gives
    # entrywise parity with the reference CPU implementation (<= 1e-10); the
    # float32 path is the TPU speed configuration.
    dtype=np.float64,
    # number of host worker threads (kept for API parity with
    # pyiga.get_max_threads / set_max_threads)
    max_threads=os.cpu_count() or 1,
    # 'auto': pick jax.default_backend(); or 'cpu'/'tpu' explicitly.
    backend="auto",
    # force Pallas kernels to interpreter mode (set automatically on CPU)
    pallas_interpret=None,
    # dof cutoff for routing tiny per-level hierarchical assemblies to the
    # host CPU backend (see host_assembly_cutoff)
    host_assembly_cutoff=40000,
    # dof cutoff for routing small local-MG solves to the host CSR kernels
    # (see host_solve_cutoff)
    host_solve_cutoff=100000,
)


def _get(name):
    return getattr(_state, name, _DEFAULTS[name])


def get_dtype():
    """Return the configured device compute dtype (numpy dtype)."""
    return _get("dtype")


def set_dtype(dtype):
    """Set the device compute dtype (e.g. ``jnp.float32`` for the TPU fast path)."""
    _state.dtype = np.dtype(dtype).type


def get_max_threads():
    """Number of host threads used by host-side helpers (API parity with pyiga)."""
    return _get("max_threads")


def set_max_threads(n):
    _state.max_threads = int(n)


def default_assembly_mode():
    """Default assembly mode: 'ozaki' (the bf16-MXU f64 fast path) for
    float64 on accelerator backends where f64 is software-emulated, 'exact'
    on CPU (native f64) and for float32."""
    import jax
    if get_dtype() != np.float64:
        return "exact"
    # honor an explicit jax.default_device pin: with the TPU registered
    # as the default backend but computation pinned to CPU, the pair/
    # Ozaki path would be slower AND the pinned-CPU jit miscompiles the
    # two-float transforms (see CLAUDE.md)
    pin = jax.config.jax_default_device
    platform = pin.platform if pin is not None else jax.default_backend()
    return "exact" if platform == "cpu" else "ozaki"


def host_assembly_cutoff():
    """Problem-size cutoff (dofs) below which per-level hierarchical
    assemblies run on the host CPU backend in exact-f64 mode even when an
    accelerator is the default: at these sizes the per-dispatch latency
    (~28 ms through the tunnel) and the compact-tensor pull dominate any
    device speedup.  Override with ``set_host_assembly_cutoff`` or the
    ``PYIGA_HOST_ASM_CUTOFF`` env var; 0 disables host routing."""
    env = os.environ.get("PYIGA_HOST_ASM_CUTOFF")
    if env is not None:
        return int(env)
    return _get("host_assembly_cutoff")


def set_host_assembly_cutoff(n):
    _state.host_assembly_cutoff = int(n)


def host_solve_cutoff():
    """Problem-size cutoff (dofs) below which the local-MG solve runs the
    host CSR kernels even when an accelerator is the default.  Measured on
    the v5e (1593-dof hierarchy): the fully-fused one-dispatch device
    solve costs 398 ms (every f64 op is emulated and latency/traffic
    bound at tiny sizes) vs ~84 ms for the host sweep kernels.  Override
    with ``set_host_solve_cutoff`` / ``PYIGA_HOST_SOLVE_CUTOFF``; 0
    disables routing (always use the device path on accelerators)."""
    env = os.environ.get("PYIGA_HOST_SOLVE_CUTOFF")
    if env is not None:
        return int(env)
    return _get("host_solve_cutoff")


def set_host_solve_cutoff(n):
    _state.host_solve_cutoff = int(n)


def get_backend():
    return _get("backend")


def set_backend(name):
    """Select the backend HINT consumed by :func:`default_device` and
    :func:`pallas_interpret_mode` (e.g. 'cpu' flips Pallas kernels to the
    interpreter).  It does NOT re-route jit dispatch by itself — to run on
    CPU in a TPU-default process, start a fresh process with
    ``JAX_PLATFORMS=cpu`` (see CLAUDE.md; a jax.default_device CPU pin
    miscompiles the two-float pipeline on this JAX version)."""
    if name not in ("auto", "cpu", "tpu"):
        raise ValueError("backend must be 'auto', 'cpu' or 'tpu'")
    _state.backend = name


def compile_cache_dir():
    """Directory of the persistent XLA compilation cache (the analog of the
    reference's on-disk compiled-module cache, compile.py:22,58-73).
    Override with ``PYIGA_CACHE_DIR``; disable with
    ``PYIGA_COMPILE_CACHE=0``.  Returns None when disabled."""
    if os.environ.get("PYIGA_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    # pure-CPU processes (tests, comparators) skip the disk cache: CPU
    # executables AOT-compiled by the accelerator-configured process carry
    # different machine-feature flags, and loading them back in a pure-CPU
    # process warns/risks SIGILL; CPU compiles are cheap anyway.
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return None
    path = os.environ.get("PYIGA_CACHE_DIR")
    if path:
        return path
    try:
        from platformdirs import user_cache_dir
        base = user_cache_dir("pyiga_tpu")
    except ImportError:
        base = os.path.join(os.path.expanduser("~"), ".cache", "pyiga_tpu")
    return os.path.join(base, "xla_cache-" + _host_isa_digest())


def _host_isa_digest():
    """Short digest of the host CPU's feature flags.  XLA:CPU executables
    are AOT-compiled for the compiling host's exact machine features;
    replaying them on a host with a different feature set logs a loud
    mismatch error per load and risks SIGILL (observed: a shared cache
    between two machines spammed hundreds of such lines per bench run and
    pushed the metric lines out of the recorded artifact).  Salting the
    cache path per feature set keeps each host's entries separate."""
    import hashlib
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform
        flags = platform.machine() + platform.processor()
    return hashlib.blake2b(flags.encode(), digest_size=4).hexdigest()


def use_x64():
    """Enable 64-bit JAX computation. Called on import for correctness parity."""
    import os

    # XLA's CPU backend enables LLVM fast-math by default, which rewrites
    # the error-free transformations of the two-float pipeline
    # (ops/twofloat.py) into algebraically-equal-but-lossy code under jit
    # (measured: 1e-14 -> 6e-8).  The TPU backend is unaffected.  Must be
    # set before the CPU backend initializes.
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_cpu_enable_fast_math" not in flags:
        os.environ["XLA_FLAGS"] = \
            (flags + " --xla_cpu_enable_fast_math=false").strip()

    import jax

    jax.config.update("jax_enable_x64", True)

    # Persistent cross-process compilation cache: a fresh process reloads
    # compiled executables instead of re-paying every XLA/Mosaic compile
    # (the reference persists compiled modules the same way,
    # /root/reference/pyiga/compile.py:58-73).  scripts/clear_cache.py
    # wipes it.
    cache = compile_cache_dir()
    if cache is not None:
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            # cache every compile, however quick (the tunnel dispatch floor
            # makes even small recompiles expensive here)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              0)
        except Exception:       # unknown flags on an older jax: best-effort
            pass
        _exclude_cpu_from_persistent_cache()


def _exclude_cpu_from_persistent_cache():
    """Keep XLA:CPU executables OUT of the persistent cache.

    XLA:CPU AOT results embed compile-time machine/tuning flags (e.g.
    ``+prefer-no-scatter``); reloading them triggers a loud
    feature-mismatch error per load and measurably slows execution
    (measured: the Navier-Stokes host path ran 1775 ms/step with cached
    CPU executables vs 417 ms/step recompiled in-process), and a cache
    shared across hosts risks real SIGILLs.  jax has no per-backend cache
    switch, so gate its ``is_cache_used(backend)`` predicate; the TPU
    entries — the expensive ones here — stay cached."""
    try:
        import jax._src.compilation_cache as _cc
        if getattr(_cc, "_pyiga_no_cpu_cache", False):
            return
        _orig = _cc.is_cache_used

        def _is_cache_used_no_cpu(backend):
            if getattr(backend, "platform", None) == "cpu":
                return False
            return _orig(backend)

        _cc.is_cache_used = _is_cache_used_no_cpu
        _cc._pyiga_no_cpu_cache = True
    except Exception:           # private API moved: degrade to caching all
        pass


def default_device():
    """The device computations should run on under the current backend setting."""
    import jax

    backend = get_backend()
    if backend == "auto":
        return jax.devices()[0]
    return jax.devices(backend)[0]


def pallas_interpret_mode():
    """Whether Pallas kernels should run in interpreter mode.

    Defaults to True unless running on a real TPU backend.
    """
    import jax

    forced = _get("pallas_interpret")
    if forced is not None:
        return forced
    return default_device().platform != "tpu"


def set_pallas_interpret(flag):
    _state.pallas_interpret = flag
