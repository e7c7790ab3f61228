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
