"""pyiga_tpu: a TPU-native isogeometric analysis framework.

A from-scratch rebuild of the capabilities of pyiga (c-f-h/pyiga) designed
for TPU hardware: variational forms lower to sum-factorization contraction
plans executed as batched einsums / Pallas kernels on the MXU, matrices live
in HBM in a compact multilevel-banded layout with Kronecker-structured
matvecs, and solvers run matrix-free under jit.

Host-side numpy/scipy handles the small, setup-time combinatorial structures
(knot vectors, sparsity patterns, hierarchical index sets, direct solvers).
"""

__version__ = '0.1.0'

# The default compute dtype is float64 (entry parity with the reference CPU
# implementation); enable 64-bit JAX before any tracing happens.  The float32
# TPU fast path is selected via config.set_dtype(np.float32).
from .config import use_x64 as _use_x64
_use_x64()

from .config import (            # noqa: F401
    get_max_threads, set_max_threads,
    get_dtype, set_dtype,
    get_backend, set_backend,
)
