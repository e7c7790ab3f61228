# -*- coding: utf-8 -*-
"""3D Poisson on the twisted box: sum-factorization assembly + matrix-free
CG on the compact multilevel-banded matrix (the benchmark workload)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp

from pyiga_tpu import assemble, bspline, geometry, solvers
from pyiga_tpu.assemblers import MassAssembler, StiffnessAssembler
from pyiga_tpu.ops.mlmatvec import make_ml_matvec


def main(n=16, p=3):
    kvs = 3 * (bspline.make_knots(p, 0.0, 1.0, n),)
    geo = geometry.twisted_box()
    ndofs = np.prod([kv.numdofs for kv in kvs])
    print('dofs:', ndofs)

    t0 = time.perf_counter()
    K = StiffnessAssembler(kvs, geo).assemble()     # compact MLMatrix
    M = MassAssembler(kvs, geo).assemble()
    print('assembly: %.3fs' % (time.perf_counter() - t0))

    # matrix-free CG on device for (K + M) u = b
    mvK, mvM = make_ml_matvec(K), make_ml_matvec(M)
    matvec = lambda v: mvK(v) + mvM(v)
    b = np.ones(K.shape[1])
    t0 = time.perf_counter()
    u, it = solvers.cg_jit(matvec, jnp.asarray(b), tol=1e-8, maxiter=2000)
    u = np.asarray(u)
    print('CG: %d iterations, %.3fs' % (int(it), time.perf_counter() - t0))

    res = np.linalg.norm((K.asmatrix() + M.asmatrix()) @ u - b)
    print('residual:', res / np.linalg.norm(b))
    return u


if __name__ == '__main__':
    main()
