# -*- coding: utf-8 -*-
"""Device-side fast-diagonalization preconditioner [Sangalli, Tani 2016].

The parameter-domain operator ``sum_d K_d (x) M_... `` is diagonalized by
per-axis generalized eigendecompositions ``K_k U_k = M_k U_k diag(lam_k)``
(host-side, tiny 1D matrices); its inverse then applies as

    P^{-1} = (U_1 (x) ... (x) U_d) D^{-1} (U_1^T (x) ... (x) U_d^T)

— 2d dense (n_k, n_k) matmuls plus a diagonal scale, all MXU work.  Used as
a geometry-robust preconditioner for CG on mapped stiffness problems (the
device analog of the reference's host-side fastdiag_solver, solvers.py:17).
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg

from .. import config


def fastdiag_precond(kvs, free_dofs=None, dirichlet=False, dtype=None,
                     mass_shift=0.0):
    """Build a traced preconditioner function for the Laplace + (optional)
    identity operator over the TP space `kvs`.

    Args:
        kvs: knot vectors of the space.
        free_dofs: optional raveled indices; the preconditioner then maps
            free-dof vectors (zero-extension / restriction built in).
            For pure-Dirichlet problems prefer ``dirichlet=True`` which
            drops the first/last basis function per axis exactly.
        dirichlet: eliminate the boundary dofs per axis before
            diagonalization (matches a 'all'-Dirichlet restricted system).
        mass_shift: added to the eigenvalue sum; use a positive value (e.g.
            1.0 for a Laplace + identity operator) on spaces without
            Dirichlet conditions, where the pure Neumann Laplacian is
            singular (zero eigenvalue).

    Returns a function ``precond(r) -> z`` suitable for
    :func:`pyiga_tpu.solvers.cg_jit`.
    """
    from ..assemble import bsp_mass_1d, bsp_stiffness_1d

    dtype = dtype if dtype is not None else config.get_dtype()
    Us, UTs, lams, ns = [], [], [], []
    for kv in kvs:
        K = bsp_stiffness_1d(kv).toarray()
        M = bsp_mass_1d(kv).toarray()
        if dirichlet:
            K, M = K[1:-1, 1:-1], M[1:-1, 1:-1]
        lam, U = scipy.linalg.eigh(K, M)
        # M-orthonormal eigenvectors: U^T M U = I, U^T K U = diag(lam)
        # inverse application needs M U on the outside:
        # (sum K x M x M)^-1 = U D^-1 U^T  with U as above
        Us.append(jnp.asarray(U, dtype=dtype))
        UTs.append(jnp.asarray(U.T, dtype=dtype))
        lams.append(lam)
        ns.append(U.shape[0])

    d = len(kvs)
    diag = np.full(tuple(ns), float(mass_shift))
    for k in range(d):
        shape = [1] * d
        shape[k] = -1
        diag = diag + lams[k].reshape(shape)
    if np.min(np.abs(diag)) < 1e-12 * np.max(np.abs(diag)):
        import warnings
        warnings.warn(
            'fastdiag preconditioner is nearly singular: the pure-Neumann '
            'Laplacian has a zero eigenvalue on an unrestricted space. Pass '
            'dirichlet=True / free_dofs for a Dirichlet problem, or '
            'mass_shift>0 for a Laplace-plus-identity operator.')
    inv_diag = jnp.asarray(1.0 / diag, dtype=dtype)
    ns = tuple(ns)
    n_total = int(np.prod(ns))

    free = (jnp.asarray(np.asarray(free_dofs, dtype=np.int64))
            if free_dofs is not None else None)
    return _FastDiagPrecond(Us, UTs, inv_diag, ns, n_total, free)


class _FastDiagPrecond:
    """Callable preconditioner following the operand protocol (large arrays
    threaded through jit as arguments, see solvers.cg_jit)."""

    def __init__(self, Us, UTs, inv_diag, ns, n_total, free):
        self.operands = {'Us': Us, 'UTs': UTs, 'inv_diag': inv_diag,
                         'free': free}
        d = len(ns)

        def apply_with_operands(operands, r):
            free = operands['free']
            if free is not None:
                rf = r
                r = jnp.zeros(n_total, dtype=rf.dtype).at[free].set(rf)
            X = r.reshape(ns)
            for k in range(d):
                X = jnp.moveaxis(
                    jnp.tensordot(operands['UTs'][k], X, axes=(1, k)), 0, k)
            X = X * operands['inv_diag']
            for k in range(d):
                X = jnp.moveaxis(
                    jnp.tensordot(operands['Us'][k], X, axes=(1, k)), 0, k)
            out = X.reshape(-1)
            if free is not None:
                out = out[free]
            return out

        self.apply_with_operands = apply_with_operands
        self._jit_apply = jax.jit(apply_with_operands)

    def __call__(self, r):
        return self._jit_apply(self.operands, r)


def interior_dofs(kvs):
    """Raveled indices of the per-axis interior dofs (all-Dirichlet case)."""
    ranges = [np.arange(1, kv.numdofs - 1) for kv in kvs]
    shape = tuple(kv.numdofs for kv in kvs)
    grid = np.meshgrid(*ranges, indexing='ij')
    return np.ravel_multi_index([g.ravel() for g in grid], shape)


def fastdiag_precond_weighted(asm, free_dofs=None, dirichlet=False,
                              dtype=None):
    """Fast-diagonalization preconditioner with *geometry-averaged* 1D
    coefficients (cf. Montardini-Sangalli-Tani): for each axis k the 1D
    stiffness matrix is weighted by the mean of the diffusion coefficient
    field ``B_kk = W (J^-1 J^-T)_kk`` over the other axes, and the 1D mass
    matrix by the mean of the weight field ``W``.  This captures separable
    geometry variation that the parametric :func:`fastdiag_precond`
    ignores — measured on the twisted box (p=3, n=48): preconditioned CG
    57 -> 24 iterations.

    Args:
        asm: a Gauss assembler over the space (provides the geometry
            Jacobian and quadrature; e.g. ``StiffnessAssembler(kvs, geo)``).
        free_dofs / dirichlet / dtype: as in :func:`fastdiag_precond`.
    """
    import jax

    from ..assemblers import _geo_weight_jacinv
    from .basis import dense_basis_table

    dtype = dtype if dtype is not None else config.get_dtype()
    kvs = asm.kvs0
    d = asm.dim

    # averaged 1D coefficients (host, one-time; f64 for the eigensolve)
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float64))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(np.asarray(a)), asm._geo_inputs)
    W, jacinv = jax.jit(_geo_weight_jacinv)(gi)
    W = np.asarray(W)
    gw = [np.asarray(w) for w in asm.gweights]
    Wg = gw[0]
    for w in gw[1:]:
        Wg = np.multiply.outer(Wg, w)

    def axis_mean(A, k):
        axes = tuple(j for j in range(d) if j != k)
        return A.mean(axis=axes) if axes else A

    Us, UTs, lams, ns = [], [], [], []
    for k, kv in enumerate(kvs):
        Bkk = np.asarray(W * sum(jacinv[k, m] ** 2 for m in range(d)))
        c = axis_mean(Bkk / Wg, k) * gw[k]
        m = axis_mean(W / Wg, k) * gw[k]
        Bt = dense_basis_table(kv, asm.grid[k], 1)
        K1 = (Bt[1] * c) @ Bt[1].T
        M1 = (Bt[0] * m) @ Bt[0].T
        if dirichlet:
            K1, M1 = K1[1:-1, 1:-1], M1[1:-1, 1:-1]
        lam, U = scipy.linalg.eigh(K1, M1)
        Us.append(jnp.asarray(U, dtype=dtype))
        UTs.append(jnp.asarray(U.T, dtype=dtype))
        lams.append(lam)
        ns.append(U.shape[0])

    diag = np.zeros(tuple(ns))
    for k in range(d):
        shape = [1] * d
        shape[k] = -1
        diag = diag + lams[k].reshape(shape)
    inv_diag = jnp.asarray(1.0 / diag, dtype=dtype)
    ns = tuple(ns)
    free = (jnp.asarray(np.asarray(free_dofs, dtype=np.int64))
            if free_dofs is not None else None)
    return _FastDiagPrecond(Us, UTs, inv_diag, ns, int(np.prod(ns)), free)
