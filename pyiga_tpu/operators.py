# -*- coding: utf-8 -*-
"""LinearOperator zoo and the sparse direct-solver abstraction.

API parity with /root/reference/pyiga/operators.py.  Host-side direct solves
use scipy (SuperLU / Cholesky / LU); these live on setup and comparison paths.
The matrix-free operators (Kronecker, block, subspace correction) are the
interfaces the TPU solvers consume.
"""

import numpy as np
import scipy.linalg
import scipy.sparse.linalg
from scipy.sparse.linalg import LinearOperator

from . import kronecker


class NullOperator(LinearOperator):
    """Zero operator of the given shape (used as a block placeholder)."""

    def __init__(self, shape, dtype=np.float64):
        super().__init__(shape=shape, dtype=dtype)

    def _matvec(self, x):
        return np.zeros(self.shape[0], dtype=self.dtype)

    def _matmat(self, x):
        return np.zeros((self.shape[0], x.shape[1]), dtype=self.dtype)

    def _transpose(self):
        return NullOperator((self.shape[1], self.shape[0]), dtype=self.dtype)


class IdentityOperator(LinearOperator):
    """Identity operator of size `n`."""

    def __init__(self, n, dtype=np.float64):
        super().__init__(shape=(n, n), dtype=dtype)

    def _matvec(self, x):
        return x

    def _matmat(self, x):
        return x

    def _transpose(self):
        return self


class DiagonalOperator(LinearOperator):
    """Acts like a diagonal matrix with the given diagonal vector."""

    def __init__(self, diag):
        diag = np.squeeze(diag)
        assert diag.ndim == 1, 'Diagonal must be a vector'
        self.diag = diag
        super().__init__(shape=(len(diag), len(diag)), dtype=diag.dtype)

    def _matvec(self, x):
        return self.diag * x if x.ndim == 1 else self.diag[:, None] * x

    _matmat = _matvec

    def _transpose(self):
        return self


class KroneckerOperator(LinearOperator):
    """Matrix-free application of the Kronecker product of the given operators."""

    def __init__(self, *ops):
        self.ops = ops
        sz_in = int(np.prod([A.shape[1] for A in ops]))
        sz_out = int(np.prod([A.shape[0] for A in ops]))
        alldense = all(isinstance(A, np.ndarray) for A in ops)
        allsquare = all(A.shape[0] == A.shape[1] for A in ops)
        if alldense or not allsquare:
            self.applyfunc = kronecker._apply_kronecker_dense
        else:
            self.applyfunc = kronecker._apply_kronecker_linops
        super().__init__(dtype=ops[0].dtype, shape=(sz_out, sz_in))

    def _matvec(self, x):
        return self.applyfunc(self.ops, x)

    def _matmat(self, x):
        return self.applyfunc(self.ops, x)

    def _transpose(self):
        return KroneckerOperator(*(B.T for B in self.ops))

    def _adjoint(self):
        return KroneckerOperator(*(B.H for B in self.ops))


class BaseBlockOperator(LinearOperator):
    """Generic block operator given by sub-operators and their index ranges."""

    def __init__(self, shape, ops, ran_out, ran_in):
        self.ops = ops
        self.ran_out = ran_out
        self.ran_in = ran_in
        super().__init__(ops[0].dtype, shape)

    def _matvec(self, x):
        if x.ndim == 2:
            x = x[:, 0]
        y = np.zeros(self.shape[0])
        for op, ro, ri in zip(self.ops, self.ran_out, self.ran_in):
            y[ro] += op.dot(x[ri])
        return y

    def _matmat(self, x):
        y = np.zeros((self.shape[0], x.shape[1]))
        for op, ro, ri in zip(self.ops, self.ran_out, self.ran_in):
            y[ro] += op.dot(x[ri])
        return y

    def _transpose(self):
        return BaseBlockOperator((self.shape[1], self.shape[0]),
                                 tuple(op.T for op in self.ops),
                                 self.ran_in, self.ran_out)

    def _adjoint(self):
        return BaseBlockOperator((self.shape[1], self.shape[0]),
                                 tuple(op.H for op in self.ops),
                                 self.ran_in, self.ran_out)


def _sizes_to_ranges(sizes):
    bounds = np.concatenate(([0], np.cumsum(list(sizes))))
    return [range(bounds[k], bounds[k + 1]) for k in range(len(bounds) - 1)]


def BlockDiagonalOperator(*ops):
    """Block-diagonal operator with the given operators on the diagonal."""
    ranges_i = _sizes_to_ranges(op.shape[0] for op in ops)
    ranges_j = _sizes_to_ranges(op.shape[1] for op in ops)
    shape = (ranges_i[-1].stop, ranges_j[-1].stop)
    return BaseBlockOperator(shape, ops, ranges_i, ranges_j)


def BlockOperator(ops):
    """Block operator from a rectangular list-of-lists of operators.

    Use :class:`NullOperator` (or None) for empty blocks.  Analogous to
    :func:`numpy.block` for dense matrices."""
    M, N = len(ops), len(ops[0])
    ranges_i = _sizes_to_ranges(ops[i][0].shape[0] for i in range(M))
    ranges_j = _sizes_to_ranges(ops[0][j].shape[1] for j in range(N))
    shape = (ranges_i[-1].stop, ranges_j[-1].stop)

    ops_list, ri_list, rj_list = [], [], []
    for i in range(M):
        assert len(ops[i]) == N, 'All rows must have equal length'
        for j in range(N):
            op = ops[i][j]
            if op is None or isinstance(op, NullOperator):
                continue
            assert op.shape == (len(ranges_i[i]), len(ranges_j[j])), \
                'Operator at position (%d,%d) has wrong shape' % (i, j)
            ops_list.append(op)
            ri_list.append(ranges_i[i])
            rj_list.append(ranges_j[j])
    if ops_list:
        return BaseBlockOperator(shape, ops_list, ri_list, rj_list)
    return NullOperator(shape)


class SubspaceOperator(LinearOperator):
    r"""Additive subspace correction operator
    :math:`Lx = \sum_j P_j B_j P_j^T x` for prolongators `P_j` and
    square operators `B_j`."""

    def __init__(self, subspaces, Bs):
        subspaces, Bs = tuple(subspaces), tuple(Bs)
        assert len(subspaces) == len(Bs)
        assert len(Bs) > 0, 'No operators given'
        self.subspaces = subspaces
        self.Bs = Bs
        self._is_transpose = False
        n = subspaces[0].shape[0]
        super().__init__(shape=(n, n), dtype=Bs[0].dtype)

    def _matvec(self, x):
        if x.ndim > 1:
            x = np.squeeze(x)
        y = np.zeros(len(x))
        for P, B in zip(self.subspaces, self.Bs):
            z = P.T.dot(x)
            y += P.dot(B.T.dot(z) if self._is_transpose else B.dot(z))
        return y

    def _transpose(self):
        Y = SubspaceOperator(self.subspaces, self.Bs)
        Y._is_transpose = not self._is_transpose
        return Y


class SolverWrapper(LinearOperator):
    """Wrap a factorized solver object exposing ``solve`` as a LinearOperator."""

    def __init__(self, shape, dtype, solve):
        self._solve = solve
        super().__init__(shape=shape, dtype=dtype)

    def _matvec(self, x):
        return self._solve(x)

    def _matmat(self, x):
        return self._solve(x)


def make_solver(B, symmetric=False, spd=False):
    """LinearOperator applying a direct solver for the square matrix `B`.

    Sparse matrices are factorized with SuperLU (the reference optionally
    uses MKL PARDISO when available, operators.py:252-259); dense symmetric
    matrices use Cholesky, general dense ones LU.
    """
    if spd:
        symmetric = True

    if scipy.sparse.issparse(B):
        spLU = scipy.sparse.linalg.splu(B.tocsc(), permc_spec='NATURAL')
        return SolverWrapper(B.shape, B.dtype, spLU.solve)
    if symmetric:
        chol = scipy.linalg.cho_factor(B, check_finite=False)
        return SolverWrapper(
            B.shape, B.dtype,
            lambda x: scipy.linalg.cho_solve(chol, x, check_finite=False))
    LU = scipy.linalg.lu_factor(B, check_finite=False)
    return SolverWrapper(
        B.shape, B.dtype,
        lambda x: scipy.linalg.lu_solve(LU, x, check_finite=False))


def make_kronecker_solver(*Bs):
    """Operator applying the inverse of the Kronecker product of the matrices."""
    return KroneckerOperator(*(make_solver(B) for B in Bs))
