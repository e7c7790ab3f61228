# -*- coding: utf-8 -*-
"""Low-rank tensor formats and approximation algorithms.

L1 layer: mode-k products, canonical (CP) and Tucker formats, HOSVD,
alternating-least-squares and greedy approximation algorithms, and
sum-of-Kronecker operators.  API parity with the reference
(/root/reference/pyiga/tensor.py); the implementation here is built on a
single :func:`modek_tprod` primitive so that the same code path can later
dispatch dense contractions to the TPU (all heavy operations are mode-k
matricized matmuls, which XLA maps directly onto the MXU).
"""

import operator
from functools import reduce

import numpy as np
import scipy.linalg
import scipy.sparse
import scipy.sparse.linalg


################################################################################
# Mode-k products and basic tools
################################################################################

def matricize(X, k):
    """Matricization (flattening) of tensor `X` along axis `k`:
    shape ``(X.shape[k], prod(other axes))`` with the other axes in order."""
    return np.moveaxis(X, k, 0).reshape(X.shape[k], -1)


def modek_tprod(B, k, X):
    """Mode-`k` product of tensor `X` with the matrix/sparse matrix/operator `B`
    (of shape ``m x X.shape[k]``); result has ``m`` along axis `k`."""
    if isinstance(B, np.ndarray):
        return np.moveaxis(np.tensordot(B, X, axes=(1, k)), 0, k)
    # sparse matrix / LinearOperator: matricize along k, apply, fold back
    Xk = matricize(X, k)
    Yk = B.dot(Xk)
    shp = (Yk.shape[0],) + tuple(np.delete(X.shape, k))
    return np.moveaxis(Yk.reshape(shp), 0, k)


def apply_tprod(ops, A):
    """Apply the tensor (Kronecker) product of the operators `ops` to tensor `A`.

    ``ops[k]`` acts along axis ``k``; ``None`` entries act as the identity.
    `A` may have trailing axes beyond ``len(ops)``, which are untouched.
    Low-rank tensor classes provide their own ``nway_prod`` implementation.
    """
    if hasattr(A, 'nway_prod'):
        return A.nway_prod(ops)
    for k, B in enumerate(ops):
        if B is not None:
            A = modek_tprod(B, k, A)
    return A


def fro_norm(X):
    """Frobenius norm of a tensor (format-aware)."""
    if hasattr(X, 'norm'):
        return X.norm()
    return np.linalg.norm(asarray(X).ravel())


def asarray(X):
    """Expand any tensor format to a full ndarray."""
    if hasattr(X, 'asarray'):
        return X.asarray()
    return np.asanyarray(X)


def outer(*xs):
    """Outer product of vectors ``x1, ..., xd`` as a `d`-dimensional array."""
    res = xs[0]
    for x in xs[1:]:
        res = res[..., None] * x
    return res


def array_outer(*xs):
    """Outer product of arbitrary ndarrays; output shape is the concatenation
    of the input shapes."""
    res = xs[0]
    for x in xs[1:]:
        res = np.multiply.outer(res, x)
    return res


def pad(X, pad_width):
    """Pad a tensor (of any supported format) with zero slices per axis;
    `pad_width` entries are ``(before, after)`` or ``None``."""
    assert len(pad_width) == X.ndim, 'invalid length of pad_width'
    ops = []
    for j, pw in enumerate(pad_width):
        if pw is None:
            ops.append(None)
        else:
            nj = X.shape[j]
            P = scipy.sparse.lil_matrix((nj + pw[0] + pw[1], nj))
            P[pw[0]:pw[0] + nj] = scipy.sparse.eye(nj)
            ops.append(P)
    return apply_tprod(ops, X)


def _multi_kron(As):
    return reduce(np.kron, As)


def _normalize_indices(I, shape):
    """Convert an indexing expression into per-axis ranges plus the resulting
    shape and the set of axes indexed by scalars (to be squeezed)."""
    if not isinstance(I, tuple):
        I = (I,)
    d = len(shape)
    if len(I) > d:
        raise ValueError('got %d indices but have only %d axes' % (len(I), d))
    I = I + (d - len(I)) * (slice(None),)

    per_axis, new_shape, singletons = [], [], []
    for k, ik in enumerate(I):
        if np.isscalar(ik):
            i = range(shape[k])[ik]     # raises on invalid index
            r = range(i, i + 1)
            new_shape.append(1)
            singletons.append(k)
        elif isinstance(ik, slice):
            r = range(shape[k])[ik]
            new_shape.append(len(r))
        else:
            r = np.arange(shape[k])[ik]
            new_shape.append(len(r))
        per_axis.append(r)
    return tuple(per_axis), tuple(new_shape), tuple(singletons)


################################################################################
# HOSVD and truncation
################################################################################

def hosvd(X):
    """Higher-order SVD: returns a :class:`TuckerTensor` with orthogonal square
    factors and a core of the same shape as `X`."""
    Us = [scipy.linalg.svd(matricize(X, k), full_matrices=False,
                           check_finite=False)[0] for k in range(X.ndim)]
    core = apply_tprod([U.T for U in Us], X)
    return TuckerTensor(Us, core)


def _find_best_truncation_axis(X):
    """Axis whose last slice has the smallest norm (cheapest to truncate)."""
    errs = [np.linalg.norm(np.moveaxis(X, i, 0)[-1].ravel()) for i in range(X.ndim)]
    i = int(np.argmin(errs))
    return i, errs[i]


def find_truncation_rank(X, tol=1e-12):
    """Greedily shrink an HOSVD core until the accumulated truncation error
    reaches `tol`; returns the resulting shape."""
    err_sq, tol_sq = 0.0, tol ** 2
    while X.size > 0:
        ax, e = _find_best_truncation_axis(X)
        err_sq += e ** 2
        if err_sq > tol_sq:
            break
        sl = X.ndim * [slice(None)]
        sl[ax] = slice(None, -1)
        X = X[tuple(sl)]
    return X.shape


################################################################################
# Approximation algorithms (ALS / greedy)
################################################################################

def _dot_rank1(xs, ys):
    """Frobenius inner product of two rank-1 tensors given by their factors."""
    return np.prod([np.dot(x, y) for x, y in zip(xs, ys)])


def _without_k(L, k):
    return L[:k] + L[k + 1:]


def _apply_lowrank(Ts, xs):
    """Apply each rank-1 operator (tuple of matrices) in `Ts` to the rank-1
    tensor with factors `xs`."""
    return [tuple(T[j].dot(xs[j]) for j in range(len(xs))) for T in Ts]


def als1(A, tol=1e-15):
    """Best rank-1 approximation of tensor `A` via alternating least squares.
    Returns a tuple of `d` vectors whose outer product approximates `A`."""
    factors = [np.random.rand(1, n) for n in A.shape]
    axes = range(A.ndim)
    while True:
        move = 1.0
        for k in axes:
            contractors = [f if j != k else None
                           for j, f in enumerate(factors)]
            scale = np.prod([f[0] @ f[0] for j, f in enumerate(factors)
                             if j != k])
            updated = asarray(apply_tprod(contractors, A)).ravel() / scale
            move *= np.linalg.norm(updated - factors[k][0])
            factors[k][0, :] = updated
        if move < tol:
            return tuple(f[0] for f in factors)


def als(A, R, tol=1e-10, maxiter=10000, startval=None):
    """Best rank-`R` CP approximation of `A` via alternating least squares.
    Returns a :class:`CanonicalTensor`."""
    if startval is None:
        factors = [np.random.rand(R, n) for n in A.shape]
    else:
        if isinstance(startval, CanonicalTensor):
            if startval.R != R:
                raise ValueError('starting value has wrong rank')
            startval = startval.Xs
        factors = [x.T for x in startval]
        if not all(f.shape == (R, n) for f, n in zip(factors, A.shape)):
            raise ValueError('starting value has wrong shape')

    d = A.ndim
    scale = fro_norm(A)
    grams = [f @ f.T for f in factors]      # per-axis R x R Gram matrices

    for _ in range(maxiter):
        residual_sq = 0.0
        for k in range(d):
            # normal-equations rhs: contract A against every rank-1 term
            # along all axes except k
            rhs = np.stack([
                asarray(apply_tprod(
                    [None if j == k else factors[j][r:r + 1, :]
                     for j in range(d)], A)).ravel()
                for r in range(R)])
            G = np.prod(_without_k(grams, k), axis=0)
            residual_sq += fro_norm(G @ factors[k] - rhs) ** 2
            factors[k] = np.linalg.solve(G, rhs)
            grams[k] = factors[k] @ factors[k].T
        if np.sqrt(residual_sq) < tol * scale:
            break
    return CanonicalTensor(f.T for f in factors)


def grou(B, R, tol=1e-12, return_errors=False):
    """CP approximation by greedy rank-one updates
    (doi:10.1016/j.cam.2019.03.002)."""
    residual = asarray(B).copy()
    terms, errors = [], []
    for _ in range(R):
        t = als1(residual)
        terms.append(t)
        residual = residual - outer(*t)
        errors.append(fro_norm(residual))
        if errors[-1] < tol:
            break
    approx = CanonicalTensor.from_terms(terms)
    return (approx, errors) if return_errors else approx


def als1_ls(A, B, tol=1e-15, maxiter=10000, spd=False):
    """Rank-1 approximation of the solution of the Kronecker-format linear
    system ``A x = B`` via ALS.  `A` is a list of rank-1 operator terms
    (tuples of per-axis sparse matrices)."""
    if spd:
        return _als1_ls_spd(A, B, tol=tol, maxiter=maxiter)
    d = B.ndim
    rankA = len(A)
    xs = [np.random.rand(B.shape[j]) for j in range(d)]

    AitAj = [[[(A[i][k].T.dot(A[j][k])).tocsr() for j in range(rankA)]
              for i in range(rankA)] for k in range(d)]

    for _ in range(maxiter):
        delta = 1.0
        for k in range(d):
            ys = _apply_lowrank([_without_k(list(Ar), k) for Ar in A],
                                _without_k(xs, k))
            ZtZ = reduce(operator.add,
                         (_dot_rank1(ys[i], ys[j]) * AitAj[k][i][j]
                          for i in range(rankA) for j in range(rankA)))
            b = np.zeros(B.shape[k])
            for j in range(rankA):
                zs = [y[None, :] for y in ys[j]]
                zs = zs[:k] + [A[j][k].T] + zs[k:]
                b += asarray(apply_tprod(zs, B)).ravel()
            xk = scipy.sparse.linalg.spsolve(ZtZ.tocsc(), b)
            delta *= np.linalg.norm(xs[k] - xk)
            xs[k] = xk
        if delta < tol:
            break
    return xs


def _als1_ls_spd(A, B, tol=1e-15, maxiter=10000):
    """Rank-1 ALS for SPD `A`: best rank-1 approximation in the energy norm."""
    d = B.ndim
    rankA = len(A)
    xs = [np.random.rand(B.shape[j]) for j in range(d)]

    for _ in range(maxiter):
        delta = 1.0
        for k in range(d):
            Ak = sum(
                np.prod([A[r][m].dot(xs[m]).dot(xs[m]) for m in range(d) if m != k])
                * A[r][k] for r in range(rankA))
            xts = [x[None, :] for x in xs]
            xts[k] = None
            b = asarray(apply_tprod(xts, B)).ravel()
            xk = scipy.sparse.linalg.spsolve(scipy.sparse.csc_matrix(Ak), b)
            delta *= np.linalg.norm(xs[k] - xk)
            xs[k] = xk
        if delta < tol:
            break
    return xs


def als1_ls_structured(A, B, tol=1e-15, maxiter=10000):
    """Like :func:`als1_ls` but exploits identical sparsity structure of all
    operator factors to accumulate in the shared ``data`` array."""
    d = B.ndim
    rankA = len(A)
    xs = [np.random.rand(B.shape[j]) for j in range(d)]

    AitAj = [[[(A[i][k].T.dot(A[j][k])).tocsr() for j in range(rankA)]
              for i in range(rankA)] for k in range(d)]

    for _ in range(maxiter):
        delta = 1.0
        for k in range(d):
            ys = _apply_lowrank([_without_k(list(Ar), k) for Ar in A],
                                _without_k(xs, k))
            ZtZ = AitAj[k][0][0].copy()
            ZtZ.data[:] = 0.0
            for i in range(rankA):
                for j in range(rankA):
                    ZtZ.data += _dot_rank1(ys[i], ys[j]) * AitAj[k][i][j].data
            b = np.zeros(B.shape[k])
            for j in range(rankA):
                zs = [y[None, :] for y in ys[j]]
                zs = zs[:k] + [A[j][k].T] + zs[k:]
                b += asarray(apply_tprod(zs, B)).ravel()
            xk = scipy.sparse.linalg.spsolve(ZtZ.tocsc(), b)
            delta *= np.linalg.norm(xs[k] - xk)
            xs[k] = xk
        if delta < tol:
            break
    return xs


def gta(A, R, tol=1e-12, rtol=1e-12, return_errors=False):
    """Greedy Tucker approximation of tensor `A`
    (doi:10.1016/j.cam.2019.03.002)."""
    if isinstance(A, np.ndarray):
        A = TensorSum(A)
    us = als1(A)
    U = [u[:, None] / np.linalg.norm(u) for u in us]
    d = A.ndim
    A_norm = fro_norm(A)
    errors = []

    T = None
    for k in range(R):
        core = asarray(apply_tprod([u.T for u in U], A))
        T = TuckerTensor(U, core)
        E = A - T
        err = fro_norm(E)
        errors.append(err)
        if k == R - 1 or err < tol or err < rtol * A_norm:
            break
        vs = als1(E)
        for j in range(d):
            y = vs[j] - U[j].dot(U[j].T.dot(vs[j]))
            ny = np.linalg.norm(y)
            if ny >= 1e-14:
                U[j] = np.column_stack((U[j], y / ny))
    return (T, errors) if return_errors else T


def _tucker_sum(terms):
    terms = list(terms)
    A = terms[0]
    for B in terms[1:]:
        U, X1, X2 = join_tucker_bases(A, B)
        A = TuckerTensor(U, X1 + X2)
        if any(u.shape[1] > u.shape[0] for u in A.Us):
            A = A.compress()
    return A


def gta_ls(A, F, R, tol=1e-12, verbose=0, gs=None, spd=False):
    """Greedy Tucker approximation of the solution of ``A U = F`` with `A` in
    low Kronecker-rank format (doi:10.1016/j.cam.2019.03.002).

    Args:
        A: list of rank-1 operator terms (tuples of per-axis matrices).
        F: right-hand-side tensor (any format).
        R: number of greedy iterations (max multilinear rank).
        gs: if not None, use this many Gauss-Seidel sweeps on the core system
            (instead of a direct solve) once it grows beyond 500 unknowns.
        spd: whether `A` is symmetric positive definite.
    """
    res0_norm = fro_norm(F)
    us = als1_ls(A, F, tol=tol, spd=spd)
    U = [u[:, None] / np.linalg.norm(u) for u in us]
    d = F.ndim
    rankA = len(A)
    X = np.zeros(d * (0,))

    for it in range(R):
        # reduced (projected) system in the tensor-product basis U
        A_U = reduce(operator.add,
                     (_multi_kron([U[k].T.dot(A[j][k].dot(U[k])) for k in range(d)])
                      for j in range(rankA)))
        F_U = asarray(apply_tprod([u.T for u in U], F)).ravel()
        shpX = tuple(U[k].shape[1] for k in range(d))

        if gs is not None and A_U.shape[0] > 500:
            pad_size = tuple((0, U[k].shape[1] - X.shape[k]) for k in range(d))
            zz = np.pad(X, pad_size, 'constant').ravel()
            from .solvers import gauss_seidel
            gauss_seidel(scipy.sparse.csr_matrix(A_U), zz, F_U, iterations=gs)
        else:
            zz = np.linalg.solve(A_U, F_U)
        X = zz.reshape(shpX)

        UX = TuckerTensor(U, X)
        if it == R - 1:
            return UX

        # residual F - A(UX), recompressed to keep ranks small
        A_UX = _tucker_sum(apply_tprod(list(Aj), UX) for Aj in A)
        Rk = (F - A_UX).compress(rtol=1e-2)

        res = fro_norm(Rk)
        if verbose >= 2:
            print('gta_ls: it=%d residual=%.3e' % (it, res))
        if res < tol * res0_norm:
            if verbose >= 1:
                print('gta_ls: %d iterations, residual reduction %.3e'
                      % (it, res / res0_norm))
            return UX

        vs = als1_ls(A, Rk, tol=tol)
        for j in range(d):
            y = vs[j] - U[j].dot(U[j].T.dot(vs[j]))
            U[j] = np.column_stack((U[j], y / np.linalg.norm(y)))


################################################################################
# Tensor format classes
################################################################################

class CanonicalTensor:
    """A tensor in CP (canonical) format: a sum of `R` rank-1 terms, stored as
    `d` factor matrices of shape ``(n_k, R)``."""

    def __init__(self, Xs):
        self.Xs = tuple(X[:, None] if X.ndim == 1 else X for X in Xs)
        self.ndim = len(self.Xs)
        self.shape = tuple(X.shape[0] for X in self.Xs)
        self.R = self.Xs[0].shape[1]
        assert all(X.shape[1] == self.R for X in self.Xs), 'invalid matrix shape'

    def __repr__(self):
        return '<%s shape=%s R=%s>' % (type(self).__name__, self.shape, self.R)

    @staticmethod
    def zeros(shape):
        return CanonicalTensor(np.zeros((n, 0)) for n in shape)

    @staticmethod
    def ones(shape):
        return CanonicalTensor(np.ones((n, 1)) for n in shape)

    @staticmethod
    def from_terms(terms):
        """Build a CP tensor from rank-1 terms given as tuples of vectors."""
        terms = list(terms)
        d = len(terms[0])
        return CanonicalTensor(
            np.column_stack([t[k] for t in terms]) for k in range(d))

    @staticmethod
    def from_tensor(A):
        """Convert from Tucker format (expanding the core entrywise)."""
        if isinstance(A, TuckerTensor):
            terms = []
            for index in np.ndindex(*A.R):
                a = A.X[index]
                if abs(a) > 1e-15:
                    xs = tuple(U[:, j] for U, j in zip(A.Us, index))
                    terms.append((a * xs[0],) + xs[1:])
            if terms:
                return CanonicalTensor.from_terms(terms)
            return CanonicalTensor.zeros(A.shape)
        raise TypeError('conversion from %s to canonical not implemented' % type(A))

    def copy(self):
        return CanonicalTensor(X.copy() for X in self.Xs)

    def asarray(self):
        if self.R == 0:
            return np.zeros(self.shape)
        return sum(outer(*term) for term in self.terms())

    def terms(self):
        """Iterate over the rank-1 terms as tuples of vectors."""
        for r in range(self.R):
            yield tuple(X[:, r] for X in self.Xs)

    def norm(self):
        return np.sqrt(sum(_dot_rank1(ti, tj)
                           for ti in self.terms() for tj in self.terms()))

    def nway_prod(self, Bs):
        Bs = tuple(Bs)
        if len(Bs) < self.ndim:
            Bs = Bs + (self.ndim - len(Bs)) * (None,)
        elif len(Bs) > self.ndim:
            raise ValueError('more operators than tensor axes')
        return CanonicalTensor(
            np.asarray(X) if B is None else B.dot(X)
            for B, X in zip(Bs, self.Xs))

    def ravel(self):
        return self.asarray().ravel()

    def __neg__(self):
        A = self.copy()
        return CanonicalTensor((-A.Xs[0],) + A.Xs[1:])

    def __add__(self, T2):
        assert self.shape == T2.shape, 'incompatible shapes'
        if isinstance(T2, CanonicalTensor):
            return CanonicalTensor(np.hstack((X1, X2))
                                   for X1, X2 in zip(self.Xs, T2.Xs))
        if isinstance(T2, TuckerTensor):
            return TuckerTensor.from_tensor(self) + T2
        if isinstance(T2, np.ndarray):
            return self.asarray() + T2
        raise TypeError('cannot add CanonicalTensor and %s' % type(T2))

    def __sub__(self, T2):
        return self + (-T2)

    def squeeze(self, axis=None):
        """Eliminate singleton axes (like :func:`numpy.squeeze`)."""
        axis = _check_squeeze_axes(self, axis)
        if len(axis) == 0:
            return self
        if len(axis) == self.ndim:
            return self.ravel()[0]
        remaining = sorted(set(range(self.ndim)) - set(axis))
        # multiply the (1 x R) singleton factors into the first remaining one
        factors = self.Xs[axis[0]].copy()
        for i in axis[1:]:
            factors *= self.Xs[i]
        Xs = [self.Xs[i] for i in remaining]
        Xs[0] = Xs[0] * factors
        return CanonicalTensor(Xs)

    def __getitem__(self, I):
        I, shp, singl = _normalize_indices(I, self.shape)
        A = CanonicalTensor(X[Ik] for X, Ik in zip(self.Xs, I))
        assert A.shape == shp
        return A.squeeze(axis=singl)


def _check_squeeze_axes(T, axis):
    if axis is None:
        return tuple(i for i in range(T.ndim) if T.shape[i] == 1)
    if np.isscalar(axis):
        axis = (axis,)
    if not all(T.shape[i] == 1 for i in axis):
        raise ValueError('all given axes must be singletons!')
    return tuple(axis)


class TuckerTensor:
    """A tensor in Tucker format: factor matrices ``U_k (n_k x m_k)`` and a
    core tensor of shape ``(m_1, ..., m_d)``."""

    def __init__(self, Us, X):
        self.Us = tuple(Us)
        self.X = X
        self.ndim = len(self.Us)
        assert self.ndim == X.ndim, 'Incompatible sizes'
        self.shape = tuple(U.shape[0] for U in self.Us)
        self.R = self.X.shape

    def __repr__(self):
        return '<%s shape=%s R=%s>' % (type(self).__name__, self.shape, self.R)

    @staticmethod
    def zeros(shape):
        return TuckerTensor.from_tensor(CanonicalTensor.zeros(shape))

    @staticmethod
    def ones(shape):
        return TuckerTensor.from_tensor(CanonicalTensor.ones(shape))

    @staticmethod
    def from_tensor(A):
        if isinstance(A, CanonicalTensor):
            X = np.zeros(A.ndim * (A.R,))
            np.fill_diagonal(X, 1.0)
            return TuckerTensor(A.Xs, X)
        if isinstance(A, TuckerTensor):
            return A
        U = tuple(np.eye(n) for n in np.shape(A))
        return TuckerTensor(U, asarray(A))

    def copy(self):
        return TuckerTensor((U.copy() for U in self.Us), self.X.copy())

    def asarray(self):
        return apply_tprod(self.Us, self.X)

    def orthogonalize(self):
        """Equivalent Tucker tensor whose factors have orthonormal columns."""
        QR = [scipy.linalg.qr(U, mode='economic', check_finite=False)
              for U in self.Us]
        return TuckerTensor([q for q, _ in QR],
                            apply_tprod([r for _, r in QR], self.X))

    def norm(self):
        return fro_norm(self.orthogonalize().X)

    def truncate(self, k):
        """Truncate to multilinear rank `k` (scalar or per-axis tuple)."""
        if np.isscalar(k):
            slices = self.ndim * (slice(None, k),)
        else:
            assert len(k) == self.ndim
            slices = tuple(slice(None, ki) for ki in k)
        return TuckerTensor([U[:, s] for U, s in zip(self.Us, slices)],
                            self.X[slices])

    def compress(self, tol=1e-15, rtol=1e-15):
        """Rank-compress via orthogonalization + core HOSVD + greedy truncation."""
        T = self.orthogonalize()
        tol = max(tol, fro_norm(T.X) * rtol)
        core_svd = hosvd(T.X)
        truncated = core_svd.truncate(find_truncation_rank(core_svd.X, tol))
        return truncated.nway_prod(T.Us)

    def nway_prod(self, Bs):
        Bs = tuple(Bs)
        if len(Bs) < self.ndim:
            Bs = Bs + (self.ndim - len(Bs)) * (None,)
        elif len(Bs) > self.ndim:
            raise ValueError('more operators than tensor axes')
        return TuckerTensor(
            (np.asarray(U) if B is None else B.dot(U)
             for B, U in zip(Bs, self.Us)), self.X)

    def ravel(self):
        return self.asarray().ravel()

    def __add__(self, T2):
        assert T2.shape == self.shape, 'incompatible shapes'
        if isinstance(T2, TuckerTensor):
            U, X1, X2 = join_tucker_bases(self, T2)
            return TuckerTensor(U, X1 + X2)
        if isinstance(T2, CanonicalTensor):
            return self + TuckerTensor.from_tensor(T2)
        if isinstance(T2, np.ndarray):
            return self.asarray() + T2
        raise TypeError('cannot add TuckerTensor and %s' % type(T2))

    def __sub__(self, T2):
        assert T2.shape == self.shape, 'incompatible shapes'
        if isinstance(T2, TuckerTensor):
            U, X1, X2 = join_tucker_bases(self, T2)
            return TuckerTensor(U, X1 - X2)
        return self + (-T2)

    def __neg__(self):
        return TuckerTensor((U.copy() for U in self.Us), -self.X)

    def squeeze(self, axis=None):
        axis = _check_squeeze_axes(self, axis)
        if len(axis) == 0:
            return self
        if len(axis) == self.ndim:
            return self.ravel()[0]
        remaining = sorted(set(range(self.ndim)) - set(axis))
        factors = self.ndim * [None]
        for i in axis:
            factors[i] = self.Us[i]     # shape 1 x R_i
        X = apply_tprod(factors, self.X).squeeze(axis)
        return TuckerTensor((self.Us[i] for i in remaining), X)

    def __getitem__(self, I):
        I, shp, singl = _normalize_indices(I, self.shape)
        T = TuckerTensor((U[Ik] for U, Ik in zip(self.Us, I)), self.X)
        assert T.shape == shp
        return T.squeeze(axis=singl)


def join_tucker_bases(T1, T2):
    """Represent two Tucker tensors in the concatenated joint basis; returns
    ``(U, X1, X2)`` with ``T1 == TuckerTensor(U, X1)`` etc."""
    assert T1.shape == T2.shape
    U = tuple(np.hstack((U1, U2)) for U1, U2 in zip(T1.Us, T2.Us))
    X1 = np.pad(T1.X, tuple((0, n) for n in T2.X.shape), 'constant')
    X2 = np.pad(T2.X, tuple((n, 0) for n in T1.X.shape), 'constant')
    return U, X1, X2


class TensorSum:
    """Formal sum of tensors of identical shape (kept unexpanded)."""

    def __init__(self, *Xs):
        self.Xs = tuple(Xs)
        assert self.Xs, 'cannot form sum of empty list of tensors'
        self.ndim = self.Xs[0].ndim
        self.shape = self.Xs[0].shape
        assert all(X.shape == self.shape for X in self.Xs), \
            'tensors must have identical shape'

    def __repr__(self):
        return '<%s shape=%s nterms=%s>' % (type(self).__name__, self.shape,
                                            len(self.Xs))

    def asarray(self):
        A = np.array(asarray(self.Xs[0]))
        for X in self.Xs[1:]:
            A = A + asarray(X)
        return A

    def ravel(self):
        return self.asarray().ravel()

    def nway_prod(self, Bs):
        return TensorSum(*(apply_tprod(Bs, X) for X in self.Xs))

    def __add__(self, T2):
        return TensorSum(*(self.Xs + (T2,)))

    def __sub__(self, T2):
        return TensorSum(*(self.Xs + (-T2,)))

    def __neg__(self):
        return TensorSum(*(-X for X in self.Xs))

    def __getitem__(self, I):
        Ys = tuple(X[I] for X in self.Xs)
        if all(np.isscalar(Y) for Y in Ys):
            return sum(Ys)
        return TensorSum(*Ys)


class TensorProd:
    """Formal tensor (outer) product of tensors; axes are concatenated."""

    def __init__(self, *Xs):
        self.Xs = tuple(Xs)
        shp = ()
        self.slices = []
        for X in self.Xs:
            start = len(shp)
            shp = shp + X.shape
            self.slices.append(slice(start, len(shp)))
        self.ndim = len(shp)
        self.shape = shp

    def __repr__(self):
        return '<%s shape=%s nterms=%s>' % (type(self).__name__, self.shape,
                                            len(self.Xs))

    def asarray(self):
        return array_outer(*(asarray(X) for X in self.Xs))

    def ravel(self):
        return self.asarray().ravel()

    def nway_prod(self, Bs):
        return TensorProd(*(apply_tprod(Bs[sl], X)
                            for sl, X in zip(self.slices, self.Xs)))

    def __add__(self, T2):
        return TensorSum(self, T2)

    def __sub__(self, T2):
        return TensorSum(self, -T2)

    def __neg__(self):
        return TensorProd(*((-self.Xs[0],) + self.Xs[1:]))

    def __getitem__(self, I):
        if not isinstance(I, tuple):
            I = (I,)
        if len(I) > self.ndim:
            raise ValueError('too many indices')
        I = I + (self.ndim - len(I)) * (slice(None),)
        Ys = tuple(X[I[sl]] for X, sl in zip(self.Xs, self.slices))
        if all(np.isscalar(Y) for Y in Ys):
            return np.prod(Ys)
        return TensorProd(*Ys)


################################################################################
# Sum-of-Kronecker operators
################################################################################

class CanonicalOperator:
    r"""A linear operator in low Kronecker-rank format:
    :math:`\mathcal A = \sum_r A^1_r \otimes \cdots \otimes A^d_r`.

    `terms` is a list of `d`-tuples of matrices (one tuple per Kronecker term).
    Applying the operator never materializes the Kronecker product; each term
    is an :func:`apply_tprod` (per-axis matmuls, MXU-friendly on device)."""

    def __init__(self, terms):
        self.terms = list(terms)
        self.R = len(self.terms)
        d = len(self.terms[0])
        assert all(self.terms[r][j].shape == self.terms[0][j].shape
                   for r in range(self.R) for j in range(d)), 'inconsistent shapes'
        shapeout = tuple(A.shape[0] for A in self.terms[0])
        shapein = tuple(A.shape[1] for A in self.terms[0])
        self.shape = (shapeout, shapein)
        self.ndim = d

    def __repr__(self):
        return '<%s %s -> %s R=%s>' % (type(self).__name__, self.shape[1],
                                       self.shape[0], self.R)

    @staticmethod
    def eye(ns, format='dia'):
        return CanonicalOperator([[scipy.sparse.eye(n, format=format)
                                   for n in ns]])

    def asmatrix(self, format='csr'):
        """The raveled operator as a sparse matrix."""
        from .utils import multi_kron_sparse
        X = multi_kron_sparse(self.terms[0], format=format)
        for j in range(1, self.R):
            X = X + multi_kron_sparse(self.terms[j], format=format)
        return X

    @property
    def T(self):
        return CanonicalOperator([tuple(B.T for B in t) for t in self.terms])

    def __add__(self, other):
        assert isinstance(other, CanonicalOperator), \
            'can only add CanonicalOperators to each other'
        assert self.shape == other.shape, 'incompatible shapes'
        return CanonicalOperator(self.terms + other.terms)

    def __neg__(self):
        return CanonicalOperator([(-t[0],) + tuple(t[1:]) for t in self.terms])

    def __sub__(self, other):
        return self + (-other)

    def __mul__(self, other):
        assert isinstance(other, CanonicalOperator)
        assert self.shape[1] == other.shape[0], 'incompatible shapes'
        return CanonicalOperator([
            tuple(a.dot(b) for a, b in zip(t1, t2))
            for t1 in self.terms for t2 in other.terms])

    def kron(self, other):
        """Kronecker product of two canonical operators (axes concatenated)."""
        return CanonicalOperator([tuple(t1) + tuple(t2)
                                  for t1 in self.terms for t2 in other.terms])

    def apply(self, X):
        """Apply to a tensor of shape ``self.shape[1]``."""
        assert X.shape == self.shape[1], 'wrong shape of input tensor'
        return reduce(operator.add, (apply_tprod(t, X) for t in self.terms))

    def __matmul__(self, X):
        if isinstance(X, CanonicalOperator):
            return self * X
        return self.apply(X)

    def slice(self, limits):
        """Restrict every factor to the index window ``limits[k] = (lo, hi)``."""
        return CanonicalOperator([
            tuple(A[l[0]:l[1], l[0]:l[1]] for A, l in zip(term, limits))
            for term in self.terms])
