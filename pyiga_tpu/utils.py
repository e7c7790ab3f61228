# -*- coding: utf-8 -*-
"""Shared helpers: grid evaluation, sparse Kronecker utilities, lazy grids.

API parity with /root/reference/pyiga/utils.py.  The heavyweight Cython-backed
CSR helpers of the reference (CSRRowSlice/CSRRowSubset) are plain scipy here;
they sit on setup paths, not the device hot path.
"""

import itertools

import numpy as np
import scipy.sparse


def _fill_grid(values, shape):
    """Broadcast `values` onto the leading grid axes (functions that ignore
    an argument return under-broadcast arrays); trailing component axes are
    kept."""
    values = np.asanyarray(values)
    want = shape + values.shape[len(shape):]
    return values if values.shape == want else np.broadcast_to(values, want)


def _ensure_grid_shape(values, grid):
    """Normalize a function result over a tensor grid: tuple components are
    stacked into a trailing axis, everything is broadcast to the grid."""
    shape = tuple(map(len, grid))
    if isinstance(values, tuple):
        values = np.stack([_fill_grid(v, shape) for v in values], axis=-1)
    return _fill_grid(values, shape)


def grid_eval(f, grid):
    """Evaluate `f` over the tensor grid `grid` (axes in ZYX order; a plain
    callable receives XYZ-ordered meshgrid coordinate arrays)."""
    if hasattr(f, 'grid_eval'):
        return f.grid_eval(grid)
    mesh = list(np.meshgrid(*grid, sparse=True, indexing='ij'))
    mesh.reverse()      # ZYX grid axes -> XYZ arguments
    return _ensure_grid_shape(f(*mesh), grid)


def grid_eval_transformed(f, grid, geo):
    """Evaluate `f` on the image of the tensor grid under the geometry map."""
    phys = grid_eval(geo, grid)     # shape(grid) x dim
    coords = tuple(phys[..., i] for i in range(phys.shape[-1]))
    return _ensure_grid_shape(f(*coords), grid)


def read_sparse_matrix(fname):
    """Load a 1-based ``i j value`` triplet text file (the golden-fixture
    format used by the reference test suite) as a CSR matrix."""
    I, J, vals = np.loadtxt(fname, skiprows=1, unpack=True)
    return scipy.sparse.coo_matrix(
        (vals, (I.astype(int) - 1, J.astype(int) - 1))).tocsr()


def multi_kron_sparse(As, format='csr'):
    """Sparse Kronecker product of a sequence of sparse matrices."""
    As = list(As)
    if len(As) == 1:
        return As[0].asformat(format, copy=True)
    result = As[-1]
    for A in reversed(As[:-1]):
        result = scipy.sparse.kron(A, result, format=format)
    return result


def kron_partial(As, rows, restrict=False, format='csr'):
    """Assemble only the given `rows` of the Kronecker product of the sparse
    matrices `As`.  With ``restrict=True`` the result has ``len(rows)`` rows;
    otherwise it has the full Kronecker shape with other rows zero.

    This is the workhorse for THB ``represent_fine`` (reference: utils.py:69).
    """
    from .mlmatrix import MLStructure
    S = MLStructure.from_kronecker(As)
    out_shape = (len(rows), S.shape[1]) if restrict else S.shape

    if restrict:
        I, J, I_idx = S.nonzeros_for_rows(rows, renumber_rows=True)
    else:
        I, J = S.nonzeros_for_rows(rows)
    if len(I) == 0:
        return scipy.sparse.csr_matrix(out_shape)

    bs_I = tuple(S.bs[k][0] for k in range(S.L))
    bs_J = tuple(S.bs[k][1] for k in range(S.L))
    I_ix = np.unravel_index(I, bs_I)
    J_ix = np.unravel_index(J, bs_J)
    entries = np.ones(len(I))
    for k in range(S.L):
        Ak = scipy.sparse.csr_matrix(As[k])
        vals = np.asarray(Ak[I_ix[k], J_ix[k]]).ravel()
        entries = entries * vals
    if restrict:
        I = I_idx
    return scipy.sparse.coo_matrix((entries, (I, J)),
                                   shape=out_shape).asformat(format)


def cartesian_product(arrays):
    """Cartesian product of 1D arrays as an ``(N, L)`` array (last axis fastest)."""
    L = len(arrays)
    shp = tuple(a.shape[0] for a in arrays)
    out = np.empty(shp + (L,), dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        ix = [np.newaxis] * L
        ix[i] = slice(None)
        out[..., i] = a[tuple(ix)]
    return out.reshape(-1, L)


class CSRRowSlice:
    """Apply a contiguous row slice of a CSR matrix without materializing the
    submatrix."""

    def __init__(self, A, row_bounds):
        assert isinstance(A, scipy.sparse.csr_matrix)
        lo, hi = row_bounds
        assert 0 <= lo <= hi <= A.shape[0], 'invalid row bounds'
        self.A = A
        self.bounds = (lo, hi)
        self.shape = (hi - lo, A.shape[1])
        self.dtype = A.dtype

    def _matmat(self, other):
        lo, hi = self.bounds
        # scipy row slicing of CSR is cheap for contiguous blocks
        return self.A[lo:hi].dot(other)

    __mul__ = _matmat
    dot = _matmat


class CSRRowSubset:
    """Apply an arbitrary subset of the rows of a CSR matrix to a vector."""

    def __init__(self, A, rows):
        assert isinstance(A, scipy.sparse.csr_matrix)
        self.A = A
        self.rows = np.asarray(rows, dtype=np.int64)
        self.shape = (len(rows), A.shape[1])
        self.dtype = A.dtype

    def _matvec(self, other):
        return self.A[self.rows].dot(other)

    __mul__ = _matvec
    dot = _matvec


class LazyArray:
    """Lazily evaluate a function over a tensor grid with slicing notation."""

    def __init__(self, f, grid, mode='eval'):
        self.f = f
        self.grid = grid
        self.mode = mode

    def _eval(self, localgrid):
        if self.mode == 'eval':
            return grid_eval(self.f, localgrid)
        if self.mode == 'jac':
            return self.f.grid_jacobian(localgrid)
        raise ValueError('invalid mode: %s' % (self.mode,))

    def __getitem__(self, I):
        assert len(I) == len(self.grid), 'Wrong number of indices'
        return self._eval(tuple(g[i] for g, i in zip(self.grid, I)))


class LazyCachingArray(LazyArray):
    """Like :class:`LazyArray` but caches already-computed values tile-wise.

    .. warning:: only correct if output is requested in full consecutive tiles.
    """

    def __init__(self, f, outshape, grid, tilesize, mode='eval'):
        super().__init__(f, grid, mode)
        self.outshape = outshape
        self.ts = tilesize
        self.tiles = {}

    def get_tile(self, I):
        T = self.tiles.get(I)
        if T is None:
            ts = self.ts
            localgrid = tuple(g[i * ts:(i + 1) * ts]
                              for g, i in zip(self.grid, I))
            T = self._eval(localgrid)
            self.tiles[I] = T
        return T

    def __getitem__(self, I):
        assert len(I) == len(self.grid), 'Wrong number of indices'
        idx = tuple(tuple(range(sl.start, sl.stop)) for sl in I)
        N = tuple(len(gi) for gi in idx)
        output = np.empty(N + self.outshape)
        ts = self.ts
        tiles = tuple(range(gi[0] // ts, (gi[-1] + ts - 1) // ts) for gi in idx)
        J0 = tuple(gi[0] // ts for gi in idx)
        for J in itertools.product(*tiles):
            dest = tuple(slice((j - j0) * ts, (j - j0 + 1) * ts)
                         for j, j0 in zip(J, J0))
            output[dest] = self.get_tile(J)
        return output


class BijectiveIndex:
    """Bidirectional map between a list of values and indices ``0..len-1``."""

    def __init__(self, values):
        self.values = values
        self._index = {v: i for i, v in enumerate(values)}

    def __len__(self):
        return len(self.values)

    def __getitem__(self, i):
        return self.values[i]

    def index(self, v):
        return self._index[v]


class _DummyPbar:
    """No-op stand-in for tqdm."""

    def __init__(self, *args, **kwargs):
        self.r = args[0] if args else None

    def __iter__(self):
        return iter(self.r)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass

    def update(self, *args, **kwargs):
        pass

    def close(self):
        pass

    def set_postfix(self, *args, **kwargs):
        pass


def progress_bar(enable=True):
    """Return tqdm if available and enabled, else a no-op progress bar."""
    if enable:
        try:
            import tqdm
            import warnings
            warnings.simplefilter('ignore', tqdm.TqdmWarning)
            return tqdm.tqdm
        except ImportError:
            pass
    return _DummyPbar
