"""Fully device-resident local-multigrid V-cycle solver.

Round-3 measurement: driving the local MG solve from the host costs ~4
device dispatches per V-cycle (each ~28 ms through the tunnel) for the
smoother alone, while restriction/prolongation/residual run host scipy —
123 ms/iteration for a problem whose per-level arithmetic is microseconds
(BENCH_r03: 0.043x the CPU baseline).  This module applies the cg_ir
medicine: the ENTIRE iterative solve — order-exact wavefront Gauss-Seidel
smoothing (:mod:`pyiga_tpu.ops.relax`), per-level residuals and grid
transfers (padded-ELL sparse matvecs), the dense coarse inverse, and the
convergence check of :func:`pyiga_tpu.solvers.iterative_solve` — runs as
ONE jitted ``lax.while_loop`` device program; the host fetches the
solution and the iteration count at the end.

The operation order reproduces the reference V-cycle exactly
(/root/reference/pyiga/solvers.py:174-241 ``local_mg_step`` +
``iterative_solve`` :243); iteration counts are the behavioral contract
(reference test/test_localmg.py) and are asserted bit-exactly in
tests/test_localmg.py for this backend too.
"""

import numpy as np

from .relax import level_schedule, _pack_sweep

_SWEEP_DIRS = {'forward': (False,), 'backward': (True,),
               'symmetric': (False, True)}


def ell_pack(A, dtype=np.float64):
    """CSR matrix -> padded ELL arrays ``(cols (n, W) int32, vals (n, W))``
    with zero-padding; the matvec is ``sum(vals * x[cols], axis=-1)``."""
    import scipy.sparse
    if not scipy.sparse.isspmatrix_csr(A):
        A = scipy.sparse.csr_matrix(A)
    n = A.shape[0]
    counts = np.diff(A.indptr)
    W = max(int(counts.max()) if n else 0, 1)
    cols = np.zeros((n, W), dtype=np.int32)
    vals = np.zeros((n, W), dtype=dtype)
    for i in range(n):
        lo, hi = A.indptr[i], A.indptr[i + 1]
        cols[i, :hi - lo] = A.indices[lo:hi]
        vals[i, :hi - lo] = A.data[lo:hi]
    return cols, vals


def _ell_mv(ell, x):
    """Padded-ELL matvec (traced)."""
    cols, vals = ell
    return (vals * x[cols]).sum(axis=-1)


def _smooth(passes, iterations, x, b):
    """Order-exact wavefront GS application (traced; see ops/relax.py)."""
    import jax.numpy as jnp
    from jax import lax

    def one_pass(x, pack):
        rows, cols, vals, diag = pack

        def body(l, x):
            r = rows[l]
            z = jnp.sum(vals[l] * x[cols[l]], axis=-1)
            fi = b.at[r].get(mode='fill', fill_value=0.0)
            return x.at[r].set((fi - z) / diag[l], mode='drop')

        return lax.fori_loop(0, rows.shape[0], body, x)

    for _ in range(iterations):
        for pack in passes:
            x = one_pass(x, pack)
    return x


def _smooth_tri(passes, iterations, x, b):
    """GS sweeps as dense triangular-inverse updates with gather/scatter
    index selection (traced; see :func:`_tri_smoother_pack`)."""
    for _ in range(iterations):
        for (S, ell, T) in passes:
            r = b[S] - _ell_mv(ell, x)
            x = x.at[S].add(T @ r)
    return x


def _smooth_densemat(passes, iterations, x, b):
    """GS sweeps as pure dense matmul chains: selection and scatter ride
    0/1 one-hot matrices (exact), so the whole sweep is three matvecs.
    On TPU an f64-emulated matvec costs ~2 ns per OUTPUT element (~us at
    these sizes) while each XLA gather/scatter costs ~0.7-1.5 ms — the
    gather/scatter formulation measured 18.6 ms per V-cycle on hardware,
    dominated by exactly those ops."""
    for _ in range(iterations):
        for (Asel, T, Esc) in passes:
            r = Esc.T @ b - Asel @ x
            x = x + Esc @ (T @ r)
    return x


def _tri_smoother_pack(A, indices, reverse=False, dense=False):
    """Dense-triangular form of one GS sweep over `indices` (in order;
    reversed if `reverse`) on CSR ``A``: the sweep is algebraically
    ``x_S += M^{-1} (b - A x)_S`` with ``M`` the lower (upper, for a
    reversed sweep) triangle of ``A[S][:, S]`` *in sweep-order basis* —
    one dense (m, m) apply replaces the ~wavefront-depth sequence of tiny
    sequential gather/scatter steps, which cost ~31 us each on the TPU
    (BENCH_r04 run 1: 717 ms device for a 29-iteration solve).

    Zero/missing-diagonal rows keep the reference's skip semantics
    (relaxation_cy.pyx:62): their update row is zeroed (dx_i = 0), and
    later rows correctly see the old value through the zero contribution.

    Returns ``(S, ell_rows, T)`` with ``ell_rows`` the padded-ELL rows
    ``A[S, :]`` and ``T = M^{-1}`` dense; with ``dense=True`` returns
    ``(A[S, :] dense, T, E_scatter)`` for the all-matmul formulation
    (:func:`_smooth_densemat`)."""
    import scipy.sparse
    if not scipy.sparse.isspmatrix_csr(A):
        A = scipy.sparse.csr_matrix(A)
    S = np.asarray(indices, dtype=np.int64)
    A_SS = A[S][:, S].toarray()
    M = np.triu(A_SS) if reverse else np.tril(A_SS)
    diag = np.diagonal(A_SS).copy()
    dead = diag == 0.0
    if dead.any():
        M[dead, :] = 0.0
        M[dead, dead] = 1.0
    T = np.linalg.inv(M)
    if dead.any():
        T[dead, :] = 0.0
    if dense:
        n = A.shape[1]
        Esc = np.zeros((n, len(S)))
        Esc[S, np.arange(len(S))] = 1.0
        return np.asarray(A[S].todense()), T, Esc
    ell = ell_pack(A[S])
    return S.astype(np.int32), ell, T


class DeviceMGSolver:
    """One-dispatch local multigrid solver for a fixed hierarchy.

    Args mirror :func:`pyiga_tpu.solvers.local_mg_step`: the Galerkin
    matrix hierarchy ``As`` (finest last), virtual-hierarchy prolongators
    ``Ps`` (``Ps[lv]``: level lv -> lv+1), per-level smoothing index sets
    ``lv_inds``, the GS sweep directions ``(pre, post)`` and
    ``smooth_steps``.  ``active_dofs`` masks the convergence residual
    (:func:`~pyiga_tpu.solvers.iterative_solve` semantics).

    ``smoother_impl`` selects the kernel set: ``'dense'`` (default below
    ``dense_cutoff`` finest dofs) lowers the ENTIRE cycle to dense
    matmuls — triangular-inverse smoothing with one-hot selection/scatter
    matrices, dense level matrices and transfers — because on TPU an
    f64-emulated matvec costs ~us at these sizes while every XLA
    gather/scatter costs ~ms (measured: 18.6 -> ~1 ms per V-cycle);
    ``'tri'`` keeps padded-ELL matvecs + gather/scatter triangular
    smoothing (O(nnz) memory, for larger hierarchies); ``'wavefront'``
    the order-exact dependency-wavefront kernel of
    :mod:`pyiga_tpu.ops.relax`.  All reproduce the host path's iteration
    counts (tests/test_localmg.py)."""

    def __init__(self, As, Ps, lv_inds, sweeps, smooth_steps,
                 active_dofs=None, smoother_impl='auto',
                 dense_cutoff=6000):
        import jax.numpy as jnp
        L = len(As)
        assert len(Ps) == L - 1
        pre_sweep, post_sweep = sweeps
        n = As[-1].shape[0]
        if smoother_impl == 'auto':
            smoother_impl = 'dense' if n <= dense_cutoff else 'tri'
        assert smoother_impl in ('dense', 'tri', 'wavefront')
        dense = smoother_impl == 'dense'

        def op(M):
            if dense:
                return jnp.asarray(np.asarray(M.todense()))
            return tuple(map(jnp.asarray, ell_pack(M.tocsr())))

        params = {}
        params['A'] = [op(As[lv]) for lv in range(1, L)]
        params['Afine'] = params['A'][-1] if L > 1 else op(As[0])
        params['P'] = [op(Ps[lv]) for lv in range(L - 1)]
        params['PT'] = [op(Ps[lv].T) for lv in range(L - 1)]

        if smoother_impl in ('dense', 'tri'):
            def packs(lv, sweep):
                return tuple(
                    tuple(jnp.asarray(a) if not isinstance(a, tuple)
                          else tuple(map(jnp.asarray, a))
                          for a in _tri_smoother_pack(As[lv], lv_inds[lv],
                                                      reverse=reverse,
                                                      dense=dense))
                    for reverse in _SWEEP_DIRS[sweep])
        else:
            def packs(lv, sweep):
                out = []
                for reverse in _SWEEP_DIRS[sweep]:
                    order, level = level_schedule(As[lv], lv_inds[lv],
                                                  reverse=reverse)
                    out.append(tuple(jnp.asarray(a) for a in
                                     _pack_sweep(As[lv], order, level)))
                return tuple(out)

        params['pre'] = [packs(lv, pre_sweep) for lv in range(1, L)]
        params['post'] = ([] if post_sweep == pre_sweep else
                          [packs(lv, post_sweep) for lv in range(1, L)])

        # coarsest level: dense inverse of the smoothing-set block, applied
        # as a matmul (the host path's make_solver(spd=True) up to ~1e-15)
        ind0 = np.asarray(lv_inds[0], dtype=np.int32)
        A0 = As[0][lv_inds[0]][:, lv_inds[0]].toarray()
        params['Cinv'] = jnp.asarray(np.linalg.inv(A0))
        if dense:
            E0 = np.zeros((As[0].shape[0], len(ind0)))
            E0[ind0, np.arange(len(ind0))] = 1.0
            params['E0'] = jnp.asarray(E0)
        else:
            params['ind0'] = jnp.asarray(ind0)

        mask = np.zeros(n)
        if active_dofs is None:
            mask[:] = 1.0
        else:
            mask[np.asarray(active_dofs)] = 1.0
        params['mask'] = jnp.asarray(mask)

        self.params = params
        self.L = L
        self.n0 = As[0].shape[0]
        self.same_sweeps = post_sweep == pre_sweep
        self.smooth_steps = smooth_steps
        self.smoother_impl = smoother_impl

    def solve(self, f, tol=1e-8, maxiter=5000):
        """Run ``x <- vcycle(x)`` until the masked residual drops by
        ``tol``; returns ``(x, iterations)`` with ``inf`` iterations on
        non-convergence (host-side semantics of ``iterative_solve``)."""
        import jax.numpy as jnp
        fn = _solve_fn(self.L, self.n0, self.smooth_steps,
                       self.same_sweeps, self.smoother_impl)
        x, res, res0, it = fn(self.params, jnp.asarray(f),
                              float(tol), int(maxiter))
        it = int(it)
        converged = float(res) / float(res0) < tol
        return np.asarray(x), (it if converged else np.inf)


_SOLVE_CACHE = {}


def _solve_fn(L, n0, steps, same, impl='dense'):
    """The jitted one-dispatch MG solve, cached per static configuration
    (jax.jit caches by function identity: a per-instance closure would
    re-trace/re-compile on every ``solve_hmultigrid`` call)."""
    key = (L, n0, steps, same, impl)
    fn = _SOLVE_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp
    from jax import lax
    smooth = {'dense': _smooth_densemat, 'tri': _smooth_tri,
              'wavefront': _smooth}[impl]

    def mv(op, x):
        return _ell_mv(op, x) if isinstance(op, tuple) else op @ x

    def vcycle(p, x, f):
        pre, post = p['pre'], (p['pre'] if same else p['post'])
        xs, rhss = [None] * L, [None] * L
        xs[L - 1], rhss[L - 1] = x, f
        for lv in range(L - 1, 0, -1):
            xs[lv] = smooth(pre[lv - 1], steps, xs[lv], rhss[lv])
            r = rhss[lv] - mv(p['A'][lv - 1], xs[lv])
            rhss[lv - 1] = mv(p['PT'][lv - 1], r)
            xs[lv - 1] = jnp.zeros_like(rhss[lv - 1])
        if impl == 'dense':
            xs[0] = p['E0'] @ (p['Cinv'] @ (p['E0'].T @ rhss[0]))
        else:
            x0 = jnp.zeros(n0, rhss[0].dtype)
            xs[0] = x0.at[p['ind0']].set(p['Cinv'] @ rhss[0][p['ind0']])
        for lv in range(1, L):
            xs[lv] = xs[lv] + mv(p['P'][lv - 1], xs[lv - 1])
            xs[lv] = smooth(post[lv - 1], steps, xs[lv], rhss[lv])
        return xs[L - 1]

    def solve(p, f, tol, maxiter):
        mask = p['mask']
        res0 = jnp.linalg.norm(f * mask)

        def cond(c):
            x, res, it = c
            # iterative_solve's exact comparison form (counts contract)
            return jnp.logical_and(jnp.logical_not(res / res0 < tol),
                                   it < maxiter)

        def body(c):
            x, _, it = c
            x = vcycle(p, x, f)
            res = jnp.linalg.norm((f - mv(p['Afine'], x)) * mask)
            return x, res, it + 1

        x = jnp.zeros_like(f)
        x, res, it = lax.while_loop(cond, body, (x, res0, 0))
        return x, res, res0, it

    fn = jax.jit(solve, static_argnames=('maxiter',))
    _SOLVE_CACHE[key] = fn
    return fn
