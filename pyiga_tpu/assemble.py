# -*- coding: utf-8 -*-
"""High-level assembly API.

L6 layer, API parity with /root/reference/pyiga/assemble.py: 1D reference
assemblers, Kronecker fast paths, the generic assembly driver, right-hand
sides, Dirichlet boundary conditions and restricted linear systems,
integration.

Matrix conventions (same as reference): rows = test functions, columns =
trial functions; vector-valued problems support 'blocked' (component-major)
and 'packed' (interleaved) layouts.
"""

import itertools
import math

import numpy as np
import scipy.sparse

from . import assemblers, bspline, operators, tensor, utils
from .bspline import KnotVector
from .mlmatrix import MLStructure
from .quadrature import make_iterated_quadrature, make_tensor_quadrature


################################################################################
# 1D assemblers
################################################################################

def bsp_mixed_deriv_biform_1d(knotvec, du, dv, nqp=None, weightfunc=None):
    """1D matrix for ``a(u,v) = int weight * u^(du) v^(dv)``; computed as
    ``C_dv^T diag(w) C_du`` with per-span Gauss quadrature."""
    if nqp is None:
        nqp = int(math.ceil((2 * knotvec.p - du - dv + 1) / 2.0))
    nodes, weights = make_iterated_quadrature(knotvec.mesh, nqp)
    C = bspline.collocation_derivs(knotvec, nodes, derivs=max(du, dv))
    if weightfunc is not None:
        weights = weights * utils.grid_eval(weightfunc, (nodes,))
    W = scipy.sparse.diags(weights)
    return (C[dv].T @ W @ C[du]).tocsr()


def bsp_mass_1d(knotvec, weightfunc=None):
    """1D mass matrix (optionally weighted)."""
    return bsp_mixed_deriv_biform_1d(knotvec, 0, 0, weightfunc=weightfunc)


def bsp_stiffness_1d(knotvec, weightfunc=None):
    """1D stiffness (Laplace) matrix (optionally weighted)."""
    return bsp_mixed_deriv_biform_1d(knotvec, 1, 1, weightfunc=weightfunc)


def bsp_mixed_deriv_biform_1d_asym(knotvec1, knotvec2, du, dv,
                                   quadgrid=None, nqp=None):
    """Petrov-Galerkin 1D matrix relating trial space `knotvec1` (`du`
    derivatives) and test space `knotvec2` (`dv` derivatives); result has
    shape ``knotvec2.numdofs x knotvec1.numdofs``."""
    if quadgrid is None:
        quadgrid = knotvec1.mesh
    if nqp is None:
        nqp = int(math.ceil((knotvec1.p + knotvec2.p - du - dv + 1) / 2.0))
    nodes, weights = make_iterated_quadrature(quadgrid, nqp)
    C1 = bspline.collocation_derivs(knotvec1, nodes, derivs=du)[du]
    C2 = bspline.collocation_derivs(knotvec2, nodes, derivs=dv)[dv]
    return (C2.T @ scipy.sparse.diags(weights) @ C1).tocsr()


def bsp_mass_1d_asym(knotvec1, knotvec2, quadgrid=None):
    return bsp_mixed_deriv_biform_1d_asym(knotvec1, knotvec2, 0, 0,
                                          quadgrid=quadgrid)


def bsp_stiffness_1d_asym(knotvec1, knotvec2, quadgrid=None):
    return bsp_mixed_deriv_biform_1d_asym(knotvec1, knotvec2, 1, 1,
                                          quadgrid=quadgrid)


################################################################################
# Multi-dimensional mass/stiffness with Kronecker fast paths
################################################################################

def bsp_mass_2d(knotvecs, geo=None, format='csr'):
    if geo is None:
        kv1, kv2 = knotvecs
        return scipy.sparse.kron(bsp_mass_1d(kv1), bsp_mass_1d(kv2),
                                 format=format)
    return assemble_entries(assemblers.MassAssembler2D(knotvecs, geo),
                            symmetric=True, format=format)


def bsp_stiffness_2d(knotvecs, geo=None, format='csr'):
    if geo is None:
        kv1, kv2 = knotvecs
        M1, M2 = bsp_mass_1d(kv1), bsp_mass_1d(kv2)
        K1, K2 = bsp_stiffness_1d(kv1), bsp_stiffness_1d(kv2)
        return (scipy.sparse.kron(K1, M2, format=format)
                + scipy.sparse.kron(M1, K2, format=format))
    return assemble_entries(assemblers.StiffnessAssembler2D(knotvecs, geo),
                            symmetric=True, format=format)


def bsp_mass_3d(knotvecs, geo=None, format='csr'):
    if geo is None:
        Ms = [bsp_mass_1d(kv) for kv in knotvecs]
        k = lambda A, B: scipy.sparse.kron(A, B, format=format)
        return k(Ms[0], k(Ms[1], Ms[2]))
    return assemble_entries(assemblers.MassAssembler3D(knotvecs, geo),
                            symmetric=True, format=format)


def bsp_stiffness_3d(knotvecs, geo=None, format='csr'):
    if geo is None:
        MK = [(bsp_mass_1d(kv), bsp_stiffness_1d(kv)) for kv in knotvecs]
        k = lambda A, B: scipy.sparse.kron(A, B, format=format)
        M12 = k(MK[1][0], MK[2][0])
        K12 = k(MK[1][1], MK[2][0]) + k(MK[1][0], MK[2][1])
        return k(MK[0][1], M12) + k(MK[0][0], K12)
    return assemble_entries(assemblers.StiffnessAssembler3D(knotvecs, geo),
                            symmetric=True, format=format)


################################################################################
# Right-hand sides and integration
################################################################################

def inner_products(kvs, f, f_physical=False, geo=None):
    """L2 inner products of all TP basis functions with `f` (the load
    vector), as an array of shape ``numdofs(kv) per axis`` (+ components)."""
    if isinstance(kvs, KnotVector):
        kvs = (kvs,)
    nqp = max(kv.p for kv in kvs) + 1
    gaussgrid, gaussweights = make_tensor_quadrature(
        [kv.mesh for kv in kvs], nqp)

    if f_physical:
        assert geo is not None, \
            'inner_products in physical domain requires geometry'
        fvals = utils.grid_eval_transformed(f, gaussgrid, geo)
    else:
        fvals = utils.grid_eval(f, gaussgrid)

    fvals = tensor.apply_tprod(
        [operators.DiagonalOperator(gw) for gw in gaussweights], fvals)
    if geo is not None:
        jac = geo.grid_jacobian(gaussgrid)
        geo_det = np.abs(np.linalg.det(jac))
        extra_dims = fvals.ndim - geo_det.ndim
        if extra_dims > 0:
            geo_det = geo_det.reshape(geo_det.shape + extra_dims * (1,))
        fvals = fvals * geo_det
    Ct = [bspline.collocation(kvs[i], gaussgrid[i]).T for i in range(len(kvs))]
    return tensor.apply_tprod(Ct, fvals)


def integrate(kvs, f, f_physical=False, geo=None):
    """Integral of `f` over the domain described by `geo` (or the parameter
    domain), using the same Gauss rule as the assemblers."""
    if isinstance(kvs, KnotVector):
        kvs = (kvs,)
    nqp = max(kv.p for kv in kvs) + 1
    gaussgrid, gaussweights = make_tensor_quadrature(
        [kv.mesh for kv in kvs], nqp)

    if f_physical:
        assert geo is not None, 'integrate in physical domain requires geometry'
        fvals = utils.grid_eval_transformed(f, gaussgrid, geo)
    else:
        fvals = utils.grid_eval(f, gaussgrid)

    fvals = tensor.apply_tprod(
        [operators.DiagonalOperator(gw) for gw in gaussweights], fvals)
    if geo is not None:
        jac = geo.grid_jacobian(gaussgrid)
        fvals = fvals * np.abs(np.linalg.det(jac))
    return fvals.sum(axis=tuple(range(len(kvs))))


################################################################################
# Dirichlet boundary conditions
################################################################################

def slice_indices(ax, idx, shape, ravel=False, flip=None):
    """Dof indices of the slice at index `idx` along axis `ax` of a TP basis
    with the given `shape`; as multi-indices or raveled (`ravel=True`)."""
    shape = tuple(shape)
    if idx < 0:
        idx += shape[ax]
    axdofs = [range(n) for n in shape]
    if flip is not None:
        flip = tuple(flip)
        flip = flip[:ax] + (False,) + flip[ax:]
        for i, flp in enumerate(flip):
            if flp:
                axdofs[i] = reversed(axdofs[i])
    axdofs[ax] = [idx]
    multi_indices = np.array(list(itertools.product(*axdofs)))
    if ravel:
        return np.ravel_multi_index(multi_indices.T, shape)
    return multi_indices


def boundary_dofs(kvs, bdspec, ravel=False, flip=None):
    """Indices of the dofs lying on the given boundary face."""
    bdax, bdside = bspline._parse_bdspec(bdspec, len(kvs))
    N = tuple(kv.numdofs for kv in kvs)
    return slice_indices(bdax, 0 if bdside == 0 else -1, N,
                         ravel=ravel, flip=flip)


def boundary_cells(kvs, bdspec, ravel=False):
    """Indices of the cells lying on the given boundary face."""
    bdax, bdside = bspline._parse_bdspec(bdspec, len(kvs))
    N = tuple(kv.numspans for kv in kvs)
    return slice_indices(bdax, 0 if bdside == 0 else -1, N, ravel=ravel)


def _drop_nans(indices, values):
    isnan = np.isnan(values)
    if np.any(isnan):
        keep = np.nonzero(~isnan)[0]
        return indices[keep], values[keep]
    return indices, values


def compute_dirichlet_bc(kvs, geo, bdspec, dir_func):
    """Indices and values of the Dirichlet dofs on one boundary face,
    computed by interpolating `dir_func` (given in physical coordinates;
    scalars mean constant functions; vector-valued functions produce blocked
    numbering)."""
    bdspec = bspline._parse_bdspec(bdspec, len(kvs))
    bdax, bdside = bdspec

    bdbasis = list(kvs)
    assert len(bdbasis) == geo.sdim, 'Invalid dimension of geometry'
    del bdbasis[bdax]

    bdgeo = geo.boundary(bdspec)
    from .approx import interpolate
    if np.isscalar(dir_func):
        const_value = dir_func
        dir_func = lambda *x: const_value
    dircoeffs = interpolate(bdbasis, dir_func, geo=bdgeo)

    N = tuple(kv.numdofs for kv in kvs)
    bdindices = slice_indices(bdax, 0 if bdside == 0 else -1, N, ravel=True)

    extra_dims = dircoeffs.ndim - len(bdbasis)
    if extra_dims == 0:
        return _drop_nans(bdindices, dircoeffs.ravel())
    if extra_dims == 1:
        numcomp = dircoeffs.shape[-1]
        NN = np.prod(N)
        idx, val = combine_bcs(
            (bdindices + j * NN, dircoeffs[..., j].ravel())
            for j in range(numcomp))
        return _drop_nans(idx, val)
    raise ValueError('invalid dimension of Dirichlet coefficients: %s'
                     % (dircoeffs.shape,))


def compute_dirichlet_bcs(kvs, geo, bdconds):
    """Combined (indices, values) for several boundary conditions; the
    shorthand ``("all", g)`` applies `g` on every boundary face."""
    if len(bdconds) == 2 and bdconds[0] == 'all':
        dir_func = bdconds[1]
        bdconds = [((ax, bd), dir_func)
                   for ax in range(len(kvs)) for bd in (0, 1)]
    return combine_bcs(compute_dirichlet_bc(kvs, geo, bdspec, g)
                       for (bdspec, g) in bdconds)


def compute_initial_condition_01(kvs, geo, bdspec, g0, g1, physical=True):
    """Indices/values fixing function value `g0` and first derivative `g1`
    at one face of a space-time cylinder with constant-in-time geometry."""
    bdspec = bspline._parse_bdspec(bdspec, len(kvs))
    bdax, bdside = bdspec

    bdbasis = list(kvs)
    del bdbasis[bdax]

    bdgeo = geo.boundary(bdspec) if physical else None
    from .approx import interpolate
    coeffs01 = np.stack((
        interpolate(bdbasis, g0, geo=bdgeo).ravel(),
        interpolate(bdbasis, g1, geo=bdgeo).ravel()))

    kvt = kvs[bdax]
    if bdside == 0:
        bdcolloc = bspline.active_deriv(kvt, kvt.support()[0], 1)[:2, :2]
    else:
        bdcolloc = bspline.active_deriv(kvt, kvt.support()[1], 1)[:2, -2:]
    coll_coeffs = np.linalg.solve(bdcolloc, coeffs01)

    N = tuple(kv.numdofs for kv in kvs)
    firstidx = 0 if bdside == 0 else -2
    bdindices = np.concatenate((
        slice_indices(bdax, firstidx, N, ravel=True),
        slice_indices(bdax, firstidx + 1, N, ravel=True)))
    return bdindices, coll_coeffs.ravel()


def combine_bcs(bcs):
    """Merge several (indices, values) pairs, dropping duplicate indices."""
    bcs = list(bcs)
    indices = np.concatenate([ind for ind, _ in bcs])
    values = np.concatenate([val for _, val in bcs])
    assert indices.shape == values.shape, 'Inconsistent BC sizes'
    uidx, lookup = np.unique(indices, return_index=True)
    return uidx, values[lookup]


class RestrictedLinearSystem:
    """A linear system with some dofs eliminated (fixed to given values).

    ``R_free``/``R_elim`` restrict to the free/eliminated dofs; the updated
    right-hand side is ``R_free (b - A R_elim^T values)``.  `elim_rows`
    supports Petrov-Galerkin systems where the eliminated equations differ
    from the eliminated dofs."""

    def __init__(self, A, b, bcs, elim_rows=None):
        indices, values = bcs
        if np.isscalar(b):
            b = np.broadcast_to(b, A.shape[0])
        if np.isscalar(values):
            values = np.broadcast_to(values, np.shape(indices)[0])
        self.values = values

        I = scipy.sparse.eye(A.shape[1], format='csr')
        mask = np.ones(A.shape[1], dtype=bool)
        mask[np.asarray(indices, dtype=np.int64)] = False
        self.R_free = I[mask]
        self.R_elim = I[~mask]

        if elim_rows is not None:
            Iv = scipy.sparse.eye(A.shape[0], format='csr')
            maskv = np.ones(A.shape[0], dtype=bool)
            maskv[np.asarray(sorted(elim_rows), dtype=np.int64)] = False
            self.R_free_v = Iv[maskv]
            self.R_elim_v = Iv[~maskv]
        else:
            self.R_free_v = self.R_free
            self.R_elim_v = self.R_elim

        self.A = self.restrict_matrix(A)
        self.b = self.restrict_rhs(b - A.dot(self.R_elim.T.dot(values)))

    def restrict(self, u):
        """Restrict a full-dof vector to the free dofs."""
        return self.R_free.dot(u)

    def restrict_rhs(self, f):
        """Restrict a right-hand side to the non-eliminated rows."""
        return self.R_free_v.dot(f)

    def restrict_matrix(self, B):
        """Restrict a full matrix to the free dofs (rows and columns)."""
        if not scipy.sparse.issparse(B):
            B = scipy.sparse.csr_matrix(B)
        return self.R_free_v.dot(B).dot(self.R_free.T)

    def extend(self, u):
        """Zero-pad a free-dof vector to all dofs."""
        return self.R_free.T.dot(u)

    def complete(self, u):
        """Extend a restricted solution with the eliminated dof values."""
        return self.extend(u) + self.R_elim.T.dot(self.values)


################################################################################
# Assembly drivers
################################################################################

def assemble_entries(asm, symmetric=False, format='csr', layout='blocked'):
    """Assemble all entries of the given assembler and return the matrix (or
    vector for arity-1 assemblers).

    Unlike the reference (which chunks per-entry evaluations over threads,
    assemble.py:703), the sum-factorization assemblers always compute the
    complete compact tensor on device; `symmetric` is accepted for API
    compatibility.  Pass ``format='mlb'`` to obtain the compact
    :class:`~pyiga_tpu.mlmatrix.MLMatrix` without expanding to scipy.

    Vector-valued problems support the reference's two layouts
    (assemble.py:714): 'blocked' (component-major numbering) and 'packed'
    (components interleaved per dof)."""
    is_vector_valued = getattr(getattr(asm, 'vf', None), 'vec', False)
    if asm.arity == 1:
        result = asm.assemble_vector()
        if is_vector_valued and layout == 'blocked':
            result = np.moveaxis(result, -1, 0)
        return result
    if is_vector_valued:
        return _combine_vector_blocks(asm, asm.assemble(), format, layout)
    mlm = asm.assemble()
    if format == 'mlb':
        return mlm
    return mlm.asmatrix(format)


def _combine_vector_blocks(asm, blocks, format, layout):
    """Combine per-component MLMatrix blocks into a sparse matrix in the
    requested layout ('blocked' = component-major, 'packed' = interleaved)."""
    assert layout in ('blocked', 'packed')
    ncu, ncv = asm.vf.num_components()[:2] if asm.vf.arity == 2 else (1, 1)
    ncu = ncu or 1
    ncv = ncv or 1
    zero = None
    if layout == 'blocked':
        rows = []
        for cv in range(ncv):
            row = []
            for cu in range(ncu):
                blk = blocks.get((cu, cv))
                row.append(blk.asmatrix() if blk is not None else zero)
            rows.append(row)
        return scipy.sparse.bmat(rows, format=format)
    # packed: join a trailing dense (ncv, ncu) component level
    S = asm.structure.join(MLStructure.dense((ncv, ncu)))
    some = next(iter(blocks.values()))
    data = np.zeros(some.data.shape + (ncv * ncu,))
    for (cu, cv), blk in blocks.items():
        data[..., cv * ncu + cu] = blk.data
    X = S.make_mlmatrix(data=data)
    if format == 'mlb':
        return X
    return X.asmatrix(format)


def mass(kvs, geo=None, format='csr'):
    """Mass matrix over a TP spline space (1D/2D/3D dispatch; Kronecker fast
    path for ``geo=None``)."""
    if isinstance(kvs, KnotVector):
        return bsp_mass_1d(kvs)
    dim = len(kvs)
    if dim == 1:
        return bsp_mass_1d(kvs[0])
    if geo is None:
        Ms = [bsp_mass_1d(kv) for kv in kvs]
        return utils.multi_kron_sparse(Ms, format=format)
    return assemble_entries(assemblers.MassAssembler(kvs, geo),
                            symmetric=True, format=format)


def stiffness(kvs, geo=None, format='csr'):
    """Stiffness matrix over a TP spline space (Kronecker fast path for
    ``geo=None``)."""
    if isinstance(kvs, KnotVector):
        return bsp_stiffness_1d(kvs)
    dim = len(kvs)
    if dim == 1:
        return bsp_stiffness_1d(kvs[0])
    if dim == 2:
        return bsp_stiffness_2d(kvs, geo=geo, format=format)
    if dim == 3:
        return bsp_stiffness_3d(kvs, geo=geo, format=format)
    raise ValueError('dimension %d not supported' % dim)


################################################################################
# VForm-based assembly (string / VForm / assembler polymorphism)
################################################################################

def _Jac_to_boundary_matrix(bdspec, dim):
    """dim x (dim-1) matrix restricting a volumetric Jacobian to the boundary
    `bdspec`, with signs chosen so the computed normal points outward for
    positively oriented patches (reference: assemble.py:899)."""
    ax, side = bdspec
    ax = dim - 1 - ax       # vform coordinate axes are in XYZ order
    I = np.eye(dim)
    I[:, 0::2] *= -1
    B = np.hstack((I[:, :ax], I[:, ax + 1:]))
    if side != 0:
        B[:, 0] *= -1
    return B


def instantiate_assembler(problem, kvs, args, bfuns, boundary=None,
                          updatable=()):
    """Normalize `problem` (string / VForm / assembler class / instance) into
    an instantiated assembler object (reference: assemble.py:914)."""
    from . import vform as vform_mod
    from .compile import compile_vform

    if isinstance(problem, str):
        problem = vform_mod.parse_vf(problem, kvs, args=args, bfuns=bfuns,
                                     boundary=bool(boundary),
                                     updatable=updatable)

    num_spaces = 1
    if isinstance(problem, vform_mod.VForm):
        num_spaces = problem.num_spaces()
        problem = compile_vform(problem)

    if isinstance(problem, type):
        used_args = dict()
        if boundary:
            bdspec = bspline._parse_bdspec(boundary, len(kvs))
            used_args['boundary'] = bdspec
            args = dict(args)
            args['Jac_to_boundary'] = _Jac_to_boundary_matrix(bdspec, len(kvs))
        for inp in itertools.chain(problem.inputs().keys(),
                                   problem.parameters().keys()):
            if inp == 'geo':
                pass
            if inp not in args:
                raise ValueError("required input parameter '%s' missing" % inp)
            used_args[inp] = args[inp]
        if 'Jac_to_boundary' in args:
            used_args['Jac_to_boundary'] = args['Jac_to_boundary']

        if num_spaces <= 1:
            return problem(kvs, **used_args)
        assert num_spaces == 2, 'no more than two spaces allowed'
        return problem(kvs[0], kvs2=kvs[1], **used_args)

    # already an assembler instance
    if hasattr(problem, 'assemble') or hasattr(problem, 'assemble_vector'):
        return problem
    raise TypeError("invalid type for 'problem': %s" % type(problem))


def assemble(problem, kvs, args=None, bfuns=None, boundary=None,
             symmetric=False, format='csr', layout='blocked', **kwargs):
    """Assemble a matrix or vector in a function space.

    `problem` may be a string (parsed by :func:`pyiga_tpu.vform.parse_vf`),
    a :class:`~pyiga_tpu.vform.VForm`, a compiled assembler class, or an
    assembler instance.  `kvs` is a TP spline space (tuple of KnotVectors),
    a pair of such spaces, or an :class:`~pyiga_tpu.hierarchical.HSpace`.
    Named inputs (geometry, coefficient functions, parameters) are passed in
    `args` or as keyword arguments.  (Reference: assemble.py:837.)"""
    if args is None:
        args = dict()
    args = dict(args)
    args.update(kwargs)

    try:
        from .hierarchical import HSpace
        if isinstance(kvs, HSpace):
            return _assemble_hspace(problem, kvs, args=args, bfuns=bfuns,
                                    symmetric=symmetric, format=format,
                                    layout=layout)
    except ImportError:
        pass

    asm = instantiate_assembler(problem, kvs, args, bfuns, boundary)
    return assemble_entries(asm, symmetric=symmetric, format=format,
                            layout=layout)


def assemble_vf(vf, kvs, symmetric=False, format='csr', layout='blocked',
                args=None, **kwargs):
    """Assemble a :class:`~pyiga_tpu.vform.VForm` into a matrix or vector."""
    if args is None:
        args = dict()
    args.update(kwargs)
    return assemble(vf, kvs, symmetric=symmetric, format=format,
                    layout=layout, args=args)


def _assemble_hspace(problem, hs, args, bfuns=None, symmetric=False,
                     format='csr', layout='blocked'):
    """Assemble over a hierarchical spline space (reference assemble.py:824)."""
    if isinstance(problem, str):
        from . import vform as vform_mod
        problem = vform_mod.parse_vf(problem, hs.knotvectors(0), args=args,
                                     bfuns=bfuns)
    from .hierarchical import HDiscretization
    if problem.arity == 2:
        hdiscr = HDiscretization(hs, problem, asm_args=args)
        return hdiscr.assemble_matrix(symmetric=symmetric).asformat(format)
    elif problem.arity == 1:
        hdiscr = HDiscretization(hs, None, asm_args=args)
        return hdiscr.assemble_functional(problem)


class Assembler:
    """High-level assembler wrapper with support for updatable inputs
    (reference: assemble.py:958).  Instantiate once, then call
    :meth:`assemble`, optionally passing updated input fields."""

    def __init__(self, problem, kvs, args=None, bfuns=None, boundary=None,
                 symmetric=False, updatable=(), **kwargs):
        if args is None:
            args = dict()
        args = dict(args)
        args.update(kwargs)
        self.symmetric = bool(symmetric)
        self.updatable = tuple(updatable)
        self.asm = instantiate_assembler(problem, kvs, args, bfuns, boundary,
                                         self.updatable)
        if not all(u in self.asm.inputs().keys() or u in
                   self.asm.parameters().keys() for u in self.updatable):
            raise ValueError('Assembler received an updatable argument which '
                             'is not an assembler input')

    def update(self, **kwargs):
        """Update input fields declared as updatable."""
        if not all(name in self.updatable for name in kwargs):
            raise RuntimeError('update() received an argument which was not '
                               'specified as updatable')
        self.asm.update(**kwargs)

    def assemble(self, format='csr', layout='blocked', **upd_fields):
        """Assemble, optionally updating fields first."""
        if upd_fields:
            self.update(**upd_fields)
        return assemble_entries(self.asm, symmetric=self.symmetric,
                                format=format, layout=layout)


def divdiv(kvs, geo=None, layout='blocked', format='csr'):
    """Assemble the div-div operator for a vector-valued TP space."""
    from . import geometry as geometry_mod
    dim = 1 if isinstance(kvs, KnotVector) else len(kvs)
    if geo is None:
        geo = geometry_mod.unit_cube(dim=dim)
    from .vform import divdiv_vf
    from .compile import compile_vform
    asm = compile_vform(divdiv_vf(dim))(kvs, geo=geo)
    return assemble_entries(asm, symmetric=True, layout=layout, format=format)


################################################################################
# Fast low-rank (ACA) assembling
################################################################################

def _fast_asm(vf_factory, kvs, geo, tol, maxiter, skipcount, tolcount,
              verbose):
    from .compile import compile_vform
    from .lowrank import fast_assemble
    dim = len(kvs)
    asm = compile_vform(vf_factory(dim))(kvs, geo=geo)
    return fast_assemble(asm, kvs, tol=tol, maxiter=maxiter,
                         skipcount=skipcount, tolcount=tolcount,
                         verbose=verbose)


def mass_fast(kvs, geo=None, tol=1e-10, maxiter=100, skipcount=3,
              tolcount=3, verbose=2):
    """Assemble the mass matrix by fast low-rank ACA assembling
    (reference: assemble.py:1065)."""
    if geo is None:
        return mass(kvs)
    from .vform import mass_vf
    return _fast_asm(mass_vf, kvs, geo, tol, maxiter, skipcount, tolcount,
                     verbose)


def stiffness_fast(kvs, geo=None, tol=1e-10, maxiter=100, skipcount=3,
                   tolcount=3, verbose=2):
    """Assemble the stiffness matrix by fast low-rank ACA assembling
    (reference: assemble.py:1083)."""
    if geo is None:
        return stiffness(kvs)
    from .vform import stiffness_vf
    return _fast_asm(stiffness_vf, kvs, geo, tol, maxiter, skipcount,
                     tolcount, verbose)


################################################################################
# Multipatch (conforming patches with shared-dof union numbering)
################################################################################

def _bb_rect(G):
    import scipy.spatial
    bb = G.bounding_box()
    return scipy.spatial.Rectangle(tuple(b[0] for b in bb),
                                   tuple(b[1] for b in bb))


def _check_geo_match(G1, G2, grid=4):
    """Check whether two boundary geometries coincide under any combination
    of per-axis coordinate flips; returns (match, flip)."""
    if G1.sdim != G2.sdim or G1.dim != G2.dim:
        return False, None
    if not np.allclose(G1.support, G2.support):
        return False, None
    grd = [np.linspace(s[0], s[1], grid) for s in G1.support]
    X1 = G1.grid_eval(grd)
    for flip in itertools.product(*(G2.sdim * [(False, True)])):
        flipped = [np.ascontiguousarray(np.flip(g)) if f else g
                   for g, f in zip(grd, flip)]
        if np.allclose(X1, G2.grid_eval(flipped)):
            return True, flip
    return False, None


def _find_matching_boundaries(G1, G2):
    assert G1.sdim == G2.sdim and G1.dim == G2.dim
    all_bds = list(itertools.product(range(G1.sdim), (0, 1)))
    matches = []
    for bd1 in all_bds:
        B1 = G1.boundary(bd1)
        for bd2 in all_bds:
            ok, flip = _check_geo_match(B1, G2.boundary(bd2))
            if ok:
                matches.append((bd1, bd2, flip))
    return matches


def detect_interfaces(patches):
    """Detect matching interfaces between the patches ``(kvs, geo)``.
    Returns ``(connected, interfaces)`` where each interface is suitable for
    :meth:`Multipatch.join_boundaries`."""
    import networkx as nx
    interfaces = []
    bbs = [_bb_rect(geo) for (_, geo) in patches]
    diams = [bb.max_distance_rectangle(bb) for bb in bbs]

    graph = nx.Graph()
    graph.add_nodes_from(range(len(patches)))
    for p1 in range(len(patches)):
        for p2 in range(p1 + 1, len(patches)):
            mindist = bbs[p1].min_distance_rectangle(bbs[p2])
            if mindist < 1e-10 * max(diams[p1], diams[p2]):
                matches = _find_matching_boundaries(patches[p1][1],
                                                    patches[p2][1])
                for bd1, bd2, flip in matches:
                    interfaces.append((p1, bd1, p2, bd2, flip))
                if matches:
                    graph.add_edge(p1, p2)
    return nx.is_connected(graph), interfaces


class Multipatch:
    """A conforming multipatch discretization: per-patch TP spaces with
    shared dofs identified along matching interfaces.

    The global numbering puts the non-shared (interior) dofs of each patch
    first (patch by patch), followed by the shared dofs.
    (Reference: assemble.py:1182.)"""

    def __init__(self, patches, automatch=False):
        self.patches = patches
        self.N = [bspline.numdofs(kvs) for (kvs, _) in self.patches]
        self.N_ofs = np.concatenate(([0], np.cumsum(self.N)))
        self.shared_per_patch = [dict() for _ in range(len(self.patches))]
        self.shared_dofs = []

        if automatch:
            connected, interfaces = detect_interfaces(self.patches)
            if not connected:
                print('WARNING: patch graph is not connected - '
                      'interface detection may have failed')
            for intf in interfaces:
                self.join_boundaries(*intf)
            self.finalize()

    @property
    def numpatches(self):
        return len(self.patches)

    @property
    def numdofs(self):
        """Global dof count (shared dofs counted once); requires finalize()."""
        return self.M_ofs[-1] + len(self.shared_dofs)

    def _new_shared_dof(self):
        self.shared_dofs.append(set())
        return len(self.shared_dofs) - 1

    def join_dofs(self, p1, I1, p2, I2):
        """Identify the dofs `I1` of patch `p1` with `I2` of patch `p2`."""
        assert len(I1) == len(I2), 'dof arrays must have the same length'
        assert p1 != p2, 'patches must be different'

        def add(sd, p, i):
            self.shared_per_patch[p][i] = sd
            self.shared_dofs[sd].add((p, i))

        for i1, i2 in zip(I1, I2):
            if i1 in self.shared_per_patch[p1]:
                add(self.shared_per_patch[p1][i1], p2, i2)
            elif i2 in self.shared_per_patch[p2]:
                add(self.shared_per_patch[p2][i2], p1, i1)
            else:
                sd = self._new_shared_dof()
                add(sd, p1, i1)
                add(sd, p2, i2)

    def join_boundaries(self, p1, bdspec1, p2, bdspec2, flip=None):
        """Identify the dofs along two matching patch boundaries (with
        optional per-axis flips of the second boundary)."""
        dofs1 = boundary_dofs(self.patches[p1][0], bdspec1, ravel=True)
        dofs2 = boundary_dofs(self.patches[p2][0], bdspec2, ravel=True,
                              flip=flip)
        self.join_dofs(p1, dofs1, p2, dofs2)

    def finalize(self):
        """Freeze the shared-dof structure and set up global numbering."""
        num_shared = [len(spp) for spp in self.shared_per_patch]
        self.M = [n - s for n, s in zip(self.N, num_shared)]
        self.M_ofs = np.concatenate(([0], np.cumsum(self.M)))

    def patch_to_global_idx(self, p):
        """Array mapping local TP indices of patch `p` to global indices."""
        tpdofs = np.arange(self.N[p])
        sdofs = np.array(sorted(self.shared_per_patch[p].items()))
        if len(sdofs):
            local = np.setdiff1d(tpdofs, sdofs[:, 0], assume_unique=True)
        else:
            local = tpdofs.copy()
        m_ofs = self.M_ofs[p]
        tpdofs[local] = np.arange(m_ofs, m_ofs + local.shape[0])
        if len(sdofs):
            tpdofs[sdofs[:, 0]] = self.M_ofs[-1] + sdofs[:, 1]
        return tpdofs

    def patch_to_global(self, p, j_global=False):
        """Sparse 0/1 matrix mapping patch-`p` dofs to global dofs."""
        shape = (self.numdofs,
                 self.N_ofs[-1] if j_global else self.N[p])
        n_ofs = self.N_ofs[p] if j_global else 0
        I = self.patch_to_global_idx(p)
        J = np.arange(n_ofs, n_ofs + self.N[p])
        return scipy.sparse.coo_matrix(
            (np.ones(len(I)), (I, J)), shape=shape).tocsr()

    def global_to_patch(self, p):
        """Transpose (and left-inverse) of :meth:`patch_to_global`."""
        return self.patch_to_global(p).T

    def assemble_system(self, problem, rhs, args=None, bfuns=None,
                        symmetric=False, format='csr', layout='blocked',
                        **kwargs):
        """Assemble the global system matrix and right-hand side by
        accumulating per-patch contributions ``X A_p X^T`` (the scatter that
        becomes a psum over shared interface dofs when patches are
        distributed across devices)."""
        n = self.numdofs
        A = scipy.sparse.csr_matrix((n, n)).asformat(format)
        b = np.zeros(n)
        if args is None:
            args = dict()
        for p in range(self.numpatches):
            X = self.patch_to_global(p)
            kvs, geo = self.patches[p]
            args.update(geo=geo)
            A_p = assemble(problem, kvs, args=args, bfuns=bfuns,
                           symmetric=symmetric, format=format, layout=layout,
                           **kwargs)
            A = A + X @ A_p @ X.T
            b_p = assemble(rhs, kvs, args=args, bfuns=bfuns,
                           symmetric=symmetric, format=format, layout=layout,
                           **kwargs).ravel()
            b += X @ b_p
        return A, b

    def compute_dirichlet_bcs(self, bdconds):
        """Dirichlet (indices, values) over the global numbering;
        `bdconds` contains (patch, bdspec, dir_func) triples."""
        bcs = []
        p2g = dict()
        for p, bdspec, g in bdconds:
            kvs, geo = self.patches[p]
            bc = compute_dirichlet_bc(kvs, geo, bdspec, g)
            if p not in p2g:
                p2g[p] = self.patch_to_global_idx(p)
            bcs.append((p2g[p][bc[0]], bc[1]))
        return combine_bcs(bcs)
