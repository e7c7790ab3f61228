# -*- coding: utf-8 -*-
"""Hierarchical spline spaces: HB- and THB-spline bases over adaptively
refined tensor-product meshes.

API parity with /root/reference/pyiga/hierarchical.py (whose algorithms
follow Garau & Vazquez 2018 / GeoPDEs).  All of this is host-side index-set
logic executed at setup time; the device work (assembly over bounding-box
restricted grids, smoothing) happens in :class:`HDiscretization`
(:mod:`pyiga_tpu._hdiscr`) and the solvers.

Conventions (identical to the reference):

* functions and cells are identified by multi-index tuples per level;
* the **canonical order** of dofs is level-major, lexicographic within each
  level (active functions only);
* in the *virtual hierarchy* for level ``lv``, the dofs are the active
  functions of levels ``< lv`` plus active-then-deactivated functions on
  level ``lv`` (each group sorted lexicographically).
"""

import copy
import itertools

import numpy as np
import scipy.sparse

from . import bspline, utils
from ._hdiscr import HDiscretization  # noqa: F401  (re-export)


################################################################################
# Small helpers
################################################################################

def _cells_supporting(kv, meshsupp):
    """Per cell, the index of the first and one-past-last function supported
    on it (vectorized version of the reference's per-function loop)."""
    n = kv.numspans
    first = np.full(n, kv.numdofs, dtype=meshsupp.dtype)
    last = np.zeros(n, dtype=meshsupp.dtype)
    for j in range(meshsupp.shape[0]):
        a, b = meshsupp[j]
        first[a:b] = np.minimum(first[a:b], j)
        last[a:b] = np.maximum(last[a:b], j)
    return np.column_stack((first, last + 1))


def _scatter(n, idx, u):
    out = np.zeros(n, dtype=u.dtype)
    out[idx] = u
    return out


def _positions_in(superlist, sublist):
    """Positions of the (sorted, unique) entries of `sublist` within the
    sorted-compatible `superlist`."""
    out = []
    k = 0
    for x in sublist:
        k = superlist.index(x, k)
        out.append(k)
    return np.array(out, dtype=int)


def _without_axis(tuples, axis):
    kind = type(tuples)
    return kind(t[:axis] + t[axis + 1:] for t in tuples)


def _merge_dicts_of_sets(dA, dB):
    return {k: dA.get(k, set()) | dB.get(k, set())
            for k in dA.keys() | dB.keys()}


################################################################################
# Tensor-product and hierarchical meshes
################################################################################

class TPMesh:
    """A tensor-product mesh given by a tuple of knot vectors."""

    def __init__(self, kvs):
        self.kvs = tuple(kvs)
        self.dim = len(kvs)
        self.numspans = [kv.numspans for kv in kvs]
        self.numel = int(np.prod(self.numspans))
        self.numdofs = [kv.numdofs for kv in kvs]
        self.numbf = int(np.prod(self.numdofs))
        self.meshsupp = tuple(kv.mesh_support_idx_all() for kv in self.kvs)
        self.suppfunc = tuple(_cells_supporting(kv, ms)
                              for kv, ms in zip(self.kvs, self.meshsupp))

    def __eq__(self, other):
        return self.kvs == other.kvs

    def refine(self):
        return TPMesh([kv.refine() for kv in self.kvs])

    def cells(self):
        """All cell multi-indices of this mesh."""
        return list(itertools.product(*(range(n) for n in self.numspans)))

    def cell_extents(self, c):
        """Min/max pairs per axis for the cell `c`."""
        return tuple((kv.mesh[ci], kv.mesh[ci + 1])
                     for kv, ci in zip(self.kvs, c))

    def functions(self):
        """All basis-function multi-indices of this mesh."""
        return list(itertools.product(*(range(n) for n in self.numdofs)))

    def support(self, indices):
        """Cells on which any of the given functions is nonzero."""
        supp = set()
        for jj in indices:
            supp.update(itertools.product(
                *(range(self.meshsupp[d][j, 0], self.meshsupp[d][j, 1])
                  for d, j in enumerate(jj))))
        return supp

    def supported_in(self, cells):
        """Functions whose support intersects the given cells."""
        funcs = set()
        for kk in cells:
            funcs.update(itertools.product(
                *(range(self.suppfunc[d][k, 0], self.suppfunc[d][k, 1])
                  for d, k in enumerate(kk))))
        return funcs

    def neighbors(self, indices):
        """Functions with nontrivial support intersection with the given ones."""
        return self.supported_in(self.support(indices))


class HMesh:
    """Hierarchy of dyadically refined TP meshes with active/deactivated cell
    sets per level (implementation detail of :class:`HSpace`)."""

    def __init__(self, mesh):
        self.dim = mesh.dim
        self.meshes = [mesh]
        self.active = [set(mesh.cells())]
        self.deactivated = [set()]
        self.P = []

    @staticmethod
    def _level_prolongators(coarse, fine):
        return tuple(bspline.prolongation(k0, k1).tocsc()
                     for k0, k1 in zip(coarse.kvs, fine.kvs))

    @staticmethod
    def init_from_kvs(kvs, active, deactivated, P=None):
        """Build an HMesh from per-level knot vectors and cell sets."""
        out = HMesh(TPMesh(kvs[0]))
        out.meshes = [TPMesh(kv) for kv in kvs]
        out.active = active
        out.deactivated = deactivated
        out.P = P or [HMesh._level_prolongators(a, b)
                      for a, b in zip(out.meshes[:-1], out.meshes[1:])]
        return out

    def add_level(self):
        self.meshes.append(self.meshes[-1].refine())
        self.active.append(set())
        self.deactivated.append(set())
        self.P.append(self._level_prolongators(*self.meshes[-2:]))

    def ensure_levels(self, L):
        while len(self.meshes) < L:
            self.add_level()

    # -- cell hierarchy (dyadic) ------------------------------------------------

    def cell_children(self, lv, cells):
        if not 0 <= lv < len(self.meshes) - 1:
            raise ValueError('level %d has no finer level' % lv)
        kids = []
        for c in cells:
            kids += itertools.product(*((2 * ci, 2 * ci + 1) for ci in c))
        return kids

    def cell_grandchildren(self, lv, cells, targetlv=None):
        targetlv = targetlv or (len(self.meshes) - 1)
        if not 0 <= lv < targetlv < len(self.meshes):
            raise ValueError('invalid level pair (%d, %d)' % (lv, targetlv))
        for l in range(lv, targetlv):
            cells = self.cell_children(l, cells)
        return cells

    def cell_parent(self, lv, cells):
        if not 1 <= lv < len(self.meshes):
            raise ValueError('level %d has no coarser level' % lv)
        return {tuple(ci >> 1 for ci in c) for c in cells}

    def cell_grandparent(self, lv, cells, targetlv=None):
        targetlv = targetlv or 0
        if not 0 <= targetlv < lv < len(self.meshes):
            raise ValueError('invalid level pair (%d, %d)' % (lv, targetlv))
        for l in range(lv, targetlv, -1):
            cells = self.cell_parent(l, cells)
        return cells

    # -- function hierarchy (via prolongator sparsity) ---------------------------

    def _fn_children_1d(self, lv, dim, j):
        P = self.P[lv][dim]     # CSC: column j = children of function j
        return P.indices[P.indptr[j]:P.indptr[j + 1]]

    def _fn_parents_1d(self, lv, dim, j):
        return list(self.P[lv - 1][dim].getrow(j).nonzero()[1])

    def function_children(self, lv, indices):
        out = set()
        for jj in indices:
            out.update(itertools.product(
                *(self._fn_children_1d(lv, d, j) for d, j in enumerate(jj))))
        return out

    def function_grandchildren(self, lv, indices, targetlv=None):
        if not targetlv:
            targetlv = len(self.meshes) - 1
        assert 0 <= lv < targetlv < len(self.meshes), 'Invalid levels'
        while lv < targetlv - 1:
            indices = self.function_children(lv, indices)
            lv += 1
        return self.function_children(lv, indices)

    def function_parents(self, lv, indices):
        out = set()
        for jj in indices:
            out.update(itertools.product(
                *(self._fn_parents_1d(lv, d, j) for d, j in enumerate(jj))))
        return out

    def function_grandparents(self, lv, indices, targetlv=None):
        if not targetlv:
            targetlv = 0
        assert 0 <= targetlv < lv < len(self.meshes), 'Invalid levels'
        while lv > targetlv + 1:
            indices = self.function_parents(lv, indices)
            lv -= 1
        return self.function_parents(lv, indices)

    # -- hierarchical cell resolution --------------------------------------------

    def _resolve_up(self, lv, cells):
        """Active hierarchical cells of level >= lv covering the given cells."""
        out = dict()
        pending = set(cells)
        L = len(self.meshes)
        for l in range(lv, L):
            out[l] = pending & self.active[l]
            pending -= self.active[l]
            if l < L - 1:
                pending = set(self.cell_children(l, pending))
        assert not pending, 'Invalid cells detected: %s' % (pending,)
        return out

    def _resolve_down(self, lv, cells):
        """Active hierarchical cells of level <= lv covering the given cells."""
        out = dict()
        pending = set(cells)
        for l in reversed(range(lv + 1)):
            out[l] = pending & self.active[l]
            pending -= self.active[l]
            if l > 0:
                pending = set(self.cell_parent(l, pending))
        assert not pending, 'Invalid cells detected: %s' % (pending,)
        return out

    def _resolve(self, lv, cells):
        cells = set(cells)
        known = self.active[lv] | self.deactivated[lv]
        return _merge_dicts_of_sets(
            self._resolve_down(lv, cells - known),
            self._resolve_up(lv, cells & known))

    def hmesh_cells(self, cells):
        """Smallest dict-of-sets of active hierarchical cells containing the
        given per-level cells (list or dict)."""
        if isinstance(cells, dict):
            as_list = [[] for _ in range(len(self.meshes))]
            for lv, cls in cells.items():
                as_list[lv] = cls
            cells = as_list
        out = dict()
        for lv in range(len(self.meshes)):
            out = _merge_dicts_of_sets(out, self._resolve(lv, cells[lv]))
        return {lv: c for lv, c in out.items() if c}

    def refine(self, marked):
        """Deactivate the marked cells and activate their children; returns
        the dict of newly activated cells per level."""
        max_lv = max(lv for lv, cells in marked.items() if cells)
        self.ensure_levels(max_lv + 2)

        new_cells = dict()
        for lv in range(len(self.meshes) - 1):
            cells = set(marked.get(lv, []))
            self.active[lv] -= cells
            self.deactivated[lv] |= cells
            new_cells[lv + 1] = self.cell_children(lv, cells)
            self.active[lv + 1] |= set(new_cells[lv + 1])
        return new_cells

    def get_virtual_mesh(self, level):
        """The hierarchical mesh truncated at the given level (refinements of
        deeper levels undone)."""
        assert 0 <= level < len(self.meshes)
        out = HMesh(self.meshes[0])
        for i in range(level + 1):
            out.refine({i: self.deactivated[i]})
        return out


################################################################################
# HSpace
################################################################################

class HSpace:
    """An HB-/THB-spline space over an adaptively refined mesh.

    Args:
        kvs: knot vectors of the coarsest tensor-product level.
        truncate: True for THB-splines, False (default) for HB-splines.
        disparity: maximum level distance of interacting functions
            (``np.inf`` = unrestricted); respected by :meth:`refine`.
        bdspecs: boundaries on which dofs are eliminated (Dirichlet).
    """

    def __init__(self, kvs, truncate=False, disparity=np.inf, bdspecs=None):
        hmesh = HMesh(TPMesh(kvs))
        self.dim = hmesh.dim
        self.hmesh = hmesh
        self.truncate = bool(truncate)
        self.actfun = [set(hmesh.meshes[0].functions())]
        self.deactfun = [set()]
        self.disparity = disparity
        if bdspecs is not None:
            bdspecs = [bspline._parse_bdspec(bd, self.dim) for bd in bdspecs]
        self.bdspecs = bdspecs
        self._clear_cache()

    def _clear_cache(self):
        self._cache_ravel_global = None
        self._cache_index_dirichlet = None
        self._cache_ravel_dirichlet = None

    @staticmethod
    def init_from_kvs(kvs, active_cells, deactivated_cells, active_funcs,
                      deactivated_funcs, P=None, truncate=False,
                      disparity=np.inf, bdspecs=None):
        """Build an HSpace from explicit per-level data."""
        out = HSpace(kvs[0], truncate=truncate, disparity=disparity,
                     bdspecs=bdspecs)
        out.hmesh = HMesh.init_from_kvs(kvs, active_cells, deactivated_cells,
                                        P=P)
        out.actfun = active_funcs
        out.deactfun = deactivated_funcs
        return out

    def _add_level(self):
        self.hmesh.add_level()
        self.actfun.append(set())
        self.deactfun.append(set())

    def _ensure_levels(self, L):
        while self.numlevels < L:
            self._add_level()

    # -- basic queries -------------------------------------------------------------

    @property
    def numlevels(self):
        return len(self.hmesh.meshes)

    @property
    def numdofs(self):
        """Total number of active basis functions."""
        return sum(self.numactive)

    @property
    def numactive(self):
        """Number of active basis functions per level."""
        return tuple(len(af) for af in self.actfun)

    def mesh(self, lv):
        return self.hmesh.meshes[lv]

    def knotvectors(self, lv):
        return self.hmesh.meshes[lv].kvs

    def active_cells(self, lv=None, flat=False):
        """Active cells on one level, per level, or flat in canonical order."""
        if lv is not None:
            return self.hmesh.active[lv]
        if flat:
            return [(l, c) for l in range(self.numlevels)
                    for c in sorted(self.hmesh.active[l])]
        return [self.hmesh.active[l] for l in range(self.numlevels)]

    @property
    def total_active_cells(self):
        return sum(len(ac) for ac in self.hmesh.active)

    def active_functions(self, lv=None, flat=False):
        """Active functions on one level, per level, or flat canonical."""
        if lv is not None:
            return self.actfun[lv]
        if flat:
            return [(l, f) for l in range(self.numlevels)
                    for f in sorted(self.actfun[l])]
        return self.actfun

    def deactivated_cells(self, lv=None):
        if lv is not None:
            return self.hmesh.deactivated[lv]
        return [self.hmesh.deactivated[l] for l in range(self.numlevels)]

    def cell_extents(self, lv, c):
        return self.hmesh.meshes[lv].cell_extents(c)

    def function_support(self, lv, jj):
        """Support of the function `jj` on level `lv` as min/max pairs."""
        kvs = self.mesh(lv).kvs
        out = []
        for kv, j in zip(kvs, jj):
            lo, hi = kv.mesh_support_idx(j)
            out.append((kv.mesh[lo], kv.mesh[hi]))
        return tuple(out)

    # -- index conversion -----------------------------------------------------------

    def ravel_indices(self, indices):
        """Per level, ravel the (sorted) multi-indices into sequential TP
        indices."""
        indices = [sorted(ix) if isinstance(ix, set) else ix for ix in indices]
        out = []
        for lv in range(self.numlevels):
            if len(indices[lv]):
                out.append(np.ravel_multi_index(
                    np.array(indices[lv]).T, self.mesh(lv).numdofs, order='C'))
            else:
                out.append(np.arange(0))
        return tuple(out)

    def active_indices(self):
        return self.ravel_indices(self.actfun)

    def deactivated_indices(self):
        return self.ravel_indices(self.deactfun)

    def _levelwise_to_canonical(self, indices, raveled=False):
        if not raveled:
            indices = self.ravel_indices(indices)
        return self.raveled_to_virtual_canonical_indices(
            self.numlevels - 1, indices)

    def raveled_to_virtual_canonical_indices(self, lv, indices):
        """Map per-level raveled TP indices to canonical matrix indices within
        the virtual hierarchy level `lv`."""
        avail = self.ravel_global[lv]
        out = []
        offset = 0
        for l in range(self.numlevels):
            out += list(offset + _positions_in(list(avail[l]), indices[l]))
            offset += len(avail[l])
        return np.array(out, dtype=int)

    @property
    def ravel_global(self):
        if self._cache_ravel_global is None:
            self._cache_ravel_global = [
                self.ravel_indices(idx) for idx in self.global_indices()]
        return self._cache_ravel_global

    # -- Dirichlet handling ------------------------------------------------------------

    def _boundary_cells_lv(self, lv, bdspec):
        from .assemble import boundary_cells
        return set(map(tuple, boundary_cells(self.mesh(lv).kvs, bdspec)))

    def _boundary_funcs_lv(self, lv, bdspec):
        from .assemble import boundary_dofs
        return set(map(tuple, boundary_dofs(self.mesh(lv).kvs, bdspec)))

    def _dirichlet_indices(self):
        TPb = []
        for lv in range(self.numlevels):
            aux = set()
            for bdspec in (self.bdspecs or []):
                aux |= self._boundary_funcs_lv(lv, bdspec)
            TPb.append(aux)

        out, out_index = [], []
        for lv in range(self.numlevels):
            aux = [self.actfun[i] & TPb[i] if i <= lv else set()
                   for i in range(self.numlevels)]
            out.append(list(self.ravel_indices(aux)))
            out_index.append(aux)

        ravel_bddeact = self.ravel_indices(
            [self.deactfun[lv] & TPb[lv] for lv in range(self.numlevels)])
        # deactivated boundary functions appended per virtual level (after the
        # active ones, preserving the canonical order)
        for lv in range(self.numlevels):
            out_index[lv][lv] |= self.deactfun[lv] & TPb[lv]
            out[lv][lv] = np.concatenate((out[lv][lv], ravel_bddeact[lv]))

        self._cache_ravel_dirichlet = tuple(out)
        self._cache_index_dirichlet = tuple(out_index)

    @property
    def index_dirichlet(self):
        if not self._cache_index_dirichlet:
            self._dirichlet_indices()
        return self._cache_index_dirichlet

    @property
    def ravel_dirichlet(self):
        if not self._cache_ravel_dirichlet:
            self._dirichlet_indices()
        return self._cache_ravel_dirichlet

    def dirichlet_dofs(self, lv=None):
        """Canonical indices lying on the Dirichlet boundaries."""
        if lv is None:
            lv = self.numlevels - 1
        return self.raveled_to_virtual_canonical_indices(
            lv, self.ravel_dirichlet[lv])

    def non_dirichlet_dofs(self):
        """Canonical indices away from the Dirichlet boundaries."""
        return sorted(set(range(self.numdofs)) - set(self.dirichlet_dofs()))

    # -- virtual hierarchy index sets (smoothing sets for local MG) ----------------------

    def new_indices(self):
        """Per virtual level, the newly added functions (active + deactivated
        of that level)."""
        return [
            [(sorted(self.actfun[i] - self.index_dirichlet[lv][i])
              + sorted(self.deactfun[i] - self.index_dirichlet[lv][i]))
             if i == lv else []
             for i in range(self.numlevels)]
            for lv in range(self.numlevels)]

    def trunc_indices(self):
        """Per virtual level, the functions interacting via truncation."""
        indices = self.new_indices()
        aux_dict = dict()
        for lv in range(self.numlevels):
            for i in range(self.numlevels):
                if i == lv:
                    act = list(self.actfun[lv])
                    aux_dict[lv] = dict(zip(act, act))
                elif lv - self.disparity <= i < lv:
                    found = []
                    for j in aux_dict[i]:
                        if isinstance(aux_dict[i][j], tuple):
                            aux_dict[i][j] = {aux_dict[i][j]}
                        aux_dict[i][j] = set(self.hmesh.function_children(
                            lv - 1, aux_dict[i][j]))
                        overlap = aux_dict[i][j] & (self.actfun[lv]
                                                    | self.deactfun[lv])
                        if overlap:
                            aux_dict[i][j] -= overlap
                            found.append(j)
                    indices[lv][i] = sorted(
                        set(found) - self.index_dirichlet[lv][i])
        return indices

    def func_supp_indices(self):
        """Per virtual level, coarse functions that are (grand)parents of the
        active fine functions."""
        indices = self.new_indices()
        for lv in range(self.numlevels):
            for i in range(self.numlevels):
                if lv - self.disparity <= i < lv:
                    funcs = set(self.hmesh.function_grandparents(
                        lv, self.actfun[lv], i)) & self.actfun[i]
                    indices[lv][i] = sorted(
                        funcs - self.index_dirichlet[lv][i])
        return indices

    def cell_supp_indices(self, remove_dirichlet=True):
        """Per virtual level, coarse functions whose support intersects the
        support of the new fine functions (support extension)."""
        indices = self.new_indices()
        for lv in range(self.numlevels):
            for i in range(self.numlevels):
                if lv - self.disparity <= i < lv:
                    funcs = self.hmesh.meshes[i].supported_in(
                        self.hmesh.cell_grandparent(
                            lv, self.hmesh.meshes[lv].support(self.actfun[lv]),
                            i)) & self.actfun[i]
                    if remove_dirichlet:
                        indices[lv][i] = sorted(
                            funcs - self.index_dirichlet[lv][i])
                    else:
                        indices[lv][i] = sorted(funcs)
        return indices

    def global_indices(self, vlvl=None):
        """Per virtual level, all functions of that virtual space."""
        if vlvl is None:
            return [self.global_indices(vlvl=j) for j in range(self.numlevels)]
        indices = [[] for _ in range(self.numlevels)]
        for i in range(vlvl + 1):
            if i == vlvl:
                indices[i] = sorted(self.actfun[i]) + sorted(self.deactfun[i])
            else:
                indices[i] = sorted(self.actfun[i])
        return indices

    def indices_to_smooth(self, strategy='func_supp'):
        """Smoothing index sets (canonical, per virtual level) for the local
        multigrid solver."""
        assert strategy in ('new', 'trunc', 'func_supp', 'cell_supp'), \
            'Invalid smoothing strategy'
        chosen = getattr(self, strategy + '_indices')()
        chosen = [self.ravel_indices(idx) for idx in chosen]
        return [self.raveled_to_virtual_canonical_indices(lv, chosen[lv])
                for lv in range(self.numlevels)]

    # -- supports ---------------------------------------------------------------------

    def compute_supports(self, functions):
        """Active hierarchical cells covering the supports of the given
        per-level function lists."""
        supports = [self.hmesh.meshes[l].support(funcs)
                    for l, funcs in enumerate(functions)]
        return self.hmesh.hmesh_cells(supports)

    def compute_virtual_supports(self, per_level):
        return tuple(self.get_virtual_space(lv).compute_supports(functions)
                     for lv, functions in enumerate(per_level))

    @property
    def cell_dirichlet(self):
        return self.compute_virtual_supports(self.index_dirichlet)

    @property
    def cell_new(self):
        return self.compute_virtual_supports(self.new_indices())

    @property
    def cell_trunc(self):
        return self.compute_virtual_supports(self.trunc_indices())

    @property
    def cell_func_supp(self):
        return self.compute_virtual_supports(self.func_supp_indices())

    @property
    def cell_cell_supp(self):
        return self.compute_virtual_supports(self.cell_supp_indices())

    @property
    def cell_global(self):
        return self.compute_virtual_supports(self.global_indices())

    # -- refinement ---------------------------------------------------------------------

    def _functions_to_deactivate(self, marked):
        mf = dict()
        for lv in range(self.numlevels):
            m = marked.get(lv)
            if not m:
                mf[lv] = set()
            else:
                cand = self.mesh(lv).supported_in(m) & self.actfun[lv]
                # deactivate when no active cell of this level remains in the support
                mf[lv] = set(
                    f for f in cand
                    if not (self.mesh(lv).support([f]) & self.hmesh.active[lv]))
        return mf

    def cell_support_extension(self, l, cells, k):
        assert 0 <= k <= l, 'Invalid level.'
        aux = cells if k == l else self.hmesh.cell_grandparent(l, cells, k)
        return self.hmesh.meshes[k].support(
            self.hmesh.meshes[k].supported_in(aux))

    def function_support_extension(self, l, functions, k):
        assert 0 <= k <= l, 'Invalid level.'
        aux = self.hmesh.meshes[l].support(functions)
        if k != l:
            aux = self.hmesh.cell_grandparent(l, aux, k)
        return self.hmesh.meshes[k].supported_in(aux)

    def _cell_neighborhood(self, l, cells, truncate=False):
        if l - self.disparity < 0:
            return set()
        if truncate:
            return self.hmesh.active[l - self.disparity] & set(
                self.hmesh.cell_parent(
                    l - self.disparity + 1,
                    self.cell_support_extension(l, cells,
                                                l - self.disparity + 1)))
        return self.hmesh.active[l - self.disparity] & set(
            self.cell_support_extension(l, cells, l - self.disparity))

    def _mark_recursive(self, l, marked, truncate=False):
        neighbors = self._cell_neighborhood(l, marked.get(l, set()),
                                            truncate=truncate)
        if neighbors:
            marked[l - self.disparity] = \
                marked.get(l - self.disparity, set()) | neighbors
            self._mark_recursive(l - self.disparity, marked, truncate=truncate)

    def refine(self, marked, truncate=False):
        """Refine the marked cells (dict level -> cells), preserving the mesh
        level disparity [Bracco, Giannelli, Vazquez 2018].  Returns the cells
        actually refined."""
        max_lv = max(lv for lv, cells in marked.items() if cells)
        self._ensure_levels(max_lv + 2)

        if self.disparity < np.inf:
            marked = marked.copy()
            for l in range(self.numlevels):
                self._mark_recursive(l, marked, truncate=truncate)

        new_cells = self.hmesh.refine(marked)
        mf = self._functions_to_deactivate(marked)

        for lv in range(self.numlevels - 1):
            mfuncs = mf[lv]
            self.actfun[lv] -= mfuncs
            self.deactfun[lv] |= mfuncs
            candidates = (self.mesh(lv + 1).supported_in(new_cells[lv + 1])
                          - self.actfun[lv + 1])
            fine_cells = (self.hmesh.active[lv + 1]
                          | self.hmesh.deactivated[lv + 1])
            msh = self.mesh(lv + 1)
            self.actfun[lv + 1] |= set(
                f for f in candidates
                if msh.support([f]).issubset(fine_cells))

        self._clear_cache()
        return marked

    def refine_region(self, lv, region_function):
        """Refine all active cells on level `lv` whose center satisfies
        `region_function` (arguments in XYZ order)."""
        self._ensure_levels(lv + 2)

        def center(c):
            return tuple(0.5 * (lo + hi)
                         for lo, hi in reversed(self.cell_extents(lv, c)))
        return self.refine({lv: tuple(
            c for c in self.hmesh.active[lv] if region_function(*center(c)))})

    # -- space relations -----------------------------------------------------------------

    def get_virtual_space(self, lv):
        """The virtual-hierarchy space at level `lv` (deeper refinements
        undone)."""
        if lv is None:
            lv = self.numlevels - 1
        assert 0 <= lv < self.numlevels, 'Invalid level.'
        out = self.copy()
        if lv != self.numlevels - 1:
            out.actfun = out.actfun[:lv + 1]
            out.deactfun = out.deactfun[:lv + 1]
            out.hmesh.active = out.hmesh.active[:lv + 1]
            out.hmesh.deactivated = out.hmesh.deactivated[:lv + 1]
            out.hmesh.meshes = out.hmesh.meshes[:lv + 1]
            out.hmesh.P = out.hmesh.P[:lv]
            out.actfun[lv] |= out.deactfun[lv]
            out.deactfun[lv] = set()
            out.hmesh.active[lv] |= out.hmesh.deactivated[lv]
            out.hmesh.deactivated[lv] = set()
            out._clear_cache()
        return out

    def copy(self):
        return copy.deepcopy(self)

    def is_subspace_of(self, other, check_kv=True):
        """Whether `self` is a subspace of `other`."""
        if not self.numlevels <= other.numlevels:
            return False
        if check_kv and not (self.hmesh.meshes[:self.numlevels]
                             == other.hmesh.meshes[:self.numlevels]):
            return False
        return all(self.deactfun[lv] <= other.deactfun[lv]
                   for lv in range(self.numlevels))

    def spans_same_space_as(self, other, check_kv=True):
        """Whether `self` and `other` span the same space."""
        if self.numlevels != other.numlevels:
            return False
        if check_kv and not (self.hmesh.meshes[:self.numlevels]
                             == other.hmesh.meshes[:self.numlevels]):
            return False
        return all(self.actfun[lv] == other.actfun[lv]
                   and self.deactfun[lv] == other.deactfun[lv]
                   for lv in range(self.numlevels))

    def __eq__(self, other):
        return self.spans_same_space_as(other)

    def boundary(self, bdspec):
        """Restriction of this space to a boundary face as a (dim-1)-dim
        HSpace plus the canonical indices of the boundary functions."""
        bdspec = bspline._parse_bdspec(bdspec, self.dim)
        ax = bdspec[0]
        act_i, act_c, deact_i, deact_c, mapping_i = [], [], [], [], []
        for lv in range(self.numlevels):
            TPcells = self._boundary_cells_lv(lv, bdspec)
            TPfuncs = self._boundary_funcs_lv(lv, bdspec)
            mapping_i.append(self.actfun[lv] & TPfuncs)
            act_i.append(_without_axis(mapping_i[-1], ax))
            act_c.append(_without_axis(self.hmesh.active[lv] & TPcells, ax))
            deact_i.append(_without_axis(self.deactfun[lv] & TPfuncs, ax))
            deact_c.append(_without_axis(
                self.hmesh.deactivated[lv] & TPcells, ax))

        mapping = self._levelwise_to_canonical(mapping_i)
        kvs = tuple(_without_axis(
            list(self.hmesh.meshes[lv].kvs for lv in range(self.numlevels)),
            ax))

        while not act_c[-1]:
            act_c.pop(); deact_c.pop(); act_i.pop(); deact_i.pop()
        bd_space = HSpace.init_from_kvs(
            kvs[:len(act_c)], act_c, deact_c, act_i, deact_i,
            truncate=self.truncate, disparity=self.disparity)
        return bd_space, mapping

    def prolongate_to(self, fine, check_nestedness=False,
                      check_nestedness_kv=False):
        """Prolongation matrix from `self` into the refined HSpace `fine`
        (``self.is_subspace_of(fine)`` assumed)."""
        if check_nestedness and not self.is_subspace_of(
                fine, check_kv=check_nestedness_kv):
            raise RuntimeError('HSpace is not a subspace')
        disparity = max(self.disparity, fine.disparity)

        c_numlevels = self.numlevels
        c_actfun = self.actfun
        f_numlevels = fine.numlevels
        f_numactive = fine.numactive
        f_actfun = fine.actfun
        f_actfun_can = tuple(
            np.arange(sum(f_numactive[:lv]), sum(f_numactive[:lv + 1]))
            for lv in range(f_numlevels))
        f_actfun_rav = fine.active_indices()
        f_deactfun_rav = fine.deactivated_indices()

        replaced_rav = self.ravel_indices(
            [c_act - f_act
             for c_act, f_act in zip(c_actfun, f_actfun[:c_numlevels])])

        def replaced_as_canonical(lv):
            levels = [set() for _ in range(c_numlevels)]
            levels[lv] = replaced_rav[lv]
            return self._levelwise_to_canonical(levels, raveled=True)

        c_replaced_can = [replaced_as_canonical(lv)
                          for lv in range(c_numlevels)]

        common_actfun = [c_act & f_act
                         for c_act, f_act in zip(c_actfun,
                                                 f_actfun[:c_numlevels])]
        common_c = self._levelwise_to_canonical(common_actfun)
        common_f = fine._levelwise_to_canonical(
            common_actfun + [set()] * (f_numlevels - c_numlevels))

        out = scipy.sparse.lil_matrix((fine.numdofs, self.numdofs))
        out[np.ix_(common_f, common_c)] = scipy.sparse.eye(len(common_c))

        needed_P_rows = [set() for _ in range(f_numlevels - 1)]
        coarse_levels = (c_numlevels if c_numlevels < f_numlevels
                         else c_numlevels - 1)
        for l in range(1, min(f_numlevels, coarse_levels + disparity + 1)):
            needed_P_rows[l - 1].update(f_actfun_rav[l])
            needed_P_rows[l - 1].update(f_deactfun_rav[l])
        P = [utils.kron_partial(fine.tp_prolongation(lv),
                                np.array(sorted(needed_P_rows[lv])))
             for lv in range(f_numlevels - 1)]

        P_current, fd_lm1 = None, None
        for lv in range(coarse_levels):
            for l in range(lv + 1, min(f_numlevels, lv + disparity + 1)):
                fa_l = f_actfun_rav[l]
                fd_l = f_deactfun_rav[l]
                if l == lv + 1:
                    P_act = P[l - 1][np.ix_(fa_l, replaced_rav[lv])]
                    P_deact = P[l - 1][np.ix_(fd_l, replaced_rav[lv])]
                else:
                    P_act = P[l - 1][np.ix_(fa_l, fd_lm1)] @ P_current
                    P_deact = P[l - 1][np.ix_(fd_l, fd_lm1)] @ P_current
                out[np.ix_(f_actfun_can[l], c_replaced_can[lv])] += P_act
                if len(fd_l) == 0:
                    break
                P_current = P_deact
                fd_lm1 = fd_l
        return out.tocsr()

    # -- basis representation ----------------------------------------------------------

    def represent_fine(self, lv=None, truncate=None, rows=None,
                       restrict=False):
        """Matrix representing the active HB/THB functions (up to level `lv`)
        by their coefficients in the TP space of level `lv`.

        `rows` optionally restricts which TP coefficients are computed
        (zero-filled unless `restrict=True`, in which case the matrix is
        shrunk to those rows).  (Reference: hierarchical.py:1059.)"""
        if lv is None:
            lv = self.numlevels - 1
        assert 0 <= lv < self.numlevels, 'Invalid level.'
        if truncate is None:
            truncate = self.truncate
        act_indices = list(self.active_indices()[:lv + 1])
        act_indices[lv] = np.concatenate(
            (act_indices[lv], self.deactivated_indices()[lv]))

        fmt = 'lil' if truncate else 'csr'

        blocks = []
        needed_rows = None
        P = None
        for k in reversed(range(lv + 1)):
            Nj = self.mesh(k).numbf
            if k == lv:
                if rows is None:
                    P = scipy.sparse.eye(Nj, format='csc')
                    needed_rows = None
                else:
                    n = len(rows)
                    if restrict:
                        P = scipy.sparse.coo_matrix(
                            (np.ones(n), (np.arange(n), rows)),
                            shape=(n, Nj)).tocsc()
                    else:
                        P = scipy.sparse.coo_matrix(
                            (np.ones(n), (rows, rows)),
                            shape=(Nj, Nj)).tocsc()
                    needed_rows = rows
            else:
                if needed_rows is not None and \
                        len(needed_rows) / P.shape[1] > 0.5:
                    needed_rows = None      # full Kronecker is cheaper
                if needed_rows is None:
                    Pj = utils.multi_kron_sparse(self.hmesh.P[k], format=fmt)
                else:
                    Pj = utils.kron_partial(self.hmesh.P[k], needed_rows,
                                            format=fmt)
                if truncate:
                    Pj[act_indices[k + 1], :] = 0
                P = P.dot(Pj)
                nnz_per_col = P.getnnz(axis=0)
                needed_rows = nnz_per_col.nonzero()[0]

            blocks.append(P[:, act_indices[k]])

        blocks.reverse()
        return scipy.sparse.bmat([blocks], format='csr')

    def truncate_one_level(self, k, num_rows=None, inverse=False):
        """Truncation operator from level `k` to `k+1`
        (``I - A`` or its inverse ``I + A``)."""
        nt = np.cumsum(self.numactive)
        actidx = self.active_indices()
        if num_rows is None:
            num_rows = nt[-1]
        A = self.represent_fine(lv=k + 1, rows=actidx[k + 1], truncate=False,
                                restrict=True)
        nA = A.shape[0]
        A.resize(nA, nt[k])
        A.resize(nA, num_rows)
        A = scipy.sparse.vstack(
            (scipy.sparse.csr_matrix((nt[k], num_rows)), A))
        A.resize(num_rows, num_rows)
        I = scipy.sparse.eye(num_rows, format='csr')
        return I + A if inverse else I - A

    def thb_to_hb(self):
        """Square matrix mapping THB coefficients to HB coefficients."""
        if self.numlevels == 1:
            return scipy.sparse.eye(self.numdofs, format='csr')
        T = self.truncate_one_level(0)
        for k in range(1, self.numlevels - 1):
            T = self.truncate_one_level(k) @ T
        return T

    def hb_to_thb(self):
        """Square matrix mapping HB coefficients to THB coefficients."""
        if self.numlevels == 1:
            return scipy.sparse.eye(self.numdofs, format='csr')
        T = self.truncate_one_level(0, inverse=True)
        for k in range(1, self.numlevels - 1):
            T = T @ self.truncate_one_level(k, inverse=True)
        return T

    def split_coeffs(self, x):
        """Split a canonical coefficient vector into per-level pieces."""
        out, j = [], 0
        for af in self.actfun:
            out.append(x[j:j + len(af)])
            j += len(af)
        assert j == x.shape[0], 'Wrong length of input vector'
        return out

    def tp_prolongation(self, lv, kron=False):
        """TP prolongation from level `lv` to `lv+1` (per-axis factors or the
        full Kronecker product)."""
        Ps = self.hmesh.P[lv]
        return utils.multi_kron_sparse(Ps) if kron else Ps

    def incidence_matrix(self):
        """0/1 matrix of (active function, active cell) incidences in
        canonical order."""
        naf = tuple(len(ii) for ii in self.actfun)
        nac = tuple(len(ii) for ii in self.hmesh.active)
        ndc = tuple(len(ii) for ii in self.hmesh.deactivated)
        L = self.numlevels

        cell_index = [
            utils.BijectiveIndex(sorted(self.hmesh.active[k])
                                 + sorted(self.hmesh.deactivated[k]))
            for k in range(L)]

        def incidence_1level(k):
            n0 = sum(nac[:k])
            Z = scipy.sparse.lil_matrix((naf[k], n0 + nac[k] + ndc[k]),
                                        dtype=int)
            msh_k, ci_k = self.hmesh.meshes[k], cell_index[k]
            for i, f in enumerate(sorted(self.actfun[k])):
                for c in msh_k.support([f]):
                    Z[i, n0 + ci_k.index(c)] = 1
            return Z.tocsr()

        def cell_prolongation(k):
            P = scipy.sparse.lil_matrix((nac[k + 1] + ndc[k + 1], ndc[k]),
                                        dtype=int)
            for i in range(ndc[k]):
                parent = cell_index[k][nac[k] + i]
                for c in self.hmesh.cell_children(k, [parent]):
                    P[cell_index[k + 1].index(c), i] = 1
            I_k = scipy.sparse.eye(sum(nac[:k + 1]), dtype=int)
            return scipy.sparse.bmat([[I_k, None], [None, P]], format='csr')

        result = [incidence_1level(k) for k in range(L)]
        for k in range(L - 1):
            P = cell_prolongation(k)
            for j in range(k + 1):
                result[j] = result[j].dot(P.T)
        return scipy.sparse.vstack(result, format='csr')

    def virtual_hierarchy_prolongators(self, truncate=None):
        """Prolongators between consecutive virtual-hierarchy spaces
        (the multigrid transfer operators)."""
        if truncate is None:
            truncate = self.truncate
        Ps = tuple(self.tp_prolongation(lv, kron=False)
                   for lv in range(self.numlevels - 1))
        IA = self.active_indices()
        ID = self.deactivated_indices()
        IR = tuple(np.concatenate((iA, iD)) for iA, iD in zip(IA, ID))
        nt = np.cumsum(tuple(len(ii) for ii in IA))

        prolongators = []
        for lv in range(self.numlevels - 1):
            P_rd = utils.kron_partial(Ps[lv], rows=IR[lv + 1],
                                      restrict=True)[:, ID[lv]]
            P_hb = scipy.sparse.bmat(
                ((scipy.sparse.eye(nt[lv]), None), (None, P_rd)),
                format='csc')
            prolongators.append(P_hb)

        if truncate:
            prolongators = [
                self.truncate_one_level(k, num_rows=P.shape[0], inverse=True)
                @ P for k, P in enumerate(prolongators)]
        return prolongators

    # -- evaluation ----------------------------------------------------------------------

    def coeffs_to_levelwise_funcs(self, coeffs, truncate=None):
        """Per-level :class:`.BSplineFunc` contributions of a hierarchical
        function given in canonical coefficients."""
        if truncate is None:
            truncate = self.truncate
        if truncate:
            coeffs = self.thb_to_hb() @ coeffs
        u_lv = self.split_coeffs(coeffs)
        IA = self.active_indices()
        from .geometry import BSplineFunc
        return tuple(
            BSplineFunc(self.knotvectors(lv),
                        _scatter(self.mesh(lv).numbf, IA[lv], uj))
            for lv, uj in enumerate(u_lv))

    def grid_eval(self, coeffs, gridaxes, truncate=None):
        """Evaluate a hierarchical function on a tensor grid."""
        if truncate is None:
            truncate = self.truncate
        return sum(f.grid_eval(gridaxes)
                   for f in self.coeffs_to_levelwise_funcs(
                       coeffs, truncate=truncate))


class HSplineFunc:
    """A (scalar) function in a hierarchical spline space, following the
    :class:`.BSplineFunc` interface."""

    def __init__(self, hspace, u, truncate=None):
        self.hs = hspace
        self.coeffs = u
        self.sdim = hspace.dim
        self.dim = 1
        self.truncate = hspace.truncate if truncate is None else truncate

    def output_shape(self):
        return ()

    def is_scalar(self):
        return True

    def is_vector(self):
        return False

    def __call__(self, *x):
        return self.eval(*x)

    def _levelwise(self):
        return self.hs.coeffs_to_levelwise_funcs(self.coeffs,
                                                 truncate=self.truncate)

    def eval(self, *x):
        return sum(f.eval(*x) for f in self._levelwise())

    def grid_eval(self, gridaxes):
        return self.hs.grid_eval(self.coeffs, gridaxes,
                                 truncate=self.truncate)

    def grid_jacobian(self, gridaxes):
        return sum(f.grid_jacobian(gridaxes) for f in self._levelwise())

    def grid_hessian(self, gridaxes):
        return sum(f.grid_hessian(gridaxes) for f in self._levelwise())

    @property
    def support(self):
        return tuple(kv.support() for kv in self.hs.knotvectors(0))
