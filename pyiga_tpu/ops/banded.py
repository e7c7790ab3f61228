# -*- coding: utf-8 -*-
"""Regular banded layout for compact multilevel matrices and its fast matvec.

For spline spaces with single interior knots, the per-axis sparsity pattern
is a clipped band of width ``2p+1``.  Padding the clipped boundary rows to
the full band gives a *regular* layout

    D[mu_1, ..., mu_d, i_1, ..., i_d],   j_k = i_k + mu_k - p_k,

(band offsets leading, dof axes trailing = TPU-tile friendly).  The matvec
then reads the data tensor exactly once and accumulates ``prod(2p_k+1)``
shifted windows of the (VMEM-resident) input vector:

    y[i] = sum_mu D[mu, i] * x[i + mu - p]

This replaces the gather + segment-sum path of :mod:`.mlmatvec` (which
remains as the general fallback for irregular patterns): the banded form is
bandwidth-optimal, while gathers re-read HBM per level.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def band_info(structure):
    """If every level of the MLStructure is a clipped band over a square
    block, return the per-level bandwidths; else None."""
    bws = []
    for (m, n), bidx in zip(structure.bs, structure.bidx):
        if m != n:
            return None
        i = bidx[:, 0].astype(np.int64)
        j = bidx[:, 1].astype(np.int64)
        bw = int(np.max(np.abs(i - j))) if len(i) else 0
        # check the pattern is exactly the clipped band of width bw
        lo = np.maximum(0, np.arange(n) - bw)
        hi = np.minimum(n, np.arange(n) + bw + 1)
        if len(i) != int(np.sum(hi - lo)):
            return None
        bws.append(bw)
    return bws


def compact_to_banded_indices(structure, bws):
    """Indices mapping the flat compact data tensor into the padded banded
    tensor: returns per-level arrays ``(mu_k, i_k)`` for each nonzero."""
    out = []
    for bw, bidx in zip(bws, structure.bidx):
        i = bidx[:, 0].astype(np.int64)
        j = bidx[:, 1].astype(np.int64)
        out.append((j - i + bw, i))
    return out


def banded_from_compact(data, structure, bws):
    """Scatter the compact data tensor into the regular banded layout
    ``(b_1, ..., b_d, n_1, ..., n_d)`` (zeros on the padding).

    Host-side numpy: the mapping is separable per level, so a single
    ``np.ix_`` fancy assignment with per-axis flat indices suffices."""
    d = len(bws)
    ns = [b[0] for b in structure.bs]
    bsz = [2 * bw + 1 for bw in bws]
    idx = compact_to_banded_indices(structure, bws)
    flat = [mu * n + i for (mu, i), n in zip(idx, ns)]
    # interleaved layout (b1, n1, b2, n2, ...), flattened per level
    D = np.zeros([b * n for b, n in zip(bsz, ns)], dtype=np.asarray(data).dtype)
    D[np.ix_(*flat)] = np.asarray(data)
    D = D.reshape([x for b, n in zip(bsz, ns) for x in (b, n)])
    # move all band axes to the front: (b1, ..., bd, n1, ..., nd)
    perm = list(range(0, 2 * d, 2)) + list(range(1, 2 * d, 2))
    return np.ascontiguousarray(np.transpose(D, perm))


@partial(jax.jit, static_argnames=('bws', 'ns'))
def banded_matvec(D, x, bws, ns):
    """Banded matvec: `D` in ``(b_1..b_d, n_1..n_d)`` layout, `x` raveled.

    Reads `D` once; accumulates one shifted window of the zero-padded input
    per band-offset combination via a fori_loop (static trip count
    ``prod(b_k)``, unrolled windows stay in VMEM for typical sizes)."""
    d = len(ns)
    bsz = tuple(2 * bw + 1 for bw in bws)
    x = x.reshape(ns)
    xp = jnp.pad(x, [(bw, bw) for bw in bws])
    nmu = int(np.prod(bsz))

    def body(f, y):
        # unravel flat offset index f -> (mu_1, ..., mu_d)
        mus = []
        rem = f
        for k in reversed(range(d)):
            mus.append(rem % bsz[k])
            rem = rem // bsz[k]
        mus = tuple(reversed(mus))
        Dslice = jax.lax.dynamic_slice(D, mus + d * (0,),
                                       d * (1,) + tuple(ns))
        Dslice = Dslice.reshape(ns)
        xwin = jax.lax.dynamic_slice(xp, mus, tuple(ns))
        return y + Dslice * xwin

    y = jax.lax.fori_loop(0, nmu, body, jnp.zeros(ns, dtype=x.dtype))
    return y.reshape(-1)


class BandedOperator:
    """Device-resident banded operator with a fast matvec; built from an
    :class:`~pyiga_tpu.mlmatrix.MLMatrix` (or directly from banded data)."""

    def __init__(self, D, bws, ns):
        self.D = D
        self.bws = tuple(bws)
        self.ns = tuple(ns)
        self.shape = (int(np.prod(ns)), int(np.prod(ns)))
        # operand protocol (see solvers.cg_jit): D threaded as a jit argument
        self.operands = {'D': D}
        bws_t, ns_t = self.bws, self.ns
        self.apply_with_operands = (
            lambda operands, x: banded_matvec(operands['D'], x, bws_t, ns_t))

    @staticmethod
    def from_mlmatrix(mlm, data=None):
        """Build from an MLMatrix (uses its structure; `data` may override
        the device array, e.g. to stay in float32)."""
        bws = band_info(mlm.structure)
        if bws is None:
            return None
        ns = tuple(b[0] for b in mlm.structure.bs)
        if data is None:
            data = jnp.asarray(mlm.data)
        D = banded_from_compact(data, mlm.structure, bws)
        return BandedOperator(D, bws, ns)

    def matvec(self, x):
        return banded_matvec(self.D, x, self.bws, self.ns)

    def __call__(self, x):
        return self.matvec(x)
