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


def banded_gather_maps(structure, bws):
    """Per-level lookup tables mapping banded flat row ``mu*n + i`` to the
    compact data index (or -1 on the clipped-band padding).  Host setup for
    :func:`banded_from_compact_device`."""
    maps = []
    for (m, n), bidx, bw in zip(structure.bs, structure.bidx, bws):
        lookup = -np.ones((2 * bw + 1) * n, dtype=np.int64)
        i = bidx[:, 0].astype(np.int64)
        mu = bidx[:, 1].astype(np.int64) - i + bw
        lookup[mu * n + i] = np.arange(len(bidx))
        maps.append(lookup)
    return maps


def banded_from_compact_device(data, maps, bsz, ns):
    """Traced compact -> banded ``(b..., n...)`` conversion: one separable
    gather per level (take along axis), zeroing the padding — the data never
    leaves HBM (unlike the host-side :func:`banded_from_compact`)."""
    from .sumfac import banded_reorder
    X = data
    for k, lk in enumerate(maps):
        lk = jnp.asarray(lk)
        mask_shape = [1] * data.ndim
        mask_shape[k] = -1
        X = (jnp.take(X, jnp.maximum(lk, 0), axis=k)
             * (lk >= 0).reshape(mask_shape).astype(data.dtype))
    return banded_reorder(X, bsz, ns)


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


################################################################################
# Pallas kernel (TPU): stream D once, keep x and y resident in VMEM
################################################################################

def _ceil(x, m):
    return -(-x // m) * m


def banded_matvec_pallas(D_pad, xp, mus, ns, ns_pad, interpret=False):
    """Pallas banded matvec (3D).

    Args:
        D_pad: banded data, shape ``(B, n1, n2p, n3p)`` — band-offset
            combinations flattened into the leading (grid) axis, dof axes
            zero-padded to TPU tile multiples.
        xp: band-halo + tile padded input, shape
            ``(n1 + 2b1, n2p + 2b2, n3p + 2b3)`` (zeros outside the domain).
        mus: ``(B, 3)`` int32 table of band offsets (scalar-prefetched).
        ns / ns_pad: logical and padded dof shapes.

    One grid step per band-offset combination: the D block streams through
    VMEM (DMA-pipelined by Pallas), the shifted window of the VMEM-resident
    `xp` is multiplied in, and the output block (same block every step)
    accumulates in VMEM — the data tensor is read exactly once."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = D_pad.shape[0]
    n1p, n2p, n3p = ns_pad

    xshape = xp.shape

    def kernel(mus_ref, D_ref, xp_ref, y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        # Mosaic vector loads must be tile-aligned in the (sublane, lane)
        # dims: slice dynamically along the untiled axis 0, then extract the
        # shifted window in dims 1/2 by dynamic in-register rotations and a
        # static aligned prefix.
        xw = xp_ref[pl.ds(mus_ref[step, 0], n1p), :, :]
        for axis in (1, 2):
            m = mus_ref[step, axis]
            sz = xshape[axis]
            shift = jax.lax.rem(jnp.int32(sz) - m, jnp.int32(sz))
            xw = pltpu.roll(xw, shift, axis)
        y_ref[...] += D_ref[0] * xw[:, :n2p, :n3p]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n1p, n2p, n3p), lambda s, mus: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xp.shape, lambda s, mus: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n1p, n2p, n3p), lambda s, mus: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p, n3p), D_pad.dtype),
        interpret=interpret,
    )(mus, D_pad, xp)
    return y[:ns[0], :ns[1], :ns[2]]


class PallasBandedOperator:
    """3D banded operator backed by the Pallas kernel.

    Requires the padded input (``(n1+2b1) * pad8(n2p+2b2) * pad128(n3p+2b3)``
    elements) to fit in VMEM; use :class:`BandedOperator` otherwise.

    .. note::
        The kernel extracts shifted input windows with dynamic in-register
        rotations; the current Mosaic toolchain on this target rejects
        dynamic sublane rotations ("unsupported unaligned shape"), so the
        compiled TPU path is unavailable there and the kernel runs in
        interpreter mode / serves as the reference implementation.  The
        production solver path is :class:`~pyiga_tpu.ops.matfree.
        MatrixFreeOperator` (pure MXU matmuls, faster than any assembled
        matvec measured on hardware); :class:`BandedOperator` is the XLA
        assembled-operator path."""

    def __init__(self, D, bws, ns, interpret=None):
        from .. import config
        assert len(ns) == 3, 'Pallas banded matvec implemented for 3D'
        self.bws = tuple(bws)
        self.ns = tuple(ns)
        bsz = tuple(2 * b + 1 for b in bws)
        self.shape = (int(np.prod(ns)), int(np.prod(ns)))
        if interpret is None:
            interpret = config.pallas_interpret_mode()
        self.interpret = interpret

        # pad dof axes to tile multiples (sublane 8, lane 128)
        n1, n2, n3 = ns
        self.ns_pad = (n1, _ceil(n2, 8), _ceil(n3, 128))
        Bflat = int(np.prod(bsz))
        D = D.reshape((Bflat,) + tuple(ns))
        pad = [(0, 0)] + [(0, p - n) for p, n in zip(self.ns_pad, ns)]
        self.D_pad = jnp.pad(jnp.asarray(D), pad)
        self.mus = jnp.asarray(
            np.stack(np.unravel_index(np.arange(Bflat), bsz), axis=1)
            .astype(np.int32))

        self._xpad_shape = tuple(p + 2 * b
                                 for p, b in zip(self.ns_pad, self.bws))

        ns_t, ns_pad_t, bws_t = self.ns, self.ns_pad, self.bws
        xshape = self._xpad_shape
        intp = self.interpret

        def apply_with_operands(operands, x):
            X = x.reshape(ns_t)
            xp = jnp.zeros(xshape, dtype=x.dtype)
            xp = jax.lax.dynamic_update_slice(xp, X, bws_t)
            y = banded_matvec_pallas(operands['D_pad'], xp, operands['mus'],
                                     ns_t, ns_pad_t, interpret=intp)
            return y.reshape(-1)

        self.operands = {'D_pad': self.D_pad, 'mus': self.mus}
        self.apply_with_operands = apply_with_operands
        self._jit_apply = jax.jit(apply_with_operands)

    def matvec(self, x):
        return self._jit_apply(self.operands, x)

    def __call__(self, x):
        return self.matvec(x)


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


def banded_matvec_pair(D_pair, x_pair, bws, ns):
    """Two-float banded matvec: same window accumulation as
    :func:`banded_matvec` but in fused f32 pair arithmetic — the float64
    residual matvecs of iterative refinement without any emulated-f64
    elementwise ops (which cost ~15x their traffic bound on TPU)."""
    from . import twofloat as tf
    d = len(ns)
    bsz = tuple(2 * bw + 1 for bw in bws)
    xh = x_pair[0].reshape(ns)
    xl = x_pair[1].reshape(ns)
    pad = [(bw, bw) for bw in bws]
    xph, xpl = jnp.pad(xh, pad), jnp.pad(xl, pad)
    nmu = int(np.prod(bsz))

    def body(f, y):
        mus = []
        rem = f
        for k in reversed(range(d)):
            mus.append(rem % bsz[k])
            rem = rem // bsz[k]
        mus = tuple(reversed(mus))
        Ds = tuple(
            jax.lax.dynamic_slice(Dc, mus + d * (0,),
                                  d * (1,) + tuple(ns)).reshape(ns)
            for Dc in D_pair)
        xw = (jax.lax.dynamic_slice(xph, mus, tuple(ns)),
              jax.lax.dynamic_slice(xpl, mus, tuple(ns)))
        return tf.df_add(y, tf.df_mul(Ds, xw))

    z = jnp.zeros(ns, dtype=jnp.float32)
    yh, yl = jax.lax.fori_loop(0, nmu, body, (z, z))
    return yh.reshape(-1), yl.reshape(-1)


class BandedOperatorPair:
    """Banded operator holding its data as a two-float f32 pair; maps f64
    vectors to f64 results at ~2^-45 relative accuracy with f32-speed
    arithmetic.  Drop-in for :class:`BandedOperator` as the high-precision
    operator of :func:`~pyiga_tpu.solvers.cg_ir`."""

    def __init__(self, D_pair, bws, ns):
        from . import twofloat as tf
        self.bws = tuple(bws)
        self.ns = tuple(ns)
        self.shape = (int(np.prod(ns)), int(np.prod(ns)))
        self.operands = {'Dh': None if D_pair is None else D_pair[0],
                         'Dl': None if D_pair is None else D_pair[1]}
        bws_t, ns_t = self.bws, self.ns

        def apply_with_operands(operands, x):
            xp = tf.df_from_f64(x)
            yh, yl = banded_matvec_pair((operands['Dh'], operands['Dl']),
                                        xp, bws_t, ns_t)
            return tf.df_to_f64((yh, yl))

        self.apply_with_operands = apply_with_operands

    def set_data_f64(self, D):
        """Split a float64 banded data array into the stored pair."""
        from . import twofloat as tf
        hi, lo = tf.df_from_f64(D)
        self.operands['Dh'] = hi
        self.operands['Dl'] = lo

    def matvec(self, x):
        import jax as _jax
        return _jax.jit(self.apply_with_operands)(self.operands, x)

    def __call__(self, x):
        return self.matvec(x)


