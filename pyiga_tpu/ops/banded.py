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

    y = jax.lax.fori_loop(
        0, nmu, body, jnp.zeros(ns, dtype=jnp.result_type(D.dtype, x.dtype)))
    return y.reshape(-1)


def banded_matvec_static(D, x, bws, ns):
    """Python-unrolled variant of :func:`banded_matvec`: STATIC band
    offsets (``lax.slice`` windows instead of loop-carried dynamic
    slices).  Larger HLO (``prod(2p+1)`` fused slice-multiply-adds), but
    under SPMD sharding static slices of the padded input lower to cheap
    halo collective-permutes on the sharded axis, while the fori_loop's
    loop-varying dynamic slices force a per-iteration all-gather.  Used
    by the sharded flagship pipeline (:mod:`pyiga_tpu.parallel.flagship`).
    """
    bsz = tuple(2 * bw + 1 for bw in bws)
    x = x.reshape(ns)
    xp = jnp.pad(x, [(bw, bw) for bw in bws])
    y = jnp.zeros(ns, dtype=jnp.result_type(D.dtype, x.dtype))
    D = D.reshape(bsz + tuple(ns))
    for mus in np.ndindex(*bsz):
        xw = jax.lax.slice(xp, mus, tuple(m + n for m, n in zip(mus, ns)))
        y = y + D[mus] * xw
    return y.reshape(-1)


def banded_matvec_pair_static(D_pair, x_pair, bws, ns):
    """Static-offset (SPMD-friendly) form of :func:`banded_matvec_pair`;
    see :func:`banded_matvec_static`."""
    from . import twofloat as tf
    bsz = tuple(2 * bw + 1 for bw in bws)
    xh = x_pair[0].reshape(ns)
    xl = x_pair[1].reshape(ns)
    pad = [(bw, bw) for bw in bws]
    xph, xpl = jnp.pad(xh, pad), jnp.pad(xl, pad)
    Dh = D_pair[0].reshape(bsz + tuple(ns))
    Dl = D_pair[1].reshape(bsz + tuple(ns))
    z = jnp.zeros(ns, dtype=jnp.float32)
    y = (z, z)
    for mus in np.ndindex(*bsz):
        lim = tuple(m + n for m, n in zip(mus, ns))
        xw = (jax.lax.slice(xph, mus, lim), jax.lax.slice(xpl, mus, lim))
        y = tf.df_add(y, tf.df_mul((Dh[mus], Dl[mus]), xw))
    return y[0].reshape(-1), y[1].reshape(-1)


class BandedOperator:
    """Device-resident banded operator with a fast matvec; built from an
    :class:`~pyiga_tpu.mlmatrix.MLMatrix` (or directly from banded data)."""

    def __init__(self, D, bws, ns):
        # keep D device-resident: a host numpy D would re-upload the full
        # banded tensor (~(2p+1)^d * prod(ns) * itemsize) on every matvec
        D = jax.device_put(D) if isinstance(D, np.ndarray) else D
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
            data = mlm.data      # host scatter below; __init__ device_puts
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
        self._jit_apply = jax.jit(apply_with_operands)

    def set_data_f64(self, D):
        """Split a float64 banded data array into the stored pair."""
        from . import twofloat as tf
        hi, lo = tf.df_from_f64(D)
        self.operands['Dh'] = hi
        self.operands['Dl'] = lo

    def matvec(self, x):
        return self._jit_apply(self.operands, x)

    def __call__(self, x):
        return self.matvec(x)




################################################################################
# Flat-offset Pallas matvec: the whole d-D banded product as 1D static shifts
################################################################################
#
# Key reduction: embed the banded data into the halo-padded dof grid
# (zeros on the halo and outside the band clip).  Then for every band-offset
# combination mu the contribution is an ELEMENTWISE product of the embedded
# data with the input shifted by the single FLAT offset
#
#     off(mu) = sum_k (mu_k - b_k) * stride_k(padded grid),
#
# because the zero entries of the embedded data mask every row-wrap and
# boundary artifact of flat shifting.  All offsets are static, so the kernel
# unrolls them with static sublane/lane rolls — the dynamic sublane
# rotations that Mosaic rejects never appear.
# x and y stay VMEM-resident; the data streams from HBM exactly once via
# double-buffered DMA.  This replaces the reference's compact matvec
# (/root/reference/pyiga/mlmatrix_cy.pyx:295 ml_matvec_3d) as the assembled
# fast matvec on TPU.


def flat_banded_layout(bws, ns):
    """Static layout info: COMPACT grid shape, flat length F, row count R
    (lanes of 128), per-combo flat shifts (relative, >= 0) and the lead
    padding rows needed so every shift is nonnegative.

    The data grid is the UNPADDED dof grid: shifted reads that cross an
    axis boundary land on a wrong-but-valid dof, and are multiplied by
    the banded data's zero entry for that (dof, offset) — the band tables
    store zeros exactly where the band leaves the matrix, so no halo is
    needed.  Dropping the former ``n + 2b`` halo grid cuts the streamed
    data bytes ~40% at the bench sizes; the matvec is read-bandwidth
    bound (~350 GB/s measured), so the bytes are the time."""
    d = len(ns)
    bsz = tuple(2 * b + 1 for b in bws)
    np_ = tuple(ns)
    F = int(np.prod(np_))
    strides = [int(np.prod(np_[k + 1:])) for k in range(d)]
    offs = []
    for mu in np.ndindex(*bsz):
        offs.append(sum((m - b) * s for m, b, s in zip(mu, bws, strides)))
    offs = np.asarray(offs, np.int64)
    lead = int(-offs.min())             # zeros prepended to x

    def _rows8(rows):
        # sublane-aligned row counts: 8-row-aligned DMAs are measurably
        # faster than odd row extents
        return -(-rows // 8) * 8

    R = _rows8(-(-F // 128))
    # grid decomposition: the kernel iterates the LEADING band dimension as
    # its grid (the mu_1 part of the shift is absorbed into per-step
    # pre-sliced copies of x), so only the prod(bsz[1:]) inner combos are
    # statically unrolled in the body.  inner shift for (mu_2..mu_d) is
    # sum mu_k * stride_k  (in [0, sum (bsz_k-1) stride_k]).
    C1 = bsz[0]
    C23 = int(np.prod(bsz[1:])) if d > 1 else 1
    inner = []
    for mu in np.ndindex(*bsz[1:]):
        inner.append(int(sum(m * s for m, s in zip(mu, strides[1:]))))
    max_inner = max(inner)
    RXi = _rows8(-(-int(F + max_inner + 1) // 128) + 1)
    return {'F': F, 'R': R, 'lead': lead, 'bsz': bsz,
            'C1': C1, 'C23': C23, 'inner': inner, 'RXi': RXi,
            'S1': strides[0]}


def flat_banded_data(D, bws, ns):
    """Embed banded data ``(b..., n...)`` into the flat halo-padded layout:
    returns ``(C, R, 128)`` with zero halo/padding (any dtype)."""
    lay = flat_banded_layout(bws, ns)
    bsz, F, R = lay['bsz'], lay['F'], lay['R']
    C = int(np.prod(bsz))
    D = np.asarray(D).reshape((C,) + tuple(ns))
    flat = np.zeros((C, R * 128), dtype=D.dtype)
    flat[:, :F] = D.reshape(C, F)
    return flat.reshape(C, R, 128)


def _flat_shift_tiles(X, off):
    """w[r*128+l] = X[(r*128+l) + off] for a static off >= 0, X (RX, 128):
    two static rolls + a lane-mask select (wrap reads land on halo rows
    whose data factor is zero)."""
    from jax.experimental.pallas import tpu as pltpu
    sr, sl = off // 128, off % 128
    RX = X.shape[0]

    def roll(A, shift, axis):
        # non-negative int32 shifts: pltpu.roll rejects negatives, and
        # Python-int shifts lower to i64 under x64 (Mosaic wants i32)
        return pltpu.roll(A, jnp.int32(shift), axis)

    # a backward roll by s is a forward roll by dim - s
    B = roll(X, (RX - sr) % RX, 0) if sr else X
    if sl == 0:
        return B
    C1 = roll(B, 128 - sl, 1)
    C2 = roll(C1, RX - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    return jnp.where(lane < 128 - sl, C1, C2)


def _pick_dma_chunk(C23, R, n_pair, budget=11 * 2 ** 20):
    """DMA chunk size (combos per transfer): large transfers amortize the
    per-DMA issue cost (measured ~13us/DMA on the tunneled v5e — chunk
    size, not engine bandwidth, sets the throughput); bounded by a VMEM
    budget for the double-buffered (2 x n_pair x G) data blocks."""
    block = R * 128 * 4
    G = max(1, budget // (2 * n_pair * block))
    return int(min(G, C23))


def _make_flat_kernel(inner_shifts, C23, R, n_pair, G=1):
    """Kernel body: grid iterates the leading band dimension (its shift is
    pre-applied in the per-step x copy); the C23 inner combos are unrolled
    with static rolls.  D (pair) streams from HBM with double-buffered DMA;
    y (pair) accumulates in VMEM across grid steps."""
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl
    from . import twofloat as tf

    n_chunks = -(-C23 // G)

    if n_pair == 1:
        def kernel(x_ref, d_hbm, y_ref, dbuf, sem):
            m1 = pl.program_id(0)
            base = jnp.int32(m1) * jnp.int32(C23)

            def dma(slot, g):
                # chunked copy: G combos per DMA (fewer, larger transfers);
                # the explicit [0, R) row slice tolerates D pre-padded to
                # the blocked variant's R2 rows (shared data arrays)
                sz = min(G, C23 - g * G)
                return pltpu.make_async_copy(
                    d_hbm.at[pl.ds(base + jnp.int32(g * G), sz),
                             pl.ds(0, R)],
                    dbuf.at[jnp.int32(slot), pl.ds(0, sz)],
                    sem.at[jnp.int32(slot)])

            dma(0, 0).start()

            @pl.when(m1 == 0)
            def _():
                y_ref[...] = jnp.zeros_like(y_ref)

            X = x_ref[0]
            for g in range(n_chunks):
                slot = g % 2
                if g + 1 < n_chunks:
                    dma(1 - slot, g + 1).start()
                dma(slot, g).wait()
                for ci in range(min(G, C23 - g * G)):
                    c = g * G + ci
                    w = _flat_shift_tiles(X, inner_shifts[c])
                    y_ref[...] += dbuf[slot, ci] * w[:R, :]
        return kernel

    def kernel_pair(xh_ref, xl_ref, dh_hbm, dl_hbm, yh_ref, yl_ref,
                    dbuf, sem):
        m1 = pl.program_id(0)
        base = jnp.int32(m1) * jnp.int32(C23)

        def dma(slot, g, src, half):
            sz = min(G, C23 - g * G)
            return pltpu.make_async_copy(
                src.at[pl.ds(base + jnp.int32(g * G), sz), pl.ds(0, R)],
                dbuf.at[jnp.int32(slot), jnp.int32(half), pl.ds(0, sz)],
                sem.at[jnp.int32(slot), jnp.int32(half)])

        dma(0, 0, dh_hbm, 0).start()
        dma(0, 0, dl_hbm, 1).start()

        @pl.when(m1 == 0)
        def _():
            yh_ref[...] = jnp.zeros_like(yh_ref)
            yl_ref[...] = jnp.zeros_like(yl_ref)

        Xh = xh_ref[0]
        Xl = xl_ref[0]
        for g in range(n_chunks):
            slot = g % 2
            if g + 1 < n_chunks:
                dma(1 - slot, g + 1, dh_hbm, 0).start()
                dma(1 - slot, g + 1, dl_hbm, 1).start()
            dma(slot, g, dh_hbm, 0).wait()
            dma(slot, g, dl_hbm, 1).wait()
            for ci in range(min(G, C23 - g * G)):
                c = g * G + ci
                wh = _flat_shift_tiles(Xh, inner_shifts[c])[:R, :]
                wl = _flat_shift_tiles(Xl, inner_shifts[c])[:R, :]
                ph, pl_ = tf.df_mul((dbuf[slot, 0, ci], dbuf[slot, 1, ci]),
                                    (wh, wl))
                sh, sl_ = tf.df_add((yh_ref[...], yl_ref[...]), (ph, pl_))
                yh_ref[...] = sh
                yl_ref[...] = sl_
    return kernel_pair


def _flat_resident_ok(lay, n_pair, budget=13 * 2 ** 20):
    """Whether the whole-R kernel's VMEM residents (x copies, y, D DMA
    buffers) fit; above this the row-blocked variant takes over.

    The budget admits the 3D n=48 headline shapes (estimate 12.8 MB —
    the r4-proven resident footprint; routing them to the blocked
    variant measured +5 ms device on the fused headline program:
    solve 9.5 -> 13.0 ms, 62.9 -> 67.9 ms total) while 3D n=96
    (23 MB estimate) takes the blocked route."""
    R, RXi, C23 = lay['R'], lay['RXi'], lay['C23']
    G = _pick_dma_chunk(C23, R, n_pair=n_pair)
    est = (n_pair * RXi * 512 + n_pair * R * 512
           + 2 * n_pair * G * R * 512)
    return est <= budget


def _flat_call(lay, D3, x7, interpret=False):
    """f32 flat matvec kernel: D3 (C, R, 128) combos leading-band-major,
    x7 (C1, RXi, 128) per-leading-offset pre-sliced input copies."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, RXi, C1, C23 = lay['R'], lay['RXi'], lay['C1'], lay['C23']
    if not _flat_resident_ok(lay, 1):
        return _flat_call_blocked(lay, D3, x7, interpret=interpret)
    G = _pick_dma_chunk(C23, R, n_pair=1)
    kernel = _make_flat_kernel(tuple(lay['inner']), C23, R, 1, G=G)
    return pl.pallas_call(
        kernel,
        grid=(C1,),
        # index maps use s*0 for constant positions (mixed i64/i32 index
        # tuples fail Mosaic legalization under jax_enable_x64)
        in_specs=[pl.BlockSpec((1, RXi, 128), lambda s: (s, s * 0, s * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((R, 128), lambda s: (s * 0, s * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, G, R, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(x7, D3)


def _flat_call_pair(lay, Dh3, Dl3, xh7, xl7, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, RXi, C1, C23 = lay['R'], lay['RXi'], lay['C1'], lay['C23']
    if not _flat_resident_ok(lay, 2):
        return _flat_call_pair_blocked(lay, Dh3, Dl3, xh7, xl7,
                                       interpret=interpret)
    G = _pick_dma_chunk(C23, R, n_pair=2)
    kernel = _make_flat_kernel(tuple(lay['inner']), C23, R, 2, G=G)
    return pl.pallas_call(
        kernel,
        grid=(C1,),
        in_specs=[pl.BlockSpec((1, RXi, 128), lambda s: (s, s * 0, s * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, RXi, 128), lambda s: (s, s * 0, s * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((R, 128), lambda s: (s * 0, s * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, 128), lambda s: (s * 0, s * 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((R, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, 2, G, R, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(xh7, xl7, Dh3, Dl3)


def _blocked_geometry(lay, n_pair, rb_target=512):
    """Row-block geometry for the blocked flat kernel: block rows RB,
    halo'd x-block rows RBX, block count NB (R padded up to NB * RB), and
    the required padded x row count.  The blocked kernel exists because
    the whole-R kernel keeps x/y (and C1 x copies) VMEM-resident, which
    caps it at ~500k dofs (measured: 44.8 MB scoped at 3D n=96 vs the
    16 MB limit); blocking streams x/y per row block instead."""
    R = lay['R']
    RB = min(rb_target, R)
    NB = -(-R // RB)
    R2 = NB * RB
    sr_max = max(lay['inner']) // 128 + 1
    RBX = -(-(RB + sr_max + 1) // 8) * 8
    XR = R2 + RBX - RB            # last block's x slice stays in bounds
    return {'RB': RB, 'NB': NB, 'R2': R2, 'RBX': RBX, 'XR': XR}


def _make_flat_kernel_blocked(inner_shifts, C23, RB, RBX, n_pair, G):
    """Row-blocked kernel body: grid ``(NB, C1)`` (m1 fastest, so each
    y block accumulates across the leading band dimension while staying
    resident); x lives in HBM and each step DMAs its halo'd row block,
    D streams per (combo chunk, row block) with double buffering."""
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl
    from . import twofloat as tf

    n_chunks = -(-C23 // G)

    if n_pair == 1:
        def kernel(x_hbm, d_hbm, y_ref, xbuf, dbuf, xsem, dsem):
            nb, m1 = pl.program_id(0), pl.program_id(1)
            base = jnp.int32(m1) * jnp.int32(C23)
            row0 = jnp.int32(nb) * jnp.int32(RB)
            xdma = pltpu.make_async_copy(
                x_hbm.at[m1, pl.ds(row0, RBX)], xbuf, xsem)
            xdma.start()

            def ddma(slot, g):
                sz = min(G, C23 - g * G)
                return pltpu.make_async_copy(
                    d_hbm.at[pl.ds(base + jnp.int32(g * G), sz),
                             pl.ds(row0, RB)],
                    dbuf.at[jnp.int32(slot), pl.ds(0, sz)],
                    dsem.at[jnp.int32(slot)])

            ddma(0, 0).start()

            @pl.when(m1 == 0)
            def _():
                y_ref[...] = jnp.zeros_like(y_ref)

            xdma.wait()
            X = xbuf[...]
            for g in range(n_chunks):
                slot = g % 2
                if g + 1 < n_chunks:
                    ddma(1 - slot, g + 1).start()
                ddma(slot, g).wait()
                for ci in range(min(G, C23 - g * G)):
                    c = g * G + ci
                    w = _flat_shift_tiles(X, inner_shifts[c])
                    y_ref[...] += dbuf[slot, ci] * w[:RB, :]
        return kernel

    def kernel_pair(xh_hbm, xl_hbm, dh_hbm, dl_hbm, yh_ref, yl_ref,
                    xbuf, dbuf, xsem, dsem):
        nb, m1 = pl.program_id(0), pl.program_id(1)
        base = jnp.int32(m1) * jnp.int32(C23)
        row0 = jnp.int32(nb) * jnp.int32(RB)

        def xdma(half, src):
            return pltpu.make_async_copy(
                src.at[m1, pl.ds(row0, RBX)],
                xbuf.at[jnp.int32(half)], xsem.at[jnp.int32(half)])

        xdma(0, xh_hbm).start()
        xdma(1, xl_hbm).start()

        def ddma(slot, g, src, half):
            sz = min(G, C23 - g * G)
            return pltpu.make_async_copy(
                src.at[pl.ds(base + jnp.int32(g * G), sz),
                       pl.ds(row0, RB)],
                dbuf.at[jnp.int32(slot), jnp.int32(half), pl.ds(0, sz)],
                dsem.at[jnp.int32(slot), jnp.int32(half)])

        ddma(0, 0, dh_hbm, 0).start()
        ddma(0, 0, dl_hbm, 1).start()

        @pl.when(m1 == 0)
        def _():
            yh_ref[...] = jnp.zeros_like(yh_ref)
            yl_ref[...] = jnp.zeros_like(yl_ref)

        xdma(0, xh_hbm).wait()
        xdma(1, xl_hbm).wait()
        Xh = xbuf[0]
        Xl = xbuf[1]
        for g in range(n_chunks):
            slot = g % 2
            if g + 1 < n_chunks:
                ddma(1 - slot, g + 1, dh_hbm, 0).start()
                ddma(1 - slot, g + 1, dl_hbm, 1).start()
            ddma(slot, g, dh_hbm, 0).wait()
            ddma(slot, g, dl_hbm, 1).wait()
            for ci in range(min(G, C23 - g * G)):
                c = g * G + ci
                wh = _flat_shift_tiles(Xh, inner_shifts[c])[:RB, :]
                wl = _flat_shift_tiles(Xl, inner_shifts[c])[:RB, :]
                ph, pl_ = tf.df_mul((dbuf[slot, 0, ci], dbuf[slot, 1, ci]),
                                    (wh, wl))
                sh, sl_ = tf.df_add((yh_ref[...], yl_ref[...]), (ph, pl_))
                yh_ref[...] = sh
                yl_ref[...] = sl_
    return kernel_pair


def _flat_call_blocked(lay, D3, x7, interpret=False):
    """f32 blocked flat matvec: y computed per row block (grid NB x C1),
    x/D streamed from HBM.  Same result as :func:`_flat_call` (rows past
    R are zero-padded)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, RXi, C1, C23 = lay['R'], lay['RXi'], lay['C1'], lay['C23']
    g = _blocked_geometry(lay, n_pair=1)
    RB, NB, R2, RBX, XR = (g['RB'], g['NB'], g['R2'], g['RBX'], g['XR'])
    G = _pick_dma_chunk(C23, RB, n_pair=1, budget=4 * 2 ** 20)
    # pads are skipped when the caller pre-padded (flat_banded_pad_blocked
    # / _embed_x(rows=XR)): an in-call jnp.pad of D copies the whole
    # ~GB-scale data tensor through HBM EVERY matvec (measured ~2x solve
    # device time at 3D n=96)
    if D3.shape[1] != R2:
        D3 = jnp.pad(D3, ((0, 0), (0, R2 - R), (0, 0)))
    if x7.shape[1] != XR:
        x7 = jnp.pad(x7, ((0, 0), (0, XR - RXi), (0, 0)))
    kernel = _make_flat_kernel_blocked(tuple(lay['inner']), C23, RB, RBX,
                                       1, G)
    y = pl.pallas_call(
        kernel,
        grid=(NB, C1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((RB, 128), lambda nb, m1: (nb, m1 * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R2, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RBX, 128), jnp.float32),
                        pltpu.VMEM((2, G, RB, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(x7, D3)
    return y[:R]


def _flat_call_pair_blocked(lay, Dh3, Dl3, xh7, xl7, interpret=False):
    """Two-float blocked flat matvec (see :func:`_flat_call_blocked`)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, RXi, C1, C23 = lay['R'], lay['RXi'], lay['C1'], lay['C23']
    g = _blocked_geometry(lay, n_pair=2)
    RB, NB, R2, RBX, XR = (g['RB'], g['NB'], g['R2'], g['RBX'], g['XR'])
    G = _pick_dma_chunk(C23, RB, n_pair=2, budget=4 * 2 ** 20)
    # see _flat_call_blocked: in-call D pads double the HBM traffic
    if Dh3.shape[1] != R2:
        Dh3 = jnp.pad(Dh3, ((0, 0), (0, R2 - R), (0, 0)))
    if Dl3.shape[1] != R2:
        Dl3 = jnp.pad(Dl3, ((0, 0), (0, R2 - R), (0, 0)))
    if xh7.shape[1] != XR:
        xh7 = jnp.pad(xh7, ((0, 0), (0, XR - RXi), (0, 0)))
    if xl7.shape[1] != XR:
        xl7 = jnp.pad(xl7, ((0, 0), (0, XR - RXi), (0, 0)))
    kernel = _make_flat_kernel_blocked(tuple(lay['inner']), C23, RB, RBX,
                                       2, G)
    yh, yl = pl.pallas_call(
        kernel,
        grid=(NB, C1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec((RB, 128), lambda nb, m1: (nb, m1 * 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R2, 128), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2, RBX, 128), jnp.float32),
                        pltpu.VMEM((2, 2, G, RB, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(xh7, xl7, Dh3, Dl3)
    return yh[:R], yl[:R]


def _embed_x(lay, bws, ns, X, rows=None):
    """Embed the (ns) input grid into C1 leading-offset-shifted flat copies
    of shape (C1, rows, 128): copy m1 starts at flat position m1 * S1 of
    the fully halo-padded input, so the kernel's inner shifts stay in
    [0, max_inner].  ``rows`` defaults to the resident kernel's RXi; the
    blocked kernel wants its halo'd XR directly (cheaper than a post-hoc
    pad, and the extra rows are only ever multiplied by zero band data)."""
    C1, S1, RXi = lay['C1'], lay['S1'], lay['RXi']
    lead, F = lay['lead'], lay['F']
    if rows is None:
        rows = RXi
    xp = X
    # prefix `lead` zeros: copy m1 = prefixed[m1*S1 : ...] then equals
    # xp_flat[q + (m1 - b1)*S1 - lead_rest], so the kernel's inner combo
    # shifts (sum_{k>=2} mu_k * stride_k) are all nonnegative
    L = (C1 - 1) * S1 + rows * 128
    assert lead + F <= L
    flat = jnp.zeros((L,), dtype=X.dtype)
    flat = jax.lax.dynamic_update_slice(flat, xp.reshape(-1), (lead,))
    copies = [jax.lax.dynamic_slice(flat, (m1 * S1,), (rows * 128,))
              for m1 in range(C1)]
    return jnp.stack(copies).reshape(C1, rows, 128)


def _embed_rows(lay, n_pair):
    """Row count for :func:`_embed_x` matched to the kernel variant the
    (lay, n_pair) combination will run."""
    if _flat_resident_ok(lay, n_pair):
        return lay['RXi']
    return _blocked_geometry(lay, n_pair)['XR']


def flat_banded_pad_blocked(lay, D3, n_pair):
    """Pre-pad flat banded data to the row-blocked kernel's R2 rows
    (identity when the resident kernel will run, or when already padded).
    Call this ONCE where assembled data enters a solver: the blocked
    kernels otherwise re-pad the whole data tensor on every matvec, which
    doubles the HBM traffic of a bandwidth-bound kernel."""
    if _flat_resident_ok(lay, n_pair):
        return D3
    R2 = _blocked_geometry(lay, n_pair)['R2']
    pad = R2 - D3.shape[1]
    if pad <= 0:
        return D3
    return jnp.pad(D3, ((0, 0), (0, pad), (0, 0)))


def _extract_y(lay, bws, ns, y2):
    return y2.reshape(-1)[:lay['F']]


class FlatBandedOperator:
    """f32 banded operator on the flat-offset Pallas kernel (any dimension;
    the data tensor streams HBM exactly once per matvec, x/y stay in VMEM).
    Requires ``(RXi + 3R + small) * 512`` bytes of VMEM — fine up to ~1M
    dofs."""

    def __init__(self, D, bws, ns, interpret=None):
        from .. import config
        self.bws, self.ns = tuple(bws), tuple(ns)
        self.shape = (int(np.prod(ns)), int(np.prod(ns)))
        self.lay = flat_banded_layout(self.bws, self.ns)
        if interpret is None:
            interpret = config.pallas_interpret_mode()
        self._interpret = interpret
        D3 = None
        if D is not None:
            D3 = flat_banded_pad_blocked(
                self.lay,
                jnp.asarray(flat_banded_data(np.asarray(D, np.float32),
                                             self.bws, self.ns)), 1)
        self.operands = {'D3': D3}
        lay, bws_t, ns_t, intp = self.lay, self.bws, self.ns, interpret
        xrows = _embed_rows(lay, 1)

        def apply_with_operands(operands, x):
            x2 = _embed_x(lay, bws_t, ns_t, x.reshape(ns_t), rows=xrows)
            y2 = _flat_call(lay, operands['D3'], x2, interpret=intp)
            return _extract_y(lay, bws_t, ns_t, y2)

        self.apply_with_operands = apply_with_operands
        self._jit_apply = jax.jit(apply_with_operands)

    def set_data_banded_device(self, D_banded):
        """Host-side update from a ``(b..., n...)`` banded device array
        (the embed itself runs on device).  Do NOT call inside a jitted
        function — that would store a tracer into ``operands``; inside a
        fused assemble+solve jit use :func:`flat_banded_embed_device`
        directly and thread the result as an operand."""
        self.operands['D3'] = flat_banded_pad_blocked(
            self.lay, flat_banded_embed_device(
                D_banded, self.bws, self.ns, self.lay), 1)

    def matvec(self, x):
        return self._jit_apply(self.operands, x)

    def __call__(self, x):
        return self.matvec(x)


def flat_banded_embed_device(D_banded, bws, ns, lay=None):
    """Traced: embed a banded ``(b..., n...)`` (or ``(C,) + ns``) device
    array into the flat kernel layout ``(C, R, 128)`` with zero halo."""
    if lay is None:
        lay = flat_banded_layout(tuple(bws), tuple(ns))
    C = int(np.prod(lay['bsz']))
    D = D_banded.reshape((C, -1))
    flat = jnp.zeros((C, lay['R'] * 128), dtype=D.dtype)
    flat = jax.lax.dynamic_update_slice(flat, D, (0, 0))
    return flat.reshape(C, lay['R'], 128)


class FlatBandedOperatorPair:
    """Two-float flat banded operator: f64-accurate matvecs (~2^-45) with
    the pair data streamed once per call — the high-precision residual
    operator for :func:`~pyiga_tpu.solvers.cg_ir` (replaces the fori-loop
    :class:`BandedOperatorPair`, which re-reads HBM per offset)."""

    def __init__(self, D_pair, bws, ns, interpret=None):
        from .. import config
        from . import twofloat as tf
        self.bws, self.ns = tuple(bws), tuple(ns)
        self.shape = (int(np.prod(ns)), int(np.prod(ns)))
        self.lay = flat_banded_layout(self.bws, self.ns)
        if interpret is None:
            interpret = config.pallas_interpret_mode()
        self._interpret = interpret
        Dh3 = Dl3 = None
        if D_pair is not None:
            Dh3 = flat_banded_pad_blocked(self.lay, jnp.asarray(
                flat_banded_data(np.asarray(D_pair[0], np.float32),
                                 self.bws, self.ns)), 2)
            Dl3 = flat_banded_pad_blocked(self.lay, jnp.asarray(
                flat_banded_data(np.asarray(D_pair[1], np.float32),
                                 self.bws, self.ns)), 2)
        self.operands = {'Dh3': Dh3, 'Dl3': Dl3}
        lay, bws_t, ns_t, intp = self.lay, self.bws, self.ns, interpret
        xrows = _embed_rows(lay, 2)

        def apply_with_operands(operands, x):
            xh, xl = tf.df_from_f64(x.reshape(ns_t))
            xh2 = _embed_x(lay, bws_t, ns_t, xh, rows=xrows)
            xl2 = _embed_x(lay, bws_t, ns_t, xl, rows=xrows)
            yh2, yl2 = _flat_call_pair(lay, operands['Dh3'],
                                       operands['Dl3'], xh2, xl2,
                                       interpret=intp)
            yh = _extract_y(lay, bws_t, ns_t, yh2)
            yl = _extract_y(lay, bws_t, ns_t, yl2)
            return tf.df_to_f64((yh, yl))

        self.apply_with_operands = apply_with_operands
        self._jit_apply = jax.jit(apply_with_operands)

    def matvec(self, x):
        return self._jit_apply(self.operands, x)

    def __call__(self, x):
        return self.matvec(x)


def flat_banded_pair_from_padded_chain(Z_pair, bws, ns, lay=None,
                                       add_transpose=True):
    """Traced: produce the flat matvec layout ``(C, R, 128)`` pair directly
    from the PADDED interleaved chain output, fusing the symmetric
    mirror/combine, the banded reorder and the flat-layout embed into one
    pass of static box slices.

    ``Z_pair = (Zh, Zl)`` is the chain accumulator with axis-k position
    ``mu_k * n_k + i_k`` (extent >= (2b_k+1) n_k; trailing padding rows
    ignored).  For every band combo ``mu`` the direct part is the box
    slice ``Z[mu, i]`` embedded at halo offset b, and the transpose part
    is the shifted box ``Z[2b - mu, j = i + mu - b]`` — both static slices
    (cheap XLA copies; a general gather here is ~30x slower on TPU).

    With ``add_transpose`` the caller must chain ALL terms into one
    accumulator with the direct (self-mirrored) terms' tables prescaled by
    0.5: the two slices then evaluate direct + sym + sym^T exactly (each
    direct term is bitwise symmetric, so half of it arrives from each
    slice)."""
    from . import twofloat as tf
    d = len(ns)
    if lay is None:
        lay = flat_banded_layout(tuple(bws), tuple(ns))
    bsz, F, R = lay['bsz'], lay['F'], lay['R']
    Zh, Zl = Z_pair
    outs_h, outs_l = [], []
    for mu in np.ndindex(*bsz):
        sl1 = tuple(slice(m * n, m * n + n) for m, n in zip(mu, ns))
        h = Zh[sl1]
        l = Zl[sl1]
        if add_transpose:
            slT, padT = [], []
            for m, b, n in zip(mu, bws, ns):
                s = m - b
                start = (2 * b - m) * n + max(0, s)
                ln = n - abs(s)
                slT.append(slice(start, start + ln))
                lo = max(0, -s)
                padT.append((lo, n - lo - ln))
            hT = jnp.pad(Zh[tuple(slT)], tuple(padT))
            lT = jnp.pad(Zl[tuple(slT)], tuple(padT))
            h, l = tf.df_add((h, l), (hT, lT))
        outs_h.append(h.reshape(-1))
        outs_l.append(l.reshape(-1))
    C = len(outs_h)
    padF = ((0, 0), (0, R * 128 - F))
    H = jnp.pad(jnp.stack(outs_h), padF).reshape(C, R, 128)
    L = jnp.pad(jnp.stack(outs_l), padF).reshape(C, R, 128)
    return H, L
