# -*- coding: utf-8 -*-
"""Single-kernel Pallas V-cycle for the device local-MG solver.

Measurement (round 4, v5e through the axon tunnel): inside a compiled
program every XLA kernel costs ~20-25 us and every Pallas launch ~90 us,
so the two-float XLA V-cycle (~130 kernels) floors at ~3.2 ms/iteration
for a problem whose arithmetic is ~0.1 ms — kernel COUNT, not bytes, is
the cost.  This module lowers one ENTIRE V-cycle (all smoothing passes,
grid transfers, coarse solve, convergence residual + masked norm) to ONE
Pallas kernel:

  * matrices stay in HBM (``memory_space=ANY``) as transposed zero-padded
    two-float pairs (transposed padded [hi|lo] tiles) and are
    streamed through a VMEM buffer in ``(128, m_pad)`` chunks with
    explicit ``make_async_copy`` DMAs;
  * every vector lives in VMEM scratch as a ``(1, n_pad)`` row pair;
    matvec chunks transpose the ``(1, 128)`` x-slice to a ``(128, 1)``
    column, form exact Dekker products + cross terms against the chunk,
    and fold 128 -> 1 sublanes with a compensated halving tree (static
    sub-8 sublane slicing is supported on this toolchain);
  * one-hot select matrices stream as single-f32 (their products and
    disjoint-support sums are exact in plain f32);
  * consecutive terms (``b_S - A_S x``) accumulate into one result, so a
    smoothing pass is two streamed matvecs and a pair add.

The kernel reproduces the host f64 path's operation order and iteration
counts exactly (~2^-45 accuracy; tests/test_localmg.py contracts), like
the XLA two-float mode it replaces on accelerators
(reference algorithm: /root/reference/pyiga/solvers.py:174-241).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


from . import twofloat as tf

_SWEEP_DIRS = {'forward': (False,), 'backward': (True,),
               'symmetric': (False, True)}

# Tile geometry of the packed sparse streams: 128 contraction rows x
# _TILE_W output lanes.  Wider tiles cost occupancy (more zeros streamed:
# 82/109/164 MB per V-cycle at W=128/256/512 on the bench hierarchy) but
# the VPU runs the error-free transforms ~2x faster on wide values
# (measured 213 vs ~390 Gflop/s at 128- vs 1664-lane operands).
_TILE_W = 256

# budget for the fused V-cycle kernel's explicit VMEM scratch (the 16 MB
# scoped limit less headroom for Mosaic's own allocations); build()
# returns None above it and DeviceMGSolver falls back to the 'df' cycle
_FUSED_VMEM_BUDGET = 12 * 2 ** 20


def _pad_space(n):
    """Padded vector-space length (multiple of the tile width)."""
    return -(-max(int(n), 1) // _TILE_W) * _TILE_W


def _pad_row(v, np_len):
    """f64 vector -> zero-padded (1, np_len) two-float row pair (host)."""
    vv = np.zeros(np_len, dtype=np.float64)
    vv[:len(v)] = v
    hi = vv.astype(np.float32)
    lo = (vv - hi.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(hi.reshape(1, -1)), jnp.asarray(lo.reshape(1, -1)))


def build(As, Ps, lv_inds, sweeps, steps, active_dofs=None):
    """Host-side build: returns ``(operands, desc)`` for
    :func:`make_solve`.  `As`/`Ps`/`lv_inds` as in
    :class:`pyiga_tpu.ops.mg.DeviceMGSolver`; every dense matrix is
    prepped into the transposed padded two-float HBM layout, with the
    scatter matrices folded in exactly (``Esc @ T`` is a row scatter)."""
    import scipy.sparse
    from .mg import _tri_inverse
    L = len(As)
    pre_sweep, post_sweep = sweeps
    pre_dirs = _SWEEP_DIRS[pre_sweep]
    post_dirs = _SWEEP_DIRS[post_sweep]
    As = [scipy.sparse.csr_matrix(A) for A in As]

    n = [A.shape[0] for A in As]
    npad = [_pad_space(x) for x in n]
    m = [len(lv_inds[lv]) for lv in range(L)]
    mpad = [_pad_space(x) for x in m]

    mats = []           # flat operand list (device arrays)
    shapes = []         # (rows, cols, is_pair, sched) per matrix

    def _split_T(M):
        M = np.asarray(M, dtype=np.float64)
        r, c = M.shape
        MT = np.zeros((_pad_space(c), _pad_space(r)))
        MT[:c, :r] = M.T
        hi = MT.astype(np.float32)
        lo = (MT - hi.astype(np.float64)).astype(np.float32)
        return hi, lo

    W = _TILE_W

    def _pack_tiles(hi, lo):
        """Pack the occupied (128, W) tiles of the transposed matrix in
        m-major order: data ``(ntiles*128, 2W)`` ([hi|lo] per tile) +
        the static schedule ``sched[j] = (k-tile ids...)``.  Zero tiles
        contribute exact zeros through the error-free adds, so skipping
        them is bitwise-free; they are the majority of these operands
        (measured 37-54%% occupancy at W=128 on the bench hierarchy)."""
        K, Mw = hi.shape
        nk, nj = K // 128, Mw // W
        occ = (hi.reshape(nk, 128, nj, W) != 0).any(axis=(1, 3))
        if lo is not None:
            occ |= (lo.reshape(nk, 128, nj, W) != 0).any(axis=(1, 3))
        sched, data = [], []
        for j in range(nj):
            kt = tuple(int(k) for k in np.nonzero(occ[:, j])[0])
            sched.append(kt)
            for k in kt:
                th = hi[k * 128:(k + 1) * 128, j * W:(j + 1) * W]
                if lo is None:
                    data.append(th)
                else:
                    tl = lo[k * 128:(k + 1) * 128, j * W:(j + 1) * W]
                    data.append(np.concatenate([th, tl], axis=1))
        w = 2 * W if lo is not None else W
        if data:
            packed = np.concatenate(data, axis=0)
        else:
            packed = np.zeros((128, w), np.float32)  # placeholder
        return jnp.asarray(packed), tuple(sched)

    def add_pair(M):
        hi, lo = _split_T(M)
        packed, sched = _pack_tiles(hi, lo)
        mats.append(packed)
        shapes.append((hi.shape[0], hi.shape[1], True, sched))
        return len(shapes) - 1

    def add_single(M):
        hi, _lo = _split_T(M)
        packed, sched = _pack_tiles(hi, None)
        mats.append(packed)
        shapes.append((hi.shape[0], hi.shape[1], False, sched))
        return len(shapes) - 1

    idx = {}
    for lv in range(1, L):
        S = np.asarray(lv_inds[lv], dtype=np.int64)
        A_S = As[lv][S]
        A_SS = A_S[:, S].toarray()
        Esc = np.zeros((n[lv], m[lv]))
        Esc[S, np.arange(m[lv])] = 1.0
        idx['sel', lv] = add_single(Esc.T)                # (m, n) one-hot
        idx['asel', lv] = add_pair(A_S.toarray())         # (m, n)
        for rev in set(pre_dirs) | set(post_dirs):
            T = _tri_inverse(A_SS, reverse=rev)
            idx['tsc', lv, rev] = add_pair(Esc @ T)       # (n, m), exact
        idx['a', lv] = add_pair(As[lv].toarray())
        idx['pt', lv - 1] = add_pair(Ps[lv - 1].T.toarray())
        idx['p', lv - 1] = add_pair(Ps[lv - 1].toarray())
    ind0 = np.asarray(lv_inds[0], dtype=np.int64)
    E0 = np.zeros((n[0], m[0]))
    E0[ind0, np.arange(m[0])] = 1.0
    A0 = As[0][ind0][:, ind0].toarray()
    idx['coarse'] = add_pair(E0 @ np.linalg.inv(A0) @ E0.T)

    mask = np.zeros(n[-1])
    if active_dofs is None:
        mask[:] = 1.0
    else:
        mask[np.asarray(active_dofs)] = 1.0
    mask_row = _pad_row(mask, npad[-1])[0]                # exact 0/1 f32

    desc = dict(L=L, steps=int(steps), pre=pre_dirs, post=post_dirs,
                n=tuple(n), npad=tuple(npad), m=tuple(m),
                mpad=tuple(mpad), shapes=tuple(shapes),
                idx=tuple(sorted(idx.items(), key=lambda kv: repr(kv[0]))))

    # scoped-VMEM gate: the kernel's double-buffered DMA scratch is sized
    # by the worst k-tile count over all matrices, which grows with the
    # fine-level dof count (a dense fine A at n=4096 already needs
    # 2 x 8 MB of the 16 MB limit, before the vector scratch and Mosaic's
    # own overhead).  Over budget -> None; the caller falls back to the
    # XLA 'df' cycle instead of crashing the remote compile.
    maxw = max((max((len(kt) for kt in s[3]), default=1)) for s in shapes)
    scratch_bytes = (2 * maxw * 128 * 2 * _TILE_W * 4
                     + 4 * sum(npad[:L - 1]) * 4
                     + 2 * sum(mpad[1:]) * 4 + 2 * max(npad) * 4
                     + 9 * npad[-1] * 4)        # in/out VMEM vectors
    if scratch_bytes > _FUSED_VMEM_BUDGET:
        return None

    # keep idx usable as a dict at trace time
    return (tuple(mats), mask_row), _Desc(desc, idx)


class _Desc:
    """Hashable static description (kernel cache key)."""

    def __init__(self, d, idx):
        self.d = d
        self.idx = idx

    def _key(self):
        return (self.d['L'], self.d['steps'], self.d['pre'], self.d['post'],
                self.d['n'], self.d['npad'], self.d['m'], self.d['mpad'],
                self.d['shapes'], self.d['idx'])

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _Desc) and self._key() == other._key()


def _tree_fold(p, e):
    """Compensated sublane halving (k, m) -> (1, m) (static slices)."""
    k = p.shape[0]
    while k > 1:
        h = k // 2
        p, e = tf.df_add((p[:h], e[:h]), (p[h:], e[h:]))
        k = h
    return p, e


def _plain_fold(p):
    k = p.shape[0]
    while k > 1:
        h = k // 2
        p = p[:h] + p[h:]
        k = h
    return p


def _two_prod_bsplit(a, b, bh, bl):
    """Dekker two_prod with the x-side split hoisted (the x columns are
    reused by every tile of the strip; only the streamed tile is split
    in place)."""
    p = a * b
    c = tf._SPLIT * a
    ah = c - (c - a)
    al = a - ah
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _vcycle_kernel(desc, nmats, *refs):
    """The fused V-cycle kernel body (fully unrolled static program)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    d = desc.d
    idx = desc.idx
    L, steps = d['L'], d['steps']
    npad, mpad = d['npad'], d['mpad']
    shapes = d['shapes']

    # unpack refs: matrices | f(2) x(2) mask | outputs xo(2) res2(2) |
    # scratch: buf0 buf1 sem0 sem1 xcols(2) mvout(2) | per-level rows
    mat_refs = refs[:nmats]
    fh_ref, fl_ref, xh_ref, xl_ref, mask_ref = refs[nmats:nmats + 5]
    xo_h, xo_l, r2_h, r2_l = refs[nmats + 5:nmats + 9]
    scr = list(refs[nmats + 9:])
    bufs = [scr[0], scr[1]]
    sems = [scr[2], scr[3]]
    scr = scr[4:]

    # per-level scratch rows: x[lv], rh[lv] for lv < L-1; bS[lv] lv>=1; tmp
    xs, rhs, bS = {}, {}, {}
    for lv in range(L - 1):
        xs[lv] = (scr.pop(0), scr.pop(0))
        rhs[lv] = (scr.pop(0), scr.pop(0))
    for lv in range(1, L):
        bS[lv] = (scr.pop(0), scr.pop(0))
    tmp = (scr.pop(0), scr.pop(0))
    assert not scr

    def mv(terms, out_width):
        """Sum of streamed matvec terms -> (1, out_width) value pair.
        terms: list of (mat_index, (src_h, src_l) value rows, sign).

        Tile-sparse m-major streaming: only the occupied 128x128 tiles
        (packed contiguously per output tile at build time) are DMA'd,
        in per-(output-tile, term) strips, double-buffered across the
        whole call.  Source vectors are staged once into a column cache
        so each tile multiply is a plain lane-broadcast.  Skipped tiles
        are exact zeros — bitwise-identical to the dense stream."""
        W = _TILE_W
        # stage the term sources as (128, 1) column VALUES (registers —
        # scratch round-trips here cost ~8 us per single-lane store):
        # value, low part, hoisted Dekker split halves of the high part
        cols = []
        for ti, (j, src, _sign) in enumerate(terms):
            rows = shapes[j][0]
            percol = []
            for c in range(rows // 128):
                xh = src[0][:, c * 128:(c + 1) * 128].T
                xl = src[1][:, c * 128:(c + 1) * 128].T
                cc = tf._SPLIT * xh
                bh = cc - (cc - xh)
                percol.append((xh, xl, bh, xh - bh))
            cols.append(percol)

        # strip schedule: per output tile jt, per term, its k-tiles
        strips = []                 # (term_i, jt, t0, ktiles)
        nj = out_width // W
        offs = {}
        for ti, (j, _src, _sign) in enumerate(terms):
            sched = shapes[j][3]
            pos = 0
            offs[ti] = []
            for jt in range(nj):
                offs[ti].append(pos)
                pos += len(sched[jt])
        for jt in range(nj):
            for ti, (j, _src, _sign) in enumerate(terms):
                kt = shapes[j][3][jt]
                if kt:
                    strips.append((ti, jt, offs[ti][jt], kt))

        def start(i, slot):
            ti, _jt, t0, kt = strips[i]
            j = terms[ti][0]
            w = 2 * W if shapes[j][2] else W
            cp = pltpu.make_async_copy(
                mat_refs[j].at[pl.dslice(t0 * 128, len(kt) * 128)],
                bufs[slot].at[pl.dslice(0, len(kt) * 128),
                              pl.dslice(0, w)],
                sems[slot])
            cp.start()
            return cp

        cps = [None, None]
        if strips:
            cps[0] = start(0, 0)
        outs = {}
        acc, acc_jt = None, None
        for i, (ti, jt, t0, kt) in enumerate(strips):
            slot = i % 2
            cps[slot].wait()
            if i + 1 < len(strips):
                cps[1 - slot] = start(i + 1, 1 - slot)
            j, _src, sign = terms[ti]
            is_pair = shapes[j][2]
            if acc_jt is not None and acc_jt != jt:
                outs[acc_jt] = acc
                acc = None
            acc_jt = jt
            part = None
            for t, ktile in enumerate(kt):
                th = bufs[slot][t * 128:(t + 1) * 128, :W]
                xh, xl, bh, bl = cols[ti][ktile]
                if is_pair:
                    tl = bufs[slot][t * 128:(t + 1) * 128, W:2 * W]
                    p, e = _two_prod_bsplit(th, xh, bh, bl)
                    e = e + (th * xl + tl * (xh + xl))
                    ph, pe = _tree_fold(p, e)
                else:
                    # one-hot: exact plain products / disjoint sums
                    ph = _plain_fold(th * xh)
                    pe = _plain_fold(th * xl)
                part = (ph, pe) if part is None else \
                    tf.df_add(part, (ph, pe))
            if sign < 0:
                part = (-part[0], -part[1])
            acc = part if acc is None else tf.df_add(acc, part)
        if acc_jt is not None:
            outs[acc_jt] = acc

        z = jnp.zeros((1, W), jnp.float32)
        oh = jnp.concatenate([outs.get(jt, (z, z))[0]
                              for jt in range(nj)], axis=1)
        ol = jnp.concatenate([outs.get(jt, (z, z))[1]
                              for jt in range(nj)], axis=1)
        return oh, ol

    def write(row_refs, val, width):
        row_refs[0][:, :width] = val[0]
        row_refs[1][:, :width] = val[1]

    def smooth(lv, x_val, bs_v, dirs):
        for _ in range(steps):
            for rev in dirs:
                r = tf.df_sub(bs_v, mv([(idx['asel', lv], x_val, 1)],
                                       mpad[lv]))
                dx = mv([(idx['tsc', lv, rev], r, 1)], npad[lv])
                x_val = tf.df_add(x_val, dx)
        return x_val

    f_val = (fh_ref[...], fl_ref[...])

    # descend: pre-smooth, restrict residual
    rh_val = {L - 1: f_val}
    x_val = (xh_ref[...], xl_ref[...])
    for lv in range(L - 1, 0, -1):
        if lv < L - 1:
            z = jnp.zeros((1, npad[lv]), jnp.float32)
            x_val = (z, z)
        bs_v = mv([(idx['sel', lv], rh_val[lv], 1)], mpad[lv])
        write(bS[lv], bs_v, mpad[lv])
        x_val = smooth(lv, x_val, bs_v, d['pre'])
        if lv == L - 1:
            write((xo_h, xo_l), x_val, npad[lv])
        else:
            write(xs[lv], x_val, npad[lv])
        ax = mv([(idx['a', lv], x_val, 1)], npad[lv])
        r_val = tf.df_sub(rh_val[lv], ax)
        write(tmp, r_val, npad[lv])
        rh_v = mv([(idx['pt', lv - 1], (tmp[0][:, :npad[lv]],
                                        tmp[1][:, :npad[lv]]), 1)],
                  npad[lv - 1])
        write(rhs[lv - 1], rh_v, npad[lv - 1])
        rh_val[lv - 1] = (rhs[lv - 1][0][:, :npad[lv - 1]],
                          rhs[lv - 1][1][:, :npad[lv - 1]])

    # coarse solve
    x_lo = mv([(idx['coarse'], rh_val[0], 1)], npad[0])

    # ascend: prolongate correction, post-smooth
    for lv in range(1, L):
        if lv == L - 1:
            xcur = (xo_h[...], xo_l[...])
        else:
            xcur = (xs[lv][0][...], xs[lv][1][...])
        px = mv([(idx['p', lv - 1], x_lo, 1)], npad[lv])
        xcur = tf.df_add((xcur[0][:, :npad[lv]], xcur[1][:, :npad[lv]]), px)
        bs_v = (bS[lv][0][:, :mpad[lv]], bS[lv][1][:, :mpad[lv]])
        xcur = smooth(lv, xcur, bs_v, d['post'])
        if lv == L - 1:
            write((xo_h, xo_l), xcur, npad[lv])
        else:
            write(xs[lv], xcur, npad[lv])
            x_lo = xcur

    # convergence residual: res2 = || (f - A x) * mask ||^2 as a pair
    x_fin = (xo_h[...], xo_l[...])
    ax = mv([(idx['a', L - 1], x_fin, 1)], npad[L - 1])
    r_val = tf.df_sub(f_val, ax)
    mrow = mask_ref[...]
    rh2, rl2 = r_val[0] * mrow, r_val[1] * mrow
    acc = None
    for kb in range(npad[L - 1] // 128):
        ch = rh2[:, kb * 128:(kb + 1) * 128].T        # (128, 1)
        cl = rl2[:, kb * 128:(kb + 1) * 128].T
        p, e = tf.two_prod(ch, ch)
        e = e + (2.0 * (ch * cl) + cl * cl)
        p, e = _tree_fold(p, e)                       # (1, 1)
        acc = (p, e) if acc is None else tf.df_add(acc, (p, e))
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
    r2_h[...] = jnp.where(lane0, acc[0], 0.0)
    r2_l[...] = jnp.where(lane0, acc[1], 0.0)


_SOLVE_CACHE = {}


def make_solve(desc, interpret=False):
    """Jitted full solve (while_loop around the fused V-cycle kernel),
    cached per static description."""
    key = (desc, interpret)
    fn = _SOLVE_CACHE.get(key)
    if fn is not None:
        return fn
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    d = desc.d
    L = d['L']
    npad, mpad = d['npad'], d['mpad']
    nmats = len(d['shapes'])
    npL = npad[L - 1]
    maxw = max((max((len(kt) for kt in s[3]), default=1))
               for s in d['shapes'])

    scratch = [pltpu.VMEM((maxw * 128, 2 * _TILE_W), jnp.float32),
               pltpu.VMEM((maxw * 128, 2 * _TILE_W), jnp.float32),
               pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA]
    for lv in range(L - 1):
        scratch += [pltpu.VMEM((1, npad[lv]), jnp.float32)] * 4
    for lv in range(1, L):
        scratch += [pltpu.VMEM((1, mpad[lv]), jnp.float32)] * 2
    scratch += [pltpu.VMEM((1, max(npad)), jnp.float32)] * 2

    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * nmats +
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5)
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    kernel = functools.partial(_vcycle_kernel, desc, nmats)

    def vcycle_call(mats, mask_row, f_pair, x_pair):
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((1, npL), jnp.float32)] * 2 +
                      [jax.ShapeDtypeStruct((1, 128), jnp.float32)] * 2,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*mats, f_pair[0], f_pair[1], x_pair[0], x_pair[1], mask_row)

    def solve(operands, f64, tol, maxiter):
        mats, mask_row = operands
        nL = f64.shape[0]
        fh = jnp.zeros((1, npL), jnp.float32).at[0, :nL].set(
            f64.astype(jnp.float32))
        fl = jnp.zeros((1, npL), jnp.float32).at[0, :nL].set(
            (f64 - fh[0, :nL].astype(jnp.float64)).astype(jnp.float32))
        f_pair = (fh, fl)
        mh, ml = f_pair[0] * mask_row, f_pair[1] * mask_row
        res0 = jnp.sqrt(jnp.sum(mh.astype(jnp.float64) ** 2
                                + 2.0 * mh.astype(jnp.float64)
                                * ml.astype(jnp.float64)
                                + ml.astype(jnp.float64) ** 2))

        def cond(c):
            xh, xl, res, it = c
            return jnp.logical_and(jnp.logical_not(res / res0 < tol),
                                   it < maxiter)

        def body(c):
            xh, xl, _, it = c
            xh, xl, r2h, r2l = vcycle_call(mats, mask_row, f_pair, (xh, xl))
            res = jnp.sqrt(r2h[0, 0].astype(jnp.float64)
                           + r2l[0, 0].astype(jnp.float64))
            return xh, xl, res, it + 1

        x0 = (jnp.zeros((1, npL), jnp.float32),
              jnp.zeros((1, npL), jnp.float32))
        xh, xl, res, it = lax.while_loop(cond, body, (*x0, res0, 0))
        x = xh[0, :nL].astype(jnp.float64) + xl[0, :nL].astype(jnp.float64)
        from .mg import _pack_result
        return _pack_result(x, res, res0, it)

    fn = jax.jit(solve, static_argnames=('maxiter',))
    if len(_SOLVE_CACHE) > 8:
        _SOLVE_CACHE.clear()        # adaptive loops: new key per hierarchy
    _SOLVE_CACHE[key] = fn
    return fn
