# -*- coding: utf-8 -*-
"""Pallas TPU kernel for two-float dense matvecs.

The device local-MG V-cycle (ops/mg.py) is a chain of ~24 dense matvecs
per iteration on small (~1-2k) operands.  In emulated f64 each matvec
runs at ~19 GB/s (1.07 ms at 1593^2); the XLA two-float formulation
(:func:`pyiga_tpu.ops.mg._df_mv`) improves that to ~56 GB/s (0.357 ms)
but is still bounded by materialized elementwise intermediates.  This
kernel streams the matrix once through VMEM and keeps the whole
error-free-transform product + compensated reduction in registers:

  * the matrix is stored TRANSPOSED ``(n_pad, m_pad)`` as an exact f32
    ``(hi, lo)`` pair — the contraction axis k rides the sublanes, the
    output axis m the lanes, so the reduction is a sublane halving tree;
  * per grid step ``(j, s)`` the kernel loads a ``(128, mb)`` tile and
    the matching ``(128, 1)`` x-block (broadcast along lanes), forms the
    exact Dekker products + cross terms, halves 128 -> 8 sublanes with
    compensated pair adds, and accumulates into an ``(8, mb)`` VMEM
    scratch across k-blocks;
  * the final 8-row fold runs in XLA (sub-8 sublane slicing is not
    worth the Mosaic trouble; it is ~m*8 elements).

Everything is zero-padded to multiples of 128 on both axes host-side;
padding contributes exact zeros through error-free adds, so callers can
keep whole vector spaces padded and never re-slice between ops.

Accuracy matches the XLA two-float path (~2^-45 relative).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import twofloat as tf

# VMEM budget for the (128, mb) input pair tile (see CLAUDE.md: budget
# ~3.5 MB of ESTIMATED buffers; Mosaic stack temporaries inflate ~4x)
_TILE_BUDGET = 2 * 2 ** 20


def _round_up(x, m):
    return -(-x // m) * m


def pad_len(n):
    """Padded length of a vector space (multiple of 128)."""
    return _round_up(max(int(n), 1), 128)


def prep(M):
    """Host-side prep of a dense f64 ``(m, n)`` matrix: returns the
    transposed zero-padded pair ``(MT_hi, MT_lo)`` of shape
    ``(pad_len(n), pad_len(m))`` as device arrays."""
    M = np.asarray(M, dtype=np.float64)
    m, n = M.shape
    MT = np.zeros((pad_len(n), pad_len(m)), dtype=np.float64)
    MT[:n, :m] = M.T
    hi = MT.astype(np.float32)
    lo = (MT - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _pick_mb(m_pad):
    """Largest 128-multiple divisor of `m_pad` whose (128, mb) f32 pair
    tile fits the VMEM budget."""
    q = m_pad // 128
    best = 128
    for d in range(1, q + 1):
        if q % d == 0 and 128 * 128 * d * 8 <= _TILE_BUDGET:
            best = 128 * d
    return best


def _kernel(mt_h_ref, mt_l_ref, xh_ref, xl_ref, oh_ref, ol_ref,
            acc_h, acc_l, *, nk):
    from jax.experimental import pallas as pl
    s = pl.program_id(1)
    mh = mt_h_ref[...]                # (128, mb)
    ml = mt_l_ref[...]
    xh = xh_ref[...]                  # (128, 1), broadcast along lanes
    xl = xl_ref[...]
    p, e = tf.two_prod(mh, xh)
    e = e + (mh * xl + ml * (xh + xl))
    k = 128
    while k > 8:                      # sublane halving tree (8-aligned)
        h = k // 2
        p, e = tf.df_add((p[:h], e[:h]), (p[h:], e[h:]))
        k = h

    @pl.when(s == 0)
    def _():
        acc_h[...] = p
        acc_l[...] = e

    @pl.when(s > 0)
    def _():
        ah, al = tf.df_add((acc_h[...], acc_l[...]), (p, e))
        acc_h[...] = ah
        acc_l[...] = al

    @pl.when(s == nk - 1)
    def _():
        oh_ref[...] = acc_h[...]
        ol_ref[...] = acc_l[...]


@functools.partial(jax.jit, static_argnames=('interpret',))
def _call(mt_h, mt_l, xh2, xl2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n_pad, m_pad = mt_h.shape
    nk = n_pad // 128
    mb = _pick_mb(m_pad)
    grid = (m_pad // mb, nk)          # k innermost: acc stays resident
    in_specs = [
        pl.BlockSpec((128, mb), lambda j, s: (s, j)),
        pl.BlockSpec((128, mb), lambda j, s: (s, j)),
        pl.BlockSpec((128, 1), lambda j, s: (s, j * 0)),
        pl.BlockSpec((128, 1), lambda j, s: (s, j * 0)),
    ]
    out_specs = [pl.BlockSpec((8, mb), lambda j, s: (s * 0, j))] * 2
    kernel = functools.partial(_kernel, nk=nk)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((8, m_pad), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((8, mb), jnp.float32),
                        pltpu.VMEM((8, mb), jnp.float32)],
        interpret=interpret,
    )(mt_h, mt_l, xh2, xl2)
    return oh, ol


def matvec_padded(Mprep, xpair, interpret=False):
    """``M @ x`` with `Mprep` from :func:`prep` and `xpair` a two-float
    vector pair of the PADDED input length; returns the padded output
    pair.  Padding rows/entries are exact zeros in and out."""
    mt_h, mt_l = Mprep
    xh = xpair[0].reshape(-1, 1)
    xl = xpair[1].reshape(-1, 1)
    oh, ol = _call(mt_h, mt_l, xh, xl, interpret=interpret)
    k = 8
    while k > 1:                      # fold the 8 partial rows in XLA
        h = k // 2
        oh, ol = tf.df_add((oh[:h], ol[:h]), (oh[h:], ol[h:]))
        k = h
    return oh[0], ol[0]
