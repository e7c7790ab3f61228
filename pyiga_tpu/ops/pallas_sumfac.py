# -*- coding: utf-8 -*-
"""Fused Pallas TPU kernel for the pair-chained Ozaki contraction.

One sum-factorization stage contracts the leading axis of a two-float f32
field against a float64 basis-pair table.  The XLA formulation
(:func:`~pyiga_tpu.ops.sumfac._ozaki_contract_axis_pair`) materializes six
bf16 chunk arrays and six f32 diagonal arrays in HBM per stage; this kernel
streams everything through VMEM instead:

    per output tile:
      1. load the field pair tile (K x r) into VMEM,
      2. split it into six 8-bit bf16 mantissa chunks on the VPU
         (power-of-two column scales via exponent bit-masking — exact,
         and avoids frexp/ldexp which Mosaic does not lower),
      3. run the 21 triangular chunk x chunk MXU dots against the
         preloaded (static) table chunks, accumulating six exact-f32
         diagonals in VMEM,
      4. combine the diagonals into a two-float result (error-free
         f32 adds) and apply the exact power-of-two scales,
      5. write the (r x M) pair tile.

HBM traffic per stage drops from ~13 tile passes to 3 (read pair, write
pair), which is where the XLA version spends most of its time.

Chain convention: every stage contracts the CURRENT leading axis and
appends the band axis last, so a d-stage chain maps ``(K_1, ..., K_d)``
fields to ``(M_1, ..., M_d)`` compact tensors with no transposes anywhere.
The band axis is zero-padded to a multiple of 128 lanes and sliced once at
the end of the chain.

The kernel requires a real TPU (or ``interpret=True``).  Numerical behavior
follows the same pair accuracy model as the XLA pair chain and the same
exact-f32 MXU accumulation bound, but the magic-constant nearest-rounding
split (``_slice_pair_cols``) sits on a different rounding grid than
sumfac._ozaki_slice_pair's truncating split, so individual chunks (and thus
bitwise output) may differ while the reconstructed pair agrees to the pair
error bound (measured 1e-13 relative on the 3D n=48 stiffness).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from . import sumfac
from . import twofloat as tf

_L = 6          # mantissa chunks (8 bits each): covers the f32 pair's 48
_W = 8          # bits per chunk
_NH = 3         # chunks taken from `hi` (3 x 8 = f32 mantissa)


def _pow2_at_least(a):
    """Exact power of two >= a (a > 0), via exponent bit-masking.
    Subnormal `a` (all exponent bits zero) clamps to the minimum normal
    2^-126 so the downstream reciprocal scale stays finite."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    p = jax.lax.bitcast_convert_type(bits & jnp.uint32(0x7F800000),
                                     jnp.float32)
    p = jnp.maximum(p, jnp.float32(2.0 ** -126))
    return jnp.where(a > p, 2.0 * p, p)


def _slice_pair_cols(hi, lo, interpret=False):
    """Split a two-float (K, r) tile into six bf16 chunks with per-column
    power-of-two scales (same decomposition contract as
    sumfac._ozaki_slice_pair, cheaper extraction).

    Each chunk is extracted by the magic-constant rounding EFT
    ``q = (r + C) - C`` with ``C = 1.5 * 2^(23 - 8(i+1))``: the add forces
    round-to-nearest onto the chunk's ``2^-8(i+1)`` grid and the remainder
    ``r - q`` is exact — 2 ops replace the mul/trunc/mul of the truncating
    form, and division by the power-of-two column scale becomes one exact
    reciprocal multiply.  Nearest-rounded chunks are typically signed ints
    of magnitude <= 129 (vs 255 truncating); the first chunk can reach 256
    and the ``i == _NH`` lo-fold up to ~384 when the column max sits at an
    exact power of two, which is why ``_K_MAX`` keeps the 2w+log2(K) <= 24
    exact-f32 MXU accumulation bound rather than relying on the tighter
    typical margin.  Note the rounding grid differs from
    sumfac._ozaki_slice_pair's truncating split: reconstruction agrees to
    the pair's accuracy model, not bitwise."""
    a = jnp.max(jnp.abs(hi), axis=0, keepdims=True)
    s = _pow2_at_least(jnp.where(a > 0, a, 1.0))
    rs = 1.0 / s                    # exact: s is a power of two
    r = hi * rs
    chunks = []
    for i in range(_L):
        if i == _NH:
            # fold in the low word once the hi mantissa is consumed
            r = r + lo * rs
        C = jnp.float32(1.5 * 2.0 ** (23 - _W * (i + 1)))
        t = r + C
        if interpret:
            # XLA (the interpret-mode executor) folds (r + C) - C to r;
            # the barrier blocks that.  Mosaic neither folds nor lowers
            # optimization_barrier, so the plain form runs on TPU.
            t = jax.lax.optimization_barrier(t)
        q = t - C
        chunks.append(q.astype(jnp.bfloat16))
        r = r - q
    return chunks, s


def _dots_from_chunks(chunks, s_col, tcat, ts):
    """Six diagonal dots over concatenated chunk stacks.

    ``diag_d = sum_a chunk_a . T_{d-a}`` is ONE MXU dot of a SUFFIX of
    the reverse-ordered x-chunk concat (``rcat`` rows ``(L-1-d)K..LK``
    hold ``chunk_d, .., chunk_0``) against a PREFIX of the plain
    chunk-ordered table stack (``tcat`` rows ``0..(d+1)K`` hold
    ``T_0, .., T_d``) — the suffix/prefix pairing lets the streamed
    table hold each chunk ONCE (6K rows) instead of the 21K-row
    diag-stacked layout, cutting the per-tile table DMA 3.5x.  Twenty-one
    short dots with twenty serial VPU adds between them ran at ~55% MXU;
    the six concatenated dots (contractions up to ``6K``) measure at the
    MXU roofline.  Every chunk product is integer-valued and the f32
    accumulation is exact, so the reordered summation is bitwise equal
    to the diag-stacked form."""
    K = tcat.shape[0] // _L
    rcat = jnp.concatenate(chunks[::-1], axis=0)  # (6K, r) bf16, chunk_5 first
    acc = None
    for d in range(_L):
        y = jax.lax.dot_general(
            rcat[(_L - 1 - d) * K:], tcat[:(d + 1) * K],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = tf.df(y) if acc is None else tf.df_add_f32(acc, y)

    # exact power-of-two scales: s_col (1, r) column scale of the field,
    # ts (1, M) row scale of the table chunks
    scale = s_col.T * ts
    return acc[0] * scale, acc[1] * scale


def _stage_tile(xh, xl, tcat, ts, interpret=False):
    chunks, s_col = _slice_pair_cols(xh, xl, interpret=interpret)
    return _dots_from_chunks(chunks, s_col, tcat, ts)


def _stage_kernel(xh_ref, xl_ref, tc_ref, ts_ref, oh_ref, ol_ref,
                  interpret=False):
    """Grid = (R-tiles, M-tiles, K-blocks); the K axis is innermost so the
    output pair block stays resident in VMEM and accumulates the per-block
    partial results with exact two-float adds (long contraction axes split
    into <= _K_MAX blocks; each block's Ozaki split is independently exact,
    so the K-split preserves the accuracy guarantee — same scheme as
    sumfac._ozaki_contract_axis_pair's block path)."""
    from jax.experimental import pallas as pl
    hi, lo = _stage_tile(xh_ref[...], xl_ref[...], tc_ref[...], ts_ref[...],
                         interpret=interpret)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        oh_ref[...] = hi
        ol_ref[...] = lo

    @pl.when(kb > 0)
    def _():
        sh, sl = tf.df_add((oh_ref[...], ol_ref[...]), (hi, lo))
        oh_ref[...] = sh
        ol_ref[...] = sl


def _stage_kernel_acc(xh_ref, xl_ref, tc_ref, ts_ref, ah_ref, al_ref,
                      oh_ref, ol_ref, interpret=False):
    """Accumulating variant: the running two-float sum rides in aliased
    input/output buffers, so summing the six chains needs no separate
    (HBM-bound) pair-add passes.  K-blocks > 0 accumulate onto the output
    block like :func:`_stage_kernel`."""
    from jax.experimental import pallas as pl
    hi, lo = _stage_tile(xh_ref[...], xl_ref[...], tc_ref[...], ts_ref[...],
                         interpret=interpret)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        sh, sl = tf.df_add((ah_ref[...], al_ref[...]), (hi, lo))
        oh_ref[...] = sh
        ol_ref[...] = sl

    @pl.when(kb > 0)
    def _():
        sh, sl = tf.df_add((oh_ref[...], ol_ref[...]), (hi, lo))
        oh_ref[...] = sh
        ol_ref[...] = sl


# Mosaic double-buffers the HBM<->VMEM blocks and adds scratch, so budget
# well under the 16 MB of VMEM (measured: a 28.7M-estimate request OOMs,
# an 11M estimate still compiles to 17.5M)
_VMEM_BUDGET = 6 * 2 ** 20


# physical scoped-VMEM limit the Mosaic allocation is checked against
_VMEM_TOTAL = 16 * 2 ** 20


def _budget_less_output(budget, out_bytes):
    """XLA's buffer assignment may place a SMALL pallas output pair
    entirely in scoped VMEM alongside the kernel's own allocation
    (measured on v5e: a (1024, 1024) f32 output pair cost 8 MB of S(1)
    and OOM'd a fold kernel whose 6.9 MB estimate fit the budget).
    Scale the estimate budget down by the fraction of physical VMEM such
    an output would consume; large outputs (the 3D headline's compact
    tensors) cannot be VMEM-placed and keep the full budget."""
    if out_bytes >= _VMEM_TOTAL:
        return budget
    return int(budget * (_VMEM_TOTAL - out_bytes) / _VMEM_TOTAL)


def _vmem_bytes(K, r, m):
    x_pair = 2 * K * r * 4
    chunks = _L * K * r * 2                 # the (6K, r) bf16 concat
    table = _L * m * K * 2 + 4 * m          # chunk-ordered tcat block
    acc = 3 * r * m * 4                     # running df pair + current diag
    out = 2 * r * m * 4
    return x_pair + chunks + table + acc + out


# largest contraction block per kernel invocation; longer K axes (large 2D
# quadrature grids) split into blocks accumulated in-VMEM across the
# innermost grid dimension.  Bounded by the exact-f32 accumulation margin
# (2w + log2(K) <= 24 with w=8-bit chunks => K <= 256), matching the XLA
# pipeline's sumfac._OZAKI_MAX_K; the headline configs use K=192 (3D) and
# 512->2x256 splits (2D), so the tightening only affects exotic K in
# (256, 384] that the old bound ran unsplit past the margin.
_K_MAX = 256


def _pick_kblock(K):
    """Largest block <= _K_MAX that divides K in multiples of 8 (None if
    K itself is not a multiple of 8)."""
    if K % 8 != 0:
        return None
    if K <= _K_MAX:
        return K
    for kb in range(_K_MAX, 7, -8):
        if K % kb == 0:
            return kb
    return None


# Block-pick priority: with the chunk-ordered (6K-row) table layout the
# full-width M block usually fits VMEM, which removes the per-M-block
# refetch of the x stream entirely AND makes the output blocks cover full
# array rows (contiguous HBM writes — writes are the measured-slow
# direction).  m-first is therefore the default; the old r-first order
# remains as the fallback scan (and for measurement sweeps).
_PICK_M_FIRST = True


def _pick_blocks(K, R, M, r_block, vmem_bytes=None, budget=None,
                 m_first=None):
    """Largest (r, m, kb) tile sizes dividing (R, M, K) that fit the VMEM
    budget (m in lane multiples, kb in multiples of 8).

    Full K block always comes first: the 21-diagonal MXU dots collapse
    with short contraction blocks (kb=48 doubled the fold time, kb=8 was
    6x on the 3D n=48 headline), so kb stays at ``_pick_kblock``'s
    maximum.  Then the widest m (see ``_PICK_M_FIRST``), then the largest
    r that fits."""
    if vmem_bytes is None:
        vmem_bytes = _vmem_bytes
    if budget is None:
        budget = _VMEM_BUDGET
    if m_first is None:
        m_first = _PICK_M_FIRST
    kb = _pick_kblock(K)
    if kb is None:
        return None
    # every 128-multiple dividing R up to r_block (the old power-of-two
    # halving skipped e.g. r=384, which fits the stage kernels at full m)
    r_candidates = [r for r in range(min(r_block, R), 127, -128)
                    if R % r == 0]
    if not r_candidates and R < 128 and R % 8 == 0:
        r_candidates = [R]      # small rest extents: single sublane-tiled block
    m_candidates = [m for m in range(M, 127, -128)
                    if m % 128 == 0 and M % m == 0]
    if m_first:
        for m in m_candidates:
            for r in r_candidates:
                if vmem_bytes(kb, r, m) <= budget:
                    return r, m, kb
    for r in r_candidates:
        for m in m_candidates:
            if vmem_bytes(kb, r, m) <= budget:
                return r, m, kb
    return None


def _stack_tcat(t_chunks, k_blk):
    """Arrange table chunks ``(L, Mp, K)`` into the chunk-ordered layout
    ``(L K, Mp)``: per K-block, L contiguous row blocks holding the
    transposed table chunks ``T_0, .., T_{L-1}`` (the suffix/prefix dot
    pairing in :func:`_dots_from_chunks` needs each chunk only once).
    Pure relayout of a small array, traced into the surrounding jit
    (tables are jit operands — the stacking cost is noise next to the
    field streams)."""
    L, Mp, K = t_chunks.shape
    tsel = t_chunks.reshape(L, Mp, K // k_blk, k_blk)
    tsel = jnp.transpose(tsel, (2, 0, 3, 1))          # (nkb, L, k_blk, Mp)
    return tsel.reshape(L * K, Mp)


@functools.partial(jax.jit, static_argnames=('r_block', 'interpret'))
def _stage_call(xh, xl, t_chunks, t_scale, acc_h=None, acc_l=None,
                r_block=512, interpret=False):
    """One contraction stage: ``(K, R)`` pair x table chunks ``(L, M, K)``
    -> ``(R, M)`` pair.  With an `acc` pair, the result is added onto it
    in-kernel (exact two-float add; input_output_aliases avoids a separate
    accumulator pass *inside* the kernel — under an enclosing jit XLA can
    reuse the buffer, but an eager top-level call still copies it since
    this jit does not donate its arguments)."""
    from jax.experimental import pallas as pl

    K, R = xh.shape
    L, M, _ = t_chunks.shape
    blocks = _pick_blocks(K, R, M, r_block,
                          budget=_budget_less_output(_VMEM_BUDGET,
                                                     2 * R * M * 4))
    if blocks is None:        # keep supported()'s contract: never None here
        blocks = _pick_blocks(K, R, M, r_block)
    r_blk, m_blk, k_blk = blocks
    tcat = _stack_tcat(t_chunks, k_blk)
    # K innermost: the output pair block stays VMEM-resident across the
    # K-block accumulation (see _stage_kernel)
    grid = (R // r_blk, M // m_blk, K // k_blk)
    out_shape = [jax.ShapeDtypeStruct((R, M), jnp.float32),
                 jax.ShapeDtypeStruct((R, M), jnp.float32)]
    # index maps use j*0 for constant positions so every index has the
    # grid index dtype (mixed i64/i32 tuples fail Mosaic legalization
    # under jax_enable_x64)
    in_specs = [
        pl.BlockSpec((k_blk, r_blk), lambda j, s, kb: (kb, j)),
        pl.BlockSpec((k_blk, r_blk), lambda j, s, kb: (kb, j)),
        pl.BlockSpec((_L * k_blk, m_blk), lambda j, s, kb: (kb, s)),
        pl.BlockSpec((1, m_blk), lambda j, s, kb: (j * 0, s)),
    ]
    out_specs = [pl.BlockSpec((r_blk, m_blk), lambda j, s, kb: (j, s)),
                 pl.BlockSpec((r_blk, m_blk), lambda j, s, kb: (j, s))]
    operands = [xh, xl, tcat, t_scale]
    if acc_h is not None:
        operands += [acc_h, acc_l]
        in_specs = in_specs + out_specs
        kernel, alias = _stage_kernel_acc, {4: 0, 5: 1}
    else:
        kernel, alias = _stage_kernel, {}
    kernel = functools.partial(kernel, interpret=interpret)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=alias,
        interpret=interpret,
    )(*operands)
    return oh, ol


def _dots_from_chunks_T(chunks, s_col, tcat, ts):
    """Transposed-result variant of :func:`_dots_from_chunks`: the dot
    operands swap, so the tile comes out ``(m, r)`` at zero cost (no
    register transpose).  Bitwise-equal to the transpose of the direct
    form: every chunk product is integer-valued and the f32 accumulation
    is exact."""
    K = tcat.shape[0] // _L
    rcat = jnp.concatenate(chunks[::-1], axis=0)
    acc = None
    for d in range(_L):
        y = jax.lax.dot_general(
            tcat[:(d + 1) * K], rcat[(_L - 1 - d) * K:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = tf.df(y) if acc is None else tf.df_add_f32(acc, y)
    scale = ts.T * s_col                    # (m, 1) * (1, r) -> (m, r)
    return acc[0] * scale, acc[1] * scale


def _stage_tile_T(xh, xl, tcat, ts, interpret=False):
    chunks, s_col = _slice_pair_cols(xh, xl, interpret=interpret)
    return _dots_from_chunks_T(chunks, s_col, tcat, ts)


def _stage_kernel_T(xh_ref, xl_ref, tc_ref, ts_ref, oh_ref, ol_ref,
                    interpret=False):
    """Transposed-output stage kernel: writes the ``(M, R)`` layout the
    fused tail kernel consumes as ``(M1p, K2, K3)`` slabs (a free 3D
    view — no inter-stage retile)."""
    from jax.experimental import pallas as pl
    hi, lo = _stage_tile_T(xh_ref[...], xl_ref[...], tc_ref[...],
                           ts_ref[...], interpret=interpret)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        oh_ref[...] = hi
        ol_ref[...] = lo

    @pl.when(kb > 0)
    def _():
        sh, sl = tf.df_add((oh_ref[...], ol_ref[...]), (hi, lo))
        oh_ref[...] = sh
        ol_ref[...] = sl


@functools.partial(jax.jit, static_argnames=('r_block', 'interpret'))
def _stage_call_T(xh, xl, t_chunks, t_scale, r_block=512, interpret=False):
    """One contraction stage with TRANSPOSED output: ``(K, R)`` pair x
    table chunks ``(L, M, K)`` -> ``(M, R)`` pair."""
    from jax.experimental import pallas as pl

    K, R = xh.shape
    L, M, _ = t_chunks.shape
    blocks = _pick_blocks(K, R, M, r_block,
                          budget=_budget_less_output(_VMEM_BUDGET,
                                                     2 * R * M * 4))
    if blocks is None:        # keep supported()'s contract: never None here
        blocks = _pick_blocks(K, R, M, r_block)
    r_blk, m_blk, k_blk = blocks
    tcat = _stack_tcat(t_chunks, k_blk)
    grid = (R // r_blk, M // m_blk, K // k_blk)
    in_specs = [
        pl.BlockSpec((k_blk, r_blk), lambda j, s, kb: (kb, j)),
        pl.BlockSpec((k_blk, r_blk), lambda j, s, kb: (kb, j)),
        pl.BlockSpec((_L * k_blk, m_blk), lambda j, s, kb: (kb, s)),
        pl.BlockSpec((1, m_blk), lambda j, s, kb: (j * 0, s)),
    ]
    out_specs = [pl.BlockSpec((m_blk, r_blk), lambda j, s, kb: (s, j)),
                 pl.BlockSpec((m_blk, r_blk), lambda j, s, kb: (s, j))]
    kernel = functools.partial(_stage_kernel_T, interpret=interpret)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((M, R), jnp.float32)] * 2,
        interpret=interpret,
    )(xh, xl, tcat, t_scale)
    return oh, ol


################################################################################
# Fused tail: stage-2 + folded final stage in ONE kernel (3-axis chains)
################################################################################

def _tail_kernel(*refs, n_terms, idx2, idx3, interpret=False):
    """Per grid step ``(j=m1, s2, s3)``: contract K2 for every term's
    ``(K2, K3)`` slab at row m1 (into VMEM scratch, recomputed when s3
    wraps), then contract K3 against the final tables and accumulate all
    terms into one output tile — the stage-2 intermediate NEVER touches
    HBM (it was ~1.4 GB written + read per headline assembly, plus a
    lane-regrouping retile).

    Ref layout: ``x1h_0, x1l_0, .., tc2_0.., ts2_0.., tc3_0.., ts3_0..,
    oh, ol, y2h_scr, y2l_scr``."""
    from jax.experimental import pallas as pl
    n2 = len(set(idx2))
    n3 = len(set(idx3))
    base = 2 * n_terms
    tc2 = refs[base:base + n2]
    ts2 = refs[base + n2:base + 2 * n2]
    tc3 = refs[base + 2 * n2:base + 2 * n2 + n3]
    ts3 = refs[base + 2 * n2 + n3:base + 2 * n2 + 2 * n3]
    oh_ref, ol_ref = refs[base + 2 * n2 + 2 * n3:base + 2 * n2 + 2 * n3 + 2]
    y2h_scr, y2l_scr = refs[-2:]
    s3 = pl.program_id(2)

    @pl.when(s3 == 0)
    def _():
        for t in range(n_terms):
            x2h = refs[2 * t][0]            # (K2, K3)
            x2l = refs[2 * t + 1][0]
            yh, yl = _stage_tile(x2h, x2l, tc2[idx2[t]][...],
                                 ts2[idx2[t]][...], interpret=interpret)
            y2h_scr[t] = yh                 # (K3, m2b)
            y2l_scr[t] = yl

    acc = None
    for t in range(n_terms):
        zh, zl = _stage_tile(y2h_scr[t], y2l_scr[t], tc3[idx3[t]][...],
                             ts3[idx3[t]][...], interpret=interpret)
        acc = (zh, zl) if acc is None else tf.df_add(acc, (zh, zl))
    oh_ref[0] = acc[0]
    ol_ref[0] = acc[1]


def _vmem_bytes_tail(K2, K3, m2b, m3b, n_terms, n2, n3):
    x1 = n_terms * 2 * K2 * K3 * 4
    chunks2 = _L * K2 * K3 * 2
    scr = n_terms * 2 * K3 * m2b * 4
    chunks3 = _L * K3 * m2b * 2
    tc2 = n2 * (_L * K2 * m2b * 2 + 4 * m2b)
    tc3 = n3 * (_L * K3 * m3b * 2 + 4 * m3b)
    out = 3 * m2b * m3b * 4
    return x1 + chunks2 + scr + chunks3 + tc2 + tc3 + out


# the fused tail kernel's Mosaic stack inflation is larger than the stage/
# fold kernels': the r4 A/B compiled a 6.5 MB estimate to an 18.05 MB
# scoped allocation (2.8x) and OOM'd the 16 MB limit.  The post-dedup
# headline estimate is 5.68 MB at the (128, 128) minimum tiling, which
# compiles and runs at 5.8 MB budget (measured: ~15.8 MB scoped, fits).
# (env knob for on-hardware budget sweeps)
_VMEM_BUDGET_TAIL = int(float(os.environ.get('PYIGA_TAIL_BUDGET_MB',
                                             '5.8')) * 2 ** 20)


def _pick_blocks_tail(K2, K3, M2p, M3p, n_terms, n2, n3,
                      budget=None):
    """(m2b, m3b) for the fused tail kernel, widest m3 first (full-width
    m3 avoids recomputing nothing — y2 rides scratch either way — but
    keeps output writes contiguous)."""
    if budget is None:
        budget = _VMEM_BUDGET_TAIL
    for m3b in [m for m in range(M3p, 127, -128) if M3p % m == 0]:
        for m2b in [m for m in range(M2p, 127, -128) if M2p % m == 0]:
            if _vmem_bytes_tail(K2, K3, m2b, m3b, n_terms, n2, n3) \
                    <= budget:
                return m2b, m3b
    return None


@functools.partial(jax.jit,
                   static_argnames=('idx2', 'idx3', 'interpret'))
def _tail_fused_call(x1T_pairs, tc2_list, ts2_list, idx2,
                     tc3_list, ts3_list, idx3, interpret=False):
    """Fused stage-2 + folded final stage over 3-axis chains:
    ``x1T_pairs[t]`` is term t's transposed stage-1 output viewed as
    ``(M1p, K2, K3)``; returns the padded compact pair
    ``(M1p, M2p, M3p)`` written once."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M1p, K2, K3 = x1T_pairs[0][0].shape
    M2p = tc2_list[0].shape[1]
    M3p = tc3_list[0].shape[1]
    T = len(x1T_pairs)
    n2, n3 = len(tc2_list), len(tc3_list)
    blocks = _pick_blocks_tail(K2, K3, M2p, M3p, T, n2, n3)
    if blocks is None:
        return None
    m2b, m3b = blocks
    tcat2 = [_stack_tcat(tc, K2) for tc in tc2_list]
    tcat3 = [_stack_tcat(tc, K3) for tc in tc3_list]
    grid = (M1p, M2p // m2b, M3p // m3b)
    x_spec = pl.BlockSpec((1, K2, K3), lambda j, s2, s3: (j, s2 * 0, s3 * 0))
    in_specs = [x_spec] * (2 * T) + \
        [pl.BlockSpec((_L * K2, m2b), lambda j, s2, s3: (j * 0, s2))] * n2 + \
        [pl.BlockSpec((1, m2b), lambda j, s2, s3: (j * 0, s2))] * n2 + \
        [pl.BlockSpec((_L * K3, m3b), lambda j, s2, s3: (j * 0, s3))] * n3 + \
        [pl.BlockSpec((1, m3b), lambda j, s2, s3: (j * 0, s3))] * n3
    out_specs = [pl.BlockSpec((1, m2b, m3b),
                              lambda j, s2, s3: (j, s2, s3))] * 2
    operands = [a for pair in x1T_pairs for a in pair] + \
        tcat2 + list(ts2_list) + tcat3 + list(ts3_list)
    kernel = functools.partial(_tail_kernel, n_terms=T, idx2=idx2,
                               idx3=idx3, interpret=interpret)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((M1p, M2p, M3p), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((T, K3, m2b), jnp.float32),
                        pltpu.VMEM((T, K3, m2b), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return oh, ol


# Fused-tail path for 3-axis chains (stage1_T + _tail_fused_call).
# Hardware-measured on the 3D n=48 f64 headline (v5e, r4, with the path
# verified ENGAGED via a trace probe): fused device time 62.85 ms vs
# 62.68 ms for the two-call pipeline — the ~2.7 GB of stage-2 HBM
# intermediate it removes is bought back by per-grid-step table
# restreaming and the narrower (128, 128) output tiling, so it stays OFF
# by default.  Interpret tests assert bitwise parity with the two-call
# pipeline either way.  Env toggle for on-hardware A/B: PYIGA_TAIL_FUSED=1.
_TAIL_FUSED = os.environ.get('PYIGA_TAIL_FUSED', '').lower() \
    in ('1', 'true', 'yes', 'on')


def _tail_supported(tables_prepped_per_term, field_pairs):
    """Static gate: 3 axes, no K-splits, uniform table widths, VMEM fits."""
    if not _TAIL_FUSED:
        return False
    widths = [set(), set(), set()]
    for tabs, (hi, _lo) in zip(tables_prepped_per_term, field_pairs):
        if len(tabs) != 3 or hi.ndim != 3:
            return False
        for k, (tc, _ts, _M) in enumerate(tabs):
            K = tc.shape[2]
            if K != hi.shape[k] or _pick_kblock(K) != K:
                return False
            widths[k].add(tuple(tc.shape))
    # the fused call sizes every BlockSpec from the first term's tables
    if any(len(w) > 1 for w in widths):
        return False
    return True


def _chain_group_tail_fused(tables_prepped_per_term, field_pairs, idxs,
                            r_block=512, interpret=False, last_idx=None,
                            dedup_idx=None):
    """Fused-tail version of :func:`_chain_group_folded` for 3-axis
    chains: per-term transposed stage 1, then ONE kernel for stage 2 +
    the folded final contraction.  Returns ``(padded pair, dims)`` or
    None when the tiling does not fit."""
    x1T, dims1 = [], None
    for t in idxs:
        tc1, ts1, M1 = tables_prepped_per_term[t][0]
        hi, lo = field_pairs[t]
        K1 = hi.shape[0]
        R1 = int(np.prod(hi.shape[1:]))
        oh, ol = _stage_call_T(hi.reshape(K1, R1), lo.reshape(K1, R1),
                               tc1, ts1, r_block=r_block,
                               interpret=interpret)
        M1p = oh.shape[0]
        K2, K3 = hi.shape[1], hi.shape[2]
        x1T.append((oh.reshape(M1p, K2, K3), ol.reshape(M1p, K2, K3)))
        dims1 = (M1, M1p)

    def dedup(stage_k):
        tcs, tss, idx, seen = [], [], [], {}
        for pos, t in enumerate(idxs):
            tc, ts, _M = tables_prepped_per_term[t][stage_k]
            # host-computed dedup indices: in-jit id() sees distinct
            # tracers and never dedups (see stage_table_dedup_idx)
            key = (dedup_idx[stage_k][pos] if dedup_idx is not None
                   else last_idx[pos]
                   if (last_idx is not None and stage_k == 2)
                   else id(tc))
            if key not in seen:
                seen[key] = len(tcs)
                tcs.append(tc)
                tss.append(ts)
            idx.append(seen[key])
        return tcs, tss, tuple(idx)

    tc2, ts2, idx2 = dedup(1)
    tc3, ts3, idx3 = dedup(2)
    out = _tail_fused_call(x1T, tc2, ts2, idx2, tc3, ts3, idx3,
                           interpret=interpret)
    if out is None:
        return None
    M2 = tables_prepped_per_term[idxs[0]][1][2]
    M3 = tables_prepped_per_term[idxs[0]][2][2]
    dims = [dims1, (M2, out[0].shape[1]), (M3, out[0].shape[2])]
    return out, dims


def _pad_lanes(m):
    return -(-m // 128) * 128


_PREP_CACHE = {}


@jax.jit
def _prep_slice_jit(T):
    return sumfac._ozaki_slice(T, 1, _L)


def prepare_table(table):
    """Host-side: split a float64 ``(M, K)`` pair table into bf16 chunks
    (row-scaled, M zero-padded to a lane multiple).  Returns
    ``(chunks (L, Mp, K) bf16, scale (1, Mp) f32, M)``.

    Results are cached by table content, so terms sharing a pair table
    (e.g. the value*value table of every off-diagonal stiffness term)
    share one prepped array — the folded final stage dedups its in-VMEM
    table stacks by object identity."""
    import hashlib
    table = np.asarray(table, dtype=np.float64)
    key = (table.shape, hashlib.sha256(table.tobytes()).digest())
    hit = _PREP_CACHE.get(key)
    if hit is not None:
        return hit
    M, K = table.shape
    Mp = _pad_lanes(M)
    padded = np.zeros((Mp, K))
    padded[:M] = table
    chunks, s = _prep_slice_jit(jnp.asarray(padded))
    chunks = jnp.stack([c for c in chunks])
    scale = jnp.asarray(s, jnp.float32).reshape(1, Mp)
    if len(_PREP_CACHE) > 256:
        _PREP_CACHE.clear()
    _PREP_CACHE[key] = (chunks, scale, M)
    return chunks, scale, M


def _fold_kernel(*refs, n_terms, term_idx, interpret=False):
    """Final folded stage over all terms: every term's last contraction
    lands in ONE in-VMEM two-float accumulator, written once.  HBM write
    bandwidth is the scarce resource on this part (~150 GB/s vs ~900 read,
    measured), so replacing T aliased accumulator passes (T reads + T
    writes of the full compact pair) with a single write is worth ~6x the
    final-stage traffic at T=6.

    Ref layout: ``xh_0, xl_0, .., xh_{T-1}, xl_{T-1}, tc_0.., ts_0..,
    oh, ol`` with ``term_idx[t]`` selecting the (deduplicated) stacked
    table for term t."""
    from jax.experimental import pallas as pl
    n_tabs = (len(refs) - 2 * n_terms - 2) // 2
    tc_refs = refs[2 * n_terms:2 * n_terms + n_tabs]
    ts_refs = refs[2 * n_terms + n_tabs:2 * n_terms + 2 * n_tabs]
    oh_ref, ol_ref = refs[-2], refs[-1]
    acc = None
    for t in range(n_terms):
        hi, lo = _stage_tile(refs[2 * t][...], refs[2 * t + 1][...],
                             tc_refs[term_idx[t]][...],
                             ts_refs[term_idx[t]][...], interpret=interpret)
        acc = (hi, lo) if acc is None else tf.df_add(acc, (hi, lo))
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        oh_ref[...] = acc[0]
        ol_ref[...] = acc[1]

    @pl.when(kb > 0)
    def _():
        sh, sl = tf.df_add((oh_ref[...], ol_ref[...]), acc)
        oh_ref[...] = sh
        ol_ref[...] = sl


def _vmem_bytes_fold(K, r, m, n_terms, n_tabs):
    x_pairs = n_terms * 2 * K * r * 4
    chunks = _L * K * r * 2                 # per-term transient concat
    tables = n_tabs * (_L * m * K * 2 + 4 * m)
    acc = 3 * r * m * 4
    out = 2 * r * m * 4
    return x_pairs + chunks + tables + acc + out


# the fold kernel budgets a bit above the stage kernels: its per-buffer
# tiles are smaller (r shrinks with the term count), leaving headroom in
# the measured ~4x estimate->scoped-allocation inflation
_VMEM_BUDGET_FOLD = 7 * 2 ** 20


def _pick_blocks_fold(K, R, M, r_block, n_terms, n_tabs):
    return _pick_blocks(
        K, R, M, r_block,
        vmem_bytes=lambda k, r, m: _vmem_bytes_fold(k, r, m, n_terms,
                                                    n_tabs),
        budget=_budget_less_output(_VMEM_BUDGET_FOLD, 2 * R * M * 4))


@functools.partial(jax.jit,
                   static_argnames=('term_idx', 'r_block', 'interpret'))
def _stage_call_fold(x_pairs, tc_list, ts_list, term_idx, r_block=512,
                     interpret=False):
    """Folded final stage: ``sum_t contract(x_pairs[t], tables[idx[t]])``
    -> one ``(R, M)`` pair, written once (see :func:`_fold_kernel`)."""
    from jax.experimental import pallas as pl

    K, R = x_pairs[0][0].shape
    M = tc_list[0].shape[1]
    T, ntab = len(x_pairs), len(tc_list)
    blocks = _pick_blocks_fold(K, R, M, r_block, T, ntab)
    if blocks is None:
        return None
    r_blk, m_blk, k_blk = blocks
    tcats = [_stack_tcat(tc, k_blk) for tc in tc_list]
    grid = (R // r_blk, M // m_blk, K // k_blk)
    x_spec = pl.BlockSpec((k_blk, r_blk), lambda j, s, kb: (kb, j))
    in_specs = [x_spec] * (2 * T) + \
        [pl.BlockSpec((_L * k_blk, m_blk), lambda j, s, kb: (kb, s))] * ntab + \
        [pl.BlockSpec((1, m_blk), lambda j, s, kb: (j * 0, s))] * ntab
    out_specs = [pl.BlockSpec((r_blk, m_blk), lambda j, s, kb: (j, s))] * 2
    operands = [a for pair in x_pairs for a in pair] + tcats + list(ts_list)
    kernel = functools.partial(_fold_kernel, n_terms=T, term_idx=term_idx,
                               interpret=interpret)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((R, M), jnp.float32)] * 2,
        interpret=interpret,
    )(*operands)
    return oh, ol


def _chain_pair_padded(tables_prepped, field_pair, acc=None, r_block=512,
                       interpret=False):
    """d-stage pair chain; returns the PADDED compact pair plus the
    per-axis (M, Mp) dims.  With `acc` (a padded pair of the final-stage
    shape), the last stage accumulates into it in-kernel."""
    hi, lo = field_pair
    dims = []
    n_stages = len(tables_prepped)
    for k, (tc, ts, M) in enumerate(tables_prepped):
        K = hi.shape[0]
        R = int(np.prod(hi.shape[1:]))
        if acc is not None and k == n_stages - 1:
            ah, al = (a.reshape(R, tc.shape[1]) for a in acc)
        else:
            ah = al = None
        oh, ol = _stage_call(hi.reshape(K, R), lo.reshape(K, R), tc, ts,
                             acc_h=ah, acc_l=al,
                             r_block=r_block, interpret=interpret)
        Mp = oh.shape[1]
        new_shape = hi.shape[1:] + (Mp,)
        hi, lo = oh.reshape(new_shape), ol.reshape(new_shape)
        dims.append((M, Mp))
    return (hi, lo), dims


def chain_pair(tables_prepped, field_pair, r_block=512, interpret=False):
    """Full d-stage pair chain through the fused stage kernel.

    `tables_prepped`: list of :func:`prepare_table` results, one per axis
    in contraction order (axis 0 first).  `field_pair`: two-float field of
    shape ``(K_1, ..., K_d)``.  Returns the f32 pair of the compact tensor
    with shape ``(M_1, ..., M_d)`` (padding removed)."""
    (hi, lo), dims = _chain_pair_padded(tables_prepped, field_pair,
                                        r_block=r_block, interpret=interpret)
    index = tuple(slice(0, M) for M, _ in dims)
    return hi[index], lo[index]


def _prep_table_traced(T):
    """Traced variant of :func:`prepare_table` for tables that are jit
    operands: split an f64 ``(Q, K)`` table (`K` a multiple of 8) into bf16
    chunks with Q padded to a lane multiple.  Returns
    ``(chunks (L, Qp, K), scale (1, Qp), Q)``."""
    Q, K = T.shape
    Qp = _pad_lanes(Q)
    padded = jnp.pad(T, ((0, Qp - Q), (0, 0)))
    chunks, s = sumfac._ozaki_slice(padded, 1, _L)
    return jnp.stack(list(chunks)), jnp.asarray(s, jnp.float32).reshape(1, Qp), Q


def geo_stage12_mxu(tables, coeffs, d, interpret=False, r_block=512):
    """Stage-1/2 geometry-Jacobian contraction on the MXU (drop-in for
    :func:`~pyiga_tpu.ops.geom.geo_jac_stage12_df`).

    The two-float fallback there (``tp_apply_df``) runs *emulated-f64
    tensordots* whenever a coefficient axis exceeds its unroll limit —
    which is always at production sizes, and emulated-f64 dots cost ~2 ns
    per output element on TPU (measured ~9 ms of the 3D n=48 headline
    assembly).  Here the same contractions run as pair-chained Ozaki bf16
    chunk products through the fused stage kernel (~1 ms): axes are
    zero-padded to the kernel's tiling (contraction axes to multiples of
    8, the carried ``(C, n_last)`` rest axis to a lane multiple — zero
    rows/columns contribute exactly zero, so padding is exact).

    Returns ``(Ys, shape12)`` with the same contract as
    ``geo_jac_stage12_df``: ``Ys[t]`` is the two-float pair of shape
    ``(C, Q12, n_last)`` with the derivative table on axis ``t``
    (``t = d - 1``: all-values)."""
    from . import twofloat as tf
    val_tabs = [t[0] for t in tables]       # (Q_k, n_k) f64
    der_tabs = [t[1] for t in tables]
    C = coeffs.shape[0]
    n_last = coeffs.shape[d]
    shape12 = tuple(t.shape[0] for t in val_tabs[:d - 1])
    Q12 = int(np.prod(shape12)) if shape12 else 1

    # X: contraction axes leading, flattened (C, n_last) trailing, padded
    # to a lane multiple so every stage's rest extent divides by 128
    P = _pad_lanes(C * n_last)
    X = jnp.moveaxis(jnp.asarray(coeffs), 0, d - 1)
    X = X.reshape(tuple(X.shape[:d - 1]) + (C * n_last,))
    X = jnp.pad(X, [(0, 0)] * (d - 1) + [(0, P - C * n_last)])
    hi0, lo0 = tf.df_from_f64(X)

    prepped = {}
    for k in range(d - 1):
        nk = val_tabs[k].shape[1]
        # 16: bf16 sublane tile — the in-kernel chunk concat offsets are
        # multiples of the contraction extent
        nkp = -(-nk // 16) * 16
        for kind, tabs in (('v', val_tabs), ('d', der_tabs)):
            T = jnp.pad(jnp.asarray(tabs[k]), ((0, 0), (0, nkp - nk)))
            prepped[(kind, k)] = _prep_table_traced(T) + (nkp,)

    Ys = []
    for t in range(d):
        hi, lo = hi0, lo0
        for k in range(d - 1):
            tc, tscale, _Q, nkp = prepped[('d' if k == t else 'v', k)]
            pad0 = [(0, nkp - hi.shape[0])] + [(0, 0)] * (hi.ndim - 1)
            hi, lo = jnp.pad(hi, pad0), jnp.pad(lo, pad0)
            K = hi.shape[0]
            R = int(np.prod(hi.shape[1:]))
            oh, ol = _stage_call(hi.reshape(K, R), lo.reshape(K, R),
                                 tc, tscale, r_block=r_block,
                                 interpret=interpret)
            new_shape = hi.shape[1:] + (oh.shape[1],)
            hi, lo = oh.reshape(new_shape), ol.reshape(new_shape)
        # (P, Q_1p, .., Q_{d-1}p) -> (C, Q12, n_last)
        sl = (slice(0, C * n_last),) + tuple(slice(0, q) for q in shape12)
        out = []
        for A in (hi, lo):
            A = A[sl].reshape((C, n_last) + shape12)
            A = jnp.moveaxis(A, 1, -1).reshape(C, Q12, n_last)
            out.append(A)
        Ys.append((out[0], out[1]))
    return Ys, shape12


def _stiff_fields_body(j, gw, out_ref):
    """Shared elementwise tail of the stiffness fields kernels: two-float
    det/inverse of the Jacobian tile `j`, weight ``W = gw |det|`` and the
    symmetric field outputs ``B_ab = W (J^-1 J^-T)_ab``."""
    from . import geom
    d = len(j)
    det, inv = geom.det_and_inv_df_pairs(j)
    W = tf.df_mul(gw, tf.df_abs(det))
    k = 0
    for a in range(d):
        for b in range(a, d):
            Bab = tf.df_sum([tf.df_mul(inv[a][m], inv[b][m])
                             for m in range(d)])
            hi, lo = tf.df_mul(W, Bab)
            out_ref[2 * k] = hi
            out_ref[2 * k + 1] = lo
            k += 1


def _make_stiff_fields_kernel(d):
    def kernel(jac_ref, gw_ref, out_ref):
        j = [[(jac_ref[2 * (a * d + b)], jac_ref[2 * (a * d + b) + 1])
              for b in range(d)] for a in range(d)]
        _stiff_fields_body(j, (gw_ref[0], gw_ref[1]), out_ref)
    return kernel


def _make_stiff_fields_fused_kernel(d, C, n_last, nurbs,
                                    kind='stiffness'):
    """Fields kernel that also performs the LAST-axis geometry-Jacobian
    contraction in-VMEM (the leading-axes stages arrive precomputed from
    :func:`~pyiga_tpu.ops.geom.geo_jac_stage12_df`).

    Tile layout: sublanes = flattened leading grid axes (q12), lanes =
    last grid axis (padded).  The per-sublane stage-12 values enter
    through a ``(NY, r_rows, n_last)`` block whose tiny trailing dim puts
    q12 in SUBLANES — reading lane column ``j3`` yields the per-row
    scalars natively, so the contraction is a broadcast (r,1)x(1,L)
    product with no in-kernel transpose.

    Y stack rows: ``(t * C + c) * 2 + half`` for stage combo ``t``
    (deriv axis t; t = d-1 = all-values) and component c, then the
    flattened leading-axes Gauss weight pair in lane 0 of the last two
    rows.  T stack rows: value table pair (0, 1), derivative pair (2, 3),
    last-axis Gauss weight pair (4, 5)."""
    def kernel(y_ref, t_ref, out_ref):
        def contract_last(t, c, deriv):
            # same unroll order and operand order as geom.tp_apply_df's
            # final stage: bitwise-equal to the XLA pair pipeline
            acc = None
            for j3 in range(n_last):
                th = t_ref[2 * deriv, j3, :][None, :]
                tl = t_ref[2 * deriv + 1, j3, :][None, :]
                yh = y_ref[(t * C + c) * 2, :, j3][:, None]
                yl = y_ref[(t * C + c) * 2 + 1, :, j3][:, None]
                term = tf.df_mul((th, tl), (yh, yl))
                acc = term if acc is None else tf.df_add(acc, term)
            return acc

        jac = [[contract_last(k if k < d - 1 else d - 1, c,
                              1 if k == d - 1 else 0)
                for k in range(d)] for c in range(C)]
        gw12 = (y_ref[d * C * 2, :, 0][:, None],
                y_ref[d * C * 2 + 1, :, 0][:, None])
        gwL = (t_ref[4, 0, :][None, :], t_ref[5, 0, :][None, :])
        gw = tf.df_mul(gw12, gwL)

        val = None
        if nurbs or kind == 'jac':
            val = [contract_last(d - 1, c, 0) for c in range(C)]
        if nurbs:
            W = val[-1]
            WW = tf.df_mul(W, W)
            jac = [[tf.df_div(tf.df_sub(tf.df_mul(jac[c][k], W),
                                        tf.df_mul(val[c], jac[-1][k])),
                              WW)
                    for k in range(d)] for c in range(C - 1)]
            if kind == 'jac':
                val = [tf.df_div(v, W) for v in val[:-1]]
        if kind == 'jac':
            # physical values then jac row-major, hi/lo interleaved
            # (matches geom.geo_jacobian_field_df's (val, jac) content)
            k = 0
            for v in val:
                out_ref[2 * k] = v[0]
                out_ref[2 * k + 1] = v[1]
                k += 1
            for c in range(len(jac)):
                for kk in range(d):
                    out_ref[2 * k] = jac[c][kk][0]
                    out_ref[2 * k + 1] = jac[c][kk][1]
                    k += 1
        elif kind == 'mass':
            from . import geom
            det = geom.det_df_pairs(jac)
            hi, lo = tf.df_mul(gw, tf.df_abs(det))
            out_ref[0] = hi
            out_ref[1] = lo
        else:
            _stiff_fields_body(jac, gw, out_ref)
    return kernel


def _fields_fused(geo_inputs, kind='stiffness', interpret=False,
                  r_rows=256):
    """Whole stiffness-fields pipeline — geometry Jacobian last-stage
    contraction, det/inv, weights, B products — in ONE Pallas kernel (the
    XLA two-float Jacobian contraction materializes every pair op:
    measured ~30 ms of the 3D headline assembly; fused it rides the tile
    already in VMEM)."""
    from jax.experimental import pallas as pl
    from . import geom

    is_nurbs = 'geo_tables_nurbs' in geo_inputs
    tables = geo_inputs['geo_tables_nurbs' if is_nurbs else 'geo_tables_bsp']
    coeffs = geo_inputs['geo_coeffs']
    if (kind != 'jac'
            and not geo_jac_fields_supported(tables, coeffs)):
        # untiled grid or in-kernel unroll too long: XLA pair fallback
        from .. import assemblers
        fallback = (assemblers.mass_fields_df_pair if kind == 'mass'
                    else assemblers.stiffness_fields_df_pair)
        return fallback(geo_inputs)
    d = len(tables)
    C = coeffs.shape[0]
    n_last = coeffs.shape[d]
    Q_last = tables[d - 1].shape[1]
    Lp = _pad_lanes(Q_last)

    if all(-(-int(t[0].shape[1]) // 16) * 16 <= _K_MAX
           for t in tables[:d - 1]):
        Ys, shape12 = geo_stage12_mxu(tables, coeffs, d, interpret=interpret)
    else:
        # very large geometry coefficient axes: keep the two-float XLA path
        Ys, shape12 = geom.geo_jac_stage12_df(tables, coeffs, d)
    Q12 = int(np.prod(shape12)) if shape12 else 1

    # stage-12 stack, q12 in sublanes (see kernel docstring)
    w12 = geom.gauss_weight_field(geo_inputs['weights'][:d - 1]).reshape(-1)
    gw12 = tf.df_from_f64(w12)
    rows = []
    for t in range(d):
        hi, lo = Ys[t]
        for c in range(C):
            rows += [hi[c], lo[c]]
    gw_row = [jnp.zeros((Q12, n_last), jnp.float32)
              .at[:, 0].set(h) for h in gw12]
    Ystack = jnp.stack(rows + gw_row)

    # last-axis table stack, padded to (6, max(8, n_last), Lp)
    NT_rows = max(8, n_last)
    Tv = tables[d - 1][0].T      # (n_last, Q_last) f64
    Td = tables[d - 1][1].T
    wL = jnp.asarray(geo_inputs['weights'][d - 1])
    T = jnp.zeros((6, NT_rows, Lp))
    T = T.at[0:4, :n_last, :Q_last].set(
        jnp.stack([t for p in (Tv, Td) for t in tf.df_from_f64(p)])
        .reshape(4, n_last, Q_last))
    T = T.at[4:6, 0, :Q_last].set(jnp.stack(tf.df_from_f64(wL)))
    T = T.astype(jnp.float32)

    sdim = C - 1 if is_nurbs else C
    n_out = (2 if kind == 'mass'
             else 2 * sdim * (d + 1) if kind == 'jac'
             else sdim * (sdim + 1))
    NY = Ystack.shape[0]
    while Q12 % r_rows:
        r_rows //= 2
    # VMEM: Y tile lane-padded to 128 + the (n_out, r, Lp) output tile;
    # double buffering and scratch inflate the estimate ~4x (measured:
    # a 5.7 MB estimate compiled to a 23.4 MB scoped allocation), so
    # budget ~3.5 MB of estimated buffers against the 16 MB scoped limit
    while r_rows > 8 and (NY * r_rows * 128 + n_out * r_rows * Lp) * 4 \
            > 3500 * 2 ** 10:
        r_rows //= 2

    out = pl.pallas_call(
        _make_stiff_fields_fused_kernel(d, C, n_last, is_nurbs,
                                        kind=kind),
        grid=(Q12 // r_rows,),
        in_specs=[
            pl.BlockSpec((NY, r_rows, n_last), lambda j: (j * 0, j, j * 0)),
            pl.BlockSpec((6, NT_rows, Lp), lambda j: (j * 0, j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec((n_out, r_rows, Lp),
                               lambda j: (j * 0, j, j * 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, Q12, Lp), jnp.float32),
        interpret=interpret,
    )(Ystack, T)

    grid_shape = tuple(shape12) + (Q_last,)
    if kind == 'jac':
        def pair(k):
            return (out[2 * k, :, :Q_last].reshape(grid_shape),
                    out[2 * k + 1, :, :Q_last].reshape(grid_shape))
        val = [pair(c) for c in range(sdim)]
        jac = [[pair(sdim + c * d + kk) for kk in range(d)]
               for c in range(sdim)]
        return val, jac
    if kind == 'mass':
        return [(out[0, :, :Q_last].reshape(grid_shape),
                 out[1, :, :Q_last].reshape(grid_shape))]
    uniq = {}
    k = 0
    for a in range(sdim):
        for b in range(a, sdim):
            uniq[(a, b)] = (out[2 * k, :, :Q_last].reshape(grid_shape),
                            out[2 * k + 1, :, :Q_last].reshape(grid_shape))
            k += 1
    return [uniq[tuple(sorted((a, b)))]
            for a in range(sdim) for b in range(sdim)]


def stiffness_fields_pallas(geo_inputs, interpret=False, r_rows=256):
    """Stiffness coefficient fields ``B_ab = W (J^-1 J^-T)_ab`` as
    two-float pairs, with the whole elementwise pipeline (det, inverse,
    weight and B products — ~200 fused f32 passes that XLA materializes
    expensively) fused into one elementwise Pallas kernel.  The Jacobian
    itself (per-axis basis contractions) stays in XLA, where it fuses
    well.  Returns the same ``d*d`` term-field list as
    ``assemblers.stiffness_fields_df_pair`` (bitwise-equal arithmetic:
    same pair operations in the same order)."""
    from jax.experimental import pallas as pl
    from .. import assemblers
    from . import geom

    if 'geo_tables_bsp' in geo_inputs or 'geo_tables_nurbs' in geo_inputs:
        # spline/NURBS geometry: fuse the last-axis Jacobian contraction
        # into the kernel as well (the XLA pair contraction materializes
        # every op: ~30 ms on the 3D headline grid, ~1 ms fused)
        return _fields_fused(geo_inputs, 'stiffness', interpret=interpret)

    jp = assemblers._geo_jac_pairs(geo_inputs)
    d = len(jp)
    gw = tf.df_from_f64(geom.gauss_weight_field(geo_inputs['weights']))
    grid_shape = gw[0].shape
    N = int(np.prod(grid_shape))
    assert N % 128 == 0, 'grid size must be a lane multiple'
    rows = N // 128
    while rows % r_rows:
        r_rows //= 2
    if r_rows % 8 and r_rows != rows:
        # Mosaic blocks must tile (8, 128) in the last two dims or equal
        # the array dims; e.g. rows=6 or 12 cannot be blocked legally
        return assemblers.stiffness_fields_df_pair(geo_inputs)

    jac_flat = jnp.stack([c.reshape(rows, 128)
                          for a in range(d) for b in range(d)
                          for c in jp[a][b]])
    gw_flat = jnp.stack([c.reshape(rows, 128) for c in gw])
    n_out = d * (d + 1)        # hi+lo per unique (a, b) pair

    out = pl.pallas_call(
        _make_stiff_fields_kernel(d),
        grid=(rows // r_rows,),
        in_specs=[
            pl.BlockSpec((2 * d * d, r_rows, 128),
                         lambda j: (j * 0, j, j * 0)),
            pl.BlockSpec((2, r_rows, 128), lambda j: (j * 0, j, j * 0)),
        ],
        out_specs=pl.BlockSpec((n_out, r_rows, 128),
                               lambda j: (j * 0, j, j * 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, rows, 128), jnp.float32),
        interpret=interpret,
    )(jac_flat, gw_flat)

    uniq = {}
    k = 0
    for a in range(d):
        for b in range(a, d):
            uniq[(a, b)] = (out[2 * k].reshape(grid_shape),
                            out[2 * k + 1].reshape(grid_shape))
            k += 1
    return [uniq[tuple(sorted((a, b)))]
            for a in range(d) for b in range(d)]


def supported(term_tables, grid_shape, r_block=512):
    """Whether the fused kernel's tiling constraints hold for these chain
    shapes (every intermediate's flattened rest-extent must tile by
    `r_block`, contraction extents by 8)."""
    for tabs in term_tables:
        shape = list(grid_shape)
        for k, T in enumerate(tabs):
            K = shape[0]
            rest = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            Mp = _pad_lanes(T.shape[0])
            # long contraction axes (K > _K_MAX, e.g. large 2D quadrature
            # grids) split into in-VMEM-accumulated K-blocks; only shapes
            # whose K has no multiple-of-8 factorization fall back
            if _pick_blocks(K, rest, Mp, r_block) is None:
                return False
            shape = shape[1:] + [Mp]
    return True


def _chain_group_folded(tables_prepped_per_term, field_pairs, idxs,
                        r_block=512, interpret=False, last_idx=None,
                        dedup_idx=None):
    """Sum of full pair chains over the term group `idxs`, with every
    term's FINAL contraction folded into one kernel (one write of the
    group accumulator instead of one read+write per term — HBM writes
    are the scarce resource, see :func:`_fold_kernel`).  Falls back to
    the aliased per-term accumulation when the fold tiling does not fit.
    Returns ``(padded pair, dims)`` like :func:`_chain_pair_padded`."""
    if _tail_supported([tables_prepped_per_term[t] for t in idxs],
                       [field_pairs[t] for t in idxs]):
        out = _chain_group_tail_fused(tables_prepped_per_term, field_pairs,
                                      idxs, r_block=r_block,
                                      interpret=interpret,
                                      last_idx=last_idx,
                                      dedup_idx=dedup_idx)
        if out is not None:
            return out
    flats, shape_mid, dims_mid = [], None, None
    for t in idxs:
        (hi, lo), dims_mid = _chain_pair_padded(
            tables_prepped_per_term[t][:-1], field_pairs[t],
            r_block=r_block, interpret=interpret)
        K_last = hi.shape[0]
        shape_mid = hi.shape[1:]
        R_rest = int(np.prod(shape_mid)) if shape_mid else 1
        flats.append((hi.reshape(K_last, R_rest),
                      lo.reshape(K_last, R_rest)))

    tc_list, ts_list, term_idx, seen = [], [], [], {}
    for pos, t in enumerate(idxs):
        tc, ts, _M = tables_prepped_per_term[t][-1]
        k = (dedup_idx[-1][pos] if dedup_idx is not None
             else last_idx[pos] if last_idx is not None else id(tc))
        if k not in seen:
            seen[k] = len(tc_list)
            tc_list.append(tc)
            ts_list.append(ts)
        term_idx.append(seen[k])

    M_last = tables_prepped_per_term[idxs[0]][-1][2]
    folded = _stage_call_fold(flats, tc_list, ts_list, tuple(term_idx),
                              r_block=r_block, interpret=interpret)
    if folded is not None:
        oh, ol = folded
        acc = (oh.reshape(shape_mid + (oh.shape[1],)),
               ol.reshape(shape_mid + (ol.shape[1],)))
        dims = list(dims_mid) + [(M_last, oh.shape[1])]
    else:
        acc = None
        for i, t in enumerate(idxs):
            acc, d_last = _chain_pair_padded(
                [tables_prepped_per_term[t][-1]], flats[i], acc=acc,
                r_block=r_block, interpret=interpret)
        acc = tuple(a.reshape(shape_mid + (a.shape[-1],)) for a in acc)
        dims = list(dims_mid) + list(d_last)
    return acc, dims


def last_table_dedup_idx(tables_prepped_per_term, fold_plan):
    """Canonical dedup index of each plan entry's LAST prepped table.

    Must be computed on the HOST side (concrete arrays): inside a jit the
    pytree leaves are distinct tracers, so the ``id()``-based fallback in
    :func:`_chain_group_folded` never dedups and the fold kernel's VMEM
    estimate inflates until the tiling is rejected.  ``id()`` equality is
    valid here because :func:`prepare_table` interns equal tables via its
    content cache.  Pass the result as ``last_idx=`` (a static arg)."""
    seen, out = {}, []
    for t, _m in fold_plan:
        k = id(tables_prepped_per_term[t][-1][0])
        out.append(seen.setdefault(k, len(seen)))
    return tuple(out)


def stage_table_dedup_idx(tables_prepped_per_term, fold_plan):
    """Host-side canonical dedup indices for EVERY stage's tables (the
    all-stage generalization of :func:`last_table_dedup_idx`; the fused
    tail kernel shares stage-2 tables across terms too — without host-side
    indices its in-jit ``id()`` dedup sees distinct tracers, the table
    operands triple, and the real scoped-VMEM use blows past the estimate:
    the r4 A/B compiled an 18.05 MB allocation from a 6.5 MB estimate and
    OOM'd).  Returns one tuple per stage; pass as ``dedup_idx=``."""
    n_stages = len(tables_prepped_per_term[fold_plan[0][0]])
    out = []
    for k in range(n_stages):
        seen, idx = {}, []
        for t, _m in fold_plan:
            key = id(tables_prepped_per_term[t][k][0])
            idx.append(seen.setdefault(key, len(seen)))
        out.append(tuple(idx))
    return tuple(out)


def assemble_terms_folded_pallas(tables_prepped_per_term, field_pairs,
                                 fold_plan, tperms, r_block=512,
                                 interpret=False, last_idx=None,
                                 dedup_idx=None):
    """Folded sum of fused-Pallas pair chains (drop-in for
    :func:`~pyiga_tpu.ops.sumfac.assemble_terms_folded_pair`).  Each
    group's final contractions fold into one kernel writing the group
    accumulator once (:func:`_chain_group_folded`)."""
    def chain_sum(positions):
        idxs = [fold_plan[i][0] for i in positions]
        li = (tuple(last_idx[i] for i in positions)
              if last_idx is not None else None)
        di = (tuple(tuple(d[i] for i in positions) for d in dedup_idx)
              if dedup_idx is not None else None)
        acc, dims = _chain_group_folded(
            tables_prepped_per_term, field_pairs, idxs,
            r_block=r_block, interpret=interpret, last_idx=li,
            dedup_idx=di)
        index = tuple(slice(0, M) for M, _ in dims)
        return acc[0][index], acc[1][index]

    direct = [i for i, (t, m) in enumerate(fold_plan) if not m]
    mirrored = [i for i, (t, m) in enumerate(fold_plan) if m]
    out = chain_sum(direct) if direct else None
    if mirrored:
        sym = chain_sum(mirrored)
        hiT, loT = sym
        for k, p in enumerate(tperms):
            hiT = jnp.take(hiT, p, axis=k)
            loT = jnp.take(loT, p, axis=k)
        sym = tf.df_add(sym, (hiT, loT))
        out = sym if out is None else tf.df_add(out, sym)
    return tf.df_to_f64(out)


def assemble_banded_pair_pallas(tables_prepped_per_term, field_pairs,
                                fold_plan, tperms_banded, bsz, ns,
                                r_block=512, interpret=False,
                                last_idx=None, dedup_idx=None):
    """Folded pair chains over BANDED pair tables: returns the regular
    banded data tensor ``(b_1..b_d, n_1..n_d)`` as an f32 two-float pair —
    never materializing the f64 compact tensor or paying the separate
    compact->banded gather conversion (the solver-facing f64 assembly path).

    `tperms_banded`: per-axis transpose permutations of the PADDED
    banded-flat axes (:func:`~pyiga_tpu.ops.sumfac.banded_transpose_perm`
    extended with identity on the padding rows).  `last_idx` as in
    :func:`assemble_terms_folded_pallas` (host-computed dedup indices,
    aligned with `fold_plan` positions)."""
    def chain_sum(positions):
        idxs = [fold_plan[i][0] for i in positions]
        li = (tuple(last_idx[i] for i in positions)
              if last_idx is not None else None)
        di = (tuple(tuple(d[i] for i in positions) for d in dedup_idx)
              if dedup_idx is not None else None)
        return _chain_group_folded(tables_prepped_per_term, field_pairs,
                                   idxs, r_block=r_block,
                                   interpret=interpret, last_idx=li,
                                   dedup_idx=di)

    direct = [i for i, (t, m) in enumerate(fold_plan) if not m]
    mirrored = [i for i, (t, m) in enumerate(fold_plan) if m]
    out = dims = None
    if direct:
        out, dims = chain_sum(direct)
    if mirrored:
        sym, dims = chain_sum(mirrored)
        hiT, loT = sym
        for k, p in enumerate(tperms_banded):
            hiT = jnp.take(hiT, p, axis=k)
            loT = jnp.take(loT, p, axis=k)
        sym = tf.df_add(sym, (hiT, loT))
        out = sym if out is None else tf.df_add(out, sym)
    index = tuple(slice(0, b * n) for b, n in zip(bsz, ns))
    from . import sumfac as sf
    hi = sf.banded_reorder(out[0][index], bsz, ns)
    lo = sf.banded_reorder(out[1][index], bsz, ns)
    return hi, lo


def assemble_flat_banded_pair_pallas(tables_prepped_per_term, field_pairs,
                                     fold_plan, bws, ns, lay=None,
                                     r_block=512, interpret=False,
                                     last_idx=None, dedup_idx=None):
    """Fused solver-layout assembly: ALL terms chain into ONE accumulator
    ``Z`` (with mirrored terms present the caller prescales the
    direct/self-mirrored terms' tables by 0.5), then the flat matvec
    layout falls out of two static box slices per band combo
    (:func:`~pyiga_tpu.ops.banded.flat_banded_pair_from_padded_chain`),
    fusing the symmetric mirror/combine, the banded reorder and the
    flat-layout embed into one pass.  Exact because each direct term is
    bitwise symmetric (equal banded table rows give bitwise-equal chain
    outputs), so half of it arrives from each slice.

    The terms' final contractions are FOLDED into one kernel
    (:func:`_fold_kernel`) whenever its tiling fits: the compact pair —
    by far the largest array — is then written once instead of being
    read+written per term, which matters because HBM writes are ~6x
    slower than reads on this part."""
    from .banded import flat_banded_pair_from_padded_chain
    terms = [t for t, _m in fold_plan]
    any_mirror = any(m for _t, m in fold_plan)
    acc, _dims = _chain_group_folded(tables_prepped_per_term, field_pairs,
                                     terms, r_block=r_block,
                                     interpret=interpret, last_idx=last_idx,
                                     dedup_idx=dedup_idx)
    return flat_banded_pair_from_padded_chain(
        acc, bws, ns, lay=lay, add_transpose=any_mirror)


def mass_fields_pallas(geo_inputs, interpret=False):
    """Mass coefficient field ``W = gauss_weight * |det J|`` as a
    two-float pair via the fused-geometry kernel (falls back to the XLA
    pair pipeline for host-jacobian inputs)."""
    if 'geo_tables_bsp' in geo_inputs or 'geo_tables_nurbs' in geo_inputs:
        return _fields_fused(geo_inputs, 'mass', interpret=interpret)
    from .. import assemblers
    return assemblers.mass_fields_df_pair(geo_inputs)


def geo_jac_fields_pallas(tables, coeffs, weights, is_nurbs,
                          interpret=False):
    """Physical geometry values + Jacobian as two-float pairs via the
    fused kernel (drop-in for geom.geo_jacobian_field_df's return; inject
    as ``geo_val_pair``/``geo_jac_pair`` into a PairAsmContext so generic
    vform fields skip the materialized XLA pair contraction)."""
    key = 'geo_tables_nurbs' if is_nurbs else 'geo_tables_bsp'
    gi = {key: list(tables), 'geo_coeffs': coeffs,
          'weights': [jnp.asarray(w) for w in weights]}
    return _fields_fused(gi, 'jac', interpret=interpret)


# the fused-fields kernel unrolls the last-axis geometry contraction
# in-kernel (n_last two-float mul/adds per component/axis entry); beyond
# this bound the unroll explodes Mosaic compile time and stack-temporary
# VMEM (the ~4x estimate inflation), while the XLA pair path handles the
# shape fine.  Typical geometry maps have n_last <= 10.
_FUSED_FIELDS_NLAST_MAX = 32


def geo_jac_fields_supported(tables, coeffs):
    """Static tiling check for :func:`geo_jac_fields_pallas`."""
    d = len(tables)
    if d < 2:
        return False
    if coeffs is not None and np.shape(coeffs)[d] > _FUSED_FIELDS_NLAST_MAX:
        return False
    Q12 = int(np.prod([t.shape[1] for t in tables[:d - 1]]))
    return Q12 % 8 == 0
