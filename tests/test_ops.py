import pytest
import numpy as np
import jax
import jax.numpy as jnp

from pyiga_tpu import geometry, solvers
from pyiga_tpu.assemblers import MassAssembler, StiffnessAssembler
from pyiga_tpu.bspline import make_knots
from pyiga_tpu.mlmatrix import MLStructure
from pyiga_tpu.ops.banded import BandedOperator, band_info
from pyiga_tpu.ops.matfree import MatrixFreeOperator


def _setup(p=3, n=5, d=3):
    kvs = d * (make_knots(p, 0.0, 1.0, n),)
    geo = geometry.twisted_box() if d == 3 else geometry.quarter_annulus()
    return kvs, geo


def test_banded_matvec():
    kvs, geo = _setup(p=2, n=6)
    asm = StiffnessAssembler(kvs, geo)
    K = asm.assemble()
    assert band_info(K.structure) == [2, 2, 2]
    x = np.random.rand(K.shape[1])
    y_ref = K.asmatrix() @ x

    # conversion path
    op = BandedOperator.from_mlmatrix(K)
    assert np.allclose(np.asarray(op.matvec(jnp.asarray(x))), y_ref)

    # direct banded assembly path
    op2 = asm.assemble_banded()
    assert np.allclose(np.asarray(op2.matvec(jnp.asarray(x))), y_ref)


def test_banded_rejects_irregular():
    kvm = make_knots(2, 0.0, 1.0, 4, mult=2)
    S = MLStructure.from_kvs((kvm,), (kvm,))
    assert band_info(S) is None


def test_matfree_operator():
    kvs, geo = _setup(p=3, n=5)
    asm = StiffnessAssembler(kvs, geo)
    K = asm.assemble().asmatrix()
    op = MatrixFreeOperator(asm)
    x = np.random.rand(K.shape[1])
    y = np.asarray(op(jnp.asarray(x)))
    assert np.allclose(y, K @ x)

    # restricted operator
    free = np.arange(40, 300)
    opf = MatrixFreeOperator(asm, free_dofs=free)
    yf = np.asarray(opf(jnp.asarray(x[free])))
    assert np.allclose(yf, (K[free][:, free]) @ x[free])


def test_matfree_from_vform_assembler():
    from pyiga_tpu.compile import compile_vform
    from pyiga_tpu.vform import stiffness_vf
    kvs, geo = _setup(p=2, n=6, d=2)
    asm = compile_vform(stiffness_vf(2))(kvs, geo=geo)
    K = asm.assemble().asmatrix()
    op = MatrixFreeOperator(asm)
    x = np.random.rand(K.shape[1])
    assert np.allclose(np.asarray(op(jnp.asarray(x))), K @ x)


def test_matfree_cg_solve():
    kvs, geo = _setup(p=2, n=6)
    K = MatrixFreeOperator(StiffnessAssembler(kvs, geo))
    M = MatrixFreeOperator(MassAssembler(kvs, geo))
    mv = lambda v: K(v) + M(v)
    b = np.random.rand(K.shape[1])
    u, it = solvers.cg_jit(mv, jnp.asarray(b), tol=1e-10, maxiter=2000)
    A = (StiffnessAssembler(kvs, geo).assemble().asmatrix()
         + MassAssembler(kvs, geo).assemble().asmatrix())
    r = np.linalg.norm(A @ np.asarray(u) - b) / np.linalg.norm(b)
    assert r < 1e-8 and int(it) < 2000


def test_flat_banded_matvec_interpret():
    # flat-offset Pallas banded matvec (runs compiled on TPU; interpret
    # here): f32 single and two-float pair, 3D and 2D
    from pyiga_tpu.ops import twofloat as tf
    from pyiga_tpu.ops.banded import (FlatBandedOperator,
                                      FlatBandedOperatorPair,
                                      banded_gather_maps,
                                      banded_from_compact_device)

    # the (3, 2, 31) case drives the inner flat shift past 128
    # (max_inner = 2*2*33 + 4 = 136), exercising the sublane-roll branch
    # of _flat_shift_tiles that the small cases never reach
    for d, p, n in ((3, 1, 4), (2, 2, 6), (3, 2, 31)):
        kvs, geo = _setup(p=p, n=n, d=d)
        asm = StiffnessAssembler(kvs, geo)
        mlm = asm.assemble()
        bws = band_info(asm.structure)
        ns = tuple(b[0] for b in asm.structure.bs)
        bsz = tuple(2 * b + 1 for b in bws)
        maps = [jnp.asarray(m) for m in banded_gather_maps(asm.structure,
                                                           bws)]
        D64 = banded_from_compact_device(jnp.asarray(mlm.data), maps, bsz,
                                         ns)
        x = np.random.RandomState(0).rand(int(np.prod(ns)))
        ref = mlm.asmatrix() @ x

        op = FlatBandedOperator(np.asarray(D64), bws, ns, interpret=True)
        y = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)))
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5

        Dh, Dl = tf.df_from_f64(D64)
        opp = FlatBandedOperatorPair((np.asarray(Dh), np.asarray(Dl)),
                                     bws, ns, interpret=True)
        y2 = np.asarray(opp.matvec(jnp.asarray(x)))
        assert np.abs(y2 - ref).max() / np.abs(ref).max() < 1e-12


def test_flat_banded_blocked_interpret(monkeypatch):
    # the row-blocked kernel variants (x/y streamed per row block; taken
    # above ~500k dofs where the resident kernel's VMEM footprint fails)
    # must match the resident kernel bit-for-bit, with and without the
    # one-time R2/XR pre-padding of D/x (flat_banded_pad_blocked /
    # _embed_x(rows=XR)); the resident kernel must also accept pre-padded
    # D through its row-sliced DMA (shared arrays between hi/lo operators)
    from pyiga_tpu.ops import banded as bd
    from pyiga_tpu.ops import twofloat as tf

    kvs, geo = _setup(p=2, n=9, d=3)
    asm = StiffnessAssembler(kvs, geo)
    mlm = asm.assemble()
    bws = band_info(asm.structure)
    ns = tuple(b[0] for b in asm.structure.bs)
    bsz = tuple(2 * b + 1 for b in bws)
    maps = [jnp.asarray(m) for m in bd.banded_gather_maps(asm.structure,
                                                          bws)]
    D64 = bd.banded_from_compact_device(jnp.asarray(mlm.data), maps, bsz,
                                        ns)
    lay = bd.flat_banded_layout(bws, ns)
    x = np.random.RandomState(1).rand(int(np.prod(ns)))
    ref = mlm.asmatrix() @ x

    def run(op, x, f32=False):
        return np.asarray(op.matvec(
            jnp.asarray(x, jnp.float32 if f32 else None)))

    # small problem: force the blocked route via a tiny VMEM budget, and a
    # row-block size that does NOT divide R so the R2 > R padding is real
    orig_ok = bd._flat_resident_ok
    orig_geom = bd._blocked_geometry
    op_res = bd.FlatBandedOperator(np.asarray(D64), bws, ns,
                                   interpret=True)
    y_res = run(op_res, x, f32=True)
    Dh, Dl = tf.df_from_f64(D64)
    opp_res = bd.FlatBandedOperatorPair((np.asarray(Dh), np.asarray(Dl)),
                                        bws, ns, interpret=True)
    y2_res = run(opp_res, x)

    monkeypatch.setattr(bd, '_flat_resident_ok', lambda *a, **k: False)
    monkeypatch.setattr(bd, '_blocked_geometry',
                        lambda lay_, n_pair, rb_target=512:
                        orig_geom(lay_, n_pair, rb_target=12))
    assert bd._blocked_geometry(lay, 1)['R2'] > lay['R']
    op_blk = bd.FlatBandedOperator(np.asarray(D64), bws, ns,
                                   interpret=True)
    assert op_blk.operands['D3'].shape[1] == \
        bd._blocked_geometry(lay, 1)['R2']        # pre-padded at __init__
    y_blk = run(op_blk, x, f32=True)
    assert np.array_equal(y_blk, y_res)
    opp_blk = bd.FlatBandedOperatorPair((np.asarray(Dh), np.asarray(Dl)),
                                        bws, ns, interpret=True)
    y2_blk = run(opp_blk, x)
    assert np.array_equal(y2_blk, y2_res)
    # unpadded operands still work (in-call pad fallback)
    opp_blk.operands['Dh3'] = opp_blk.operands['Dh3'][:, :lay['R']]
    opp_blk.operands['Dl3'] = opp_blk.operands['Dl3'][:, :lay['R']]
    y2_unp = run(opp_blk, x)
    assert np.array_equal(y2_unp, y2_res)
    monkeypatch.setattr(bd, '_flat_resident_ok', orig_ok)

    # resident kernel fed R2-padded data (shared-array case)
    R2 = bd._blocked_geometry(lay, 1)['R2']
    op_res.operands = {'D3': jnp.pad(
        op_res.operands['D3'], ((0, 0), (0, R2 - lay['R']), (0, 0)))}
    y_res_pad = run(op_res, x, f32=True)
    assert np.array_equal(y_res_pad, y_res)
    np.testing.assert_allclose(y_res, ref, rtol=0, atol=1e-5 * np.abs(
        ref).max())


def test_symmetric_fold():
    # folded assembly (6 of 9 chains + transpose gather) must match unfolded
    for d in (2, 3):
        kvs, geo = _setup(p=3, n=5, d=d)
        asm = StiffnessAssembler(kvs, geo)
        plan, tperms = asm._fold()
        assert plan is not None and any(m for _, m in plan)
        assert len(plan) == d * (d + 1) // 2
        A_fold = asm.assemble().asmatrix()
        try:
            StiffnessAssembler.symmetric_fields = False
            A_ref = StiffnessAssembler(kvs, geo).assemble().asmatrix()
        finally:
            StiffnessAssembler.symmetric_fields = True
        scale = np.abs(A_ref).max()
        assert np.abs(A_fold - A_ref).max() < 1e-14 * scale


def test_banded_from_compact_device():
    from pyiga_tpu.ops.banded import (band_info, banded_from_compact,
                                      banded_from_compact_device,
                                      banded_gather_maps)
    kvs, geo = _setup(p=2, n=6)
    K = StiffnessAssembler(kvs, geo).assemble()
    bws = band_info(K.structure)
    bsz = tuple(2 * b + 1 for b in bws)
    ns = tuple(b[0] for b in K.structure.bs)
    D_host = banded_from_compact(K.data, K.structure, bws)
    maps = banded_gather_maps(K.structure, bws)
    D_dev = banded_from_compact_device(jnp.asarray(K.data), maps, bsz, ns)
    assert np.array_equal(np.asarray(D_dev), D_host)


def test_restricted_operator():
    from pyiga_tpu.ops.banded import (BandedOperator, band_info,
                                      banded_from_compact_device,
                                      banded_gather_maps)
    from pyiga_tpu.ops.fastdiag import interior_dofs
    from pyiga_tpu.ops.matfree import RestrictedOperator
    kvs, geo = _setup(p=3, n=5)
    asm = StiffnessAssembler(kvs, geo)
    K = asm.assemble()
    bws = band_info(K.structure)
    bsz = tuple(2 * b + 1 for b in bws)
    ns = tuple(b[0] for b in K.structure.bs)
    maps = banded_gather_maps(K.structure, bws)
    D = banded_from_compact_device(jnp.asarray(K.data), maps, bsz, ns)
    free = interior_dofs(kvs)
    rop = RestrictedOperator(BandedOperator(D, bws, ns), free,
                             int(np.prod(ns)))
    x = np.random.rand(len(free))
    y = np.asarray(rop(jnp.asarray(x)))
    Aff = K.asmatrix().tocsr()[free][:, free]
    assert np.abs(y - Aff @ x).max() < 1e-12


@pytest.mark.slow
def test_windowed_assembly():
    # windowed pair tables (support-window contraction) match dense assembly
    for d in (2, 3):
        for p in (2, 3):
            kvs, geo = _setup(p=p, n=6, d=d)
            for Asm in (MassAssembler, StiffnessAssembler):
                a = Asm(kvs, geo)
                A_ref = a.assemble().asmatrix()
                A_win = a.assemble_windowed().asmatrix()
                rel = np.abs(A_win - A_ref).max() / np.abs(A_ref).max()
                assert rel < 1e-14


def test_box_restriction():
    from pyiga_tpu.ops.fastdiag import interior_dofs
    from pyiga_tpu.ops.matfree import box_restriction
    kvs, _ = _setup(p=3, n=6)
    ns = tuple(kv.numdofs for kv in kvs)
    free = interior_dofs(kvs)
    assert box_restriction(free, ns) == ((1, 1, 1), (7, 7, 7))
    # non-box sets are rejected
    assert box_restriction(np.array([0, 5, 17]), ns) is None
    sub = np.delete(free, 3)
    assert box_restriction(sub, ns) is None


@pytest.mark.slow
def test_ozaki_assembly():
    # Ozaki-split (bf16 chunk) f64 contraction matches the exact f64 chains
    # far inside the 1e-10 entry-parity target
    from pyiga_tpu.ops import sumfac
    for d in (2, 3):
        kvs, geo = _setup(p=3, n=5, d=d)
        asm = StiffnessAssembler(kvs, geo)
        tt = [[jnp.asarray(t) for t in tabs]
              for tabs in asm.tables.term_tables(asm.terms)]
        gi = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)),
                                    asm._geo_inputs)
        fields = asm.field_fn(gi)
        plan, tperms = asm._fold()
        tperms = [jnp.asarray(p) for p in tperms]
        ref = sumfac.assemble_terms_folded(tt, fields, tuple(plan), tperms)
        oz = sumfac.assemble_terms_folded(tt, fields, tuple(plan), tperms,
                                          mode='ozaki')
        rel = float(jnp.max(jnp.abs(oz - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 5e-13

    # raw contraction chain on data with per-row dynamic range
    rng = np.random.RandomState(3)
    tabs = [jnp.asarray(rng.randn(20, 12) * np.exp(rng.randn(20, 1)))
            for _ in range(3)]
    X = jnp.asarray(rng.randn(12, 12, 12) * np.exp(rng.randn(12, 1, 1)))
    ref = sumfac.contract_chain(tabs, X)
    oz = sumfac.contract_chain_ozaki(tabs, X)
    assert float(jnp.max(jnp.abs(oz - ref)) / jnp.max(jnp.abs(ref))) < 1e-12


def test_twofloat():
    from pyiga_tpu.ops import twofloat as tf
    rng = np.random.RandomState(0)
    x = rng.randn(20000) * np.exp(2 * rng.randn(20000))
    y = rng.randn(20000) * np.exp(2 * rng.randn(20000))
    X, Y = jnp.asarray(x), jnp.asarray(y)
    a, b = tf.df_from_f64(X), tf.df_from_f64(Y)

    def rel(v, ref):
        return float(jnp.max(jnp.abs(v - ref) / jnp.abs(ref)))
    assert rel(tf.df_to_f64(tf.df_mul(a, b)), X * Y) < 1e-13
    assert rel(tf.df_to_f64(tf.df_div(a, b)), X / Y) < 1e-13
    assert rel(tf.df_to_f64(tf.df_abs(a)), jnp.abs(X)) < 1e-14
    # addition: accuracy limited only by the 48-bit input representation
    s = tf.df_to_f64(tf.df_add(a, b))
    assert float(jnp.max(jnp.abs(s - (X + Y)) /
                         jnp.maximum(jnp.abs(X), jnp.abs(Y)))) < 1e-13


@pytest.mark.slow
def test_pair_chain_assembly():
    # pair-chained Ozaki assembly (f32 pairs end to end) matches exact f64
    from pyiga_tpu.ops import sumfac, twofloat as tf
    from pyiga_tpu.assemblers import (stiffness_fields,
                                      stiffness_fields_df_pair)
    for d in (2, 3):
        kvs, geo = _setup(p=3, n=5, d=d)
        asm = StiffnessAssembler(kvs, geo)
        gi = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)),
                                    asm._geo_inputs)
        tt = [[jnp.asarray(t) for t in tabs]
              for tabs in asm.tables.term_tables(asm.terms)]
        plan, tperms = asm._fold()
        tperms = [jnp.asarray(p) for p in tperms]
        ref = sumfac.assemble_terms_folded(tt, stiffness_fields(gi),
                                           tuple(plan), tperms)
        pair = sumfac.assemble_terms_folded_pair(
            tt, stiffness_fields_df_pair(gi), tuple(plan), tperms)
        rel = float(jnp.max(jnp.abs(pair - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 1e-13

    # the pair slicer reconstructs exactly on data including values whose
    # f32 rounding sits at power-of-2 boundaries (the exp2/frexp trap)
    rng = np.random.RandomState(1)
    V = jnp.asarray(np.concatenate([rng.randn(50) * np.exp(3*rng.randn(50)),
                                    [1.0, -2.0, 0.5 - 2**-30, 2**-20, 0.0]]))
    hi, lo = tf.df_from_f64(V)
    ch, s = sumfac._ozaki_slice_pair(hi[None], lo[None], 1)
    rec = sum(c.astype(jnp.float64) for c in ch) * s.astype(jnp.float64)
    err = float(jnp.max(jnp.abs(rec[0] - V)))
    assert err < 1e-14 * float(jnp.max(jnp.abs(V)))


def test_fastdiag_weighted():
    # geometry-averaged 1D coefficients must converge strictly faster than
    # the parametric fastdiag on a strongly mapped geometry, to the same
    # solution
    from pyiga_tpu.ops.fastdiag import (fastdiag_precond,
                                        fastdiag_precond_weighted,
                                        interior_dofs)
    kvs, geo = _setup(p=3, n=8)
    asm = StiffnessAssembler(kvs, geo)
    free = interior_dofs(kvs)
    op = MatrixFreeOperator(asm, free_dofs=free, dtype=np.float64)
    b = np.random.RandomState(0).rand(len(free))
    P0 = fastdiag_precond(kvs, dirichlet=True)
    Pw = fastdiag_precond_weighted(asm, dirichlet=True)
    x0, it0 = solvers.cg_jit(op, jnp.asarray(b), tol=1e-10, maxiter=500,
                             precond=P0)
    xw, itw = solvers.cg_jit(op, jnp.asarray(b), tol=1e-10, maxiter=500,
                             precond=Pw)
    assert int(itw) < int(it0)
    K = asm.assemble().asmatrix().tocsr()[free][:, free]
    r = np.linalg.norm(K @ np.asarray(xw) - b) / np.linalg.norm(b)
    assert r < 1e-9


def test_twofloat_special_values():
    from pyiga_tpu.ops import twofloat as tf
    vals = np.array([0.0, -0.0, 1.0, -1.0, 2.0**-30, -(2.0**30),
                     0.5 - 2.0**-30, 1.0 + 2.0**-40, np.pi, -np.e])
    X = jnp.asarray(vals)
    a = tf.df_from_f64(X)
    # representation round trip: exact to the 48-bit pair precision
    aX = tf.df_to_f64(a)
    assert float(jnp.max(jnp.abs(aX - X))) < 2.0**-47 * float(jnp.max(jnp.abs(X)))
    # values with <= 48 significant bits round-trip exactly
    assert float(jnp.max(jnp.abs(aX[:7] - X[:7]))) == 0.0
    # x * 1, x + 0, x / 1 reproduce the represented value exactly
    one = tf.df_from_f64(jnp.ones_like(X))
    zero = tf.df_from_f64(jnp.zeros_like(X))
    assert float(jnp.max(jnp.abs(tf.df_to_f64(tf.df_mul(a, one)) - aX))) == 0.0
    assert float(jnp.max(jnp.abs(tf.df_to_f64(tf.df_add(a, zero)) - aX))) == 0.0
    assert float(jnp.max(jnp.abs(tf.df_to_f64(tf.df_div(a, one)) - aX))) == 0.0
    # x - x == 0 exactly
    assert float(jnp.max(jnp.abs(tf.df_to_f64(tf.df_sub(a, a))))) == 0.0


def test_ozaki_chunk_ladder():
    # documented accuracy ladder of the pair chain vs chunk count
    from pyiga_tpu.ops import sumfac, twofloat as tf
    rng = np.random.RandomState(5)
    tabs = [jnp.asarray(rng.randn(14, 12)) for _ in range(2)]
    X = jnp.asarray(rng.randn(12, 12) * np.exp(rng.randn(12, 1)))
    ref = sumfac.contract_chain(tabs, X)
    for L, tol in [(7, 1e-12), (6, 1e-10), (5, 1e-8)]:
        got = tf.df_to_f64(sumfac.contract_chain_ozaki_pair(
            tabs, tf.df_from_f64(X), L=L))
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < tol


@pytest.mark.slow
def test_ozaki_long_contraction_split():
    # contraction lengths K > 2^(24-2w) = 256 violate the exact-f32-
    # accumulation condition; the contraction must split the axis into
    # exactness-preserving blocks (ADVICE r1) and keep full accuracy
    from pyiga_tpu.ops import sumfac, twofloat as tf
    rng = np.random.RandomState(11)
    K = 700     # > 2 * _OZAKI_MAX_K: exercises multiple blocks
    A = jnp.asarray(rng.randn(9, K) * np.exp(rng.randn(9, 1)))
    X = jnp.asarray(rng.randn(K, 7) * np.exp(rng.randn(K, 1)))
    ref = jnp.tensordot(X, A, axes=(0, 1)).swapaxes(0, 1)
    oz = sumfac._ozaki_contract_axis(X, 0, A)
    rel = float(jnp.max(jnp.abs(oz - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-12

    pr = tf.df_to_f64(sumfac._ozaki_contract_axis_pair(
        tf.df_from_f64(X), 0, A))
    rel = float(jnp.max(jnp.abs(pr - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-12


@pytest.mark.slow
def test_pair_assembly_mass_and_nurbs():
    # the f64 fast path (two-float fields + pair-chained Ozaki) must cover
    # mass assembly and NURBS geometries (quarter_annulus is exact NURBS)
    from pyiga_tpu.assemblers import MassAssembler, StiffnessAssembler
    from pyiga_tpu import geometry
    from pyiga_tpu.bspline import make_knots

    for d, geo in ((2, geometry.quarter_annulus()),
                   (3, geometry.twisted_box())):
        kvs = d * (make_knots(3, 0.0, 1.0, 4),)
        for cls in (MassAssembler, StiffnessAssembler):
            asm = cls(kvs, geo)
            exact = asm.assemble(mode='exact').data
            fast = asm.assemble(mode='ozaki').data
            rel = np.abs(fast - exact).max() / np.abs(exact).max()
            assert rel < 1e-12, (cls.__name__, d, rel)


def test_pallas_chain_interpret():
    # fused Pallas pair-chain (interpret mode): validates the kernel's
    # slicing/dot/combine plumbing against the exact f64 chain.  On real
    # TPU hardware the kernel matches the XLA pair chain to the pair
    # error bound (n=48 stiffness parity 1e-13; the nearest-rounding
    # split means bitwise equality is NOT guaranteed); the interpreter
    # tolerance is loose because the CPU backend compiles error-free f32
    # transformations unreliably (see conftest).
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops import sumfac, twofloat as tf

    rng = np.random.RandomState(0)
    Q, M, d = 128, 40, 2
    tabs = [rng.rand(M, Q) * np.exp(rng.randn(M, Q)) for _ in range(d)]
    X64 = rng.rand(*(d * (Q,))) * np.exp(rng.randn(*(d * (Q,))))
    ref = sumfac.contract_chain([jnp.asarray(t) for t in tabs],
                                jnp.asarray(X64))
    prepped = [ps.prepare_table(t) for t in tabs]
    hi, lo = ps.chain_pair(prepped, tf.df_from_f64(jnp.asarray(X64)),
                           r_block=128, interpret=True)
    got = np.asarray(tf.df_to_f64((hi, lo)))
    assert got.shape == (M, M)
    rel = np.abs(got - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 1e-6


def test_pallas_supported_shapes():
    from pyiga_tpu.ops import pallas_sumfac as ps
    T = np.zeros((336, 192))
    assert ps.supported([[T, T, T]], (192, 192, 192))
    assert not ps.supported([[T, T, T]], (100, 100, 100))   # K not /8
    # K > _K_MAX splits into in-VMEM-accumulated blocks (2D n=128 config)
    big = np.zeros((900, 512))
    assert ps.supported([[big, big]], (512, 512))
    assert ps._pick_blocks(512, 512, 1024, 512)[2] == 256


def test_banded_pair_matvec():
    # two-float banded matvec matches the f64 banded matvec
    from pyiga_tpu.ops.banded import BandedOperator, BandedOperatorPair

    kvs, geo = _setup(p=2, n=6, d=2)
    from pyiga_tpu.assemblers import StiffnessAssembler
    asm = StiffnessAssembler(kvs, geo)
    mlm = asm.assemble(mode='exact')
    op = BandedOperator.from_mlmatrix(mlm)
    x = np.random.RandomState(0).rand(op.shape[1])
    y_ref = np.asarray(op.matvec(jnp.asarray(x)))
    opp = BandedOperatorPair(None, op.bws, op.ns)
    opp.set_data_f64(jnp.asarray(op.D))
    y = np.asarray(opp.matvec(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-9


def test_cg_ir_deferred_info():
    from pyiga_tpu.assemblers import MassAssembler
    from pyiga_tpu.ops.matfree import MatrixFreeOperator
    kvs, geo = _setup(p=2, n=6, d=2)
    asm = MassAssembler(kvs, geo)
    op = MatrixFreeOperator(asm)
    op32 = MatrixFreeOperator(asm, dtype=np.float32)
    b = np.random.RandomState(1).rand(op.shape[0])
    x, info_dev = solvers.cg_ir(op, op32, b, tol=1e-10, fetch_info=False)
    info = solvers.cg_ir_info(info_dev)
    assert info['residual'] < 1e-10
    M = asm.assemble().asmatrix()
    r = np.linalg.norm(M @ np.asarray(x) - b) / np.linalg.norm(b)
    assert r < 1e-9


@pytest.mark.slow
def test_pallas_folded_assembly_interpret():
    # accumulating folded Pallas assembly (interpret mode) matches the
    # exact f64 assembly of a small stiffness problem; loose tolerance
    # because the CPU backend compiles EFT f32 graphs unreliably (on TPU
    # hardware the path is verified at 1e-13, see pallas_sumfac)
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops import twofloat as tf
    from pyiga_tpu.assemblers import (StiffnessAssembler,
                                      stiffness_fields_df_pair)

    kvs, geo = _setup(p=3, n=5, d=2)        # Q=20 -> pad to lane multiples?
    kvs = 2 * (make_knots(3, 0.0, 1.0, 32),)
    asm = StiffnessAssembler(kvs, geo)
    exact = asm.assemble(mode='exact').data
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), asm._geo_inputs)
    tt_np = asm.tables.term_tables(asm.terms)
    fold_plan, tperms = asm._fold()
    gshape = tuple(len(g) for g in asm.grid)
    if not ps.supported(tt_np, gshape, r_block=128):
        import pytest
        pytest.skip('shapes do not tile for the fused kernel')
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in tt_np]
    F = stiffness_fields_df_pair(gi)
    got = np.asarray(ps.assemble_terms_folded_pallas(
        prepped, F, tuple(fold_plan), [jnp.asarray(p) for p in tperms],
        r_block=128, interpret=True))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 1e-5


def test_pallas_kblock_split_interpret():
    # long contraction axis (K=512 > _K_MAX) splits into K-blocks that
    # accumulate in VMEM with two-float adds; result must stay at pair
    # accuracy (the 2D n=128 headline shape hits this path)
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops import twofloat as tf

    rng = np.random.RandomState(3)
    K, R, M = 512, 512, 7
    X = rng.rand(K, R) * 2 - 1
    T = rng.rand(M, K) * 2 - 1
    pair = tf.df_from_f64(jnp.asarray(X))
    tc, ts, _ = ps.prepare_table(T)
    assert ps._pick_blocks(K, R, ps._pad_lanes(M), 512)[2] == 256
    oh, ol = ps._stage_call(pair[0], pair[1], tc, ts, interpret=True)
    out = np.asarray(oh.astype(np.float64) + ol.astype(np.float64))[:, :M]
    ref = (T @ X).T
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.slow
def test_banded_pair_assembly_pallas_interpret():
    # solver-layout assembly: pair chains over banded tables -> pair
    # mirror/combine -> banded (b..., n...) pair, never materializing the
    # f64 compact tensor (the bench f64 path; compiled on TPU, interpret
    # here)
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops import sumfac
    from pyiga_tpu.ops import twofloat as tf
    from pyiga_tpu.ops.banded import (band_info, banded_gather_maps,
                                      banded_from_compact_device)

    # smallest shape the stage kernel tiles: K = n*nqp = 128, rest >= 128
    kvs, geo = _setup(p=3, n=32, d=2)
    asm = StiffnessAssembler(kvs, geo)
    bws = band_info(asm.structure)
    ns = tuple(b[0] for b in asm.structure.bs)
    bsz = tuple(2 * b + 1 for b in bws)
    plan = tuple(asm._fold()[0])
    btabs = asm.tables.banded_term_tables(asm.terms, bws)
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in btabs]
    tperms = []
    for bw, n in zip(bws, ns):
        pcore = sumfac.banded_transpose_perm(n, bw)
        Mp = ps._pad_lanes(len(pcore))
        full = np.arange(Mp)
        full[:len(pcore)] = pcore
        tperms.append(jnp.asarray(full))
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float64))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), asm._geo_inputs)
    from pyiga_tpu.assemblers import stiffness_fields_df_pair
    F = stiffness_fields_df_pair(gi)
    Dh, Dl = ps.assemble_banded_pair_pallas(prepped, F, plan, tperms,
                                            bsz, ns, interpret=True)
    got = np.asarray(Dh, np.float64) + np.asarray(Dl, np.float64)

    mlm = asm.assemble(mode='exact')
    maps = [jnp.asarray(m) for m in banded_gather_maps(asm.structure, bws)]
    ref = np.asarray(banded_from_compact_device(jnp.asarray(mlm.data),
                                                maps, bsz, ns))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12

@pytest.mark.slow
def test_flat_banded_pair_assembly_pallas_interpret():
    # fully fused solver-layout assembly: ALL terms into ONE accumulator
    # (direct tables prescaled by 0.5), then two static box slices per
    # band combo produce the flat matvec layout directly (the bench f64
    # headline path; compiled on TPU, interpret here)
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops.banded import (band_info, flat_banded_data,
                                      flat_banded_layout)

    kvs, geo = _setup(p=3, n=32, d=2)
    asm = StiffnessAssembler(kvs, geo)
    bws = band_info(asm.structure)
    ns = tuple(b[0] for b in asm.structure.bs)
    lay = flat_banded_layout(tuple(bws), ns)
    plan = tuple(asm._fold()[0])
    btabs = asm.tables.banded_term_tables(asm.terms, bws)
    direct_set = {t for t, m in plan if not m}
    btabs = [[0.5 * tabs[0]] + list(tabs[1:]) if t in direct_set else tabs
             for t, tabs in enumerate(btabs)]
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in btabs]
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float64))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), asm._geo_inputs)
    from pyiga_tpu.assemblers import stiffness_fields_df_pair
    F = stiffness_fields_df_pair(gi)
    H, L = ps.assemble_flat_banded_pair_pallas(prepped, F, plan, bws, ns,
                                               lay, interpret=True)
    got = np.asarray(H, np.float64) + np.asarray(L, np.float64)

    mlm = asm.assemble(mode='exact')
    bsz = tuple(2 * b + 1 for b in bws)
    D = np.zeros(bsz + ns)
    from pyiga_tpu.ops.banded import (banded_gather_maps,
                                      banded_from_compact_device)
    maps = [jnp.asarray(m) for m in banded_gather_maps(asm.structure, bws)]
    D = np.asarray(banded_from_compact_device(jnp.asarray(mlm.data), maps,
                                              bsz, ns))
    ref = flat_banded_data(D, bws, ns)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12

@pytest.mark.slow
def test_stiffness_fields_fused_interpret():
    # fused-geometry fields kernel (in-kernel last-axis Jacobian
    # contraction): B-spline 3D and NURBS 2D vs the XLA pair fields.
    # Tolerance note: on the REAL TPU this path measures 8e-15 relative;
    # the loose bound here covers the local XLA:CPU pipeline, which
    # miscompiles large fused two-float programs (documented ~1e-7, see
    # sumfac.run_matrix_assembly_pair) under the interpret-mode jit.
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.assemblers import stiffness_fields_df_pair

    for d, n in ((3, 6), (2, 16)):
        kvs, geo = _setup(p=3, n=n, d=d)
        asm = StiffnessAssembler(kvs, geo)
        gi = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float64))
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a), asm._geo_inputs)
        assert 'geo_tables_bsp' in gi or 'geo_tables_nurbs' in gi
        ref = stiffness_fields_df_pair(gi)
        got = ps._fields_fused(gi, 'stiffness', interpret=True)
        # global scale: structurally-zero off-diagonal fields carry only
        # rounding noise (~1e-18) and have no meaningful per-field scale
        sc = max(np.abs(np.asarray(rh, np.float64)
                        + np.asarray(rl, np.float64)).max()
                 for rh, rl in ref)
        for (gh, gl), (rh, rl) in zip(got, ref):
            G = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)
            R = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
            assert np.abs(G - R).max() / sc < 1e-5

        # mass variant: W = gw |det J| through the same fused kernel
        from pyiga_tpu.assemblers import mass_fields_df_pair
        (rh, rl), = mass_fields_df_pair(gi)
        (gh, gl), = ps._fields_fused(gi, 'mass', interpret=True)
        R = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        G = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)
        assert np.abs(G - R).max() / np.abs(R).max() < 1e-5


def test_pallas_block_picks_headline():
    # static policy regression for the 3D n=48 headline shapes: full K
    # always; full-width M (no x refetch, contiguous row writes) since the
    # chunk-ordered tables made it fit VMEM
    from pyiga_tpu.ops import pallas_sumfac as ps

    r, m, kb = ps._pick_blocks(192, 36864, 384, 512)      # stage kernel
    assert kb == 192 and m == 384 and r >= 128
    assert ps._vmem_bytes(kb, r, m) <= ps._VMEM_BUDGET

    picks = ps._pick_blocks_fold(192, 147456, 384, 512, 6, 2)   # fold
    assert picks is not None
    rf, mf, kf = picks
    assert kf == 192 and mf == 384
    assert ps._vmem_bytes_fold(kf, rf, mf, 6, 2) <= ps._VMEM_BUDGET_FOLD

    # long-K 2D shapes still split into <=384 blocks
    assert ps._pick_kblock(512) == 256


def test_tail_fused_dedup_under_jit():
    # r4 A/B regression: with prepped tables passed as JIT OPERANDS the
    # in-kernel id() dedup sees distinct tracers, the tail kernel's table
    # operands triple, and the real scoped VMEM blows past the estimate
    # (compiled 18.05MB from a 6.5MB estimate and OOM'd on hardware).
    # stage_table_dedup_idx threads host-side indices through; the spy
    # asserts the tail call receives the DEDUPED table lists under jit.
    import jax
    import jax.numpy as jnp
    from pyiga_tpu.assemblers import StiffnessAssembler, \
        stiffness_fields_df_pair
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops.banded import band_info

    kvs, geo = _setup(p=3, n=8, d=3)
    asm = StiffnessAssembler(kvs, geo)
    bws = band_info(asm.structure)
    plan = tuple(asm._fold()[0])
    btabs = asm.tables.banded_term_tables(asm.terms, bws)
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in btabs]
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float64))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), asm._geo_inputs)
    F = stiffness_fields_df_pair(gi)
    terms = [t for t, _m in plan]
    dedup_idx = ps.stage_table_dedup_idx(prepped, plan)
    # the headline-form stage tables are genuinely shared across terms
    assert max(dedup_idx[0]) + 1 < len(plan)

    calls = []
    orig_call = ps._tail_fused_call

    def spy(x1T, tc2, ts2, idx2, tc3, ts3, idx3, **kw):
        calls.append((len(tc2), len(tc3)))
        return orig_call(x1T, tc2, ts2, idx2, tc3, ts3, idx3, **kw)

    old = ps._TAIL_FUSED
    try:
        ps._TAIL_FUSED = True
        ps._tail_fused_call = spy
        parrs = [[(c, s) for (c, s, _M) in tabs] for tabs in prepped]
        Ms = [[M for (_c, _s, M) in tabs] for tabs in prepped]

        def run(parrs, F):
            tp = [[(c, s, M) for ((c, s), M) in zip(ta, Ma)]
                  for ta, Ma in zip(parrs, Ms)]
            (h, l), _dims = ps._chain_group_folded(
                tp, F, terms, interpret=True, dedup_idx=dedup_idx)
            return h, l
        jax.jit(run)(parrs, list(F))
    finally:
        ps._TAIL_FUSED = old
        ps._tail_fused_call = orig_call
    assert calls, 'tail-fused path was not reached'
    n2, n3 = calls[0]
    assert n2 == max(dedup_idx[1]) + 1
    assert n3 == max(dedup_idx[2]) + 1


@pytest.mark.slow
def test_tail_fused_bitwise_interpret():
    # fused stage2+fold kernel vs the two-call pipeline: BITWISE equal
    # (identical chunk schedules; exact f32 accumulation throughout)
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops.banded import band_info
    from pyiga_tpu.assemblers import stiffness_fields_df_pair

    kvs, geo = _setup(p=3, n=8, d=3)
    asm = StiffnessAssembler(kvs, geo)
    bws = band_info(asm.structure)
    plan = tuple(asm._fold()[0])
    btabs = asm.tables.banded_term_tables(asm.terms, bws)
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in btabs]
    gi = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float64))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), asm._geo_inputs)
    F = stiffness_fields_df_pair(gi)
    terms = [t for t, _m in plan]
    last_idx = tuple(id(prepped[t][-1][0]) for t, _m in plan)

    assert ps._tail_supported([prepped[t] for t in terms],
                              [F[t] for t in terms]) is False  # default off
    old = ps._TAIL_FUSED
    try:
        (h0, l0), dims0 = ps._chain_group_folded(prepped, F, terms,
                                                 interpret=True,
                                                 last_idx=last_idx)
        ps._TAIL_FUSED = True
        assert ps._tail_supported([prepped[t] for t in terms],
                                  [F[t] for t in terms])
        (h1, l1), dims1 = ps._chain_group_folded(prepped, F, terms,
                                                 interpret=True,
                                                 last_idx=last_idx)
    finally:
        ps._TAIL_FUSED = old
    assert dims0 == dims1
    assert np.array_equal(np.asarray(h0), np.asarray(h1))
    assert np.array_equal(np.asarray(l0), np.asarray(l1))


def test_folded_pallas_dedup_reaches_fold():
    # last_table_dedup_idx must be computed host-side and threaded into the
    # fold kernel: under jit the id()-based fallback sees only tracers and
    # dedups nothing, inflating the fold's VMEM estimate until the tiling
    # is rejected (silently disabling the single-write fold).
    from pyiga_tpu.ops import pallas_sumfac as ps
    from pyiga_tpu.ops import twofloat as tf
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    Q, M = 64, 24
    tabA, tabB = rng.rand(M, Q), rng.rand(M, Q)
    terms = [[tabA, tabA], [tabA, tabB], [tabB, tabA]]
    prepped = [[ps.prepare_table(T) for T in tabs] for tabs in terms]
    plan = ((0, False), (1, False), (2, False))
    last_idx = ps.last_table_dedup_idx(prepped, plan)
    assert last_idx == (0, 1, 0)

    calls = []
    orig = ps._stage_call_fold

    def spy(x_pairs, tc_list, ts_list, term_idx, **kw):
        calls.append((len(x_pairs), len(tc_list), tuple(term_idx)))
        return orig(x_pairs, tc_list, ts_list, term_idx, **kw)

    ps._stage_call_fold = spy
    try:
        F = [tf.df_from_f64(jnp.asarray(rng.rand(Q, Q))) for _ in range(3)]
        out = ps.assemble_terms_folded_pallas(prepped, F, plan, [],
                                              interpret=True,
                                              last_idx=last_idx)
    finally:
        ps._stage_call_fold = orig
    assert calls and calls[0] == (3, 2, (0, 1, 0))
    exact = 0
    for i, tabs in enumerate(terms):
        f = np.asarray(tf.df_to_f64(F[i]))
        exact = exact + tabs[0] @ f @ tabs[1].T
    assert abs(np.asarray(out) - exact).max() / abs(exact).max() < 1e-12
