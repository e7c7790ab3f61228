"""Emulation-free f64 fast path for *generic* compiled vforms.

``assemble(..., mode='ozaki')`` upgrades to two-float (pair) field
evaluation whenever the form supports it (compile.PairAsmContext): the
coefficient fields evaluate in fused f32 pair arithmetic and the
contractions run pair-chained Ozaki — zero emulated-f64 elementwise ops on
TPU.  This matches the treatment the reference's codegen gives every form
(/root/reference/pyiga/codegen/cython.py:673 precompute_fields).

All cases assert <= 1e-10 entry parity against the exact-f64 path (measured
~1e-14)."""

import pytest
import numpy as np

from pyiga_tpu import assemble, bspline, geometry
from pyiga_tpu import vform as vf_mod
from pyiga_tpu.compile import compile_vform


def _kvs(p=3, n=8, d=2):
    return d * (bspline.make_knots(p, 0.0, 1.0, n),)


def _parity(Ae, Ap, tol=1e-10):
    err = abs(Ae - Ap).max() / abs(Ae).max()
    assert err < tol, err
    return err


@pytest.mark.slow
def test_pair_vform_convdiff_nurbs():
    # VERDICT r2 done-criterion: a NURBS-geometry convection-diffusion
    # string form at <= 1e-10 parity via the pair path
    kvs = _kvs()
    geo = geometry.quarter_annulus()        # exact NURBS
    form = '(inner(grad(u), grad(v)) + dot(b, grad(u)) * v + u * v) * dx'
    b = np.array([3.0, -2.0])
    Ae = assemble.assemble(form, kvs, geo=geo, b=b, mode='exact')
    Ap = assemble.assemble(form, kvs, geo=geo, b=b, mode='ozaki')
    _parity(Ae, Ap)


def test_pair_vform_mass_and_fold():
    kvs = _kvs()
    geo = geometry.quarter_annulus()
    for form in ('u * v * dx', 'inner(grad(u), grad(v)) * dx'):
        Ae = assemble.assemble(form, kvs, geo=geo, mode='exact')
        Ap = assemble.assemble(form, kvs, geo=geo, mode='ozaki')
        _parity(Ae, Ap)


def test_pair_vform_geometry_values():
    # geometry *values* (the x shorthand) through the pair context
    kvs = _kvs()
    geo = geometry.quarter_annulus()
    form = '(1.0 + x[0] * x[1]) * u * v * dx'
    Ae = assemble.assemble(form, kvs, geo=geo, mode='exact')
    Ap = assemble.assemble(form, kvs, geo=geo, mode='ozaki')
    _parity(Ae, Ap)


def test_pair_vform_input_field():
    # named coefficient input evaluated on the grid, split host-side
    kvs = _kvs()
    geo = geometry.bspline_quarter_annulus()
    coef = lambda x, y: 1.0 + x * y
    Ae = assemble.assemble('c * u * v * dx', kvs, geo=geo, c=coef,
                           mode='exact')
    Ap = assemble.assemble('c * u * v * dx', kvs, geo=geo, c=coef,
                           mode='ozaki')
    _parity(Ae, Ap)


def test_pair_vform_heat_st():
    kvs = _kvs()
    geo = geometry.quarter_annulus()
    asm = compile_vform(vf_mod.heat_st_vf(2))(kvs, geo=geo)
    assert asm._supports_pair_eval()
    Ae = asm.assemble(mode='exact').asmatrix()
    Ap = asm.assemble(mode='ozaki').asmatrix()
    _parity(Ae, Ap)


def test_pair_vform_boundary_sqrt():
    # boundary integral: SW = gw * norm(...) exercises the two-float sqrt
    kvs = _kvs()
    geo = geometry.quarter_annulus()
    Ae = assemble.assemble('u * v * ds', kvs, geo=geo, boundary='left',
                           mode='exact')
    Ap = assemble.assemble('u * v * ds', kvs, geo=geo, boundary='left',
                           mode='ozaki')
    _parity(Ae, Ap)


@pytest.mark.slow
def test_pair_vform_vector_blocks():
    kvs = _kvs()
    geo = geometry.quarter_annulus()
    asm = compile_vform(vf_mod.divdiv_vf(2))(kvs, geo=geo)
    assert asm._supports_pair_eval()
    Be = asm.assemble(mode='exact')
    Bp = asm.assemble(mode='ozaki')
    for k in Be:
        e, p = Be[k].data, Bp[k].data
        err = np.abs(e - p).max() / np.abs(e).max()
        assert err < 1e-10, (k, err)


@pytest.mark.slow
def test_pair_vform_gating():
    # transcendental builtins and geometry Hessians have no two-float
    # implementation: the pair upgrade must be refused (and mode='ozaki'
    # still assemble correctly through the f64-field Ozaki path)
    kvs = _kvs(n=6)
    geo = geometry.quarter_annulus()

    asm = compile_vform(vf_mod.parse_vf('exp(x[0]) * u * v * dx', kvs,
                                        args={'geo': geo}))(kvs, geo=geo)
    assert not asm._supports_pair_eval()
    _parity(asm.assemble(mode='exact').asmatrix(),
            asm.assemble(mode='ozaki').asmatrix(), tol=1e-9)

    asm2 = compile_vform(vf_mod.parse_vf('inner(hess(u), hess(v)) * dx',
                                         kvs, args={'geo': geo}))(
        kvs, geo=geo)
    assert not asm2._supports_pair_eval()
    _parity(asm2.assemble(mode='exact').asmatrix(),
            asm2.assemble(mode='ozaki').asmatrix(), tol=1e-9)


def test_pair_fields_pallas_interpret():
    # the fused generic-fields kernel evaluates every combo's two-float
    # field in one elementwise Pallas kernel; arithmetic is the same
    # PairAsmContext trace, so parity with the op-by-op XLA evaluation is
    # bitwise on TPU (loose here: the local XLA:CPU pipeline miscompiles
    # large fused two-float programs, see PLAN.md)
    import jax
    import jax.numpy as jnp

    kvs = _kvs(p=3, n=8)
    geo = geometry.quarter_annulus()        # exact NURBS
    form = '(inner(grad(u), grad(v)) + dot(b, grad(u)) * v + u * v) * dx'
    from pyiga_tpu.assemble import instantiate_assembler
    asm = instantiate_assembler(form, kvs, {'geo': geo,
                                            'b': np.array([3.0, -2.0])},
                                None, None)
    inputs = jax.tree_util.tree_map(jnp.asarray, asm._device_inputs_pair())

    # reference: eager op-by-op pair evaluation (avoids the CPU fused-jit
    # miscompile of error-free transformations)
    ref = asm._eval_combo_fields_pair(inputs, asm.combos)

    fn = jax.jit(lambda inp: asm._eval_combo_fields_pair_pallas(
        inp, asm.combos, interpret=True))
    got = fn(inputs)
    assert got is not None
    assert len(got) == len(ref)
    scale = max(np.abs(np.asarray(rh, np.float64)
                       + np.asarray(rl, np.float64)).max()
                for rh, rl in ref) + 1e-300
    for (rh, rl), (gh, gl) in zip(ref, got):
        r = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        g = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)
        assert np.abs(r - g).max() / scale < 1e-5


def test_pick_pair_block_rows_vmem_budget():
    # BENCH_r03 regression: the 3D n=48 ACA pair-fields kernel (26 input
    # leaves + 2 param rows + 18 outputs, rows=55296) compiled to a 19.8 MB
    # scoped-VMEM allocation at the fixed r_rows=256 and OOM'd the 16 MB
    # limit on hardware.  The pick must keep the estimated block bytes
    # under the ~3.5 MB budget (Mosaic stack temporaries inflate ~4x).
    from pyiga_tpu.compile import _pick_pair_block_rows
    n_block_rows = 26 + 2 + 18
    r = _pick_pair_block_rows(n_block_rows, 55296)
    assert n_block_rows * r * 128 * 4 <= 3.5 * 2**20
    assert 55296 % r == 0
    # small forms keep the full 256-row blocks
    assert _pick_pair_block_rows(10, 2048) == 256


def test_pair_fields_pallas_interpret_3d():
    # the BENCH_r03-failing form family (3D stiffness, the ACA config) at
    # a reduced-but-tileable grid: the fused fields kernel must compile and
    # match the op-by-op XLA pair evaluation in interpret mode
    import jax
    import jax.numpy as jnp

    kvs = _kvs(p=3, n=4, d=3)
    geo = geometry.twisted_box()
    from pyiga_tpu.vform import stiffness_vf
    asm = compile_vform(stiffness_vf(3))(kvs, geo=geo)
    inputs = jax.tree_util.tree_map(jnp.asarray, asm._device_inputs_pair())
    ref = asm._eval_combo_fields_pair(inputs, asm.combos)
    fn = jax.jit(lambda inp: asm._eval_combo_fields_pair_pallas(
        inp, asm.combos, interpret=True))
    got = fn(inputs)
    assert got is not None and len(got) == len(ref)
    scale = max(np.abs(np.asarray(rh, np.float64)
                       + np.asarray(rl, np.float64)).max()
                for rh, rl in ref) + 1e-300
    for (rh, rl), (gh, gl) in zip(ref, got):
        r = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        g = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)
        assert np.abs(r - g).max() / scale < 1e-5


def test_device_pair_fields_compile_failure_fallback(monkeypatch):
    # BENCH_r03 regression: a backend compile failure (scoped-VMEM OOM from
    # the remote Mosaic compile) surfaces at the jit CALL in
    # _device_pair_fields, outside the trace-time try/except — it must
    # degrade to the XLA pair evaluation instead of failing ACA assembly
    import jax

    kvs = _kvs(p=2, n=5)
    asm = compile_vform(vf_mod.stiffness_vf(2))(
        kvs, geo=geometry.quarter_annulus())
    assert asm._supports_pair_eval()

    real_jit = jax.jit
    calls = {'n': 0}

    def flaky_jit(fn, *a, **k):
        calls['n'] += 1
        if calls['n'] == 1:
            def boom(*args, **kw):
                raise RuntimeError('simulated scoped-VMEM OOM')
            return boom
        return real_jit(fn, *a, **k)

    monkeypatch.setattr(jax, 'jit', flaky_jit)
    with pytest.warns(UserWarning, match='falling back'):
        fields = asm._device_pair_fields()
    assert fields is not None and len(fields) == len(asm.combos)
    assert calls['n'] >= 2      # the fallback jit actually ran


def test_prune_probe_cached_across_instances():
    # the combo-prune/symmetry probe runs once per (form, input signature)
    # and is reused across assembler instances and space sizes — repeated
    # assembly (hierarchical levels, adaptive loops) must not re-trace it
    from pyiga_tpu import compile as C
    from pyiga_tpu.compile import compile_vform
    from pyiga_tpu.vform import stiffness_vf

    C._PRUNE_CACHE.clear()
    kvs1 = 2 * (bspline.make_knots(2, 0.0, 1.0, 6),)
    kvs2 = 2 * (bspline.make_knots(2, 0.0, 1.0, 11),)
    geo = geometry.quarter_annulus()
    cls = compile_vform(stiffness_vf(2))
    A1 = assemble.assemble_entries(cls(kvs1, geo=geo))
    assert len(C._PRUNE_CACHE) == 1
    A2 = assemble.assemble_entries(cls(kvs2, geo=geo))
    assert len(C._PRUNE_CACHE) == 1        # second size reused the probe
    # cached-plan assembly matches a fresh-probe assembly entrywise
    C._PRUNE_CACHE.clear()
    A2b = assemble.assemble_entries(cls(kvs2, geo=geo))
    assert abs(A2 - A2b).max() < 1e-14


def test_compact_slice_fresh_after_update():
    # update() must invalidate the ACA slice caches — a stale cached field
    # set made compact_slice silently return the OLD geometry's entries
    from pyiga_tpu.vform import stiffness_vf

    kvs = 2 * (bspline.make_knots(2, 0.0, 1.0, 5),)
    asm = compile_vform(stiffness_vf(2))(kvs,
                                         geo=geometry.quarter_annulus())
    row_before = asm.compact_slice({0: 1})
    asm.update(geo=geometry.bspline_quarter_annulus())
    row_after = asm.compact_slice({0: 1})
    asm2 = compile_vform(stiffness_vf(2))(
        kvs, geo=geometry.bspline_quarter_annulus())
    row_ref = asm2.compact_slice({0: 1})
    assert abs(row_after - row_ref).max() < 1e-10
    assert abs(row_after - row_before).max() > 1e-6    # geometry did change


def test_assemble_vector_pruned_component():
    # a vector functional that uses only one component: the pruned
    # component's block assembles to zeros instead of KeyError
    from pyiga_tpu import assemble
    from pyiga_tpu.vform import VForm, dx

    kvs = 2 * (bspline.make_knots(2, 0.0, 1.0, 5),)
    V = VForm(2, arity=1)
    v = V.basisfuns(components=(2,))
    f = V.input('f')
    V.add(f * v[0] * dx)
    b = compile_vform(V)(kvs, geo=geometry.quarter_annulus(),
                         f=lambda x, y: 1.0 + 0 * x).assemble_vector()
    assert b.shape[-1] == 2
    assert abs(b[..., 0]).max() > 0
    assert abs(b[..., 1]).max() == 0
