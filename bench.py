"""Benchmark: 3D degree-3 Poisson — stiffness assembly + matrix-free CG.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE north star): twisted-box geometry, degree-3 TP splines,
``PYIGA_BENCH_N`` knot spans per axis.  Timed on the default (TPU) device:

  1. sum-factorization assembly of the compact stiffness tensor into HBM,
  2. conjugate gradients to 1e-8 with the matrix-free sum-factorization
     operator (quadrature application per iteration; no assembled matvec).

value        = dofs / (assembly_time + solve_time), float64 (the
               entry-parity configuration; set PYIGA_BENCH_DTYPE=float32
               for the fast path).
vs_baseline  = speedup vs the same jitted computation on the host CPU
               backend at PYIGA_BENCH_N_CPU (the stand-in for the
               reference's single-node CPU path; pyiga publishes no numbers).
               CPU dof/s degrades with size (measured float64: 10971 at
               n=16, 4129 at n=32, 1584 at n=48 -> matched-size speedup at
               n=48 is ~54x float64); the default n_cpu=32 keeps the bench
               runtime bounded while understating, not overstating, the
               speedup.

Numerics: the float64 assembly runs the pair-chained Ozaki contraction
(bf16 mantissa chunks with exact f32 MXU accumulation, two-float fields;
L=6 chunks) — assembled entries match the exact-f64 path to ~1e-13
relative, 1000x inside the <=1e-10 entry-parity target, and the CG
iteration counts are identical.  The solve runs float32 Krylov iterations
with device-fused float64 iterative refinement to the 1e-8 target.

Timing notes: the tunneled TPU backend has ~28ms dispatch latency and
``block_until_ready`` returns early, so each phase is a single dispatch
synchronized by fetching a scalar (one combined sync per repeat).
"""

import json
import os
import time

import numpy as np


def build(n, p=3):
    from pyiga_tpu import geometry
    from pyiga_tpu.assemblers import StiffnessAssembler
    from pyiga_tpu.bspline import make_knots

    kvs = 3 * (make_knots(p, 0.0, 1.0, n),)
    geo = geometry.twisted_box()
    asm = StiffnessAssembler(kvs, geo)
    ndofs = int(np.prod([kv.numdofs for kv in kvs]))
    return asm, ndofs


def run_on(device, n, dtype, repeats=3):
    import jax
    import jax.numpy as jnp
    from pyiga_tpu.ops import sumfac
    from pyiga_tpu.ops.banded import (BandedOperator, band_info,
                                      banded_from_compact_device,
                                      banded_gather_maps)
    from pyiga_tpu.ops.fastdiag import (fastdiag_precond_weighted,
                                        interior_dofs)
    from pyiga_tpu.ops.matfree import MatrixFreeOperator, RestrictedOperator
    from pyiga_tpu import solvers

    with jax.default_device(device):
        asm, ndofs = build(n)
        gi = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                np.asarray(a, dtype=dtype)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else np.asarray(a), device),
            asm._geo_inputs)
        tt = jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a, dtype=dtype), device),
            asm.tables.term_tables(asm.terms))
        field_fn = asm.field_fn

        # symmetric-term folding: only 6 of the 9 stiffness chains computed,
        # the mirrored ones recovered by a separable transpose gather.
        # float64 uses the Ozaki-split contraction (bf16 chunk products with
        # exact f32 MXU accumulation, ~3e-14 assembled relative accuracy —
        # two orders inside the <=1e-10 parity target, ~3x faster than the
        # emulated f64 dot)
        # Ozaki splitting only pays where f64 is emulated; the CPU comparator
        # keeps its native-f64 best path
        mode = ('ozaki' if dtype == np.float64
                and device.platform not in ('cpu',) else 'exact')
        fold_plan, tperms = asm._fold()
        tperms = [jax.device_put(np.asarray(p), device) for p in tperms]
        if mode == 'ozaki':
            # fields once, then two chain dispatches (diagonal terms;
            # mirrored pairs + transpose): the chunk/diagonal buffers of the
            # Ozaki contraction on top of the full six-chain graph exceed
            # HBM at n=48, and splitting also avoids recomputing the shared
            # geometry fields per dispatch
            direct = tuple((t, False) for t, m in fold_plan if not m)
            mirrored = tuple((t, True) for t, m in fold_plan if m)
            # double-float32 field pipeline + pair-chained Ozaki contraction:
            # fields and all chain intermediates stay as f32 pairs (fused f32
            # elementwise + bf16 MXU dots; no emulated-f64 arithmetic at
            # all).  Assembled accuracy ~7e-15 relative — better than the
            # f64-intermediate Ozaki variant.
            from pyiga_tpu.assemblers import stiffness_fields_df_pair
            fields_fn = jax.jit(stiffness_fields_df_pair)
            # L=6 chunks: assembled accuracy ~1e-13 (1000x inside the
            # 1e-10 entry-parity target) at 25% fewer bf16 dots than L=7
            fn_d = jax.jit(lambda F, tt: sumfac.assemble_terms_folded_pair(
                tt, F, direct, None, L=6))
            fn_m = jax.jit(lambda F, tt, tp: sumfac.assemble_terms_folded_pair(
                tt, F, mirrored, tp, L=6))

            def asm_fn(gi, tt, tp):
                F = fields_fn(gi)
                return fn_d(F, tt) + fn_m(F, tt, tp)
        else:
            asm_fn = jax.jit(
                lambda gi, tt, tp: sumfac.assemble_terms_folded(
                    tt, field_fn(gi), tuple(fold_plan), tp, mode=mode))

        # homogeneous-Dirichlet Poisson solve: matrix-free operator on the
        # interior dofs, fast-diagonalization preconditioner.  For float64,
        # the Krylov iterations run in float32 with float64 iterative
        # refinement (full f64 accuracy; f64 is emulated on TPU).
        kvs = asm.kvs
        free = interior_dofs(kvs)
        b = jax.device_put(
            np.random.RandomState(0).rand(len(free)).astype(dtype), device)
        ir = (dtype == np.float64)
        if ir:
            # float64 residuals use the assembled matrix (banded layout,
            # converted on device from the phase-1 compact data): ~10x
            # cheaper per outer iteration than the f64 matrix-free apply
            bws = band_info(asm.structure)
            ns = tuple(bk[0] for bk in asm.structure.bs)
            bsz = tuple(2 * bw + 1 for bw in bws)
            maps = [jax.device_put(m, device)
                    for m in banded_gather_maps(asm.structure, bws)]
            to_banded = jax.jit(
                lambda d: banded_from_compact_device(d, maps, bsz, ns))
            op_hi = RestrictedOperator(
                BandedOperator(None, bws, ns), free, int(np.prod(ns)))
            op = MatrixFreeOperator(asm, free_dofs=free, dtype=np.float32)
            # geometry-averaged 1D coefficients: 57 -> 24 CG iterations on
            # the twisted box vs the parametric fastdiag
            P = fastdiag_precond_weighted(asm, dirichlet=True,
                                          dtype=np.float32)

            def solve(data):
                op_hi.operands['inner']['D'] = to_banded(data)
                u, info = solvers.cg_ir(op_hi, op, b, tol=1e-8,
                                        precond_lo=P, inner_tol=3e-3)
                return u, sum(info['inner_iters'])

            def solve_timed(data):
                # identical work; cg_ir's single packed info fetch is the
                # only host sync
                return solve(data)
        else:
            op = MatrixFreeOperator(asm, free_dofs=free)
            P = fastdiag_precond_weighted(asm, dirichlet=True)

            def solve(data):
                u, it = solvers.cg_jit(op, b, tol=1e-8, maxiter=600,
                                       precond=P)
                return u, int(it)

            def solve_timed(data):
                # leave the iteration count on device during timing
                u, it = solvers.cg_jit(op, b, tol=1e-8, maxiter=600,
                                       precond=P)
                return u, it

        # warmup / compile both phases
        data = asm_fn(gi, tt, tperms)
        float(jnp.sum(data))
        u, iters = solve(data)
        float(jnp.linalg.norm(u))

        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            data = asm_fn(gi, tt, tperms)
            u, _ = solve_timed(data)
            # ONE host sync covering both phases (each scalar fetch costs a
            # ~28ms round-trip on the tunneled backend)
            float(jnp.sum(data) + jnp.linalg.norm(u).astype(data.dtype))
            best = min(best, time.perf_counter() - t0)
    return ndofs, best, iters


def main():
    import pyiga_tpu
    import jax

    dtype = np.dtype(os.environ.get('PYIGA_BENCH_DTYPE', 'float64')).type
    pyiga_tpu.set_dtype(dtype)
    n = int(os.environ.get('PYIGA_BENCH_N', '48'))
    n_cpu = int(os.environ.get('PYIGA_BENCH_N_CPU', '32'))

    dev = jax.devices()[0]
    ndofs, t_dev, iters = run_on(dev, n, dtype)
    dofs_per_s = ndofs / t_dev

    vs_baseline = None
    try:
        cpu = jax.devices('cpu')[0]
        if cpu != dev:
            nd_c, t_cpu, _ = run_on(cpu, n_cpu, dtype, repeats=2)
            vs_baseline = round(dofs_per_s / (nd_c / t_cpu), 3)
    except RuntimeError:
        pass

    print(json.dumps({
        'metric': '3d_p3_poisson_assembly_plus_cg[%s,n=%d,cg_iters=%d]'
                  % (np.dtype(dtype).name, n, iters),
        'value': round(dofs_per_s, 1),
        'unit': 'dof/s',
        'vs_baseline': vs_baseline,
    }))


if __name__ == '__main__':
    main()
