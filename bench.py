"""Benchmark: 3D degree-3 Poisson stiffness assembly + matrix-free CG.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = end-to-end throughput (dofs/s) of sum-factorization assembly
               + 50 matrix-free CG iterations on the default (TPU) device,
               float64 (the entry-parity configuration).
vs_baseline  = speedup vs the same jitted computation executed on the host
               CPU backend at a reduced size (throughput ratio).  The
               reference pyiga publishes no benchmark numbers (BASELINE.md);
               the CPU comparator stands in for its single-node CPU path.

Env knobs: PYIGA_BENCH_N (spans per axis, default 32),
           PYIGA_BENCH_N_CPU (default 12), PYIGA_BENCH_DTYPE (float64).
"""

import json
import os
import time

import numpy as np


def build_step(n, p=3, cg_iters=50):
    from pyiga_tpu import geometry
    from pyiga_tpu.assemblers import StiffnessAssembler
    from pyiga_tpu.bspline import make_knots
    from __graft_entry__ import _single_chip_step

    kvs = 3 * (make_knots(p, 0.0, 1.0, n),)
    geo = geometry.twisted_box()
    asm = StiffnessAssembler(kvs, geo)
    step, args = _single_chip_step(asm, cg_iters=cg_iters)
    ndofs = int(np.prod([kv.numdofs for kv in kvs]))
    return step, args, ndofs


def run_timed(step, args, device, repeats=3):
    """Time the jitted step on `device`.  NB: synchronization is done by
    fetching a SCALAR derived from the outputs — on the tunneled axon TPU
    backend, ``block_until_ready`` returns before execution finishes."""
    import jax
    import jax.numpy as jnp

    def summarized(*a):
        data, x = step(*a)
        return jnp.sum(data) + jnp.linalg.norm(x)

    with jax.default_device(device):
        fn = jax.jit(summarized)
        args = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), device), args)
        np.asarray(fn(*args))           # compile + warmup (sync via fetch)
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
    return best


def main():
    import pyiga_tpu  # noqa: F401  (x64 on)
    import jax

    dtype = os.environ.get('PYIGA_BENCH_DTYPE', 'float64')
    pyiga_tpu.set_dtype(np.dtype(dtype).type)

    n = int(os.environ.get('PYIGA_BENCH_N', '48'))
    n_cpu = int(os.environ.get('PYIGA_BENCH_N_CPU', '12'))

    dev = jax.devices()[0]
    step, args, ndofs = build_step(n)
    t_dev = run_timed(step, args, dev)
    dofs_per_s = ndofs / t_dev

    vs_baseline = float('nan')
    try:
        cpu = jax.devices('cpu')[0]
        if cpu != dev:
            step_c, args_c, ndofs_c = build_step(n_cpu)
            t_cpu = run_timed(step_c, args_c, cpu, repeats=2)
            vs_baseline = dofs_per_s / (ndofs_c / t_cpu)
    except RuntimeError:
        pass

    print(json.dumps({
        'metric': '3d_p3_stiffness_assembly_plus_cg50_%s_n%d' % (dtype, n),
        'value': round(dofs_per_s, 1),
        'unit': 'dof/s',
        'vs_baseline': (round(vs_baseline, 3)
                        if np.isfinite(vs_baseline) else None),
    }))


if __name__ == '__main__':
    main()
