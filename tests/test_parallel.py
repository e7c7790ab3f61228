# Multi-device sharding tests (run on the virtual 8-device CPU mesh).
import numpy as np
import jax

import pytest

from pyiga_tpu import geometry
from pyiga_tpu.assemblers import MassAssembler, StiffnessAssembler
from pyiga_tpu.bspline import make_knots


def _cpu_devices(n):
    try:
        devs = jax.devices('cpu')
    except RuntimeError:
        return None
    return devs if len(devs) >= n else None


@pytest.mark.parametrize('ndev', [4, 8])
def test_sharded_assembly_and_cg(ndev):
    devs = _cpu_devices(ndev)
    if devs is None:
        pytest.skip('not enough CPU devices')
    from pyiga_tpu.parallel import dryrun
    data, X = dryrun(ndev, dim=2, nspans=4, p=2, cg_iters=4)
    assert np.all(np.isfinite(data)) and np.all(np.isfinite(X))

    # sharded assembly must match the single-device result exactly
    kvs = 2 * (make_knots(2, 0.0, 1.0, 4),)
    asm = StiffnessAssembler(kvs, geometry.quarter_annulus())
    ref = asm.assemble().data
    assert np.abs(data - ref).max() < 1e-12


def test_sharded_step_cg_correctness():
    devs = _cpu_devices(8)
    if devs is None:
        pytest.skip('not enough CPU devices')
    import jax.numpy as jnp
    from pyiga_tpu.parallel import make_mesh, sharded_stiffness_step

    # use the mass matrix: SPD and well-conditioned, so fixed-iteration
    # unpreconditioned CG converges (the Neumann stiffness is singular)
    kvs = 2 * (make_knots(2, 0.0, 1.0, 5),)
    asm = MassAssembler(kvs, geometry.quarter_annulus())
    mesh = make_mesh(shape=(4, 2), axis_names=('space', 'rhs'))
    step, args = sharded_stiffness_step(asm, mesh, cg_iters=60, num_rhs=2)
    with mesh:
        data, X = jax.jit(step)(*jax.tree_util.tree_map(jnp.asarray, args))
    # after enough CG iterations the residual should be small
    A = asm.assemble().asmatrix()
    B = np.asarray(args[2])
    for k in range(B.shape[0]):
        r = np.linalg.norm(A @ np.asarray(X[k]) - B[k]) / np.linalg.norm(B[k])
        assert r < 1e-6


def test_sharded_matfree_cg():
    devs = _cpu_devices(8)
    if devs is None:
        pytest.skip('not enough CPU devices')
    import jax.numpy as jnp
    from pyiga_tpu.parallel import make_mesh, sharded_matfree_cg

    kvs = 3 * (make_knots(2, 0.0, 1.0, 5),)
    geo = geometry.twisted_box()
    asm = MassAssembler(kvs, geo)
    mesh = make_mesh(8, axis_names=('space',))
    solve, ops_ = sharded_matfree_cg(asm, mesh, tol=1e-10, maxiter=300)
    n = asm.assemble().shape[0]
    b = np.random.RandomState(0).rand(n)
    with mesh:
        x, it = jax.jit(solve)(jax.tree_util.tree_map(
            lambda a: a if a is None else jnp.asarray(a), ops_),
            jnp.asarray(b))
    M = asm.assemble().asmatrix()
    r = np.linalg.norm(M @ np.asarray(x) - b) / np.linalg.norm(b)
    assert r < 1e-8
    assert int(it) < 300
