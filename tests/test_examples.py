# Smoke-run every example at reduced sizes so a broken example fails CI
# (the analog of the reference's run-notebooks.py integration suite).
import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), '..', 'examples')


def _load(name):
    path = os.path.join(EXAMPLES, name + '.py')
    spec = importlib.util.spec_from_file_location('example_' + name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize('name,kwargs', [
    ('poisson_3d', dict(n=6, p=2)),
    ('convection_diffusion', dict(n=8, p=2)),
    ('adaptive_poisson', dict(p=2, n0=4, num_refinements=2)),
    ('multipatch_poisson', dict(p=2, n=4)),
    ('stokes', dict(p=2, n_el=(4, 6))),
    ('geometry_tour', dict()),
    ('subspace_correction_mg', dict(p1=5, n1=16, p2=3, n2=6)),
])
@pytest.mark.slow
def test_example_runs(name, kwargs):
    mod = _load(name)
    mod.main(**kwargs)


def test_example_navier_stokes():
    import numpy as np
    mod = _load('navier_stokes')
    ns = mod.NavierStokes(n_el=(4, 6), p=2, Re=20.0)
    times, states = ns.integrate(tau=1e-1, t_end=0.2)
    assert len(times) >= 2
    assert np.isfinite(ns.divergence_norm(states[-1]))
