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
    ('shape_derivative', dict(p=2, n=6, steps=2)),
    ('nonlinear_poisson', dict(p=2, n=6)),
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


def test_notebooks_valid():
    # every notebook parses and its import cell resolves to a real example
    import json
    nbdir = os.path.join(os.path.dirname(__file__), '..', 'notebooks')
    names = sorted(os.listdir(nbdir))
    assert len(names) >= 7
    for name in names:
        nb = json.load(open(os.path.join(nbdir, name)))
        srcs = [''.join(c['source']) for c in nb['cells']
                if c['cell_type'] == 'code']
        assert any('from ' in s and ' import ' in s for s in srcs), name
        mod = [line for s in srcs for line in s.splitlines()
               if line.startswith('from ')][0].split()[1]
        assert os.path.exists(os.path.join(EXAMPLES, mod + '.py')), mod


@pytest.mark.slow
def test_notebooks_execute_light():
    import json
    nbdir = os.path.join(os.path.dirname(__file__), '..', 'notebooks')
    cwd = os.getcwd()
    os.chdir(nbdir)
    try:
        for name in ('geometry.ipynb', 'multipatch.ipynb'):
            nb = json.load(open(name))
            g = {}
            for c in nb['cells']:
                if c['cell_type'] == 'code':
                    exec(''.join(c['source']), g)
    finally:
        os.chdir(cwd)
