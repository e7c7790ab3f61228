# Stokes / instationary Navier-Stokes mixed discretization with Rosenbrock
# time stepping (BASELINE config 4; reference notebook solve-navier-stokes).

import pytest
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

from navier_stokes import NavierStokes


@pytest.mark.slow
def test_stokes_initial_state():
    ns = NavierStokes(n_el=(6, 10), p=2, Re=10.0)
    x0 = ns.initial_state()
    u_p = ns.LS.complete(x0)
    # velocity is (weakly) divergence free
    assert ns.divergence_norm(x0) < 1e-10
    # inflow profile is reproduced at the outflow (fully developed channel)
    vel, _ = ns.get_components(u_p)
    y = np.linspace(0, 1, 11)
    V = vel.grid_eval((y, np.array([2.0])))     # outflow boundary x=2
    assert np.allclose(V[:, 0, 0], 4 * y * (1 - y), atol=1e-6)
    assert np.allclose(V[:, 0, 1], 0.0, atol=1e-8)


@pytest.mark.slow
def test_navier_stokes_rosenbrock():
    ns = NavierStokes(n_el=(5, 8), p=2, Re=20.0)
    times, states = ns.integrate(tau=5e-2, t_end=0.3, method='rowdaind2',
                                 tol=1e-2)
    assert len(times) >= 2 and times[-1] >= 0.3 - 1e-12
    for x in states:
        assert np.all(np.isfinite(x))
    # the flow stays divergence free throughout the integration
    assert ns.divergence_norm(states[-1]) < 1e-10
    # constant-step DIRK stepping also works on the same DAE
    times2, states2 = ns.integrate(tau=0.1, t_end=0.2, method='ros3pw',
                                   tol=None)
    assert ns.divergence_norm(states2[-1]) < 1e-10
