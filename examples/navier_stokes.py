# -*- coding: utf-8 -*-
"""Instationary Navier-Stokes channel flow by a mixed spline discretization
with Rosenbrock (ROWDAIND2) time stepping — the reference's Navier-Stokes
notebook workload (BASELINE config 4).

Discretization: Taylor-Hood-like spline pair (velocity degree p, 2
components; pressure degree p-1) on a channel; parabolic inflow on the left,
no-slip walls top/bottom, open outflow right.  The saddle-point DAE

    [M 0] d/dt [u]     [ nu*A + N(u)  B^T ] [u]
    [0 0]      [p]  = -[ B            0   ] [p]

is integrated by the index-2-capable ROWDAIND2 Rosenbrock method; the
convection term is reassembled each evaluation on device through updatable
Assemblers (sum-factorization, no re-tracing)."""

import os
import sys

import numpy as np
import scipy.sparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyiga_tpu import assemble, bspline, geometry, solvers
from pyiga_tpu.geometry import BSplineFunc


class NavierStokes:
    """Channel-flow Navier-Stokes setup (inflow left, outflow right)."""

    def __init__(self, n_el=(8, 16), p=2, Re=20.0, geo=None):
        self.Re = Re
        self.kvs_u = tuple(bspline.make_knots(p, 0.0, 1.0, n)
                           for n in n_el)
        self.kvs_p = tuple(bspline.make_knots(p - 1, 0.0, 1.0, n)
                           for n in n_el)
        self.geo = geo if geo is not None else \
            geometry.unit_square().scale([2, 1])

        self.m_u = tuple(kv.numdofs for kv in self.kvs_u)
        self.m_p = tuple(kv.numdofs for kv in self.kvs_p)
        self.n_u1 = int(np.prod(self.m_u))
        self.n_u = 2 * self.n_u1
        self.n_p = int(np.prod(self.m_p))

        # blocks
        self.A_grad = assemble.assemble(
            'inner(grad(u), grad(v)) * dx', self.kvs_u,
            bfuns=[('u', 2), ('v', 2)], geo=self.geo)
        self.M_vel = assemble.assemble(
            'inner(u, v) * dx', self.kvs_u,
            bfuns=[('u', 2), ('v', 2)], geo=self.geo)
        self.A_div = assemble.assemble(
            'div(u) * q * dx', (self.kvs_u, self.kvs_p),
            bfuns=[('u', 2, 0), ('q', 1, 1)], geo=self.geo)
        self.M_pre = assemble.assemble('u * v * dx', self.kvs_p, geo=self.geo)

        # steady Stokes operator over the full (u, p) vector
        self.A_stokes = scipy.sparse.bmat(
            [[self.A_grad / Re, self.A_div.T],
             [self.A_div, None]], format='csr')

        # updatable convection assemblers (nonlinear term and linearization)
        zero_vel = BSplineFunc(self.kvs_u,
                               np.zeros(self.m_u + (2,)))
        self.asm_nlconv = assemble.Assembler(
            'grad(vel).dot(vel).dot(v) * dx', self.kvs_u,
            bfuns=[('v', 2)], geo=self.geo, vel=zero_vel, updatable=['vel'])
        self.asm_linconv = assemble.Assembler(
            'grad(u).dot(vel).dot(v) * dx', self.kvs_u,
            bfuns=[('u', 2), ('v', 2)], geo=self.geo, vel=zero_vel,
            updatable=['vel'])

        # boundary conditions: inflow left, no-slip walls, open right
        def g_inflow(x, y):
            return (4 * y * (1 - y), 0.0 * x)

        def g_zero(x, y):
            return (0.0 * x, 0.0 * x)

        self.bcs = assemble.compute_dirichlet_bcs(
            self.kvs_u, self.geo,
            [('bottom', g_zero), ('top', g_zero), ('left', g_inflow)])

        # restricted system over the combined (u, p) vector (the BC indices
        # only touch the velocity part)
        self.LS = assemble.RestrictedLinearSystem(self.A_stokes, 0.0,
                                                  self.bcs)

        # mass matrix over the full vector (zero pressure block), restricted
        M_full = scipy.sparse.bmat(
            [[self.M_vel, None],
             [None, scipy.sparse.csr_matrix((self.n_p, self.n_p))]],
            format='csr')
        self.ns_M = self.LS.restrict_matrix(M_full).tocsc()

    # -- helpers -----------------------------------------------------------------

    def get_components(self, u_p):
        """Velocity and pressure of a full (u, p) vector as spline functions."""
        u1 = u_p[:self.n_u1].reshape(self.m_u)
        u2 = u_p[self.n_u1:self.n_u].reshape(self.m_u)
        U = np.stack((u1, u2), axis=-1)
        prs = u_p[self.n_u:].reshape(self.m_p)
        return (BSplineFunc(self.kvs_u, U), BSplineFunc(self.kvs_p, prs))

    def _apply_navier_stokes(self, u_p):
        vel, _ = self.get_components(u_p)
        z = self.asm_nlconv.assemble(vel=vel)
        nl = np.concatenate((np.asarray(z).ravel(), np.zeros(self.n_p)))
        return nl + self.A_stokes.dot(u_p)

    def _linearized_ns(self, u_p):
        vel, _ = self.get_components(u_p)
        A_lc = self.asm_linconv.assemble(vel=vel)
        return scipy.sparse.bmat(
            [[self.A_grad / self.Re + A_lc, self.A_div.T],
             [self.A_div, 1e-10 * self.M_pre]], format='csr')

    # -- DAE interface -----------------------------------------------------------

    def F(self, x):
        u_p = self.LS.complete(x)
        return -self.LS.restrict(self._apply_navier_stokes(u_p))

    def J(self, x):
        u_p = self.LS.complete(x)
        return -self.LS.restrict_matrix(self._linearized_ns(u_p))

    def initial_state(self):
        """Restricted Stokes solution as the initial value."""
        from pyiga_tpu.operators import make_solver
        return make_solver(self.LS.A).dot(self.LS.b)

    def integrate(self, x0=None, tau=5e-2, t_end=0.5, method='rowdaind2',
                  tol=1e-2, progress=False):
        """Integrate; returns (times, restricted states)."""
        if x0 is None:
            x0 = self.initial_state()
        stepper = getattr(solvers, method)
        return stepper(self.ns_M, self.F, self.J, x0, tau, t_end, tol=tol,
                       progress=progress)

    def divergence_norm(self, x):
        u_p = self.LS.complete(x)
        return np.linalg.norm(self.A_div @ u_p[:self.n_u])


if __name__ == '__main__':
    ns = NavierStokes(n_el=(8, 16), p=2, Re=20.0)
    times, states = ns.integrate(tau=5e-2, t_end=0.5, progress=True)
    print('steps:', len(times) - 1)
    print('final divergence norm:', ns.divergence_norm(states[-1]))
    vel, pre = ns.get_components(ns.LS.complete(states[-1]))
    print('velocity magnitude range:',
          float(np.abs(vel.coeffs).max()))
