# -*- coding: utf-8 -*-
"""Basis for the subspace S-tilde: splines with vanishing odd derivatives at
the boundary (Hofreither & Takacs, "Robust Multigrid for Isogeometric
Analysis Based on Stable Splittings of Spline Spaces").

API parity with /root/reference/pyiga/stilde.py."""

import numpy as np
import scipy.linalg

from . import bspline


def Stilde_basis_side(kv, side):
    """Nullspace basis of the odd boundary derivatives at one end of the knot
    vector, plus a basis of its orthogonal complement."""
    p = kv.p
    u = kv.kv[0] if side == 0 else kv.kv[-1]
    derivs = bspline.active_deriv(kv, u, p - 1)     # (p, p+1)

    # the outermost function is always in the nullspace; drop it
    derivs = derivs[:, :p] if side == 0 else derivs[:, 1:]

    # scale the k-th derivative row by h^k for conditioning
    h = kv.meshsize_avg()
    derivs = (h ** np.arange(p))[:, None] * derivs

    n_tilde = (p + 1) // 2
    even = range(0, p, 2)
    assert n_tilde == len(even)
    derivs[even, :] = 0     # keep only odd derivatives

    _, _, Vt = scipy.linalg.svd(derivs)
    return (Vt.T[:, -n_tilde:], Vt.T[:, :-n_tilde])


def Stilde_basis(kv):
    """Basis for S-tilde and for its orthogonal complement, as a pair of
    prolongation-like matrices ``(P_tilde, P_compl)``."""
    p = kv.p
    b_L, b_compl_L = Stilde_basis_side(kv, 0)
    b_R, b_compl_R = Stilde_basis_side(kv, 1)

    n = kv.numdofs
    n_L, n_R = b_L.shape[1], b_R.shape[1]
    n_I = n - 2 * p
    n_c_L, n_c_R = b_compl_L.shape[1], b_compl_R.shape[1]

    P_tilde = np.zeros((n, n_L + n_I + n_R))
    P_tilde[:p, :n_L] = b_L
    P_tilde[p:-p, n_L:-n_R] = np.eye(n_I)
    P_tilde[-p:, -n_R:] = b_R

    P_compl = np.zeros((n, n_c_L + n_c_R))
    P_compl[:p, :n_c_L] = b_compl_L
    P_compl[-p:, -n_c_R:] = b_compl_R

    return (P_tilde, P_compl)
