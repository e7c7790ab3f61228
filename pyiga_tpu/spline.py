# -*- coding: utf-8 -*-
"""Convenience class for 1D spline functions (reference: spline.py)."""

import numpy as np

from . import bspline


class Spline:
    """A 1D spline function with knot vector and coefficients."""

    def __init__(self, kv, coeffs):
        coeffs = np.asarray(coeffs)
        assert coeffs.shape == (kv.numdofs,)
        self.kv = kv
        self.coeffs = coeffs

    def eval(self, x):
        """Evaluate the spline at all points of `x`."""
        return bspline.ev(self.kv, self.coeffs, x)

    def deriv(self, x, deriv=1):
        """Evaluate a derivative of the spline at all points of `x`."""
        return bspline.deriv(self.kv, self.coeffs, deriv, x)

    def derivative(self):
        """The exact derivative as a new :class:`Spline` of degree p-1."""
        p = self.kv.p
        diffcoeffs = (p / (self.kv.kv[p + 1:-1] - self.kv.kv[1:-(p + 1)])
                      * np.diff(self.coeffs))
        return Spline(bspline.KnotVector(self.kv.kv[1:-1], p - 1), diffcoeffs)
