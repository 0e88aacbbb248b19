"""Natural cubic splines: host-side coefficient solve + jnp evaluation.

Replaces the reference's torchcubicspline dependency used for the Schunk SIH
servo-tick -> joint-angle calibration curves (reference: isaacgymenvs/tasks/
hand_arm/base/ur5sih.py:437-527). Coefficients are computed once in numpy;
evaluation is a branch-free bucketized polynomial in jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CubicSpline(NamedTuple):
    """Piecewise cubic y(t) = a + b*dt + c*dt^2 + d*dt^3 on knots[i] <= t."""

    knots: jnp.ndarray  # [n]
    a: jnp.ndarray  # [n-1]
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray

    def evaluate(self, t: jnp.ndarray) -> jnp.ndarray:
        """Evaluate at t (any shape). Outside the knot range the boundary
        polynomial extrapolates (matches torchcubicspline behavior)."""
        idx = jnp.clip(
            jnp.searchsorted(self.knots, t, side="right") - 1,
            0,
            self.knots.shape[0] - 2,
        )
        dt = t - self.knots[idx]
        return self.a[idx] + dt * (self.b[idx] + dt * (self.c[idx] + dt * self.d[idx]))


def natural_cubic_spline(x, y, dtype=jnp.float32) -> CubicSpline:
    """Build a natural cubic spline through (x, y) (host-side numpy solve)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n == 2:
        b = np.array([(y[1] - y[0]) / (x[1] - x[0])])
        return CubicSpline(
            knots=jnp.asarray(x, dtype),
            a=jnp.asarray(y[:1], dtype),
            b=jnp.asarray(b, dtype),
            c=jnp.zeros(1, dtype),
            d=jnp.zeros(1, dtype),
        )
    h = np.diff(x)
    # solve for second derivatives M with natural BCs M0 = Mn-1 = 0
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    c_full = np.linalg.solve(A, rhs)  # second-derivative/2 coefficients
    a = y[:-1]
    b = (np.diff(y) / h) - h * (2 * c_full[:-1] + c_full[1:]) / 3
    d = np.diff(c_full) / (3 * h)
    return CubicSpline(
        knots=jnp.asarray(x, dtype),
        a=jnp.asarray(a, dtype),
        b=jnp.asarray(b, dtype),
        c=jnp.asarray(c_full[:-1], dtype),
        d=jnp.asarray(d, dtype),
    )
