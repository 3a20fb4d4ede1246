"""Small interpolation utilities: not-a-knot cubic spline (scipy
CubicSpline's default boundary condition) for sub-sample peak refinement.

The reference refines correlation peaks by fitting scipy's CubicSpline over
a 5-point window and scanning 100 fine points (utils.py:431-438).  This is a
closed-form small linear solve, implemented here directly so it runs inside
jit and vmaps over batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cubic_spline_coeffs(x: jnp.ndarray, y: jnp.ndarray):
    """Not-a-knot cubic spline through (x_i, y_i), n >= 3 points.

    Returns per-interval coefficients (c3, c2, c1, c0) such that on
    [x_i, x_{i+1}]: s(t) = c3_i (t-x_i)^3 + c2_i (t-x_i)^2 + c1_i (t-x_i) + c0_i.
    Solves the standard second-derivative system with not-a-knot end
    conditions via a dense solve (windows are tiny: n=5 in the pipeline).
    """
    n = x.shape[-1]
    h = x[..., 1:] - x[..., :-1]                      # (n-1,)
    dy = (y[..., 1:] - y[..., :-1]) / h

    # System A m = b for second derivatives m (n unknowns).
    batch = x.shape[:-1]
    A = jnp.zeros(batch + (n, n), x.dtype)
    b = jnp.zeros(batch + (n,), x.dtype)
    # Interior continuity rows i = 1..n-2:
    for i in range(1, n - 1):
        A = A.at[..., i, i - 1].set(h[..., i - 1])
        A = A.at[..., i, i].set(2.0 * (h[..., i - 1] + h[..., i]))
        A = A.at[..., i, i + 1].set(h[..., i])
        b = b.at[..., i].set(6.0 * (dy[..., i] - dy[..., i - 1]))
    # Not-a-knot: third derivative continuous across x_1 and x_{n-2}:
    # h1*m0 - (h0+h1)*m1 + h0*m2 = 0 ; likewise at the other end.
    A = A.at[..., 0, 0].set(h[..., 1])
    A = A.at[..., 0, 1].set(-(h[..., 0] + h[..., 1]))
    A = A.at[..., 0, 2].set(h[..., 0])
    A = A.at[..., n - 1, n - 3].set(h[..., n - 2])
    A = A.at[..., n - 1, n - 2].set(-(h[..., n - 3] + h[..., n - 2]))
    A = A.at[..., n - 1, n - 1].set(h[..., n - 3])
    m = jnp.linalg.solve(A, b[..., None])[..., 0]

    c0 = y[..., :-1]
    c1 = dy - h * (2.0 * m[..., :-1] + m[..., 1:]) / 6.0
    c2 = m[..., :-1] / 2.0
    c3 = (m[..., 1:] - m[..., :-1]) / (6.0 * h)
    return c3, c2, c1, c0


def cubic_spline_eval(x: jnp.ndarray, coeffs, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the spline at points t (extrapolates with edge intervals,
    like scipy's default)."""
    c3, c2, c1, c0 = coeffs
    n = x.shape[-1]
    idx = jnp.clip(jnp.searchsorted(x, t, side="right") - 1, 0, n - 2)
    dx = t - jnp.take(x, idx)
    return (jnp.take(c3, idx) * dx ** 3 + jnp.take(c2, idx) * dx ** 2 +
            jnp.take(c1, idx) * dx + jnp.take(c0, idx))


def refine_peak_cubic(corr_window: jnp.ndarray, center_index,
                      num_fine: int = 100) -> jnp.ndarray:
    """Sub-sample peak refinement over a 5-sample window centered at
    ``center_index`` (reference utils.py:431-438): fit a not-a-knot cubic
    spline over indices [c-2, c+2], evaluate |s| on linspace(c-2, c+2, 100),
    return the argmax abscissa."""
    base = jnp.arange(-2.0, 3.0, dtype=corr_window.dtype)
    coeffs = cubic_spline_coeffs(base, corr_window)
    fine = jnp.linspace(-2.0, 2.0, num_fine, dtype=corr_window.dtype)
    vals = cubic_spline_eval(base, coeffs, fine)
    best = jnp.argmax(jnp.abs(vals))
    return center_index + jnp.take(fine, best)
