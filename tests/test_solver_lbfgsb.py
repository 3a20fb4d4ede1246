"""Box-constrained L-BFGS-B vs scipy's Fortran implementation.

The projected L-BFGS in models/solver.py replaces scipy's Cauchy-point/
subspace machinery with gradient projection; the fixed points (KKT) are
identical, so the oracle check is on the *minimizer* scipy returns, not
the trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from pyaudiolocalization_tpu.models.solver import (lbfgsb_minimize,
                                                   tdoa_residuals)


def _scipy_min(fun, x0, lower, upper):
    res = minimize(fun, np.asarray(x0), method="L-BFGS-B",
                   bounds=list(zip(np.asarray(lower), np.asarray(upper))))
    return res.x, res.fun


def test_quadratic_interior_and_active_bounds():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def f(x):
        return 0.5 * x @ A @ x + b @ x

    # interior minimum: x* = -A^-1 b = [-1, 0.2, -0.03]
    lo, hi = jnp.full(3, -5.0), jnp.full(3, 5.0)
    got = lbfgsb_minimize(f, jnp.zeros(3), lo, hi)
    np.testing.assert_allclose(np.asarray(got.x), [-1.0, 0.2, -0.03],
                               atol=1e-5)
    # active bounds: clip the box so two coordinates saturate
    lo2, hi2 = jnp.asarray([-0.5, -5.0, 0.0]), jnp.asarray([5.0, 0.1, 5.0])
    got2 = lbfgsb_minimize(f, jnp.zeros(3), lo2, hi2)
    ref_x, ref_f = _scipy_min(lambda x: float(f(jnp.asarray(x))),
                              np.zeros(3), lo2, hi2)
    np.testing.assert_allclose(np.asarray(got2.x), ref_x, atol=1e-5)
    assert float(got2.fun) <= ref_f + 1e-8


def test_rosenbrock_boxed_matches_scipy():
    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    lo = jnp.asarray([-2.0, -2.0, -2.0])
    hi = jnp.asarray([0.8, 2.0, 2.0])   # bound excludes the global (1,1,1)
    x0 = jnp.asarray([-1.2, 1.0, -0.5])
    got = lbfgsb_minimize(f, x0, lo, hi, maxiter=500)
    ref_x, ref_f = _scipy_min(lambda x: float(f(jnp.asarray(x))),
                              np.asarray(x0), lo, hi)
    assert float(got.fun) <= ref_f * (1 + 1e-6) + 1e-8
    np.testing.assert_allclose(np.asarray(got.x), ref_x, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tdoa_cost_matches_scipy(seed):
    """The production use: polishing a DE candidate on the TDOA cost."""
    rng = np.random.default_rng(seed)
    mics = jnp.asarray(rng.uniform(0, 1, (4, 3)))
    src = rng.uniform(0.2, 0.8, 3)
    c = 343.0
    pi, pj = jnp.asarray([0, 0, 0, 1, 1, 2]), jnp.asarray([1, 2, 3, 2, 3, 3])
    d = np.linalg.norm(np.asarray(mics) - src[None], axis=1)
    tdoas = jnp.asarray((d[np.asarray(pj)] - d[np.asarray(pi)]) / c)
    w = jnp.ones(6)

    def cost(x):
        r = tdoa_residuals(x, mics, pi, pj, tdoas, c, w)
        return jnp.sum(r ** 2)

    lo, hi = jnp.full(3, -0.5), jnp.full(3, 1.5)
    # polish scenario: DE hands over a candidate near the optimum (a far
    # start can legitimately land in a ghost zero-cost basin of the 4-mic
    # hyperbola intersection, for this solver and scipy's alike)
    x0 = jnp.asarray(src + rng.uniform(-0.08, 0.08, 3))
    got = lbfgsb_minimize(cost, x0, lo, hi, maxiter=200)
    ref_x, ref_f = _scipy_min(lambda x: float(cost(jnp.asarray(x))),
                              np.asarray(x0), lo, hi)
    # same quality as scipy's Fortran L-BFGS-B (both stall at the same
    # ftol rule on flat geometries, e.g. seed 3: scipy f=2.2e-7 at 1.8 cm)
    assert float(got.fun) <= 10.0 * ref_f + 1e-10
    err_scipy = np.linalg.norm(ref_x - src)
    err_mine = np.linalg.norm(np.asarray(got.x) - src)
    assert err_mine <= 2.0 * err_scipy + 1e-3, (err_mine, err_scipy)


def test_jit_and_vmap_safe():
    def f(x):
        return jnp.sum((x - jnp.asarray([0.3, 0.7, -0.2])) ** 2)

    lo, hi = jnp.full(3, -1.0), jnp.full(3, 1.0)
    run = jax.jit(lambda x0: lbfgsb_minimize(f, x0, lo, hi).x)
    np.testing.assert_allclose(np.asarray(run(jnp.zeros(3))),
                               [0.3, 0.7, -0.2], atol=1e-5)
    xs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 3)))
    batch = jax.vmap(lambda x0: lbfgsb_minimize(f, x0, lo, hi).x)(xs)
    np.testing.assert_allclose(np.asarray(batch),
                               np.tile([0.3, 0.7, -0.2], (5, 1)), atol=1e-5)
