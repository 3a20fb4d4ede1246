"""Outlier-robust LM (leave-k-out LMedS + Huber refit) tests."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models.solver import (
    dynamic_bounds, heuristic_initial_guesses, multi_start_lm,
    multi_start_lm_robust)


TETRA = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
         (0.0, 0.0, 1.0), (1.0, 1.0, 1.0))


def _scene(seed, m=4):
    # fixed non-degenerate geometry: random 4-mic clouds are frequently
    # near-coplanar, which gives EXACT mirror (ghost) solutions that both
    # solvers legitimately land in
    rng = np.random.default_rng(seed)
    mics = jnp.asarray(TETRA[:m], jnp.float64)
    src = rng.uniform(0.25, 0.75, 3)
    pi, pj = [], []
    for i in range(m):
        for j in range(i + 1, m):
            pi.append(i)
            pj.append(j)
    pi, pj = jnp.asarray(pi), jnp.asarray(pj)
    d = np.linalg.norm(np.asarray(mics) - src[None], axis=1)
    td = jnp.asarray((d[np.asarray(pj)] - d[np.asarray(pi)]) / 343.0)
    return mics, src, pi, pj, td


def _solve(fn, mics, pi, pj, td, key):
    c = 343.0
    w = jnp.ones(pi.shape[0])
    guesses, _ = heuristic_initial_guesses(mics, pi, pj, td, c, key)
    lower, upper = dynamic_bounds(mics, td, c)
    guesses = jnp.clip(guesses, lower[None, :], upper[None, :])
    return fn(guesses, mics, pi, pj, td, c, w, lower, upper)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clean_scene_matches_plain_lm(seed):
    mics, src, pi, pj, td = _scene(seed)
    key = jax.random.PRNGKey(seed)
    plain = _solve(multi_start_lm, mics, pi, pj, td, key)
    robust = _solve(multi_start_lm_robust, mics, pi, pj, td, key)
    assert np.linalg.norm(np.asarray(plain.x) - src) < 1e-3
    assert np.linalg.norm(np.asarray(robust.x) - src) < 1e-3


@pytest.mark.parametrize("m,seed", [
    # 4 mics: 2 corrupted pairs leave 4 clean ones — enough to determine
    # the source for these draws.  (Seed 0 is deliberately absent: its
    # draw admits an EXACT ghost intersection of the 4 clean hyperbolas,
    # which no estimator can reject from the data — the 4-mic/2-outlier
    # case is only generically, not always, determinate.)
    (4, 1), (4, 2), (4, 3),
    # 5 mics: 8 clean pairs — always overdetermined, every seed must pass
    (5, 0), (5, 1), (5, 2), (5, 3),
])
def test_two_gross_outlier_pairs_rescued(m, seed):
    """Corrupt 2 pair TDOAs the way a reflection peak does (multi-ms
    errors): plain LM is dragged away, the consensus solver is not."""
    mics, src, pi, pj, td = _scene(seed, m=m)
    p = int(pi.shape[0])
    rng = np.random.default_rng(100 + seed)
    bad = rng.choice(p, size=2, replace=False)
    td_bad = np.array(td)
    td_bad[bad] += rng.choice([-1, 1], 2) * rng.uniform(2e-3, 5e-3, 2)
    td_bad = jnp.asarray(td_bad)
    key = jax.random.PRNGKey(seed)
    plain = _solve(multi_start_lm, mics, pi, pj, td_bad, key)
    robust = _solve(multi_start_lm_robust, mics, pi, pj, td_bad, key)
    err_plain = np.linalg.norm(np.asarray(plain.x) - src)
    err_robust = np.linalg.norm(np.asarray(robust.x) - src)
    assert err_robust < 0.02, (err_robust, err_plain)
    # and the outliers really do hurt the plain solver
    assert err_plain > 5 * err_robust or err_plain > 0.05


def test_three_mics_falls_back_to_plain():
    mics, src, pi, pj, td = _scene(5, m=3)
    key = jax.random.PRNGKey(5)
    plain = _solve(multi_start_lm, mics, pi, pj, td, key)
    robust = _solve(multi_start_lm_robust, mics, pi, pj, td, key)
    np.testing.assert_allclose(np.asarray(plain.x), np.asarray(robust.x),
                               atol=1e-9)


def test_public_api_lm_robust():
    from pyaudiolocalization_tpu import DEFAULT_CONFIG, localize_sound_source
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    cfg["localization"]["solver"] = "lm-robust"
    cfg["sampling_rate"] = 8000
    # This test pins the solver WIRING through the public API; the default
    # config's analyze_correlation=True would spend ~150 s running 6x1000
    # CPU permutation bootstraps that assert nothing here (the bootstrap
    # itself is covered by test_bootstrap_noise / the parity tests).
    cfg["localization"]["analyze_correlation"] = False
    cfg["duration"] = 0.4
    out = localize_sound_source(cfg, use_simulation=True, show_plots=False)
    est = np.asarray(out["estimated_position"], float)
    err = np.linalg.norm(est - np.asarray(cfg["source_position"], float))
    assert err < 0.02, est
    assert "estimated_position" in out and "tdoas" in out
