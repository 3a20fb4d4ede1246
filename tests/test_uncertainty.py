"""Position-uncertainty quantification (models/uncertainty.py — rebuild
extension; the reference's least_squares solve, main.py:261-274, discards
curvature).

The load-bearing check is Monte-Carlo consistency: over many noisy-TDOA
draws of a fixed geometry, the normalized estimation error squared
(NEES = e^T Cov^{-1} e) of the LM fixes against the PREDICTED covariance
must average ~3 (the chi-square-3 mean).  That validates the whole chain
(Jacobian, weighting, sandwich) rather than individual matrix entries.

All tests use PRIVATE seeded RNGs (the conftest ``rng`` fixture is
session-scoped; consuming it here would reshuffle every later test).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyaudiolocalization_tpu as pal
from pyaudiolocalization_tpu.models import solver as solver_ops
from pyaudiolocalization_tpu.models.uncertainty import (
    position_uncertainty, tdoa_jacobian, weights_from_snr)


def _geometry(num_mics=8, seed=0):
    r = np.random.default_rng(seed)
    mics = r.uniform(0.0, 1.0, (num_mics, 3))
    pairs = [(i, j) for i in range(num_mics) for j in range(i + 1, num_mics)]
    pi = tuple(p[0] for p in pairs)
    pj = tuple(p[1] for p in pairs)
    return mics, pi, pj


def _mc_fixes(mics, pi, pj, truth, c, sigma_td, weights, n_draws, seed):
    """Vmapped LM solves of noisy-TDOA draws (one jitted call)."""
    r = np.random.default_rng(seed)
    di = np.linalg.norm(truth[None, :] - mics, axis=1)
    pi_a, pj_a = np.asarray(pi), np.asarray(pj)
    td_true = (di[pj_a] - di[pi_a]) / c
    # WLS noise model: sigma_p = sigma / w_p per pair.
    noise = r.standard_normal((n_draws, len(pi))) * (sigma_td / weights)
    td_noisy = td_true[None, :] + noise
    td = jnp.asarray(td_noisy)
    lower = jnp.full(3, -10.0)
    upper = jnp.full(3, 10.0)

    @jax.jit
    def solve_all(tds):
        return jax.vmap(
            lambda t: solver_ops.lm_solve(
                jnp.asarray(truth), jnp.asarray(mics),
                np.asarray(pi, np.int32), np.asarray(pj, np.int32), t, c,
                jnp.asarray(weights), lower, upper).x)(tds)

    return np.asarray(solve_all(td)), td_true, td_noisy


def test_mc_consistency_known_sigma():
    """NEES against the known-sigma covariance averages ~3 over 256 draws
    (5-sigma Monte-Carlo band [2.25, 3.8])."""
    mics, pi, pj = _geometry()
    truth = np.array([0.6, 0.4, 0.5])
    c, sigma_td = 343.0, 2e-5
    w = np.ones(len(pi))
    fixes, td_true, _ = _mc_fixes(mics, pi, pj, truth, c, sigma_td, w, 256, 1)
    unc = position_uncertainty(truth, mics, pi, pj, td_true, c,
                               sigma_td=sigma_td)
    cov_inv = np.linalg.inv(unc["covariance"])
    err = fixes - truth[None, :]
    nees = np.einsum("ki,ij,kj->k", err, cov_inv, err)
    assert 2.25 < nees.mean() < 3.8, nees.mean()


def test_mc_consistency_residual_estimated_and_weighted():
    """Heteroscedastic noise (half the pairs 3x noisier) solved with the
    matching inverse-scale weights: the residual-estimated covariance's
    mean diagonal must track the sample covariance of the fixes."""
    mics, pi, pj = _geometry(seed=3)
    truth = np.array([0.3, 0.7, 0.45])
    c, sigma_td = 343.0, 2e-5
    w = np.where(np.arange(len(pi)) % 2 == 0, 1.0, 3.0)  # sigma_p = s/w_p
    # _mc_fixes returns the exact noisy draws its solves consumed — never
    # re-derive them from a shared seed (a draw-order change inside the
    # helper would silently decouple the TDOAs from the fixes).
    fixes, td_true, td_noisy = _mc_fixes(mics, pi, pj, truth, c, sigma_td,
                                         w, 256, 2)
    preds = []
    for k in range(256):
        unc = position_uncertainty(fixes[k], mics, pi, pj,
                                   td_noisy[k], c, weights=w)
        preds.append(np.diag(unc["covariance"]))
    pred = np.mean(preds, axis=0)
    samp = np.var(fixes, axis=0)
    ratio = pred / samp
    assert np.all(ratio > 0.7) and np.all(ratio < 1.4), ratio


def test_known_sigma_quadratic_scaling():
    mics, pi, pj = _geometry(num_mics=5, seed=4)
    truth = np.array([0.5, 0.5, 0.5])
    di = np.linalg.norm(truth[None, :] - mics, axis=1)
    td = (di[np.asarray(pj)] - di[np.asarray(pi)]) / 343.0
    u1 = position_uncertainty(truth, mics, pi, pj, td, 343.0, sigma_td=1e-5)
    u2 = position_uncertainty(truth, mics, pi, pj, td, 343.0, sigma_td=2e-5)
    np.testing.assert_allclose(u2["covariance"], 4.0 * u1["covariance"],
                               rtol=1e-12)
    # Ellipsoid radii scale linearly and axes columns stay unit.
    np.testing.assert_allclose(u2["ellipsoid_radii"],
                               2.0 * u1["ellipsoid_radii"], rtol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(u1["ellipsoid_axes"], axis=0), 1.0, rtol=1e-12)


def test_singular_geometry_reports_infinite_variance():
    """Coplanar array + in-plane source: the out-of-plane direction is
    unobservable (every Jacobian row lies in the plane).  The report must
    say inf there — NOT the pinv's 0.0 ('perfect certainty')."""
    r = np.random.default_rng(11)
    mics = np.c_[r.uniform(0, 1, (6, 2)), np.zeros(6)]   # z = 0 plane
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pi = tuple(p[0] for p in pairs)
    pj = tuple(p[1] for p in pairs)
    truth = np.array([0.4, 0.6, 0.0])                    # in-plane source
    di = np.linalg.norm(truth[None, :] - mics, axis=1)
    td = (di[np.asarray(pj)] - di[np.asarray(pi)]) / 343.0
    for kwargs in ({"sigma_td": 1e-5}, {}):             # both noise paths
        unc = position_uncertainty(truth, mics, pi, pj,
                                   td + 1e-6 * r.standard_normal(td.shape),
                                   343.0, **kwargs)
        assert unc["std"][2] == np.inf, kwargs
        assert np.all(np.isfinite(unc["std"][:2])), kwargs
        assert unc["unobservable_axes"].shape == (3, 1)
        np.testing.assert_allclose(
            np.abs(unc["unobservable_axes"][:, 0]), [0, 0, 1], atol=1e-9)
        assert np.sum(np.isinf(unc["ellipsoid_radii"])) == 1
    # A full-rank geometry reports an empty null basis and finite stds.
    mics3d, pi3, pj3 = _geometry(num_mics=5, seed=12)
    di = np.linalg.norm(truth[None, :] - mics3d, axis=1)
    td3 = (di[np.asarray(pj3)] - di[np.asarray(pi3)]) / 343.0
    unc = position_uncertainty(truth, mics3d, pi3, pj3, td3, 343.0,
                               sigma_td=1e-5)
    assert unc["unobservable_axes"].shape == (3, 0)
    assert np.all(np.isfinite(unc["std"]))


def test_too_few_pairs_returns_none():
    mics, _, _ = _geometry(num_mics=3, seed=5)
    pi, pj = (0, 0, 1), (1, 2, 2)
    td = np.zeros(3)
    assert position_uncertainty(np.ones(3) * 0.5, mics, pi, pj, td,
                                343.0) is None
    # ... but works with an explicit sigma.
    unc = position_uncertainty(np.ones(3) * 0.5, mics, pi, pj, td, 343.0,
                               sigma_td=1e-5)
    assert unc is not None and unc["dof"] == 0


def test_jacobian_matches_solver_rows():
    """tdoa_jacobian must equal the unweighted rows models/solver.py:45
    feeds LM (that is the geometry the covariance claims to invert)."""
    mics, pi, pj = _geometry(num_mics=5, seed=6)
    x = np.array([0.4, 0.2, 0.8])
    jac_np = tdoa_jacobian(x, mics, pi, pj)
    _, jac_jax = solver_ops.tdoa_residuals_and_jac(
        jnp.asarray(x), jnp.asarray(mics), np.asarray(pi, np.int32),
        np.asarray(pj, np.int32), jnp.zeros(len(pi)), 343.0,
        jnp.ones(len(pi)))
    np.testing.assert_allclose(jac_np, np.asarray(jac_jax), atol=1e-12)


def test_weights_from_snr_matches_device_helper():
    from pyaudiolocalization_tpu.models import tdoa as tdoa_ops
    snr = np.array([3.0, 1.0, 2.0, 6.0])
    np.testing.assert_allclose(
        weights_from_snr(snr),
        np.asarray(tdoa_ops.compute_weights(jnp.asarray(snr))), rtol=1e-6)
    assert weights_from_snr(np.zeros(3)).tolist() == [0.0, 0.0, 0.0]


def _small_config(**loc_overrides):
    cfg = copy.deepcopy(pal.DEFAULT_CONFIG)
    cfg["fs"] = 8000
    cfg["duration"] = 0.25
    loc = cfg["localization"]
    loc["analyze_correlation"] = False
    loc["visualize_correlation"] = False
    loc.update(loc_overrides)
    return cfg


def test_api_reports_uncertainty():
    cfg = _small_config(lag_mode="physical", sync_mode="none",
                        filter_method="wiener", max_expected_delay=0.05)
    cfg["source_position"] = [0.2, 0.7, 0.4]
    cfg["signal_type"] = "noise"
    res = pal.localize_sound_source(cfg, use_simulation=True,
                                    show_plots=False,
                                    key=jax.random.PRNGKey(7))
    unc = res["uncertainty"]
    assert unc is not None
    cov = unc["covariance"]
    np.testing.assert_allclose(cov, cov.T, atol=0)
    assert np.all(np.linalg.eigvalsh(cov) >= 0)
    assert unc["dof"] == len(res["tdoas"]) - 3
    assert np.all(np.isfinite(unc["std"])) and np.all(unc["std"] > 0)
    # Near-field scene with clean noise excitation: sub-meter 1-sigma.
    assert np.all(unc["std"] < 1.0)
    # LM converged: the fix is a stationary point, not a heuristic sigma.
    assert unc["heuristic"] is False


_CUBE = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]]


def _nb_config(solver="capon"):
    """Narrowband jackknife config: 16 kHz x 0.25 s leaves each of the 4
    time chunks ~7 STFT snapshots at the default 256-sample frame; the
    8-mic cube is the unambiguous narrowband array (test_pipeline.py)."""
    cfg = _small_config(lag_mode="physical", sync_mode="none",
                        solver=solver,
                        search_box=((-0.2, -0.2, -0.2), (1.2, 1.2, 1.2)))
    cfg["fs"] = 16000
    cfg["mic_positions"] = _CUBE
    cfg["signal_type"] = "sine"
    cfg["freq"] = 1100.0
    cfg["source_position"] = [0.35, 0.55, 0.45]
    return cfg


def test_api_narrowband_jackknife_uncertainty():
    """Narrowband solvers report group-jackknife error bars (VERDICT r4
    #6) — covariance PSD, std finite, no heuristic flag."""
    res = pal.localize_sound_source(_nb_config("music"),
                                    use_simulation=True, show_plots=False,
                                    key=jax.random.PRNGKey(9))
    unc = res["uncertainty"]
    assert unc is not None
    cov = unc["covariance"]
    np.testing.assert_allclose(cov, cov.T, atol=0)
    assert np.all(np.linalg.eigvalsh(cov) >= -1e-18)
    assert np.all(np.isfinite(unc["std"])) and np.all(unc["std"] >= 0)
    assert unc["heuristic"] is False
    assert unc["sigma_td"] is None
    assert unc["dof"] == 3


def test_narrowband_jackknife_mc_consistency():
    """Monte-Carlo consistency at one narrowband config (VERDICT r4 #6
    'done' criterion): per-axis z-scores e_i / std_i over independent
    noise draws.

    The api's own sine simulation is NOISELESS (reference parity), so a
    sine scene is fully deterministic; inject noisy signals instead
    (``signals=``): clean render + per-seed Gaussian noise.

    Measured decomposition at this config (capon, 8-mic cube, 1.1 kHz,
    16 kHz x 0.25 s): the fix error is the sum of a ~3 mm DETERMINISTIC
    fine-grid interpolation bias (constant across noise draws — no
    resampling can see it; covered by the api's resolution-floor term)
    plus a noise scatter that only passes the bias around -5..0 dB and
    rails into estimator breakdown below ~-12 dB (where the jackknife
    box clips and the sigma understates — documented caveat).  At
    10 dB SNR the reported sigma is therefore floor-dominated and the
    total-error z-scores must sit near 1 within a generous band."""
    import jax.numpy as jnp
    from pyaudiolocalization_tpu.models.simulator import simulate_signals
    from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

    truth = np.array([0.35, 0.55, 0.45])
    cfg = _nb_config("capon")
    fs = float(cfg["fs"])
    c = float(speed_of_sound(cfg["celsius"], cfg["humidity"]))
    clean = np.asarray(simulate_signals(
        truth, np.asarray(_CUBE, float), fs, c, cfg["duration"], "sine",
        1100.0, None, None, jnp.asarray([0.01]), jnp.asarray([1e-6]),
        0, 1e-4, key=jax.random.PRNGKey(0)))
    rms = float(np.sqrt(np.mean(clean ** 2)))
    sigma_n = rms * 10.0 ** (-10.0 / 20.0)            # ~10 dB SNR
    rng_n = np.random.default_rng(77)
    zs, errs, stds = [], [], []
    for seed in range(12):
        noisy = clean + sigma_n * rng_n.standard_normal(clean.shape)
        res = pal.localize_sound_source(cfg, use_simulation=False,
                                        show_plots=False,
                                        key=jax.random.PRNGKey(100 + seed),
                                        signals=list(noisy))
        e = np.asarray(res["estimated_position"]) - truth
        std = np.asarray(res["uncertainty"]["std"])
        assert np.all(std > 0)
        zs.append(e / std)
        errs.append(e)
        stds.append(std)
    med_z = float(np.median(np.abs(np.concatenate(zs))))
    assert 0.15 < med_z < 4.0, med_z
    rms_axis = float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))
    med_std = float(np.median(np.concatenate(stds)))
    assert 0.1 < med_std / max(rms_axis, 1e-12) < 10.0, (med_std, rms_axis)
