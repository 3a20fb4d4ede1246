"""Per-bin frequency-dependent absorption (physical-mode simulation
extension): the reference evaluates its attenuation law
(1/d) * exp(-freq_coeff * f * d) * exp(-absorption * d) at the single
carrier frequency (utils.py:50-65 via main.py:104-118);
absorption_mode='per-bin' evaluates the same law at every rfft bin, so
reflections off high-freq_coeff materials lose treble relative to the
direct path."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyaudiolocalization_tpu as pal
from pyaudiolocalization_tpu.ops.delay import delay_and_sum
from pyaudiolocalization_tpu.ops.fftutils import rfft_n, irfft_n
from pyaudiolocalization_tpu.models.simulator import (simulate_signals,
                                                      simulate_signals_fast)


def test_delay_and_sum_per_bin_matches_analytic(rng):
    """Single path: the per-bin render equals the analytic freq-domain
    construction exp(-slope*(f-f0)) * e^{-i 2 pi f tau} * S(f)."""
    n = 1024
    fs = 8000.0
    base = jnp.asarray(rng.normal(size=n))
    tau, slope, f0 = 3.25 / fs, 2.5e-4, 1000.0
    out = delay_and_sum(base, jnp.full((1, 1), tau), jnp.ones((1, 1)),
                        fs, apply_fade=False,
                        freq_slopes=jnp.full((1, 1), slope), freq_ref=f0)
    padded = 2 * n
    freqs = np.fft.rfftfreq(padded, d=1.0 / fs)
    spec = np.asarray(rfft_n(base, padded))
    expected = np.asarray(irfft_n(jnp.asarray(
        spec * np.exp(-slope * (freqs - f0))
        * np.exp(-2j * np.pi * freqs * tau)), padded))[:n]
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-9)


def test_delay_and_sum_zero_slope_matches_scalar_path(rng):
    n = 512
    fs = 8000.0
    base = jnp.asarray(rng.normal(size=n))
    delays = jnp.asarray(rng.uniform(0, 0.01, size=(3, 4)))
    gains = jnp.asarray(rng.uniform(0.1, 1.0, size=(3, 4)))
    plain = delay_and_sum(base, delays, gains, fs)
    shaped = delay_and_sum(base, delays, gains, fs,
                           freq_slopes=jnp.zeros((3, 4)), freq_ref=500.0)
    np.testing.assert_allclose(np.asarray(shaped), np.asarray(plain),
                               atol=1e-10)


def _tilt(sig, fs, lo_band=(200.0, 1000.0), hi_band=(2500.0, 3800.0)):
    """High-band/low-band energy ratio of a 1-D signal."""
    spec = np.abs(np.fft.rfft(np.asarray(sig))) ** 2
    freqs = np.fft.rfftfreq(len(np.asarray(sig)), d=1.0 / fs)
    lo = spec[(freqs >= lo_band[0]) & (freqs <= lo_band[1])].sum()
    hi = spec[(freqs >= hi_band[0]) & (freqs <= hi_band[1])].sum()
    return hi / lo


@pytest.mark.parametrize("simulate", [simulate_signals, simulate_signals_fast])
def test_per_bin_reflection_loses_treble(rng, simulate):
    """A strongly frequency-absorbing wall tilts the per-bin render's
    spectrum down relative to the carrier-mode render (which applies the
    same loss to every bin).

    Expected effect size (derivable from the path weights): source
    [0.5,0.5,0.95] under a z=1 ceiling gives d_direct=1.186,
    d_image=1.267 from mic 0, so the reflection's f=0-referenced relative
    amplitude is r0 = (d_dir/d_img)*exp(-0.02*d_img+0.01*d_dir) ~ 0.92.
    With wall coeff 5e-4 /(Hz*m) the per-bin weight is r0*exp(-5e-4*
    1.267*f): ~0.13 in the hi band (~3150 Hz) vs ~0.63 in the lo band
    (~600 Hz); carrier mode (f0=200) applies the flat weight
    r0*exp(-5e-4*1.267*200) ~ 0.81 everywhere.  The base-signal cross
    term averages out over a band (comb in f), so band energies scale as
    1 + r^2: tilt ratio ~ (1+0.13^2)/(1+0.63^2) / 1 ~ 0.73.  Assert the
    directional effect with margin."""
    fs = 8000.0
    mics = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    planes = np.array([[0.0, 0.0, 1.0, -1.0]])  # z = 1 ceiling
    mat_ids = np.array([1], np.int32)
    absorption = jnp.asarray([0.01, 0.02])
    freq_tab = jnp.asarray([1e-6, 5e-4])        # wall: heavy HF loss
    kw = dict(signal_type="noise", freq=200.0, key=jax.random.PRNGKey(0))
    out = {}
    for mode in ("carrier", "per-bin"):
        out[mode] = np.asarray(simulate(
            [0.5, 0.5, 0.95], mics, fs, 343.0, 0.25, kw["signal_type"],
            kw["freq"], planes, mat_ids, absorption, freq_tab, 1, 0.0001,
            key=kw["key"], absorption_mode=mode))
    t_carrier = _tilt(out["carrier"][0], fs)
    t_perbin = _tilt(out["per-bin"][0], fs)
    assert t_perbin < 0.85 * t_carrier, (t_perbin, t_carrier)
    # The carrier render applies a flat per-path weight, so its tilt stays
    # near the reflection-free render's; the per-bin tilt must be the odd
    # one out (not just any difference between the two modes).
    assert t_perbin / t_carrier > 0.4, (t_perbin, t_carrier)


def test_per_bin_dead_path_stays_finite():
    """Regression: a culled path (gain 0) keeps a finite frequency slope;
    with reference-Q2-scale coefficients the old relative-to-carrier form
    evaluated 0 * exp(+overflow) = NaN and poisoned the whole render
    (VERDICT r3).  The f=0-referenced form must render finite and identical
    to the same scene without the dead path."""
    n = 512
    fs = 8000.0
    base = jnp.asarray(np.random.default_rng(7).normal(size=n))
    delays = jnp.asarray([[0.001, 0.004]])
    gains = jnp.asarray([[1.0, 0.0]])           # path 2 culled
    slopes = jnp.asarray([[1e-4, 2.9]])         # dead path: huge slope
    out = delay_and_sum(base, delays, gains, fs, apply_fade=False,
                        freq_slopes=slopes, freq_ref=0.0)
    assert np.isfinite(np.asarray(out)).all()
    alone = delay_and_sum(base, delays[:, :1], gains[:, :1], fs,
                          apply_fade=False, freq_slopes=slopes[:, :1],
                          freq_ref=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(alone),
                               atol=1e-12)
    # Even a mid-band reference (the hazardous direction: positive exponent
    # below freq_ref) must stay finite thanks to the clamp.
    out_mid = delay_and_sum(base, delays, gains, fs, apply_fade=False,
                            freq_slopes=slopes, freq_ref=1000.0)
    assert np.isfinite(np.asarray(out_mid)).all()


def test_per_bin_q2_table_warns():
    """The default material table keeps the reference's per-Hz coefficients
    (SURVEY.md Q2) — unusable as per-bin spectra; simulate must say so."""
    with pytest.warns(UserWarning, match="per-bin"):
        simulate_signals([0.5, 0.5, 0.5],
                         np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
                         8000.0, 343.0, 0.1, "noise", 500.0,
                         np.array([[0.0, 0.0, 1.0, -2.0]]),
                         np.array([1], np.int32), None, None, 1, 0.0001,
                         key=jax.random.PRNGKey(0),
                         absorption_mode="per-bin")


def test_absorption_mode_validation(rng):
    with pytest.raises(ValueError, match="absorption_mode"):
        simulate_signals([0.5] * 3, np.eye(3), 8000.0, 343.0, 0.1,
                         "noise", 500.0, absorption_mode="banded")
    cfg = copy.deepcopy(pal.DEFAULT_CONFIG)
    cfg["fs"] = 8000
    cfg["duration"] = 0.2
    cfg["absorption_mode"] = "per-bin"
    cfg["localization"]["lag_mode"] = "reference"
    with pytest.raises(ValueError, match="physical-mode"):
        pal.localize_sound_source(cfg, use_simulation=True, show_plots=False)


def test_localize_with_per_bin_absorption():
    """Physical-mode localization through the public config stays accurate
    with per-bin absorption on a reflective scene.  Uses a user-registered
    material with physically-scaled coefficients (the default table keeps
    the reference's Q2 per-Hz values, which per-bin mode warns about)."""
    from pyaudiolocalization_tpu.utils.materials import material_properties
    material_properties["acoustic-panel"] = {"absorption": 0.05,
                                             "freq": 5e-4}
    # The direct path always uses 'air', whose default coefficient is the
    # reference's Q2 per-Hz value (0.1) — swap in the physical ~1e-6 scale
    # for the per-bin render, restore after.
    air_q2 = material_properties["air"]["freq"]
    material_properties["air"]["freq"] = 1e-6
    try:
        cfg = copy.deepcopy(pal.DEFAULT_CONFIG)
        cfg["fs"] = 8000
        cfg["duration"] = 0.25
        cfg["signal_type"] = "noise"
        cfg["source_position"] = [0.3, 0.6, 0.4]
        cfg["absorption_mode"] = "per-bin"
        cfg["reflective_planes"] = [{"plane": [0.0, 0.0, 1.0, -2.0],
                                     "material": "acoustic-panel"}]
        cfg["localization"].update(dict(lag_mode="physical",
                                        sync_mode="none",
                                        filter_method="wiener",
                                        max_expected_delay=0.05))
        res = pal.localize_sound_source(cfg, use_simulation=True,
                                        show_plots=False,
                                        key=jax.random.PRNGKey(3))
        err = np.linalg.norm(res["estimated_position"]
                             - np.array(cfg["source_position"]))
        assert err < 0.1, err
    finally:
        material_properties.pop("acoustic-panel", None)
        material_properties["air"]["freq"] = air_q2
