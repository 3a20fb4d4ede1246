"""The compat layer: every reference function under its original name and
signature, NumPy in / NumPy out (pyaudiolocalization_tpu/compat.py)."""

import numpy as np
import pytest

from pyaudiolocalization_tpu import compat
from pyaudiolocalization_tpu.utils.materials import material_properties

MICS = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def setup_function(_):
    compat.seed(0)


def test_acoustics_functions():
    assert abs(compat.speed_of_sound(20, 50) - 343.62) < 0.01
    p = compat.reflect_point_across_plane([1.0, 2.0, 3.0], [0, 0, 1, -5])
    np.testing.assert_allclose(p, [1.0, 2.0, 7.0])
    with pytest.raises(ValueError):
        compat.reflect_point_across_plane([0, 0, 0], [0, 0, 0, 1])
    assert compat.distance([0, 0, 0], [3, 4, 0]) == pytest.approx(5.0)
    # Q2: reference-scale coefficients underflow at 1 kHz (documented).
    att = compat.calculate_attenuation(1.0, "air", 1000.0, material_properties)
    assert att < 1e-30
    # unknown material falls back to air
    att2 = compat.calculate_attenuation(1.0, "bogus", 1000.0, material_properties)
    assert att2 == pytest.approx(att)


def test_image_sources_reference_default_culls_everything():
    """Q2: default materials cull every image source, like the reference."""
    planes = [{"plane": [1, 0, 0, -5], "material": "wood"}]
    out = compat.generate_image_sources_iterative(
        [0.5, 0.5, 0.5], planes, 2, 1000.0, material_properties, MICS)
    assert out == []


def test_image_sources_physical_materials():
    physical = {"air": {"absorption": 0.01, "freq": 1e-5},
                "wood": {"absorption": 0.05, "freq": 5e-5}}
    planes = [{"plane": [1, 0, 0, -5], "material": "wood"}]
    out = compat.generate_image_sources_iterative(
        [0.5, 0.5, 0.5], planes, 1, 1000.0, physical, MICS)
    assert len(out) == 1
    np.testing.assert_allclose(out[0]["source"], [9.5, 0.5, 0.5])
    assert out[0]["material"] == "wood"


def test_phat_and_delays_roundtrip():
    fs = 8000.0
    sig = compat.generate_signal("noise", fs, 0.25, 1000.0)
    delayed = compat.fractional_delay(sig, 20 / fs, fs)
    corr = compat.phat_correlation(sig, delayed)
    assert corr.shape == (2 * sig.shape[0] - 1,)
    # physical mode recovers the true delay; peak lag = -(td).
    delays, _, _ = compat.get_time_delays_phat(sig, delayed, fs,
                                               lag_mode="physical")
    assert abs(-delays[0] - 20 / fs) * fs < 1.0
    # reference mode reproduces Q1's broken mapping (lag off by ~n-1).
    delays_ref, _, _ = compat.get_time_delays_phat(sig, delayed, fs)
    assert abs(delays_ref[0] + 20 / fs) * fs > 100


def test_significance_and_metrics():
    fs = 4000.0
    sig = compat.generate_signal("noise", fs, 0.1, 1000.0)
    delayed = np.roll(sig, 5)
    corr = compat.phat_correlation(sig, delayed)
    thr = compat.bootstrap_significance(sig, delayed, fs, num_bootstrap=64)
    peak, sig_ok = compat.perform_significance_test_bootstrap(sig, delayed, fs)
    assert peak > thr * 0.5
    assert compat.compute_peak_to_peak_ratio(corr) > 0
    assert compat.compute_snr(corr) > 2.0
    snr, significant = compat.perform_significance_test(corr, sig, delayed, fs)
    m = compat.compute_cross_correlation_metrics(corr, sig, delayed, fs)
    assert set(m) == {"peak_to_peak_ratio", "snr", "significant"}


def test_solver_helpers():
    td = [0.001, -0.002, 0.0005, 0.0002, -0.001, 0.0015]
    guesses = compat.heuristic_initialization_adaptive(MICS, PAIRS, td, 343.0)
    assert len(guesses) >= 1 and all(len(g) == 3 for g in guesses)
    k = compat.determine_optimal_number_of_clusters(guesses + [[9, 9, 9]])
    assert k >= 1
    bounds = compat.dynamic_bounds_extended(MICS, td, 343.0)
    assert len(bounds) == 3 and all(lo < hi for lo, hi in bounds)
    r = compat.equations([0.5, 0.5, 0.5], MICS, PAIRS, td, 343.0)
    assert len(r) == 6
    with pytest.raises(ValueError):
        compat.equations([0, 0, 0], MICS, PAIRS, td, 343.0, weights=[1.0])
    w = compat.compute_weights({(0, 1): {"snr": 4.0}}, PAIRS)
    assert w.shape == (6,)
    assert np.mean(w) == pytest.approx(1.0)


def test_signal_processing_functions():
    fs = 4000.0
    for fn in (compat.generate_pink_noise, compat.generate_realistic_speech):
        x = fn(fs, 0.1)
        assert x.shape == (400,)
        assert np.max(np.abs(x)) == pytest.approx(1.0, rel=1e-5)
    y = compat.noise_reduction(
        compat.generate_signal("noise", 8000.0, 0.1, 500.0), 8000.0)
    assert np.all(np.isfinite(y))
    with pytest.raises(ValueError, match="critical frequencies"):
        # 3400 Hz highcut above the 2 kHz Nyquist -> scipy-style error.
        compat.noise_reduction(np.zeros(400), fs)
    z = compat.resample_audio(np.sin(np.arange(400) * 0.1), 4000.0, 8000.0)
    assert z.shape == (800,)
    s = compat.normalize_signal(np.array([0.0, 2.0, -4.0]))
    np.testing.assert_allclose(s, [0.0, 0.5, -1.0])
    c = compat.dynamic_range_compression(s)
    assert np.max(np.abs(c)) == pytest.approx(1.0)
    sc = compat.dynamic_range_compression_soft_clip(np.array([0.2, 1.0]))
    assert sc.shape == (2,)


def test_sync_and_calibration():
    fs = 4000.0
    compat.seed(3)
    base = compat.generate_signal("noise", fs, 0.1, 500.0)
    shifted = np.roll(base, 30)
    out = compat.synchronize_signals_improved([base, shifted], fs)
    assert len(out) == 2
    assert out[0].shape == out[1].shape

    calib = compat.generate_calibration_signal(fs, 0.1)
    recs = compat.simulate_calibration_recording(
        calib, MICS, [0.5, 0.5, 0.5], fs, 343.0, noise_level=0.0,
        material_properties={"air": {"absorption": 0.001, "freq": 1e-6}})
    res = compat.analyze_calibration(recs, calib, fs)
    assert len(res) == 4
    true_delay = np.linalg.norm(np.array([0.5] * 3)) / 343.0
    for r in res:
        assert abs(r["delay"] - true_delay) < 2 / fs


def test_localize_entry_points_present():
    assert callable(compat.localize_sound_source)
    assert callable(compat.simulate_signals_with_multipath)
    assert callable(compat.run_calibration)
    assert callable(compat.plot_correlation_heatmap)
    assert callable(compat.plot_correlation_3d)
    assert callable(compat.plot_calibration_results)
