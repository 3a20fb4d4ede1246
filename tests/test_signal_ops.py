"""Golden tests for L1 signal ops vs the NumPy/SciPy reference semantics
(reference: signal_processing.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from pyaudiolocalization_tpu.ops import signal as sig_ops
from pyaudiolocalization_tpu.ops import delay as delay_ops


def ref_normalize(x):
    m = np.max(np.abs(x))
    return x if m == 0 else x / m


def ref_compress(x, threshold=0.8, eps=1e-8):
    x = ref_normalize(x)
    c = np.sign(x) * np.log1p(np.abs(x) / threshold + eps)
    m = np.max(np.abs(c))
    return c / m if m > 0 else c


def ref_fractional_delay(x, delay, fs):
    n = len(x)
    spec = np.fft.fft(x, n=2 * n)
    freqs = np.fft.fftfreq(2 * n, d=1.0 / fs)
    out = np.fft.ifft(spec * np.exp(-1j * 2 * np.pi * freqs * delay)).real[:n]
    fade = int(0.01 * n)
    w = np.ones(n)
    if fade > 0:
        w[:fade] *= np.linspace(0, 1, fade)
        w[-fade:] *= np.linspace(1, 0, fade)
    return out * w


def test_sine_matches_reference():
    fs, dur, f = 8000.0, 0.25, 440.0
    t = np.linspace(0, dur, int(fs * dur), endpoint=False)
    expected = np.sin(2 * np.pi * f * t)
    got = np.asarray(sig_ops.sine(fs, int(fs * dur), f))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_chirp_matches_scipy():
    fs, dur, f0 = 8000.0, 0.5, 500.0
    t = np.linspace(0, dur, int(fs * dur), endpoint=False)
    expected = scipy.signal.chirp(t, f0=f0, f1=f0 * 5, t1=dur, method="linear")
    got = np.asarray(sig_ops.chirp_linear(fs, int(fs * dur), f0, f0 * 5, dur))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_normalize_and_compress(rng):
    x = rng.normal(size=1000) * 3.7
    np.testing.assert_allclose(
        np.asarray(sig_ops.normalize_signal(jnp.asarray(x))), ref_normalize(x),
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sig_ops.dynamic_range_compression(jnp.asarray(x))),
        ref_compress(x), atol=1e-12)
    silent = np.zeros(64)
    np.testing.assert_array_equal(
        np.asarray(sig_ops.normalize_signal(jnp.asarray(silent))), silent)


def test_soft_clip(rng):
    x = rng.normal(size=512)
    xn = ref_normalize(x)
    expected = np.where(np.abs(xn) > 0.8, np.sign(xn) * (0.8 + (np.abs(xn) - 0.8) * 0.5), xn)
    got = np.asarray(sig_ops.dynamic_range_compression_soft_clip(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_fractional_delay_matches_reference(rng):
    fs = 8000.0
    x = rng.normal(size=1600)
    for d in [0.0, 1.5 / fs, 0.00321, -0.001]:
        expected = ref_fractional_delay(x, d, fs)
        got = np.asarray(delay_ops.fractional_delay(jnp.asarray(x), d, fs))
        np.testing.assert_allclose(got, expected, atol=1e-9)


def test_delay_and_sum_equals_per_path_loop(rng):
    fs = 8000.0
    base = rng.normal(size=1024)
    delays = np.array([[0.001, 0.0032, 0.0], [0.002, 0.0001, 0.004]])
    gains = np.array([[1.0, 0.5, 0.0], [0.3, 0.8, 0.1]])
    got = np.asarray(delay_ops.delay_and_sum(
        jnp.asarray(base), jnp.asarray(delays), jnp.asarray(gains), fs))
    for m in range(2):
        expected = np.zeros_like(base)
        for p in range(3):
            expected += gains[m, p] * ref_fractional_delay(base, delays[m, p], fs)
        np.testing.assert_allclose(got[m], expected, atol=1e-9)


def test_pink_noise_spectrum_shape():
    fs, n = 8000.0, 1 << 14
    x = np.asarray(sig_ops.pink_noise(jax.random.PRNGKey(0), fs, n))
    assert np.max(np.abs(x)) <= 1.0 + 1e-9
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    lo = spec[(freqs > 10) & (freqs < 100)].mean()
    hi = spec[(freqs > 1000) & (freqs < 4000)].mean()
    assert lo > 5 * hi  # 1/f power: low band much stronger


def test_speech_generator_runs():
    fs, dur = 8000.0, 0.5
    x = np.asarray(sig_ops.realistic_speech(
        jax.random.PRNGKey(1), fs, int(fs * dur), dur))
    assert x.shape == (int(fs * dur),)
    assert np.max(np.abs(x)) <= 1.0 + 1e-9
    assert np.std(x) > 0.01


def test_generate_signal_dispatch():
    fs, dur = 8000.0, 0.1
    for st in ["sine", "chirp"]:
        assert sig_ops.generate_signal(st, fs, dur, 1000.0).shape[-1] == 800
    for st in ["noise", "speech"]:
        out = sig_ops.generate_signal(st, fs, dur, 1000.0, key=jax.random.PRNGKey(0))
        assert out.shape[-1] == 800
    with pytest.raises(ValueError):
        sig_ops.generate_signal("bogus", fs, dur, 1000.0)
    with pytest.raises(ValueError):
        sig_ops.generate_signal("noise", fs, dur, 1000.0)  # missing key
