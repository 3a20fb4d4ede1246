"""Chirp-based microphone calibration subsystem.

Counterpart of the reference's calibration.py: generate a calibration
signal, simulate per-mic recordings (fractional delay + air attenuation +
Gaussian noise), estimate per-mic delay/amplitude by plain cross-correlation
(calibration.py:10-105).  All numerics are batched device ops; the
recording noise takes an explicit PRNG key (the reference uses the global
NumPy RNG, calibration.py:38).

Note SURVEY.md Q2: with the reference's default material coefficients the
air attenuation underflows to ~1e-38, so simulated recordings are
essentially pure noise and the estimated delays are artifacts — reproduced
faithfully here (the reference behavior *is* the spec).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import signal as sig_ops
from ..ops.delay import delay_and_sum
from ..ops.fftutils import rfft_n, irfft_n
from . import acoustics
from .simulator import AIR_ID


def generate_calibration_signal(fs: float, duration: float = 1.0,
                                signal_type: str = "chirp",
                                freq_start: float = 500.0,
                                freq_end: float = 5000.0,
                                dtype=None) -> jnp.ndarray:
    """Chirp or unit impulse, normalized + compressed
    (calibration.py:10-21)."""
    n = int(fs * duration)
    dt = jnp.dtype(dtype) if dtype is not None else jnp.result_type(float)
    if signal_type == "chirp":
        sig = sig_ops.chirp_linear(fs, n, freq_start, freq_end, duration, dt)
    elif signal_type == "impulse":
        sig = jnp.zeros(n, dt).at[0].set(1.0)
    else:
        raise ValueError(
            "Unsupported calibration signal type. Use 'chirp' or 'impulse'.")
    return sig_ops.dynamic_range_compression(sig_ops.normalize_signal(sig))


def simulate_calibration_recording(calib_signal: jnp.ndarray,
                                   mic_positions: jnp.ndarray,
                                   source_position: jnp.ndarray,
                                   fs: float,
                                   c,
                                   key: jax.Array,
                                   attenuation_factor: float = 1.0,
                                   noise_level: float = 0.01,
                                   freq: float = 1000.0,
                                   absorption_table: Optional[jnp.ndarray] = None,
                                   freq_table: Optional[jnp.ndarray] = None
                                   ) -> jnp.ndarray:
    """Per-mic recordings (M, N): delayed + attenuated calib signal + noise
    (calibration.py:23-40).  The delay renders at 2N FFT length exactly like
    the reference's fractional_delay (no fade differences: the fade window is
    applied per recording like the reference does inside fractional_delay)."""
    if absorption_table is None:
        from ..utils.materials import default_table
        table = default_table()
        absorption_table = jnp.asarray(table.absorption, calib_signal.dtype)
        freq_table = jnp.asarray(table.freq, calib_signal.dtype)
    dists = jnp.linalg.norm(
        jnp.asarray(source_position)[None, :] - jnp.asarray(mic_positions),
        axis=-1)                                             # (M,)
    delays = (dists / c)[:, None]                            # (M, 1)
    atten = attenuation_factor * acoustics.calculate_attenuation(
        dists, AIR_ID, freq, absorption_table, freq_table)
    clean = delay_and_sum(calib_signal, delays, atten[:, None], fs)
    noise = noise_level * jax.random.normal(key, clean.shape, clean.dtype)
    return clean + noise


def full_cross_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.correlate(a, b, mode='full') via FFT, batched over
    leading axes of ``a``: out[k] = sum_m a[m] b[m - (k - (n_b - 1))]."""
    n1, n2 = a.shape[-1], b.shape[-1]
    n = n1 + n2 - 1
    circ = irfft_n(rfft_n(a, n) * jnp.conj(rfft_n(b, n)), n)
    return jnp.roll(circ, n2 - 1, axis=-1).astype(a.dtype)


class CalibrationAnalysis(NamedTuple):
    delays: jnp.ndarray      # (M,) seconds
    amplitudes: jnp.ndarray  # (M,) peak |correlation|
    snr: jnp.ndarray         # (M,) correlation-peak SNR (quality gate)


# Correlation-peak SNR below which a calibration is noise, not signal: a
# matched chirp peak measures ~175 on this statistic even at unity
# signal/noise, while the max-of-noise artifact of a signal-free recording
# (Q2's underflowed attenuation) measures ~7 (sqrt(2 ln 2N) scaling).
CALIBRATION_SNR_GATE = 20.0


def analyze_calibration(recorded: jnp.ndarray, calib_signal: jnp.ndarray,
                        fs: float) -> CalibrationAnalysis:
    """Per-mic delay = lag of max |full correlation| / fs, amplitude = that
    peak (calibration.py:42-51; this path uses scipy's consistent lag axis —
    no Q1 defect here).  ``snr`` is the peak-over-off-peak-std statistic of
    |corr| (models/tdoa.correlation_snr): it separates a real matched-filter
    peak (~175) from the max-of-noise artifact of a signal-free recording
    (~7), which is what physical mode gates calibration application on."""
    from . import tdoa as tdoa_ops
    corr = full_cross_correlation(recorded, calib_signal)
    n2 = calib_signal.shape[-1]
    ac = jnp.abs(corr)
    idx = jnp.argmax(ac, axis=-1)
    lags = idx - (n2 - 1)
    amplitudes = jnp.max(ac, axis=-1)
    return CalibrationAnalysis(lags / fs, amplitudes,
                               tdoa_ops.correlation_snr(ac))


def run_calibration(config, key: Optional[jax.Array] = None,
                    dtype=None) -> Tuple[List[dict], jnp.ndarray, jnp.ndarray]:
    """Reference-shaped orchestration (calibration.py:74-105): returns
    ([{'delay':, 'amplitude':}, ...], calib_signal, recordings)."""
    fs = config["fs"]
    duration = config["duration"]
    source_position = np.asarray(config["source_position"], float)
    mic_positions = np.asarray(config["mic_positions"], float)
    c = acoustics.speed_of_sound(config["celsius"], config["humidity"])
    cal = config.get("calibration", {})
    calib_signal = generate_calibration_signal(
        fs, duration,
        signal_type=cal.get("signal_type", "chirp"),
        freq_start=cal.get("freq_start", 500),
        freq_end=cal.get("freq_end", 5000),
        dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(int(config.get("seed", 0)))
    recordings = simulate_calibration_recording(
        calib_signal, jnp.asarray(mic_positions, calib_signal.dtype),
        jnp.asarray(source_position, calib_signal.dtype), fs, c, key,
        attenuation_factor=cal.get("attenuation_factor", 1.0),
        noise_level=cal.get("noise_level", 0.01))
    analysis = analyze_calibration(recordings, calib_signal, fs)
    results = [
        {"delay": float(d), "amplitude": float(a), "snr": float(s)}
        for d, a, s in zip(np.asarray(analysis.delays),
                           np.asarray(analysis.amplitudes),
                           np.asarray(analysis.snr))
    ]
    return results, calib_signal, recordings
