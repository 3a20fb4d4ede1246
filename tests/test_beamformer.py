"""Narrowband steered-power localization (models/beamformer.py) — the
estimator that handles pure tones, which defeat correlation-based TDOA."""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models import beamformer as bf
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
C = float(speed_of_sound(20.0, 50.0))
MICS8 = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.],
                  [1., 1., 0.], [1., 0., 1.], [0., 1., 1.], [1., 1., 1.]])
LO = jnp.asarray([0., 0., 0.])
HI = jnp.asarray([1., 1., 1.])


def test_beamformer_localizes_pure_tone():
    """An 8-mic cube localizes a 1 kHz sine to mm — the case where the
    GCC-PHAT/TDOA chain is ambiguous modulo the carrier period."""
    src = np.array([0.3, 0.6, 0.4])
    sigs = simulate_signals(src, MICS8, FS, C, duration=0.25,
                            signal_type="sine", freq=1000.0,
                            key=jax.random.PRNGKey(0))
    out = bf.beamform_locate(jnp.asarray(sigs), jnp.asarray(MICS8), FS, C,
                             LO, HI, num_bins=4)
    assert float(jnp.linalg.norm(out.position - jnp.asarray(src))) < 0.02


def test_beamformer_broadband_and_vmap():
    srcs = np.array([[0.3, 0.6, 0.4], [0.7, 0.25, 0.55]])
    sigs = jnp.stack([
        jnp.asarray(simulate_signals(s, MICS8, FS, C, duration=0.25,
                                     signal_type="noise",
                                     key=jax.random.PRNGKey(i)))
        for i, s in enumerate(srcs)])
    # Broadband noise: restrict bins to the spatially well-sampled band
    # (high-frequency bins of a unit-cube array are grating-ambiguous; for
    # broadband content the SRP-PHAT chain is the better tool anyway).
    f = jax.jit(jax.vmap(lambda ss: bf.beamform_locate(
        ss, jnp.asarray(MICS8, sigs.dtype), FS, C, LO, HI,
        band=(200.0, 1200.0)).position))
    got = np.asarray(f(sigs))
    assert np.linalg.norm(got - srcs, axis=-1).max() < 0.05


def test_beam_sweep_solver_on_sine_scenes():
    """SweepSpec(solver='beam') localizes randomized SINE scenes that the
    TDOA solvers cannot (narrowband ambiguity)."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, monte_carlo_sweep
    mics8 = tuple(tuple(r) for r in MICS8)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="beam",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(5), 8)
    assert float(s.rmse) < 0.05
    assert float(s.hit_rate) == 1.0


def test_select_bins_band_restriction():
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((4, 513))
                       + 1j * rng.standard_normal((4, 513)))
    idx, w = bf.select_bins(spec, 1024.0, 1024, 8, band=(100.0, 200.0))
    freqs = np.fft.rfftfreq(1024, d=1.0 / 1024.0)
    got = freqs[np.asarray(idx)]
    assert np.all((got >= 100.0) & (got <= 200.0))
    assert abs(float(jnp.sum(w)) - 1.0) < 1e-6
