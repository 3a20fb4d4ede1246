"""MUSIC subspace localization (models/music.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models import music
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
from pyaudiolocalization_tpu.models.beamformer import beamform_locate
from pyaudiolocalization_tpu.models.simulator import simulate_signals

FS = 16000.0
C = float(speed_of_sound(20.0, 50.0))
# 8-mic unit cube: the beamformer envelope's unambiguous narrowband array.
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                 [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                 [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
LO = jnp.asarray([0.0, 0.0, 0.0])
HI = jnp.asarray([1.0, 1.0, 1.0])


def _tone_scene(src, freq, key, duration=0.2, snr_db=25.0):
    """Free-field render of a sine + per-mic white noise (uncorrelated
    snapshots keep the covariance well conditioned)."""
    sigs = simulate_signals(np.asarray(src), MICS, FS, C, duration=duration,
                            signal_type="sine", freq=freq,
                            key=jax.random.PRNGKey(0))
    sigs = jnp.asarray(sigs)
    noise = jax.random.normal(key, sigs.shape, sigs.dtype)
    scale = jnp.std(sigs) * (10.0 ** (-snr_db / 20.0))
    return sigs + scale * noise


def test_music_single_tone():
    src = np.array([0.3, 0.6, 0.4])
    sigs = _tone_scene(src, 800.0, jax.random.PRNGKey(1))
    out = music.music_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
    err = np.linalg.norm(np.asarray(out.position) - src)
    assert err < 0.02, err


def test_music_matches_beamformer_envelope():
    """On the beamformer's own operating point MUSIC must be at least as
    accurate (same array, same tone)."""
    src = np.array([0.7, 0.25, 0.55])
    sigs = _tone_scene(src, 600.0, jax.random.PRNGKey(2))
    mus = music.music_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
    beam = beamform_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
    e_mus = np.linalg.norm(np.asarray(mus.position) - src)
    e_beam = np.linalg.norm(np.asarray(beam.position) - src)
    assert e_mus < 0.02, (e_mus, e_beam)
    assert e_mus <= e_beam + 0.01


def test_music_two_tones_multi():
    """Two tones in different bins -> two MUSIC peaks via suppression."""
    srcs = np.array([[0.2, 0.25, 0.3], [0.8, 0.7, 0.65]])
    sigs = (_tone_scene(srcs[0], 600.0, jax.random.PRNGKey(3))
            + _tone_scene(srcs[1], 950.0, jax.random.PRNGKey(4)))
    out = music.music_locate_multi(sigs, jnp.asarray(MICS), FS, C, LO, HI,
                                   num_sources=2)
    got = np.asarray(out.positions)
    e1 = np.linalg.norm(got - srcs, axis=-1).max()
    e2 = np.linalg.norm(got - srcs[::-1], axis=-1).max()
    assert min(e1, e2) < 0.05, got


def test_music_super_resolution_same_bin():
    """Two tones 12 Hz apart (the SAME 62.5 Hz rfft bin at frame=256) from
    sources 25 cm apart: the rank-2 per-bin subspace lets MUSIC separate
    them to mm where the Bartlett scan reports only the stronger one
    (measured: beamformer lands on one source, 25 cm from the other)."""
    srcs = np.array([[0.35, 0.4, 0.5], [0.6, 0.45, 0.5]])
    sigs = (_tone_scene(srcs[0], 600.0, jax.random.PRNGKey(7))
            + _tone_scene(srcs[1], 612.0, jax.random.PRNGKey(8)))
    out = music.music_locate_multi(sigs, jnp.asarray(MICS), FS, C, LO, HI,
                                   num_sources=2, frame=256,
                                   min_separation=0.12)
    got = np.asarray(out.positions)
    e1 = np.linalg.norm(got - srcs, axis=-1).max()
    e2 = np.linalg.norm(got - srcs[::-1], axis=-1).max()
    assert min(e1, e2) < 0.03, got


def test_music_jits_and_vmaps():
    srcs = np.array([[0.3, 0.6, 0.4], [0.65, 0.2, 0.5]])
    batch = jnp.stack([
        _tone_scene(s, 700.0, jax.random.PRNGKey(10 + i))
        for i, s in enumerate(srcs)])
    f = jax.jit(jax.vmap(lambda sg: music.music_locate(
        sg, jnp.asarray(MICS), FS, C, LO, HI).position))
    got = np.asarray(f(batch))
    assert np.linalg.norm(got - srcs, axis=-1).max() < 0.02


def test_music_short_signal_raises():
    import pytest
    with pytest.raises(ValueError, match="shorter"):
        music.music_locate(jnp.zeros((4, 100)), jnp.asarray(MICS[:4]), FS, C,
                           LO, HI, frame=256)
    with pytest.raises(ValueError, match="noise-subspace"):
        music.music_locate(jnp.zeros((4, 1000)), jnp.asarray(MICS[:4]), FS,
                           C, LO, HI, num_sources=4)


def test_music_sweep_solver_on_sine_scenes():
    """SweepSpec(solver='music') localizes randomized SINE scenes like the
    'beam' solver (and via the same band-mask front-end treatment)."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, monte_carlo_sweep
    mics8 = tuple(tuple(r) for r in MICS)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="music",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(5), 8)
    assert float(s.rmse) < 0.05
    assert float(s.hit_rate) == 1.0
    # Narrowband solvers have no per-pair TDOAs: covariance is all-NaN.
    assert np.all(np.isnan(np.asarray(s.results.covariance)))


def test_music_sweep_mesh_matches_single_device():
    """solver='music' under shard_map (batched eigh inside the sharded
    scene pipeline) must match the single-device run exactly."""
    from pyaudiolocalization_tpu.parallel import (SweepSpec, make_mesh,
                                                  monte_carlo_sweep)
    mics8 = tuple(tuple(r) for r in MICS)
    # Same spec/batch as test_music_sweep_solver_on_sine_scenes: the
    # single-device 8-scene graph is already compiled in-process.
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="music",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    key = jax.random.PRNGKey(5)
    single = monte_carlo_sweep(spec, key, 8)
    sharded = monte_carlo_sweep(spec, key, 8, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(sharded.results.error),
                               np.asarray(single.results.error),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(sharded.rmse), float(single.rmse),
                               rtol=1e-4)


def test_music_sweep_multi_source_tones():
    """Multi-source sweeps accept solver='music': two tones per scene,
    assignment-matched errors stay small."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, run_scene
    mics8 = tuple(tuple(r) for r in MICS)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     mic_positions=mics8, solver="music", num_sources=2,
                     source_freqs=(600.0, 950.0),
                     source_min_separation=0.35,
                     source_box_lo=(0.15, 0.15, 0.15),
                     source_box_hi=(0.85, 0.85, 0.85), snr_db=(25.0, 35.0))
    res = run_scene(spec, jax.random.PRNGKey(1))
    assert res.estimate.shape == (2, 3)
    assert float(np.max(np.asarray(res.error))) < 0.08, np.asarray(res.error)
