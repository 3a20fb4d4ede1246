"""Moving-source tracking (models/tracking.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models.tracking import localize_trajectory
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
C = float(speed_of_sound(20.0, 50.0))


def _moving_capture(waypoints, seg_dur=0.25):
    """Quasi-static moving source: consecutive renders at waypoint positions."""
    chunks = [
        np.asarray(simulate_signals(w, MICS, FS, C, duration=seg_dur,
                                    signal_type="noise",
                                    key=jax.random.PRNGKey(i)))
        for i, w in enumerate(waypoints)
    ]
    return jnp.asarray(np.concatenate(chunks, axis=-1))


def test_trajectory_follows_moving_source():
    waypoints = np.array([[0.2, 0.3, 0.4], [0.4, 0.4, 0.4],
                          [0.6, 0.5, 0.4], [0.8, 0.6, 0.4]])
    sigs = _moving_capture(waypoints)
    track = localize_trajectory(
        sigs, jnp.asarray(MICS), FS, C,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        segment=2048, hop=1000, smoothing=0.0)
    pos = np.asarray(track.positions)
    times = np.asarray(track.times)
    assert pos.shape[0] == track.powers.shape[0] == times.shape[0]
    # Each segment center falls inside one waypoint's chunk; compare there.
    seg_dur = 0.25
    errs = []
    for p, tc in zip(pos, times):
        w = waypoints[min(int(tc // seg_dur), len(waypoints) - 1)]
        # skip segments straddling a waypoint switch
        if abs(tc % seg_dur) < 0.04 or abs(tc % seg_dur - seg_dur) < 0.04:
            continue
        errs.append(np.linalg.norm(p - w))
    errs = np.array(errs)
    assert errs.size >= 8
    assert np.median(errs) < 0.05
    # x must increase over the capture (the source moves +x).
    assert pos[-1, 0] - pos[0, 0] > 0.3


def test_trajectory_smoothing_and_validation():
    sigs = _moving_capture(np.array([[0.5, 0.4, 0.3]]), seg_dur=0.5)
    track = localize_trajectory(
        sigs, jnp.asarray(MICS), FS, C,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        segment=2048, smoothing=0.6)
    assert np.all(np.isfinite(np.asarray(track.smoothed)))
    # Smoothed track converges to the static source.
    assert np.linalg.norm(np.asarray(track.smoothed)[-1]
                          - np.array([0.5, 0.4, 0.3])) < 0.05
    with pytest.raises(ValueError, match="shorter"):
        localize_trajectory(sigs[:, :1000], jnp.asarray(MICS), FS, C,
                            jnp.zeros(3), jnp.ones(3), segment=4096)


MICS8 = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                  [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])


def test_trajectory_tracks_moving_tone_with_capon():
    """method='capon' tracks a moving PURE TONE — the correlation-based SRP
    chain has nothing to lock onto there (carrier-periodic correlations)."""
    waypoints = np.array([[0.25, 0.3, 0.4], [0.45, 0.4, 0.4],
                          [0.65, 0.5, 0.4]])
    rng = np.random.default_rng(11)
    chunks = []
    for i, w in enumerate(waypoints):
        s = np.asarray(simulate_signals(w, MICS8, FS, C, duration=0.25,
                                        signal_type="sine", freq=700.0,
                                        key=jax.random.PRNGKey(i)))
        chunks.append(s + 0.05 * np.std(s) * rng.standard_normal(s.shape))
    sigs = jnp.asarray(np.concatenate(chunks, axis=-1))
    track = localize_trajectory(
        sigs, jnp.asarray(MICS8), FS, C,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        segment=2048, hop=1024, smoothing=0.0, method="capon")
    pos = np.asarray(track.positions)
    times = np.asarray(track.times)
    errs = []
    for p, tc in zip(pos, times):
        w = waypoints[min(int(tc // 0.25), len(waypoints) - 1)]
        if abs(tc % 0.25) < 0.07 or abs(tc % 0.25 - 0.25) < 0.07:
            continue  # segment straddles a waypoint jump
        errs.append(np.linalg.norm(p - w))
    errs = np.array(errs)
    assert errs.size >= 3
    assert np.median(errs) < 0.05, errs
    # x must increase over the capture (the source moves +x).
    assert pos[-1, 0] - pos[0, 0] > 0.2


def test_trajectory_method_validation():
    with pytest.raises(ValueError, match="method"):
        localize_trajectory(jnp.zeros((4, 8192)), jnp.asarray(MICS), FS, C,
                            jnp.zeros(3), jnp.ones(3), method="bogus")
