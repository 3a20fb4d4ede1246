"""Moving-source tracking (models/tracking.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models.tracking import (kalman_rts_smooth,
                                                     localize_trajectory)
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
    with pytest.raises(ValueError, match="smoother"):
        localize_trajectory(jnp.zeros((4, 8192)), jnp.asarray(MICS), FS, C,
                            jnp.zeros(3), jnp.ones(3), smoother="bogus")


def test_kalman_rts_beats_raw_and_recovers_velocity():
    """Constant-velocity truth + white noise: the RTS smoother must cut the
    position RMSE well below the raw measurements and recover the velocity,
    with meas_std auto-calibrated (second-difference MAD is motion-blind)."""
    rng = np.random.default_rng(0)
    s, dt = 80, 0.064
    t = np.arange(s) * dt
    truth = np.stack([0.2 + 0.15 * t, 0.3 + 0.05 * t, 0.4 + 0.0 * t], -1)
    z = truth + 0.03 * rng.standard_normal((s, 3))
    sm, vel = kalman_rts_smooth(jnp.asarray(z), dt)
    sm, vel = np.asarray(sm), np.asarray(vel)
    raw = np.sqrt(np.mean((z - truth) ** 2))
    smoothed = np.sqrt(np.mean((sm - truth) ** 2))
    assert smoothed < 0.45 * raw, (smoothed, raw)
    assert np.allclose(vel[s // 2], [0.15, 0.05, 0.0], atol=0.05)
    # Degenerate single-sample track: identity, zero velocity.
    s1, v1 = kalman_rts_smooth(jnp.asarray(z[:1]), dt)
    assert np.allclose(np.asarray(s1), z[:1])
    assert np.allclose(np.asarray(v1), 0.0)


def test_kalman_power_weighting_rejects_low_confidence_outlier():
    rng = np.random.default_rng(1)
    s, dt = 60, 0.064
    t = np.arange(s) * dt
    truth = np.stack([0.2 + 0.1 * t, 0.3 * np.ones(s), 0.4 * np.ones(s)], -1)
    z = truth + 0.02 * rng.standard_normal((s, 3))
    z[30] += np.array([0.8, -0.8, 0.8])          # garbage segment...
    p = np.ones(s)
    p[30] = 1e-6                                  # ...with tiny SRP power
    sm_w, _ = kalman_rts_smooth(jnp.asarray(z), dt, powers=jnp.asarray(p))
    sm_u, _ = kalman_rts_smooth(jnp.asarray(z), dt)
    err_w = np.linalg.norm(np.asarray(sm_w)[30] - truth[30])
    err_u = np.linalg.norm(np.asarray(sm_u)[30] - truth[30])
    assert err_w < 0.5 * err_u, (err_w, err_u)
    assert err_w < 0.05


def test_trajectory_kalman_smoother_end_to_end():
    """smoother='kalman' on a rendered moving capture: finite, converges to
    the (static) source, and beats the raw per-segment scatter."""
    sigs = _moving_capture(np.array([[0.5, 0.4, 0.3]]), seg_dur=0.5)
    track = localize_trajectory(
        sigs, jnp.asarray(MICS), FS, C,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        segment=2048, hop=512, smoother="kalman")
    sm = np.asarray(track.smoothed)
    raw = np.asarray(track.positions)
    truth = np.array([0.5, 0.4, 0.3])
    assert np.all(np.isfinite(sm))
    assert np.linalg.norm(sm[-1] - truth) < 0.05
    assert (np.sqrt(np.mean((sm - truth) ** 2))
            <= np.sqrt(np.mean((raw - truth) ** 2)) + 1e-9)
