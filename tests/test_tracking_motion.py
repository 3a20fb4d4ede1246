"""Intra-segment motion (VERDICT r3 stretch): segment-static tracking
visibly biases on a fast mover; motion='compensated' does not.

The moving capture comes from models/simulator.simulate_moving_source — a
WOLA time-varying-delay render (per-frame static delays at the frame
centre, Hann overlap-add, steady-state interior sliced out), i.e. the
source genuinely moves WITHIN each tracking segment.  No reference
counterpart (the reference renders one static scene, main.py:66-124).

Scene calibration notes (measured on this suite's CPU mesh):
  * The mic array must be decisively NON-coplanar: a near-coplanar array
    has a mirror ghost across its plane with near-identical lag sets, and
    SRP can lock onto it (~0.9 m deterministic error) — a geometry
    ambiguity, not a tracking defect.
  * coarse_n=32: at the tracker's speed-oriented default (20^3) the coarse
    cell grid misses the true peak cell for this box and the two-stage
    search converges ~0.29 m away even for a perfect static scene.
  * At |v| = 1.55 m/s and 0.256 s segments the pair delays drift by up to
    ~20 samples within a segment: measured static-tracking mean error
    0.37-0.51 m across seeds vs 0.030 m compensated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import tracking
from pyaudiolocalization_tpu.models.simulator import simulate_moving_source

FS = 16000.0
C = 343.0
MICS = np.array([[0.0, 0.0, 0.0],
                 [3.0, 0.0, 0.0],
                 [1.5, 3.0, 0.0],
                 [1.5, 1.5, 2.0]])    # tetrahedral — no mirror ghost
LOWER = np.array([0.0, 0.0, 0.0])
UPPER = np.array([3.2, 3.2, 2.2])
START = np.array([0.8, 1.2, 0.7])
VEL = np.array([1.5, 0.4, 0.0])      # brisk walk, mostly along x
SEGMENT = 4096


def _moving_capture(key=0, velocity=VEL, duration=1.0):
    return simulate_moving_source(START, velocity, MICS, FS, C,
                                  duration=duration, signal_type="noise",
                                  frame=512, key=jax.random.PRNGKey(key))


def _truth_at(times):
    return START[None, :] + np.asarray(times)[:, None] * VEL[None, :]


def _track(signals, motion):
    return tracking.localize_trajectory(
        jnp.asarray(signals), jnp.asarray(MICS), FS, C,
        jnp.asarray(LOWER), jnp.asarray(UPPER), segment=SEGMENT,
        smoothing=0.0, coarse_n=32, fine_n=12, motion=motion, max_speed=3.0)


def test_static_tracking_biases_compensated_does_not():
    # 0.75 s -> 2 tracking segments: enough for the mean-bias contrast
    # below (the effect is ~12x, asserted 3x) at ~60% of the wall cost of
    # the original 1.0 s / 3-segment capture (58.8 s -> ~35 s).
    sigs = _moving_capture(duration=0.75)
    t_static = _track(sigs, "static")
    t_comp = _track(sigs, "compensated")
    truth_s = _truth_at(np.asarray(t_static.times))
    err_static = np.linalg.norm(np.asarray(t_static.positions) - truth_s,
                                axis=-1)
    err_comp = np.linalg.norm(np.asarray(t_comp.positions) - truth_s,
                              axis=-1)
    # Measured across seeds: static 0.37-0.51 m mean, compensated ~0.031.
    assert np.mean(err_comp) < 0.08, err_comp
    assert np.mean(err_static) > 3.0 * np.mean(err_comp), (err_static,
                                                           err_comp)


def test_compensated_velocity_estimate():
    sigs = _moving_capture(1, duration=0.75)  # shares compiled shapes with
    t_comp = _track(sigs, "compensated")      # the bias test above
    assert t_comp.velocities is not None
    v = np.asarray(t_comp.velocities)
    assert v.shape == (len(np.asarray(t_comp.times)), 3)
    # Measured: median velocity within ~0.02 m/s of truth across seeds.
    v_err = np.linalg.norm(np.median(v, axis=0) - VEL)
    assert v_err < 0.25, v


def test_static_mode_keeps_velocities_none():
    sigs = _moving_capture(2, duration=0.3)   # 1 segment: API contract only
    t_static = _track(sigs, "static")
    assert t_static.velocities is None


def test_moving_render_zero_velocity_matches_static_scene():
    """v=0 must degenerate to a static scene: the tracker localizes the
    (stationary) source to millimetres on the WOLA render (measured
    2.8 mm — identical frames overlap-add to an exact static render)."""
    sigs = _moving_capture(3, velocity=np.zeros(3), duration=0.3)
    tr = _track(sigs, "static")
    err = np.linalg.norm(np.asarray(tr.positions) - START[None, :], axis=-1)
    assert np.max(err) < 0.02, err


def test_velocity_lsq_recovers_synthetic_rates():
    pi, pj = np.triu_indices(MICS.shape[0], 1)
    pos = jnp.asarray([1.2, 1.1, 0.7])
    v_true = jnp.asarray([1.0, -0.7, 0.3])
    mics = jnp.asarray(MICS)
    d = pos[None, :] - mics
    u = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tau_dot = (jnp.take(u, pi, 0) - jnp.take(u, pj, 0)) @ v_true / C
    v_est = tracking._velocity_lsq(pos, mics, pi.astype(np.int32),
                                   pj.astype(np.int32), C, tau_dot,
                                   jnp.ones(pi.shape[0]))
    assert float(jnp.linalg.norm(v_est - v_true)) < 1e-3


def test_compensated_requires_srp():
    sigs = np.random.default_rng(0).normal(size=(4, 8192))
    with pytest.raises(ValueError, match="compensated"):
        tracking.localize_trajectory(
            jnp.asarray(sigs), jnp.asarray(MICS), FS, C,
            jnp.asarray(LOWER), jnp.asarray(UPPER), segment=4096,
            method="music", motion="compensated")
