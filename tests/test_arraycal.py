"""Array-geometry self-calibration (models/arraycal.py): recover jittered
microphone positions from test events at known source positions.  Beyond
reference parity — the reference calibrates per-mic DELAYS only
(calibration.py:4-48); here the same pair-TDOA residual system is inverted
for the microphone coordinates."""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models import arraycal
from pyaudiolocalization_tpu.models.simulator import simulate_signals_fast

MICS_NOMINAL = np.array([
    [0.0, 0.0, 0.0],
    [1.0, 0.0, 0.0],
    [0.5, 1.0, 0.0],
    [0.5, 0.5, 1.0],
])

SOURCES = np.array([
    [0.2, 0.3, 0.6], [0.9, 0.8, 0.4], [0.1, 0.9, 0.9],
    [0.8, 0.1, 0.8], [0.5, 0.6, 0.2], [0.3, 0.2, 1.1],
    [1.1, 0.5, 0.7], [0.6, 1.0, 1.0],
])

C = 343.0


def _pairs(m):
    p = np.array([(i, j) for i in range(m) for j in range(i + 1, m)],
                 np.int32)
    return p[:, 0], p[:, 1]


def _true_mics(seed, scale=0.03, nominal=None):
    # Private per-test rng: the conftest ``rng`` fixture is SESSION-scoped
    # (one shared stream in suite order), so drawing from it here would
    # shift every later test's random data (it did: the FLAC corruption
    # test's payload changed under it).
    nominal = MICS_NOMINAL if nominal is None else nominal
    r = np.random.default_rng(seed)
    return nominal + r.uniform(-scale, scale, nominal.shape)


def _analytic_tdoas(mics, sources, pi, pj):
    d = np.linalg.norm(sources[:, None, :] - mics[None, :, :], axis=-1)
    return (d[:, pj] - d[:, pi]) / C


def test_refine_recovers_jittered_array():
    """Exact TDOAs from a 3 cm-jittered tetrahedron: the refinement must
    recover every mic to well under a millimeter from the nominal init."""
    true_mics = _true_mics(77)
    pi, pj = _pairs(4)
    td = _analytic_tdoas(true_mics, SOURCES, pi, pj)
    res = arraycal.refine_mic_positions(td, SOURCES, MICS_NOMINAL, pi, pj, C)
    err = np.linalg.norm(np.asarray(res.mic_positions) - true_mics, axis=-1)
    init_err = np.linalg.norm(MICS_NOMINAL - true_mics, axis=-1)
    assert float(res.cost) < float(res.initial_cost) * 1e-6
    assert err.max() < 1e-4, (err, init_err)


def test_refine_noisy_tdoas_improves_geometry():
    """TDOAs with 10 us measurement noise (~3.4 mm range error): recovered
    geometry must beat the 3 cm survey error by a wide margin."""
    true_mics = _true_mics(78)
    pi, pj = _pairs(4)
    td = _analytic_tdoas(true_mics, SOURCES, pi, pj)
    td = td + np.random.default_rng(178).normal(scale=10e-6, size=td.shape)
    res = arraycal.refine_mic_positions(td, SOURCES, MICS_NOMINAL, pi, pj, C)
    err = np.linalg.norm(np.asarray(res.mic_positions) - true_mics, axis=-1)
    init_err = np.linalg.norm(MICS_NOMINAL - true_mics, axis=-1)
    assert err.max() < 0.015
    assert err.max() < init_err.max() / 2.0


def test_calibrate_array_geometry_from_signals():
    """End-to-end: simulate K free-field noise events at 48 kHz, measure
    TDOAs through the real GCC-PHAT ladder, refine.  Per-pair lags are
    sample-quantized (c/fs ~ 7 mm), so K=8 events must average the
    geometry down to a few millimeters."""
    true_mics = _true_mics(79)
    fs = 48000.0
    signals = jnp.stack([
        simulate_signals_fast(
            SOURCES[k], true_mics, fs, C, 0.1, "noise", 500.0,
            None, None, jnp.asarray([0.01]), jnp.asarray([1e-6]),
            0, 1e-4, key=jax.random.PRNGKey(100 + k))
        for k in range(len(SOURCES))])
    res = arraycal.calibrate_array_geometry(
        signals, SOURCES, MICS_NOMINAL, fs, C,
        max_expected_delay=0.02)
    err = np.linalg.norm(np.asarray(res.mic_positions) - true_mics, axis=-1)
    init_err = np.linalg.norm(MICS_NOMINAL - true_mics, axis=-1)
    assert res.tdoas.shape == (len(SOURCES), 6)
    assert err.max() < 0.008, (err, init_err)
    assert err.max() < init_err.max() / 3.0


def _pairwise(m):
    d = np.linalg.norm(m[:, None, :] - m[None, :, :], axis=-1)
    iu = np.triu_indices(len(m), 1)
    return d[iu]


MICS6_NOMINAL = np.array([
    [0.0, 0.0, 0.0],
    [1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
    [1.0, 1.0, 0.0],
    [0.5, 0.5, 1.2],
])

SOURCES12 = np.vstack([SOURCES, np.array([
    [0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.7, 0.7, 1.1], [0.4, 0.1, 0.9],
])])


def test_self_calibrate_rejects_4_mics():
    """M=4 is structurally unidentifiable from TDOAs alone (each event's 3
    independent TDOAs are exactly consumed by its own position — measured
    data cost ~1e-26 at ANY geometry), so the API refuses it."""
    pi, pj = _pairs(4)
    td = _analytic_tdoas(_true_mics(80), SOURCES, pi, pj)
    import pytest
    with pytest.raises(ValueError, match="5 microphones"):
        arraycal.self_calibrate_array(td, MICS_NOMINAL, pi, pj, C)


def test_self_calibrate_unknown_sources():
    """Joint self-calibration (event positions unknown, 6 mics): exact
    TDOAs must recover the array SHAPE (pairwise distances — the gauge-
    invariant part; absolute positions are anchor-limited to the rigid
    component of the survey error) far below the 3 cm survey error."""
    true_mics = _true_mics(81, nominal=MICS6_NOMINAL)
    pi, pj = _pairs(6)
    td = _analytic_tdoas(true_mics, SOURCES12, pi, pj)
    res = arraycal.self_calibrate_array(td, MICS6_NOMINAL, pi, pj, C)
    shape_err = np.abs(_pairwise(np.asarray(res.mic_positions))
                       - _pairwise(true_mics))
    init_shape_err = np.abs(_pairwise(MICS6_NOMINAL) - _pairwise(true_mics))
    assert res.source_positions.shape == (len(SOURCES12), 3)
    assert float(res.cost) < float(res.initial_cost) * 1e-6
    assert shape_err.max() < 1e-4, (shape_err.max(), init_shape_err.max())
    # absolute positions inherit the rigid (data-null) component of the
    # survey error — anchored, so at worst survey-scale
    abs_err = np.linalg.norm(np.asarray(res.mic_positions) - true_mics,
                             axis=-1)
    assert abs_err.max() < 0.06


def test_calibrate_array_geometry_self_cal_wrapper():
    """Signal-level wrapper with source_positions=None routes to the joint
    self-calibration and still beats the survey's shape error."""
    true_mics = _true_mics(82, nominal=MICS6_NOMINAL)
    fs = 48000.0
    signals = jnp.stack([
        simulate_signals_fast(
            SOURCES12[k], true_mics, fs, C, 0.1, "noise", 500.0,
            None, None, jnp.asarray([0.01]), jnp.asarray([1e-6]),
            0, 1e-4, key=jax.random.PRNGKey(200 + k))
        for k in range(len(SOURCES12))])
    res = arraycal.calibrate_array_geometry(
        signals, None, MICS6_NOMINAL, fs, C, max_expected_delay=0.02)
    assert isinstance(res, arraycal.SelfCalResult)
    assert res.source_positions.shape == (len(SOURCES12), 3)
    shape_err = np.abs(_pairwise(np.asarray(res.mic_positions))
                       - _pairwise(true_mics))
    init_shape_err = np.abs(_pairwise(MICS6_NOMINAL) - _pairwise(true_mics))
    assert shape_err.max() < init_shape_err.max() / 3.0
