"""Tests for the mesh-parallel Monte-Carlo sweep (parallel/sweep.py) — the
rebuild's data-parallel axis (SURVEY.md §2.4/§5.8; the reference has no
distributed execution, so these follow the §4.4 fake-mesh strategy:
8 virtual CPU devices via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.parallel import (
    SweepSpec, make_mesh, monte_carlo_sweep, run_scene, localize_batch)

SPEC = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                 source_box_lo=(0.2, 0.2, 0.2), source_box_hi=(0.8, 0.8, 0.8),
                 snr_db=(25.0, 35.0))


def test_run_scene_localizes():
    res = run_scene(SPEC, jax.random.PRNGKey(3))
    assert res.estimate.shape == (3,)
    assert float(res.error) < 0.15


def test_sweep_single_device():
    s = monte_carlo_sweep(SPEC, jax.random.PRNGKey(0), 8)
    assert s.results.estimate.shape == (8, 3)
    assert float(s.rmse) < 0.5
    assert float(s.hit_rate) > 0.5
    # Summary statistics are consistent with the per-scene results.
    np.testing.assert_allclose(
        float(s.rmse), float(jnp.sqrt(jnp.mean(s.results.error ** 2))),
        rtol=1e-5)
    # TDOA-solver scenes carry the Gauss-Markov covariance: symmetric,
    # positive-diagonal, and in the right order of magnitude (the per-axis
    # sigma should bracket the actual errors within a couple of decades).
    cov = np.asarray(s.results.covariance)
    assert cov.shape == (8, 3, 3)
    assert np.all(np.isfinite(cov))
    np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), rtol=1e-6)
    assert np.all(np.einsum("bii->bi", cov) > 0)


def test_sweep_nees_calibration():
    """Promote tests/test_uncertainty.py's Monte-Carlo consistency check to
    the REAL pipeline (VERDICT r4 #3): over randomized simulate->localize
    scenes with an 8-mic cube, the normalized estimation error squared
    (NEES = e^T cov^{-1} e) must be chi-square-3 distributed if the
    attached covariance is calibrated.  The median is the robust statistic
    (chi2_3 median = 2.366; a handful of hard scenes where the local
    linearization fails blow up the MEAN arbitrarily), measured at 2.37
    with 128 scenes on this exact config; 95%-ellipsoid coverage measured
    0.83 (heavy tails from the same outlier scenes)."""
    mics8 = SPEC.mic_positions + (
        (1.0, 1.0, 0.0), (1.0, 0.0, 1.0), (0.0, 1.0, 1.0), (1.0, 1.0, 1.0))
    spec = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                     mic_positions=mics8, source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 25.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(7), 64)
    e = np.asarray(s.results.estimate) - np.asarray(s.results.source)
    cov = np.asarray(s.results.covariance)
    nees = np.einsum("bi,bij,bj->b", e, np.linalg.inv(cov), e)
    med = float(np.median(nees))
    assert 1.2 < med < 4.5, med
    cover95 = float(np.mean(nees < 7.814728))
    assert cover95 > 0.7, cover95


def test_sweep_mesh_matches_single_device():
    """Sharding over the 8-device mesh must not change results: same keys,
    same per-scene errors, psum-reduced summary equals the local one."""
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(42)
    # 8 scenes: reuses test_sweep_single_device's compiled 8-scene graph.
    single = monte_carlo_sweep(SPEC, key, 8)
    sharded = monte_carlo_sweep(SPEC, key, 8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.results.error),
                               np.asarray(single.results.error),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(sharded.rmse), float(single.rmse),
                               rtol=1e-4)
    np.testing.assert_allclose(float(sharded.hit_rate), float(single.hit_rate))


def test_sweep_mesh_requires_divisible_batch():
    with pytest.raises(ValueError, match="divisible"):
        monte_carlo_sweep(SPEC, jax.random.PRNGKey(0), 9, mesh=make_mesh(8))


def test_sweep_multipath_scenes():
    """Reflective planes + image sources inside the vmapped pipeline."""
    spec = SweepSpec(
        fs=16000.0, duration=0.1, signal_type="noise",
        plane_coeffs=((1.0, 0.0, 0.0, -5.0), (0.0, 1.0, 0.0, -5.0)),
        plane_material_ids=(1, 2), max_reflections=2,
        source_box_lo=(0.2, 0.2, 0.2), source_box_hi=(0.8, 0.8, 0.8),
        snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(7), 4)
    assert np.all(np.isfinite(np.asarray(s.results.estimate)))
    assert float(s.rmse) < 1.0


def test_localize_batch_on_given_signals():
    """Estimation-only batch: simulate two known scenes, stack, localize."""
    from pyaudiolocalization_tpu.models.simulator import simulate_signals
    spec = SPEC
    mics = jnp.asarray(spec.mic_positions)
    c = spec.speed_of_sound
    sources = np.array([[0.3, 0.4, 0.5], [0.6, 0.3, 0.4]])
    sigs = []
    for i, src in enumerate(sources):
        s = simulate_signals(src, np.asarray(spec.mic_positions), spec.fs, c,
                             duration=spec.duration, signal_type="noise",
                             key=jax.random.PRNGKey(10 + i))
        sigs.append(s)
    batch = jnp.stack(sigs)
    est, cost, td = localize_batch(spec, batch, mics, jax.random.PRNGKey(0))
    err = np.linalg.norm(np.asarray(est) - sources, axis=-1)
    assert err.max() < 0.1


def test_sweep_bandpass_front_end_accurate():
    """Band-limited PHAT must defeat reference defect Q5: with a Butterworth
    front-end the reference's estimates collapse to the array circumcenter
    (SURVEY.md, 0.37-6.3 m error); the physical sweep path stays centimeter
    accurate."""
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="noise",
                     filter_method="butterworth",
                     source_box_lo=(0.1, 0.1, 0.1),
                     source_box_hi=(0.9, 0.9, 0.9), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(11), 8)
    assert float(s.rmse) < 0.05
    assert float(s.hit_rate) == 1.0


@pytest.mark.parametrize("solver", ["srp", "srp+lm"])
def test_sweep_srp_solvers(solver):
    """SRP-PHAT grid localization (models/srp.py): initialization-free and
    as accurate as the LM path on clean scenes."""
    spec = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                     solver=solver,
                     source_box_lo=(0.1, 0.1, 0.1),
                     source_box_hi=(0.9, 0.9, 0.9), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(5), 8)
    assert float(s.rmse) < 0.05
    assert float(s.hit_rate) == 1.0


def test_srp_beats_lm_in_reverb():
    """In reverberant scenes the TDOA-LM path picks reflection peaks on a
    fraction of scenes (reference-style failure); SRP-PHAT stays robust."""
    planes = ((1.0, 0, 0, 0.5), (1.0, 0, 0, -5.5), (0, 1.0, 0, 0.5),
              (0, 1.0, 0, -6.5), (0, 0, 1.0, 0.5), (0, 0, 1.0, -3.0))
    mats = (1, 1, 2, 2, 1, 1)
    common = dict(fs=16000.0, duration=0.25, signal_type="noise",
                  plane_coeffs=planes, plane_material_ids=mats,
                  max_reflections=2, source_box_lo=(0.1, 0.1, 0.1),
                  source_box_hi=(0.9, 0.9, 0.9), snr_db=(10.0, 25.0))
    srp = monte_carlo_sweep(SweepSpec(solver="srp", **common),
                            jax.random.PRNGKey(0), 8)
    lm = monte_carlo_sweep(SweepSpec(solver="lm", **common),
                           jax.random.PRNGKey(0), 8)
    assert float(srp.hit_rate) >= float(lm.hit_rate)
    assert float(srp.rmse) < 0.5


def test_sweep_de_solver():
    """On-device differential evolution as the sweep solver (BASELINE
    config 4); vmapped population per scene under lax.while_loop."""
    spec = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                     solver="de", de_popsize=32, de_maxiter=150,
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(9), 4)
    assert float(s.rmse) < 0.1


@pytest.mark.parametrize("num_mics", [2, 3])
def test_sweep_small_arrays(num_mics):
    """Degenerate arrays (1 or 3 pairs) must run without shape errors; with
    fewer than 4 mics 3-D localization is underdetermined, so only check
    finiteness and that estimates stay in bounds."""
    mics = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))[:num_mics]
    spec = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                     mic_positions=mics,
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(0), 4)
    est = np.asarray(s.results.estimate)
    assert np.all(np.isfinite(est))


def test_sweep_speech_signal():
    """Synthetic speech through the full physical pipeline."""
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="speech",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(20.0, 30.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(4), 8)
    assert float(s.rmse) < 0.2
    assert float(s.hit_rate) >= 0.75


# ---------------------------------------------------------------------------
# Multi-source sweeps (SweepSpec.num_sources > 1)
# ---------------------------------------------------------------------------

MICS8 = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
         (1.0, 1.0, 0.0), (1.0, 0.0, 1.0), (0.0, 1.0, 1.0), (1.0, 1.0, 1.0))

MULTI_SPEC = SweepSpec(fs=16000.0, duration=0.125, signal_type="noise",
                       mic_positions=MICS8, solver="srp",
                       num_sources=2, source_min_separation=0.4,
                       source_box_lo=(0.1, 0.1, 0.1),
                       source_box_hi=(0.9, 0.9, 0.9), snr_db=(25.0, 35.0))


def test_multi_source_scene_shapes_and_accuracy():
    res = run_scene(MULTI_SPEC, jax.random.PRNGKey(0))
    assert res.estimate.shape == (2, 3)
    assert res.source.shape == (2, 3)
    assert res.error.shape == (2,)
    assert res.cost.shape == (2,)
    # Assignment-matched: error[k] is the distance of the matched pair.
    np.testing.assert_allclose(
        np.asarray(res.error),
        np.linalg.norm(np.asarray(res.estimate) - np.asarray(res.source),
                       axis=-1), rtol=1e-6)
    assert float(np.max(np.asarray(res.error))) < 0.1


def test_multi_source_sweep_mesh_matches_single_device():
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(11)
    single = monte_carlo_sweep(MULTI_SPEC, key, 8)
    sharded = monte_carlo_sweep(MULTI_SPEC, key, 8, mesh=mesh)
    assert single.results.error.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(sharded.results.error),
                               np.asarray(single.results.error),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(sharded.rmse), float(single.rmse),
                               rtol=1e-4)
    assert float(single.rmse) < 0.1
    assert float(single.hit_rate) > 0.9
    # min-separation sampling is honored on every scene
    src = np.asarray(single.results.source)
    gaps = np.linalg.norm(src[:, 0] - src[:, 1], axis=-1)
    assert np.all(gaps >= MULTI_SPEC.source_min_separation - 1e-9)


def test_multi_source_spec_validation():
    import dataclasses
    with pytest.raises(ValueError, match="solver='srp'"):
        run_scene(dataclasses.replace(MULTI_SPEC, solver="lm"),
                  jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="source_freqs"):
        run_scene(dataclasses.replace(MULTI_SPEC, signal_type="sine"),
                  jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_sources"):
        run_scene(dataclasses.replace(MULTI_SPEC, num_sources=7),
                  jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_sources entries"):
        run_scene(dataclasses.replace(MULTI_SPEC, source_freqs=(500.0,)),
                  jax.random.PRNGKey(0))


def test_sweep_multi_source_claim_suppression():
    """SweepSpec.suppression='claim' routes the multi-source scenes through
    lag-claiming extraction; accuracy on the easy 8-mic cube must match the
    spatial mode (the claim A/B's win case is sparse arrays — see
    models/srp.srp_phat_locate_multi)."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, monte_carlo_sweep
    cube8 = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
             (0.0, 0.0, 1.0), (1.0, 1.0, 0.0), (1.0, 0.0, 1.0),
             (0.0, 1.0, 1.0), (1.0, 1.0, 1.0))
    base = dict(fs=16000.0, duration=0.1, signal_type="noise",
                mic_positions=cube8, solver="srp", num_sources=2,
                source_min_separation=0.4, source_box_lo=(0.15,) * 3,
                source_box_hi=(0.85,) * 3, snr_db=(25.0, 35.0))
    s_claim = monte_carlo_sweep(SweepSpec(suppression="claim", **base),
                                jax.random.PRNGKey(31), 8)
    assert float(s_claim.rmse) < 0.05, float(s_claim.rmse)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="suppression"):
        monte_carlo_sweep(SweepSpec(suppression="nms", **base),
                          jax.random.PRNGKey(31), 8)
