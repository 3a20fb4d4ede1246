"""Capon/MVDR localization (models/capon.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import capon
from test_music import C, FS, HI, LO, MICS, _tone_scene


def test_capon_single_tone():
    src = np.array([0.3, 0.6, 0.4])
    sigs = _tone_scene(src, 800.0, jax.random.PRNGKey(1))
    out = capon.capon_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
    assert np.linalg.norm(np.asarray(out.position) - src) < 0.02


def test_capon_nulls_loud_interferer():
    """A 10x-louder same-bin interferer elsewhere must not drown the weak
    target: the adaptive weights null it, so the 2-peak extraction finds
    BOTH emitters (the Bartlett map at this scene puts its only peak at
    the interferer, 0.69 m from the target)."""
    tgt = np.array([0.25, 0.3, 0.35])
    intf = np.array([0.75, 0.7, 0.6])
    sigs = (_tone_scene(tgt, 600.0, jax.random.PRNGKey(3))
            + 10.0 * _tone_scene(intf, 612.0, jax.random.PRNGKey(4)))
    out = capon.capon_locate_multi(sigs, jnp.asarray(MICS), FS, C, LO, HI,
                                   num_sources=2, min_separation=0.2)
    got = np.asarray(out.positions)
    assert np.linalg.norm(got - intf, axis=-1).min() < 0.03
    assert np.linalg.norm(got - tgt, axis=-1).min() < 0.03
    # The louder emitter is extracted first (descending coarse power).
    assert np.linalg.norm(got[0] - intf) < 0.03


def test_capon_overestimated_sources_harmless():
    """Unlike MUSIC the map does not depend on num_sources — requesting
    more peaks than emitters still returns the true source first."""
    src = np.array([0.4, 0.55, 0.45])
    sigs = _tone_scene(src, 700.0, jax.random.PRNGKey(5))
    out = capon.capon_locate_multi(sigs, jnp.asarray(MICS), FS, C, LO, HI,
                                   num_sources=3)
    assert np.linalg.norm(np.asarray(out.positions[0]) - src) < 0.02


def test_capon_jits_and_vmaps():
    srcs = np.array([[0.3, 0.6, 0.4], [0.65, 0.2, 0.5]])
    batch = jnp.stack([
        _tone_scene(s, 700.0, jax.random.PRNGKey(10 + i))
        for i, s in enumerate(srcs)])
    f = jax.jit(jax.vmap(lambda sg: capon.capon_locate(
        sg, jnp.asarray(MICS), FS, C, LO, HI).position))
    got = np.asarray(f(batch))
    assert np.linalg.norm(got - srcs, axis=-1).max() < 0.02


def test_capon_sweep_solver():
    """SweepSpec(solver='capon') localizes randomized sine scenes."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, run_scene
    mics8 = tuple(tuple(r) for r in MICS)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="capon",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    res = run_scene(spec, jax.random.PRNGKey(5))
    assert float(res.error) < 0.05


def test_capon_sweep_mesh_matches_single_device():
    """solver='capon' under shard_map (batched loaded inverses inside the
    sharded scene pipeline) must match the single-device run."""
    from pyaudiolocalization_tpu.parallel import (SweepSpec, make_mesh,
                                                  monte_carlo_sweep)
    mics8 = tuple(tuple(r) for r in MICS)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="capon",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    key = jax.random.PRNGKey(5)
    single = monte_carlo_sweep(spec, key, 8)
    sharded = monte_carlo_sweep(spec, key, 8, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(sharded.results.error),
                               np.asarray(single.results.error),
                               rtol=1e-4, atol=1e-6)
    assert float(single.rmse) < 0.05


def test_capon_short_signal_raises():
    with pytest.raises(ValueError, match="shorter"):
        capon.capon_locate(jnp.zeros((4, 100)), jnp.asarray(MICS[:4]), FS, C,
                           LO, HI, frame=256)
