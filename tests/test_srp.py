"""SRP-PHAT localization (models/srp.py): single- and multi-source."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import srp
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
from pyaudiolocalization_tpu.ops import gccphat

FS = 16000.0
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
PI = np.array([0, 0, 0, 1, 1, 2], np.int32)
PJ = np.array([1, 2, 3, 2, 3, 3], np.int32)
C = float(speed_of_sound(20.0, 50.0))
LO = jnp.asarray([0.0, 0.0, 0.0])
HI = jnp.asarray([1.0, 1.0, 1.0])


def _scene_corr(sources, keys):
    sigs = sum(
        simulate_signals(src, MICS, FS, C, duration=0.25, signal_type="noise",
                         key=k)
        for src, k in zip(sources, keys))
    return gccphat.gcc_phat_all_pairs(jnp.asarray(sigs), PI, PJ, nfft=8192)


def test_srp_single_source():
    src = np.array([0.3, 0.6, 0.4])
    corr = _scene_corr([src], [jax.random.PRNGKey(0)])
    out = srp.srp_phat_locate(corr, jnp.asarray(MICS), PI, PJ, FS, C, LO, HI)
    assert np.linalg.norm(np.asarray(out.position) - src) < 0.02


def test_srp_single_source_jits_and_vmaps():
    srcs = np.array([[0.3, 0.6, 0.4], [0.7, 0.2, 0.5]])
    corrs = jnp.stack([
        _scene_corr([s], [jax.random.PRNGKey(i)]) for i, s in enumerate(srcs)])
    f = jax.jit(jax.vmap(lambda cc: srp.srp_phat_locate(
        cc, jnp.asarray(MICS), PI, PJ, FS, C, LO, HI).position))
    got = np.asarray(f(corrs))
    assert np.linalg.norm(got - srcs, axis=-1).max() < 0.02


def test_srp_multi_source_two_talkers():
    """Two independent broadband sources produce two separable SRP peaks.
    Uses 8 mics: with only 6 pairs, cross-source ghost intersections can
    rival true peaks (documented in srp_phat_locate_multi)."""
    mics8 = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                      [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    pi8, pj8 = np.triu_indices(8, 1)
    pi8 = pi8.astype(np.int32)
    pj8 = pj8.astype(np.int32)
    srcs = np.array([[0.2, 0.2, 0.3], [0.8, 0.7, 0.6]])
    sigs = sum(
        simulate_signals(s, mics8, FS, C, duration=0.15, signal_type="noise",
                         key=jax.random.PRNGKey(i + 1))
        for i, s in enumerate(srcs))
    corr = gccphat.gcc_phat_all_pairs(jnp.asarray(sigs), pi8, pj8, nfft=8192)
    out = srp.srp_phat_locate_multi(
        corr, jnp.asarray(mics8), pi8, pj8, FS, C, LO, HI, num_sources=2)
    got = np.asarray(out.positions)
    # match by best assignment (2 permutations)
    e1 = np.linalg.norm(got - srcs, axis=-1).max()
    e2 = np.linalg.norm(got - srcs[::-1], axis=-1).max()
    assert min(e1, e2) < 0.08
    assert np.all(np.asarray(out.powers) > 0)


def test_srp_multi_suppression_separates_peaks():
    """Requesting more sources than exist still returns distinct positions
    (suppression prevents duplicates of the dominant peak).  Off-center
    source: an equidistant one has all-zero TDOAs, whose SRP maximum is a
    ridge along the array's symmetry axis (reference quirk Q6 geometry)."""
    src = np.array([0.3, 0.6, 0.4])
    corr = _scene_corr([src], [jax.random.PRNGKey(3)])
    out = srp.srp_phat_locate_multi(
        corr, jnp.asarray(MICS), PI, PJ, FS, C, LO, HI, num_sources=3)
    got = np.asarray(out.positions)
    d01 = np.linalg.norm(got[0] - got[1])
    assert np.linalg.norm(got[0] - src) < 0.02
    assert d01 > 0.05  # second "source" pushed away by suppression


def test_quadratic_peak_offset_recovers_subcell_peak():
    """A quadratic map with a known off-lattice peak is recovered to a
    small fraction of the lattice spacing; boundary argmaxes keep a zero
    offset."""
    import jax.numpy as jnp
    import numpy as np
    from pyaudiolocalization_tpu.models.srp import (_grid_points,
                                                    quadratic_peak_offset)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    n = 9
    pts = _grid_points(lo, hi, n, jnp.float64)
    true = jnp.asarray([0.47, 0.52, 0.61])   # off-lattice interior point
    vals = -jnp.sum((pts - true[None, :]) ** 2, axis=-1)
    k = jnp.argmax(vals)
    spacing = (hi - lo) / n
    refined = pts[k] + quadratic_peak_offset(vals, k, n, spacing)
    assert float(jnp.linalg.norm(refined - true)) < 1e-6  # exact for a
    # parabola up to float rounding
    # boundary: peak outside the box -> argmax on a face, offset zero
    vals_edge = -jnp.sum((pts - jnp.asarray([-0.3, 0.5, 0.5])) ** 2, -1)
    ke = jnp.argmax(vals_edge)
    off = quadratic_peak_offset(vals_edge, ke, n, spacing)
    assert float(jnp.abs(off[0])) == 0.0
