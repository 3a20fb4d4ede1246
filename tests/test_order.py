"""Model-order estimation (Wax-Kailath AIC/MDL, models/order.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import music as music_ops
from pyaudiolocalization_tpu.models.capon import capon_locate_multi
from pyaudiolocalization_tpu.models.music import music_locate_multi
from pyaudiolocalization_tpu.models.order import (
    complex_eigvals_from_embedded, estimate_num_sources, order_from_eigvals)


def test_embedded_eigvals_match_complex_oracle():
    rng = np.random.default_rng(0)
    for m in (3, 6):
        x = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
        c = x @ x.conj().T
        emb = music_ops.embed_planes(jnp.asarray(c.real), jnp.asarray(c.imag))
        mine = np.asarray(complex_eigvals_from_embedded(emb))
        ref = np.linalg.eigvalsh(c)[::-1]
        np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("method", ["mdl", "aic"])
@pytest.mark.parametrize("k_true", [0, 1, 2, 3])
def test_synthetic_covariance_order(method, k_true):
    rng = np.random.default_rng(10 + k_true)
    m, f = 8, 400
    a = np.exp(1j * rng.uniform(0, 2 * np.pi, (m, k_true)))
    s = (rng.standard_normal((k_true, f))
         + 1j * rng.standard_normal((k_true, f))) * 2.0
    noise = (rng.standard_normal((m, f))
             + 1j * rng.standard_normal((m, f))) / np.sqrt(2)
    x = a @ s + noise if k_true else noise
    cov = x @ x.conj().T / f
    ev = jnp.asarray(np.linalg.eigvalsh(cov)[::-1])
    got = int(order_from_eigvals(ev, f, method))
    if method == "mdl":
        assert got == k_true            # MDL is consistent
    else:
        # AIC is not consistent: it overestimates with finite probability
        # (Wax & Kailath 1985), but never under-detects here
        assert k_true <= got <= k_true + 1


def _broadband_scene(k, snr_db, seed, fs=16000.0, n=32000, m=8):
    rng = np.random.default_rng(seed)
    mics = rng.uniform(0, 1, (m, 3))
    sigs = np.zeros((m, n))
    positions = [(0.2, 0.3, 0.5), (0.8, 0.7, 0.4), (0.5, 0.9, 0.2)][:k]
    for pos in positions:
        src = rng.standard_normal(n + 400)
        d = np.linalg.norm(mics - np.array(pos), axis=1)
        for i in range(m):
            delay = int(round(d[i] / 343.0 * fs))
            sigs[i] += src[delay:delay + n] / max(d[i], 1e-3)
    p = np.sqrt((sigs ** 2).mean())
    sigs += p * 10 ** (-snr_db / 20) * rng.standard_normal(sigs.shape)
    return jnp.asarray(sigs), jnp.asarray(mics), positions, fs


@pytest.mark.parametrize("k_true", [1, 2, 3])
def test_broadband_talker_count(k_true):
    for snr in (20, 10):
        sigs, _, _, fs = _broadband_scene(k_true, snr, seed=1)
        assert estimate_num_sources(sigs, fs) == k_true, (k_true, snr)


def test_single_source_overcount_bounded_at_extreme_snr():
    # window-edge rank leakage sits ~25-30 dB below the source eigenvalue
    # (order.py docstring): at 30 dB input SNR it may be counted, but the
    # overcount stays bounded at +1 with the 1024 non-overlap default
    sigs, _, _, fs = _broadband_scene(1, 30, seed=2)
    assert 1 <= estimate_num_sources(sigs, fs) <= 2


def test_bad_method_raises():
    sigs, _, _, fs = _broadband_scene(1, 20, seed=3)
    with pytest.raises(ValueError, match="aic"):
        estimate_num_sources(sigs, fs, method="bic")


@pytest.mark.parametrize("locate", [music_locate_multi, capon_locate_multi])
def test_auto_num_sources_wires_the_mdl_count(locate):
    """num_sources='auto' must extract exactly the MDL-counted peaks.
    (Positional accuracy of the narrowband estimators on TONAL scenes is
    covered by test_music/test_capon; a broadband-noise scene is the
    order-estimation use case, not the narrowband-accuracy one.)"""
    sigs, mics, positions, fs = _broadband_scene(2, 20, seed=4)
    assert estimate_num_sources(sigs, fs) == 2
    lo, hi = jnp.zeros(3), jnp.ones(3)
    res = locate(sigs, mics, fs, 343.0, lo, hi, num_sources="auto")
    got = np.asarray(res.positions)
    assert got.shape == (2, 3)   # the MDL count, not a caller-given K
    assert np.isfinite(got).all()
    assert (got >= 0).all() and (got <= 1).all()
