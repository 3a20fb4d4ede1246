"""The Pallas whitening kernel (ops/pallas_kernels.py), run in interpret
mode on CPU (Mosaic lowering needs a real TPU; interpret mode checks the
kernel's math and indexing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.ops import gccphat
from pyaudiolocalization_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("rows,bins", [(8, 512), (6, 1024), (3, 200)])
def test_whiten_kernel_interpret_matches_jnp(rng, rows, bins):
    re = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    wr, wi = pk.phat_whiten_planes(re, im, eps=1e-10, interpret=True)
    mag = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2) + 1e-10
    np.testing.assert_allclose(np.asarray(wr), np.asarray(re) / mag,
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(wi), np.asarray(im) / mag,
                               rtol=2e-6, atol=2e-6)
    out_mag = np.hypot(np.asarray(wr), np.asarray(wi))
    assert np.all(out_mag <= 1.0 + 1e-5)


def test_whiten_gate_off_tpu():
    """On CPU the availability gate must reject (Mosaic is TPU-only)."""
    x = jnp.zeros((4, 128), jnp.float32)
    assert pk.whiten_available(x) is False


def test_gcc_whiten_modes_agree(rng):
    """'auto' (fused XLA) equals the explicit jnp math."""
    spec = (jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
            + 1j * jnp.asarray(rng.standard_normal((2, 64)), jnp.float32))
    a = gccphat._whiten(spec, 1e-10, use_pallas="auto")
    b = spec / (jnp.abs(spec) + 1e-10)
    np.testing.assert_allclose(np.asarray(jnp.real(a)), np.asarray(jnp.real(b)),
                               atol=1e-6)
