"""The Pallas FFT prototype (ops/pallas_fft.py): four-step matmul math vs
numpy, kernel in interpret mode (Mosaic lowering is a round-2 item — see
the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.ops import pallas_fft as pf


@pytest.mark.parametrize("n", [64, 1024, 2048, 65536, 131072])
def test_four_step_matches_numpy(rng, n):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    yr, yi = pf.fft_planes_reference(jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x)
    err = np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref))
    assert err / np.max(np.abs(ref)) < 5e-6


def test_kernel_interpret_mode(rng):
    x = (rng.standard_normal((4, 2048)) + 1j * rng.standard_normal((4, 2048))
         ).astype(np.complex64)
    yr, yi = pf.fft_pallas(jnp.asarray(x.real), jnp.asarray(x.imag),
                           rows_per_block=2, interpret=True)
    ref = np.fft.fft(x)
    err = np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref))
    assert err / np.max(np.abs(ref)) < 5e-6


def test_plan_validation():
    assert pf._plan(131072) == [64, 64, 32]
    with pytest.raises(ValueError):
        pf.fft_pallas(jnp.zeros((3, 256)), jnp.zeros((3, 256)),
                      rows_per_block=2, interpret=True)


def test_fft2l_permuted_roundtrip(rng):
    n = 131072
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    yr, yi = pf.fft2l_pallas(jnp.asarray(x.real), jnp.asarray(x.imag),
                             interpret=True)
    got = np.asarray(pf.permuted_to_natural(jax.lax.complex(yr, yi)))
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6
    zr, zi = pf.fft2l_pallas(yr, yi, inverse=True, interpret=True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    orig = np.asarray(x).reshape(2, 128, n // 128)
    assert np.max(np.abs(back - orig)) < 1e-5


def test_permutation_helpers(rng):
    x = jnp.asarray(rng.standard_normal((3, 1024)), jnp.float32)
    perm = pf.natural_to_permuted(x)
    assert perm.shape == (3, 128, 8)
    np.testing.assert_array_equal(np.asarray(pf.permuted_to_natural(perm)),
                                  np.asarray(x))
