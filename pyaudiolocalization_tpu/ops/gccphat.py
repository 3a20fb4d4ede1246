"""GCC-PHAT cross-correlation — the estimation kernel of the framework.

TPU-native counterpart of ``phat_correlation`` (reference: utils.py:108-119):
``corr = ifft( (F s1 · conj F s2) / (|·| + 1e-10) ).real``.  Design:

  * real-input rfft/irfft (identical math for real signals — the whitened
    spectrum stays Hermitian);
  * all-pairs form: one rfft per *mic* (M transforms), then gather the
    (i, j) pair spectra and whiten/invert per pair — instead of the
    reference's 3 full FFTs per pair inside a Python loop (utils.py:112-118);
  * everything carries leading batch axes (scenes, pairs) so one XLA graph
    correlates thousands of pairs;
  * optional Pallas whitening kernel on TPU (ops/pallas_kernels.py);
  * two lag conventions (SURVEY.md Q1): the raw ifft output is circular —
    lag 0 at index 0, negative lags wrapped at the end.  'physical' decodes
    that correctly; 'reference' reproduces the scipy-'full' index mapping the
    reference applies to it (utils.py:141-142), off by n2-1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fftutils import fft_length, rfft_n, irfft_n
from . import pallas_kernels

PHAT_EPS = 1e-10


def _whiten(spec: jnp.ndarray, eps: float, use_pallas: str = "auto") -> jnp.ndarray:
    """spec / (|spec| + eps), elementwise over a complex array."""
    re, im = jnp.real(spec), jnp.imag(spec)
    if use_pallas != "never" and pallas_kernels.whiten_available(re):
        shape = re.shape
        re2 = re.reshape(-1, shape[-1])
        im2 = im.reshape(-1, shape[-1])
        wr, wi = pallas_kernels.phat_whiten_planes(re2, im2, eps=eps)
        return jax.lax.complex(wr.reshape(shape), wi.reshape(shape))
    inv = 1.0 / (jnp.sqrt(re * re + im * im) + eps)
    return spec * inv


def phat_correlation(sig1: jnp.ndarray, sig2: jnp.ndarray,
                     nfft: Optional[int] = None, eps: float = PHAT_EPS,
                     use_pallas: str = "auto") -> jnp.ndarray:
    """Whitened cross-correlation of two signals (leading axes broadcast).

    With nfft=None the exact reference length n1+n2-1 is used; the output is
    in circular order exactly like the reference's (utils.py:118).
    """
    n1, n2 = sig1.shape[-1], sig2.shape[-1]
    n = nfft if nfft is not None else fft_length(n1, n2, "exact")
    s1 = rfft_n(sig1, n)
    s2 = rfft_n(sig2, n)
    r = _whiten(s1 * jnp.conj(s2), eps, use_pallas)
    return irfft_n(r, n).astype(sig1.dtype)


def gcc_phat_all_pairs(signals: jnp.ndarray,
                       pairs_i: np.ndarray,
                       pairs_j: np.ndarray,
                       nfft: Optional[int] = None,
                       eps: float = PHAT_EPS,
                       use_pallas: str = "auto") -> jnp.ndarray:
    """GCC-PHAT for every mic pair at once.

    signals: (..., M, N); pairs_i/pairs_j: static int arrays of length P
    (i < j, reference loop order main.py:202-203).  Returns (..., P, n).
    One rfft batch of M transforms replaces the reference's 3 FFTs per pair.
    """
    n_samp = signals.shape[-1]
    n = nfft if nfft is not None else fft_length(n_samp, n_samp, "exact")
    spec = rfft_n(signals, n)                              # (..., M, F)
    cross = jnp.take(spec, pairs_i, axis=-2) * jnp.conj(
        jnp.take(spec, pairs_j, axis=-2))                  # (..., P, F)
    white = _whiten(cross, eps, use_pallas)
    return irfft_n(white, n).astype(signals.dtype)


# ---------------------------------------------------------------------------
# Lag conventions
# ---------------------------------------------------------------------------

def lags_reference(n1: int, n2: int, n: int) -> np.ndarray:
    """The reference's (defective, Q1) lag axis: scipy correlation_lags
    'full' values indexed positionally against the circular array
    (utils.py:141-142): lag[k] = k - (n2 - 1), extended to length n."""
    return np.arange(n) - (n2 - 1)


def lags_physical(n1: int, n: int) -> np.ndarray:
    """Correct circular decoding: index k holds linear-correlation lag
    m = k for k < n1 and m = k - n otherwise."""
    k = np.arange(n)
    return np.where(k < n1, k, k - n)


def lag_axis(mode: str, n1: int, n2: int, n: int) -> np.ndarray:
    if mode in ("reference", "compat"):
        return lags_reference(n1, n2, n)
    if mode == "physical":
        return lags_physical(n1, n)
    raise ValueError(f"unknown lag mode {mode!r}")
