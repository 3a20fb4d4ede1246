"""FFT length helpers and arbitrary-length transforms for TPU.

The reference always transforms at exactly n1+n2-1 samples (utils.py:112-114)
and fractional delays at exactly 2N (signal_processing.py:69) — large
non-power-of-2 lengths.  CPU FFT libraries handle any length, but XLA's TPU
FFT only lowers friendly radices efficiently; other lengths become a dense
DFT *matmul* (an n x n matrix — 31 GB for n = 88422), which is unusable.

Two tools here:
  * ``fft_length`` — pick pow2 lengths on the performance paths;
  * ``rfft_n`` / ``irfft_n`` — exact-length transforms everywhere else: on
    CPU they call the native FFT; on TPU, non-pow2 lengths go through a
    Bluestein chirp-z transform built from power-of-2 FFTs (3 transforms of
    M = next_pow2(2n-1)), with all chirp phases precomputed host-side in
    exact integer-mod arithmetic (m^2 mod 2n stays exact where float64 m^2
    would lose the low bits that determine the phase).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def next_pow2(n: int) -> int:
    return 1 << (max(1, n) - 1).bit_length()


def fft_length(n1: int, n2: int, mode: str = "pow2") -> int:
    """Linear-correlation FFT length for signals of length n1 and n2.

    mode='exact' reproduces the reference's n1+n2-1; mode='pow2' rounds up to
    a power of two (peak positions are unchanged; per-bin whitening weights
    differ slightly — see SURVEY.md §5.7).
    """
    n = n1 + n2 - 1
    if mode == "exact":
        return n
    if mode == "pow2":
        return next_pow2(n)
    if mode == "circular":
        # next_pow2(max(n1, n2)): the correlation is circular — lag l
        # aliases with l -/+ nfft.  For whitened (PHAT) correlations the
        # aliased background is noise-level, so windowed peak picking at
        # small |l| is unaffected while the FFTs halve in size.  Physical
        # mode only; never used for reference parity.
        return next_pow2(max(n1, n2))
    raise ValueError(f"unknown fft length mode {mode!r}")


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _use_bluestein(n: int) -> bool:
    if _is_pow2(n):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=32)
def _bluestein_consts(n: int, forward: bool):
    """Host-precomputed chirp constants for a length-n DFT (inverse when
    ``forward`` is False, without the 1/n factor).

    Returns (M, u_phase (n,), v_spec (M,), k_phase (n,)) as complex128 numpy;
    cast to the working precision at trace time.
    """
    M = next_pow2(2 * n - 1)
    m = np.arange(n, dtype=np.int64)
    # W^(m^2/2) with W = exp(-+2i pi / n): angle = -+pi * (m^2 mod 2n) / n,
    # the modulus taken in exact integer arithmetic.
    sq = (m * m) % (2 * n)
    ang = np.pi * sq.astype(np.float64) / n
    sign = -1.0 if forward else 1.0
    u_phase = np.exp(sign * 1j * ang)         # multiply input
    k_phase = u_phase                          # multiply output (same chirp)
    v = np.exp(-sign * 1j * ang)               # conv kernel W^(-m^2/2)
    v_pad = np.zeros(M, np.complex128)
    v_pad[:n] = v
    v_pad[M - n + 1:] = v[1:][::-1]            # kernel at negative offsets
    v_spec = np.fft.fft(v_pad)
    return M, u_phase, v_spec, k_phase


def _czt(x: jnp.ndarray, n: int, forward: bool) -> jnp.ndarray:
    """Length-n DFT (or unnormalized inverse) of the last axis of complex
    ``x`` (length <= n; zero-padded), via Bluestein on pow2 FFTs."""
    M, u_np, v_np, k_np = _bluestein_consts(n, forward)
    cdt = x.dtype
    rdt = jnp.float32 if cdt == jnp.complex64 else jnp.float64

    def put(z):
        # Host->device transfer of complex constants is unimplemented on the
        # TPU tunnel backend; ship real/imag planes and combine on device.
        return jax.lax.complex(jnp.asarray(np.real(z), rdt),
                               jnp.asarray(np.imag(z), rdt))

    u = put(u_np)
    v = put(v_np)
    kp = put(k_np)
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    a = x[..., :n] * u
    A = jnp.fft.fft(a, n=M)
    conv = jnp.fft.ifft(A * v)[..., :n]
    return conv * kp


def rfft_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """``jnp.fft.rfft(x, n=n)`` that stays off the TPU's dense-DFT fallback
    for non-power-of-2 n."""
    if not _use_bluestein(n):
        return jnp.fft.rfft(x, n=n)
    cdt = jnp.complex64 if jnp.dtype(x.dtype).itemsize <= 4 else jnp.complex128
    full = _czt(x.astype(cdt), n, forward=True)
    return full[..., : n // 2 + 1]


def _pack_ok(n: int, axis_len: int) -> bool:
    """Use the packed-pair c2c path: TPU backend, pow2 length, even batch."""
    if axis_len % 2 or not _is_pow2(n):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def rfft_pack2(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """rfft over the last axis with PAIRS of real rows packed into one
    complex FFT (second-to-last axis must be even).

    Two real length-n transforms cost one c2c FFT + an elementwise untangle:
    Z = fft(a + i b) gives A[k] = (Z[k] + conj(Z[-k]))/2 and
    B[k] = -i (Z[k] - conj(Z[-k]))/2.  Measured on v5e at n=131072, XLA's
    rfft costs ~1.4x the equivalent packed c2c (and irfft ~2x), so the
    GCC-PHAT hot path routes through these.

    Self-contained dispatch: ineligible inputs (odd batch, non-pow2 n,
    non-TPU) fall back to the TPU-safe exact transform (``rfft_n``), so
    callers can use this unconditionally.
    """
    if x.ndim < 2 or not _pack_ok(n, x.shape[-2]):
        return rfft_n(x, n)
    shape = x.shape
    xr = x.reshape(shape[:-2] + (shape[-2] // 2, 2, shape[-1]))
    z = jax.lax.complex(xr[..., 0, :], xr[..., 1, :])
    Z = jnp.fft.fft(z, n=n)
    Zrev = jnp.conj(jnp.roll(Z[..., ::-1], 1, axis=-1))    # conj(Z[-k])
    nb = n // 2 + 1
    A = 0.5 * (Z + Zrev)[..., :nb]
    B = -0.5j * (Z - Zrev)[..., :nb]
    out = jnp.stack([A, B], axis=-2)
    return out.reshape(shape[:-2] + (shape[-2], nb))


def irfft_pack2(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """irfft over the last axis with PAIRS of Hermitian half-spectra packed
    into one complex inverse FFT (second-to-last axis must be even):
    z[k] = W1full[k] + i W2full[k] -> w1 = Re ifft(z), w2 = Im ifft(z).

    Matches ``jnp.fft.irfft`` semantics exactly: the imaginary parts of the
    DC and Nyquist bins are DISCARDED (a naive pack would leak them into
    the partner row as constant/alternating terms — e.g. delay_and_sum's
    fractional-delay phase ramp makes the Nyquist bin genuinely complex),
    and short half-spectra are zero-padded.  Ineligible inputs fall back to
    the TPU-safe ``irfft_n``; callers can use this unconditionally.
    """
    if spec.ndim < 2 or not _pack_ok(n, spec.shape[-2]):
        return irfft_n(spec, n)
    shape = spec.shape
    nb = n // 2 + 1
    if shape[-1] < nb:  # jnp.fft.irfft zero-pads short half-spectra
        pad = [(0, 0)] * (spec.ndim - 1) + [(0, nb - shape[-1])]
        spec = jnp.pad(spec, pad)
    s = spec[..., :nb].reshape(shape[:-2] + (shape[-2] // 2, 2, nb))
    # irfft ignores Im at bins 0 and n/2; zero them before packing.
    bins = jnp.arange(nb)
    keep = (bins != 0) & (bins != n // 2)
    s = jnp.where(keep, s, jnp.real(s).astype(s.dtype))
    z_head = s[..., 0, :] + 1j * s[..., 1, :]               # k = 0..n/2
    tail = jnp.conj(s[..., 0, 1:n - nb + 1][..., ::-1]) \
        + 1j * jnp.conj(s[..., 1, 1:n - nb + 1][..., ::-1])  # k = n/2+1..n-1
    zfull = jnp.concatenate([z_head, tail], axis=-1)
    w = jnp.fft.ifft(zfull)
    out = jnp.stack([jnp.real(w), jnp.imag(w)], axis=-2)
    return out.reshape(shape[:-2] + (shape[-2], n))


def irfft_n(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """``jnp.fft.irfft(spec, n=n)`` with the same TPU-safe dispatch."""
    if not _use_bluestein(n):
        return jnp.fft.irfft(spec, n=n)
    # Rebuild the full Hermitian spectrum, inverse-DFT via Bluestein.
    nb = n // 2 + 1
    spec = spec[..., :nb]
    tail = jnp.conj(spec[..., 1: n - nb + 1])[..., ::-1]
    full = jnp.concatenate([spec, tail], axis=-1)
    out = _czt(full, n, forward=False) / n
    rdt = jnp.float32 if spec.dtype == jnp.complex64 else jnp.float64
    return jnp.real(out).astype(rdt)
