"""Cross-implementation parity for ops/resample.py (VERDICT r2 item 6).

resampy is not installed here and the environment has no network, so true
golden vectors cannot be generated; instead this file carries an
INDEPENDENT NumPy reimplementation of resampy's published kaiser_best
algorithm — the tabulated Kaiser-sinc filter (64 zero crossings, 512
table samples per crossing), linear interpolation between table entries,
the integer-quantized table stride `int(scale * 512)`, and the two-wing
accumulation loop (resampy.core.resample_f semantics).  Agreement between
that oracle and ops/resample.py (which evaluates the kernel exactly at
fractional positions instead of tabulating) pins the construction:
window parameters, scale handling, output positions t = n / ratio, and
output length.

Measured agreement: ~1e-7 relative wherever resampy's table stride is
exact (all upsampling, rational downsampling such as 2:1), and ~3e-3 on
irrational-ratio downsampling (44.1k->16k), where resampy's int-quantized
stride dilates its kernel by 512/185 = 2.7676 while ops/resample dilates
by the exact 1/scale = 2.7563 — the one documented, deliberate deviation
(ours keeps the cutoff exactly at the new Nyquist).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyaudiolocalization_tpu.ops.resample import (
    resample, KAISER_BEST_ZEROS, KAISER_BEST_BETA, KAISER_BEST_ROLLOFF)

P = 512  # table samples per zero crossing (resampy precision=9 -> 2^9)


def _resampy_oracle(x: np.ndarray, sr_orig: float, sr_new: float
                    ) -> np.ndarray:
    nz = KAISER_BEST_ZEROS
    tt = np.arange(nz * P + 1) / P
    arg = np.sqrt(np.clip(1.0 - (tt / nz) ** 2, 0.0, None))
    win = (KAISER_BEST_ROLLOFF * np.sinc(KAISER_BEST_ROLLOFF * tt)
           * np.i0(KAISER_BEST_BETA * arg) / np.i0(KAISER_BEST_BETA))
    ratio = sr_new / sr_orig
    scale = min(1.0, ratio)
    if ratio < 1:
        win = win * ratio
    delta = np.diff(np.append(win, 0.0))
    step = int(scale * P)
    n_out = int(np.ceil(len(x) * ratio))
    y = np.zeros(n_out)
    nwin = len(win)
    for t in range(n_out):
        time = t / ratio
        n = int(time)
        frac = scale * (time - n)
        idxf = frac * P
        off = int(idxf)
        eta = idxf - off
        i_max = min(n + 1, (nwin - off + step - 1) // step)
        for i in range(i_max):
            j = off + i * step
            y[t] += (win[j] + eta * delta[j]) * x[n - i]
        idxf = (scale - frac) * P
        off = int(idxf)
        eta = idxf - off
        k_max = min(len(x) - n - 1, (nwin - off + step - 1) // step)
        for k in range(k_max):
            j = off + k * step
            y[t] += (win[j] + eta * delta[j]) * x[n + k + 1]
    return y


def _bandlimited_noise(n: int, sr: float, f_max: float,
                       seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    spec = np.zeros(n // 2 + 1, complex)
    k_max = int(f_max / sr * n)
    spec[1:k_max] = (rng.standard_normal(k_max - 1)
                     + 1j * rng.standard_normal(k_max - 1))
    x = np.fft.irfft(spec, n)
    return x / np.max(np.abs(x))


@pytest.mark.parametrize("sr_orig,sr_new,tol", [
    (8000.0, 44100.0, 5e-6),    # upsample, irrational ratio
    (22050.0, 44100.0, 5e-7),   # exact 2x upsample
    (44100.0, 22050.0, 5e-7),   # exact 2x downsample (stride 256 exact)
    (44100.0, 16000.0, 6e-3),   # irrational downsample: quantized-stride
                                # kernel dilation deviation (see module doc)
])
def test_matches_resampy_algorithm(sr_orig, sr_new, tol):
    f_max = 0.35 * min(sr_orig, sr_new)
    x = _bandlimited_noise(1600, sr_orig, f_max, seed=3)
    ref = _resampy_oracle(x, sr_orig, sr_new)
    got = np.asarray(resample(jnp.asarray(x), sr_orig, sr_new))
    assert got.shape == ref.shape
    m = len(ref) // 10   # interior: signal-edge conventions differ
    err = np.max(np.abs(got[m:-m] - ref[m:-m])) / np.max(np.abs(ref))
    assert err < tol, f"{sr_orig}->{sr_new}: rel err {err:.2e}"


def test_output_length_convention():
    # resampy: n_out = ceil(n * ratio)
    for n, so, sn in [(1000, 44100, 16000), (777, 8000, 44100),
                      (512, 48000, 32000)]:
        x = jnp.zeros(n)
        assert resample(x, so, sn).shape[-1] == int(np.ceil(n * sn / so))
