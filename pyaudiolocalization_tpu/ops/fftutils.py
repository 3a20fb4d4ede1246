"""FFT length helpers.

The reference always transforms at exactly n1+n2-1 samples (utils.py:112-114),
a large odd length that XLA's TPU FFT handles via Bluestein.  The performance
path pads to the next power of two instead (friendly radix for the TPU FFT);
compat/parity paths keep the exact length.
"""

from __future__ import annotations


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
    raise ValueError(f"unknown fft length mode {mode!r}")
