"""Signal synchronization before TDOA estimation.

Counterpart of ``synchronize_signals_improved`` (reference: utils.py:407-457):
align every signal to the highest-energy one by full cross-correlation with
cubic-spline sub-sample refinement, gated by a 0.3x-autocorrelation peak
check and a 50 ms plausibility window, then pad-align.

SURVEY.md Q4: this step *cancels the TDOAs* the pipeline then measures; it
is part of the reference's observable behavior, so sync_mode='reference'
reproduces it and sync_mode='none' (the physically sane choice) skips it.
The output padding is data-dependent, so this runs at the host level using
jitted correlation/refinement kernels on concrete scenes; the fully-jitted
batched sweep path uses sync_mode='none'.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import refine_peak_cubic
from .calibration import full_cross_correlation


def synchronize_signals(signals, fs: float, use_interpolation: bool = True):
    """Host-level port-of-behavior of utils.py:407-457 over a list/stack of
    equal- or unequal-length 1-D signals.  Returns a list of jnp arrays."""
    signals = [jnp.asarray(s) for s in signals]
    energies = [float(jnp.sum(s * s)) for s in signals]
    ref_idx = int(np.argmax(energies))
    reference = signals[ref_idx]
    ref_corr = full_cross_correlation(reference, reference)
    ref_peak = float(jnp.max(jnp.abs(ref_corr)))
    max_shift = int(fs * 0.05)  # 50 ms plausibility gate (utils.py:421)

    shifts: List[float] = []
    for idx, sig in enumerate(signals):
        if idx == ref_idx:
            shifts.append(0.0)
            continue
        corr = full_cross_correlation(sig, reference)
        peak_index = int(jnp.argmax(jnp.abs(corr)))
        peak_val = float(jnp.abs(corr[peak_index]))
        if peak_val < 0.3 * ref_peak:
            # Low-confidence peak: skip refinement (utils.py:428-430);
            # only the plausibility gate below may still zero the shift.
            refined = float(peak_index)
        elif use_interpolation and 1 < peak_index < corr.shape[-1] - 2:
            window = jax.lax.dynamic_slice(corr, (peak_index - 2,), (5,))
            refined = float(refine_peak_cubic(window, peak_index))
        else:
            refined = float(peak_index)
        shift = refined - (reference.shape[-1] - 1)
        if abs(shift) > max_shift:
            shift = 0.0  # implausible shift -> 0 (utils.py:443-445)
        shifts.append(shift)

    min_shift = min(shifts)
    adjusted = []
    for sig, shift in zip(signals, shifts):
        pad_left = max(0, int(round(shift - min_shift)))
        adjusted.append(jnp.pad(sig, (pad_left, 0)))
    max_len = max(s.shape[-1] for s in adjusted)
    return [jnp.pad(s, (0, max_len - s.shape[-1])) for s in adjusted]
