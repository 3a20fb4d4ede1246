"""Moving-source tracking: segment-wise localization over time.

No reference counterpart (the reference localizes one static scene).  A long
multi-mic capture is split into overlapping segments; each segment runs the
GCC-PHAT -> SRP-PHAT pipeline independently (vmapped — every segment of
every pair correlates in one XLA graph), producing a time-stamped position
track.  Optional exponential smoothing stabilizes the track under a
`lax.scan`.  ``method='capon'``/``'music'`` swap the per-segment estimator
for the narrowband snapshot-covariance scans (models/capon.py /
models/music.py) — moving TONAL sources, whose correlations carry no usable
peaks for the SRP chain.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gccphat
from ..ops.fftutils import next_pow2
from . import capon as capon_ops
from . import music as music_ops
from . import srp as srp_ops


class Track(NamedTuple):
    times: jnp.ndarray       # (S,) segment-center times, seconds
    positions: jnp.ndarray   # (S, 3) raw per-segment estimates
    smoothed: jnp.ndarray    # (S, 3) exponentially smoothed track
    powers: jnp.ndarray      # (S,) SRP power per segment (confidence)


def localize_trajectory(signals: jnp.ndarray,
                        mic_positions: jnp.ndarray,
                        fs: float,
                        c,
                        lower: jnp.ndarray,
                        upper: jnp.ndarray,
                        segment: int = 4096,
                        hop: Optional[int] = None,
                        band: Optional[Tuple[float, float]] = None,
                        smoothing: float = 0.6,
                        coarse_n: int = 20,
                        fine_n: int = 10,
                        method: str = "srp") -> Track:
    """Track a (slowly) moving source through a long capture.

    signals: (M, T); segments of ``segment`` samples every ``hop`` (default
    segment//2).  Each segment localizes independently over the box
    [lower, upper] — via SRP-PHAT (``method='srp'``, broadband default) or
    the narrowband Capon/MUSIC scans (``method='capon'``/``'music'``, for
    tonal sources); ``smoothing`` is the EMA coefficient applied along
    time (0 disables).  Fully jittable.
    """
    if method not in ("srp", "capon", "music"):
        raise ValueError("method must be 'srp', 'capon', or 'music'")
    m, t = signals.shape
    hop = segment // 2 if hop is None else hop
    if t < segment:
        raise ValueError("signal shorter than one segment")
    num_seg = 1 + (t - segment) // hop
    starts = np.arange(num_seg) * hop
    pi, pj = np.triu_indices(m, 1)
    pi = pi.astype(np.int32)
    pj = pj.astype(np.int32)
    nfft = next_pow2(segment)

    idx = starts[:, None] + np.arange(segment)[None, :]
    segs = jnp.take(signals, jnp.asarray(idx), axis=-1)     # (M, S, L)
    segs = jnp.swapaxes(segs, 0, 1)                         # (S, M, L)

    if method == "srp":
        def one(seg):
            corr = gccphat.gcc_phat_all_pairs(seg, pi, pj, nfft=nfft,
                                              band=band, fs=fs)
            out = srp_ops.srp_phat_locate(corr, mic_positions, pi, pj, fs, c,
                                          lower, upper, coarse_n=coarse_n,
                                          fine_n=fine_n)
            return out.position, out.power
    else:
        # Narrowband per-segment scan: frame ~= segment//4 keeps >= 7 STFT
        # snapshots per segment for the covariance average, rounded DOWN to
        # a power of two — non-pow2 rfft lengths lower to a dense n x n DFT
        # matmul on TPU (CLAUDE.md; the srp branch guards the same way via
        # next_pow2(segment)).
        frame = 1 << max(int(np.log2(max(segment // 4, 64))), 6)
        locate = (capon_ops.capon_locate if method == "capon"
                  else music_ops.music_locate)

        def one(seg):
            out = locate(seg, mic_positions, fs, c, lower, upper,
                         frame=frame, band=band,
                         coarse_n=coarse_n, fine_n=fine_n)
            return out.position, out.power

    positions, powers = jax.vmap(one)(segs)

    def ema(prev, cur):
        nxt = smoothing * prev + (1.0 - smoothing) * cur
        return nxt, nxt

    if smoothing > 0:
        _, smoothed = jax.lax.scan(ema, positions[0], positions)
    else:
        smoothed = positions

    times = jnp.asarray((starts + segment / 2.0) / fs, positions.dtype)
    return Track(times, positions, smoothed, powers)
