"""Model-order estimation: how many simultaneous sources are active?

The reference guesses cluster counts from TDOA scatter
(utils.py:283-300); the narrowband stack here (MUSIC/Capon,
models/music.py, models/capon.py) needs the number of sources as an
input instead.  This module closes the loop with the classic
information-theoretic criteria of Wax & Kailath (1985): for M sensors
and F snapshots with covariance eigenvalues l_1 >= ... >= l_M, the
negative log-likelihood that the smallest M-k eigenvalues are equal
(i.e. only k sources) is

    L(k) = -F (M-k) log( geometric_mean / arithmetic_mean
                         of the M-k smallest eigenvalues )

penalized by the free-parameter count k(2M-k):

    AIC(k) = 2 L(k) + 2 k (2M-k)
    MDL(k) = L(k) + 0.5 k (2M-k) log F

and the estimated order is argmin_k.  MDL is consistent (no
overestimation as F grows); AIC detects weak sources at small F at the
cost of occasional overestimation.

Wideband: covariances from several frequency bins are combined
incoherently — log-likelihood terms add across bins and the penalty
scales with the number of per-bin parameter sets (Wax/Shan/Kailath's
multiple-band formulation).

Everything runs on the real 2Mx2M embedding used by the rest of the
narrowband stack (models/music.embed_planes): the embedding doubles
every complex eigenvalue's multiplicity, so the complex spectrum is the
ascending embedded spectrum decimated by two (pinned against complex
eigvalsh in tests/test_order.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import beamformer as beam_ops
from . import music as music_ops


def complex_eigvals_from_embedded(emb: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of the complex Hermitian C from its real embedding
    [[A, -B], [B, A]]: the embedded spectrum is the complex spectrum with
    every eigenvalue doubled, so take every other ascending value.
    emb: (..., 2M, 2M) -> (..., M) DESCENDING."""
    vals = jnp.linalg.eigvalsh(emb)          # ascending, paired
    return vals[..., ::2][..., ::-1]


def information_criteria(eigvals: jnp.ndarray, num_snapshots: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AIC(k) and MDL(k) for k = 0..M-1 from DESCENDING eigenvalues.

    eigvals: (..., M) — batched over leading axes (e.g. frequency bins).
    Returns (aic, mdl), each (..., M).  Likelihood terms are summed over
    nothing here; callers combine bins by adding L(k) across the batch
    (see estimate_num_sources)."""
    m = eigvals.shape[-1]
    f = float(num_snapshots)
    lam = jnp.maximum(eigvals, 1e-30)
    # suffix arithmetic/geometric means of the (M-k) smallest eigenvalues
    rev = lam[..., ::-1]                                   # ascending
    csum = jnp.cumsum(rev, axis=-1)                        # (..., M)
    clog = jnp.cumsum(jnp.log(rev), axis=-1)
    sizes = jnp.arange(1, m + 1, dtype=lam.dtype)
    arith = csum / sizes                                   # mean of j smallest
    geom = clog / sizes                                    # log geo-mean
    # k sources leave M-k noise eigenvalues: j = M-k
    j = m - jnp.arange(m)                                  # k=0..M-1 -> j=M..1
    ratio = geom[..., j - 1] - jnp.log(jnp.maximum(arith[..., j - 1], 1e-30))
    log_l = -f * j * ratio                                 # L(k) >= 0
    k = jnp.arange(m, dtype=lam.dtype)
    aic = 2.0 * log_l + 2.0 * k * (2 * m - k)
    mdl = log_l + 0.5 * k * (2 * m - k) * np.log(f)
    return aic, mdl


def order_from_eigvals(eigvals: jnp.ndarray, num_snapshots: int,
                       method: str = "mdl",
                       max_sources: Optional[int] = None) -> jnp.ndarray:
    """Estimated source count from one or more covariances' eigenvalues.

    eigvals: (M,) or (B, M) descending (B bins combined incoherently:
    likelihoods add, penalties scale by B)."""
    ev = jnp.atleast_2d(eigvals)
    m = ev.shape[-1]
    aic, mdl = information_criteria(ev, num_snapshots)
    crit = {"aic": aic, "mdl": mdl}.get(method)
    if crit is None:
        raise ValueError(f"method must be 'aic' or 'mdl'; got {method!r}")
    total = jnp.sum(crit, axis=0)                          # (M,)
    if max_sources is not None:
        kmax = int(max_sources)
        total = jnp.where(jnp.arange(m) <= kmax, total, jnp.inf)
    return jnp.argmin(total)


def estimate_num_sources(signals: jnp.ndarray,
                         fs: float,
                         frame: int = 1024,
                         hop: Optional[int] = None,
                         num_bins: int = 8,
                         band: Optional[Tuple[float, float]] = None,
                         method: str = "mdl",
                         max_sources: Optional[int] = None) -> int:
    """Count simultaneous BROADBAND sources from (M, N) mic signals.

    Builds the same STFT snapshots and per-bin embedded covariances as
    MUSIC/Capon (models/music.py), applies Wax-Kailath ``method`` jointly
    over the ``num_bins`` strongest bins, and returns a Python int —
    usable directly as the static ``num_sources`` of music_locate_multi /
    capon_locate_multi (both accept num_sources="auto" which calls this).

    Defaults differ from the localizers on purpose: ``frame`` = 1024 and
    ``hop`` = frame (non-overlapping).  Inter-mic travel delays are a
    sizeable fraction of a short frame, so window-edge decorrelation
    inflates per-bin rank and over-counts (measured: frame 256 reports 2
    for one talker at 20 dB; frame 1024 is exact for 1-3 talkers down to
    0 dB except the genuinely buried 3rd at 0 dB); overlapping snapshots
    are correlated, which weakens the F-scaled penalty the same way.
    The residual edge-leak eigenvalue sits ~25-30 dB below the source
    eigenvalue, so above ~25 dB input SNR it may be counted (+1); longer
    frames trade against snapshot count (4096 on a 2 s capture leaves
    F=7 and MDL breaks down entirely) — raise ``frame`` only with the
    capture length.

    Caveat: spectrally DISJOINT narrowband emitters (two pure tones) are
    each rank-1 in their own bin, so the joint narrowband order is 1 —
    the right subspace size per bin, but not the emitter count; count
    tonal emitters from the multi-peak APIs instead."""
    if method not in ("aic", "mdl"):
        raise ValueError(f"method must be 'aic' or 'mdl'; got {method!r}")
    m = signals.shape[0]
    cap = m - 1 if max_sources is None else min(int(max_sources), m - 1)
    hop = frame if hop is None else int(hop)
    ev, f = _eigvals_jit(jnp.asarray(signals), fs=float(fs), frame=frame,
                         hop=hop, num_bins=num_bins, band=band)
    k = order_from_eigvals(ev, int(f), method=method, max_sources=cap)
    return int(k)


@functools.partial(jax.jit, static_argnames=("fs", "frame", "hop",
                                             "num_bins", "band"))
def _eigvals_jit(signals, *, fs, frame, hop, num_bins, band):
    snaps = music_ops.snapshot_frames(signals, frame, hop)   # (M, F, bins)
    bin_idx, _ = beam_ops.select_bins(
        jnp.mean(jnp.abs(snaps), axis=1), fs, frame, num_bins, band)
    emb = music_ops.embedded_covariances(snaps, bin_idx)     # (B, 2M, 2M)
    return complex_eigvals_from_embedded(emb), snaps.shape[1]
