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

``smoother='kalman'`` replaces the causal EMA with a constant-velocity
Kalman filter + Rauch-Tung-Striebel backward smoother: per-segment SRP
power weights the measurement covariance (low-confidence segments pull the
track less), the measurement noise is auto-calibrated from the robust
second difference of the raw track (zero for any constant-velocity truth,
so linear motion does not inflate it), and the backward pass makes the
estimate two-sided — the EMA's half-segment lag on a moving source
disappears.  Everything runs as two ``lax.scan`` passes over (S, 3, 2)
state; the three axes decouple (block-diagonal F/Q/H/R), so the per-axis
filters are 2-state and the 2x2 algebra is closed-form.
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
    smoothed: jnp.ndarray    # (S, 3) smoothed track (EMA or Kalman/RTS)
    powers: jnp.ndarray      # (S,) SRP power per segment (confidence)


def kalman_rts_smooth(positions: jnp.ndarray,
                      dt,
                      powers: Optional[jnp.ndarray] = None,
                      accel_std: float = 0.5,
                      meas_std: Optional[float] = None) -> Tuple[jnp.ndarray,
                                                                 jnp.ndarray]:
    """Constant-velocity Kalman + RTS smoothing of a position track.

    positions: (S, D) raw per-segment estimates sampled every ``dt``
    seconds.  ``powers`` (S,) optionally weights each measurement: the
    per-segment covariance is scaled by median(powers)/power (clipped to
    [0.1, 10]), so low-confidence segments pull the track less.
    ``accel_std`` (m/s^2) is the white-acceleration process noise;
    ``meas_std`` (m) defaults to a robust estimate from the track's second
    difference — exactly zero for constant-velocity truth, so source motion
    does not inflate it (d2 of white measurement noise ~ N(0, 6*sigma^2)).

    Returns ``(smoothed_positions, velocities)``, both (S, D).  Jittable;
    the three spatial axes decouple, so the scan state is (D, 2)/(D, 2, 2)
    with closed-form 2x2 inverses.
    """
    z = jnp.asarray(positions)
    s, d = z.shape
    dtype = z.dtype
    if s < 2:
        return z, jnp.zeros_like(z)
    dt = jnp.asarray(dt, dtype)

    if meas_std is None:
        if s >= 4:
            d2 = z[2:] - 2.0 * z[1:-1] + z[:-2]          # (S-2, D)
            mad = jnp.median(jnp.abs(d2))
            sigma = 1.4826 * mad / jnp.sqrt(6.0)
        else:
            sigma = jnp.asarray(0.02, dtype)
        # Floor: a perfectly static noiseless track would otherwise make R
        # singular against P's process noise.
        meas_var = jnp.maximum(sigma, 1e-4) ** 2
    else:
        meas_var = jnp.asarray(float(meas_std), dtype) ** 2

    if powers is None:
        w = jnp.ones((s,), dtype)
    else:
        p = jnp.asarray(powers, dtype)
        ref = jnp.maximum(jnp.median(p), jnp.asarray(1e-30, dtype))
        w = jnp.clip(p / ref, 0.1, 10.0)
    r_t = meas_var / w                                   # (S,)

    q = jnp.asarray(accel_std, dtype)
    f_mat = jnp.array([[1.0, 1.0], [0.0, 1.0]], dtype).at[0, 1].set(dt)
    q_mat = (q * q) * jnp.array(
        [[0.25, 0.5], [0.5, 1.0]], dtype) * jnp.stack(
        [jnp.stack([dt ** 4, dt ** 3]), jnp.stack([dt ** 3, dt ** 2])])

    def inv2(a):
        det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
        adj = jnp.stack(
            [jnp.stack([a[..., 1, 1], -a[..., 0, 1]], -1),
             jnp.stack([-a[..., 1, 0], a[..., 0, 0]], -1)], -2)
        return adj / det[..., None, None]

    m0 = jnp.stack([z[0], jnp.zeros((d,), dtype)], axis=-1)     # (D, 2)
    big = 100.0 * meas_var
    p0 = jnp.broadcast_to(
        jnp.diag(jnp.stack([big, big / (dt * dt)])), (d, 2, 2))

    def fwd(carry, inp):
        m, p = carry                                     # (D,2), (D,2,2)
        zt, rt = inp
        m_pred = m @ f_mat.T
        p_pred = jnp.einsum("ij,djk,lk->dil", f_mat, p, f_mat) + q_mat
        # H = [1, 0]: scalar innovation per axis.
        innov = zt - m_pred[:, 0]                        # (D,)
        s_cov = p_pred[:, 0, 0] + rt                     # (D,)
        k = p_pred[:, :, 0] / s_cov[:, None]             # (D, 2)
        m_new = m_pred + k * innov[:, None]
        p_new = p_pred - k[:, :, None] * p_pred[:, None, 0, :]
        return (m_new, p_new), (m_new, p_new, m_pred, p_pred)

    (_, _), (ms, ps, mp, pp) = jax.lax.scan(
        fwd, (m0, p0), (z, r_t))

    def bwd(carry, inp):
        x_next = carry                                   # (D, 2) smoothed t+1
        m_t, p_t, m_pred_next, p_pred_next = inp
        c = jnp.einsum("dij,kj,dkl->dil", p_t, f_mat, inv2(p_pred_next))
        x_t = m_t + jnp.einsum("dij,dj->di", c, x_next - m_pred_next)
        return x_t, x_t

    # RTS runs t = S-2 .. 0 against the prediction made FOR t+1.
    _, xs_rev = jax.lax.scan(
        bwd, ms[-1],
        (ms[:-1][::-1], ps[:-1][::-1], mp[1:][::-1], pp[1:][::-1]))
    x_smooth = jnp.concatenate([xs_rev[::-1], ms[-1:]], axis=0)
    return x_smooth[..., 0], x_smooth[..., 1]


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
                        method: str = "srp",
                        smoother: str = "ema",
                        accel_std: float = 0.5,
                        weighting: str = "phat") -> Track:
    """Track a (slowly) moving source through a long capture.

    signals: (M, T); segments of ``segment`` samples every ``hop`` (default
    segment//2).  Each segment localizes independently over the box
    [lower, upper] — via SRP-PHAT (``method='srp'``, broadband default) or
    the narrowband Capon/MUSIC scans (``method='capon'``/``'music'``, for
    tonal sources); ``smoothing`` is the EMA coefficient applied along
    time (0 disables).  ``smoother='kalman'`` replaces the EMA with the
    power-weighted constant-velocity Kalman/RTS smoother
    (:func:`kalman_rts_smooth`; ``accel_std`` is its process noise and
    ``smoothing`` is ignored).  ``weighting`` selects the GCC frequency
    weighting for the 'srp' method (ops/gccphat.GCC_WEIGHTINGS minus
    'ml' — per-segment single snapshots have degenerate coherence; for
    ML-weighted online tracking use StreamingLocalizer).  Fully jittable.
    """
    if method not in ("srp", "capon", "music"):
        raise ValueError("method must be 'srp', 'capon', or 'music'")
    if weighting not in ("phat", "scot", "roth", "cc"):
        raise ValueError("weighting must be 'phat', 'scot', 'roth', or "
                         "'cc' for segment tracking")
    if weighting != "phat" and method != "srp":
        raise ValueError("weighting applies to method='srp' only")
    if smoother not in ("ema", "kalman"):
        raise ValueError("smoother must be 'ema' or 'kalman'")
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
                                              band=band, fs=fs,
                                              weighting=weighting)
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

    if smoother == "kalman":
        smoothed, _ = kalman_rts_smooth(positions, hop / fs, powers=powers,
                                        accel_std=accel_std)
    elif smoothing > 0:
        _, smoothed = jax.lax.scan(ema, positions[0], positions)
    else:
        smoothed = positions

    times = jnp.asarray((starts + segment / 2.0) / fs, positions.dtype)
    return Track(times, positions, smoothed, powers)
