"""Array-geometry self-calibration: refine microphone POSITIONS from test
events at known source positions.

The reference's calibration estimates per-microphone DELAY offsets only
(calibration.py:4-48); deployment surveys of the microphone coordinates
themselves are assumed exact.  This module closes that gap: given K test
emissions (chirps/noise bursts) from known positions, it inverts the same
weighted pair-TDOA residual system the localizer uses (utils.py:384-405
semantics, roles of source and microphones swapped) for the M microphone
positions.

TPU-first design: the whole refinement is ONE jitted ``lax.scan`` — each
sweep updates every microphone simultaneously (Jacobi block-coordinate
Gauss-Newton; the per-mic 3x3 normal equations go through the same
closed-form Cramer solve as the localizer's LM) with a shared
Levenberg-style damping that retreats on cost increases.  No Python loops,
no data-dependent shapes; (K, P) residual planes vectorize over events and
pairs.

Identifiability: each event contributes P pair equations of rank <= M-1;
3M unknowns need K >= ceil(3M/(M-1)) well-spread events (K >= 4 for a
4-mic array).  Events coplanar with a microphone leave its out-of-plane
coordinate weakly constrained — spread the test positions in 3-D.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gccphat
from . import solver as solver_ops
from . import tdoa as tdoa_ops

__all__ = ["refine_mic_positions", "calibrate_array_geometry",
           "GeometryCalResult"]


class GeometryCalResult(NamedTuple):
    mic_positions: jnp.ndarray   # (M, 3) refined coordinates
    cost: jnp.ndarray            # final 0.5*sum(r^2) over all events/pairs
    initial_cost: jnp.ndarray    # same at the initial geometry
    tdoas: Optional[jnp.ndarray] = None   # (K, P) measured TDOAs (wrapper)


def _residuals(mics, sources, pairs_i, pairs_j, tdoas, c, weights):
    """r[k, p] = w[k, p] * ((d_kj - d_ki) - c * tdoa[k, p]) and the unit
    vectors u[k, m] = (m_m - s_k) / d_km used by the per-mic Jacobians."""
    diff = mics[None, :, :] - sources[:, None, :]          # (K, M, 3)
    d = jnp.linalg.norm(diff, axis=-1)                     # (K, M)
    u = diff / jnp.maximum(d, 1e-12)[..., None]            # (K, M, 3)
    di = jnp.take(d, pairs_i, axis=1)
    dj = jnp.take(d, pairs_j, axis=1)
    r = weights * ((dj - di) - c * tdoas)                  # (K, P)
    return r, u


def refine_mic_positions(tdoas: jnp.ndarray,
                         source_positions: jnp.ndarray,
                         mic_init: jnp.ndarray,
                         pairs_i, pairs_j,
                         c,
                         weights: Optional[jnp.ndarray] = None,
                         sweeps: int = 60,
                         lam0: float = 1e-2,
                         max_step: float = 0.2) -> GeometryCalResult:
    """Refine microphone positions from measured pair TDOAs.

    tdoas: (K, P) seconds, physical convention td = arrival_j - arrival_i
    (what the localizer's residual system consumes: (d_j - d_i) = c*td).
    source_positions: (K, 3) known emitter positions.  mic_init: (M, 3)
    surveyed/nominal coordinates (also the linearization anchor — the
    refinement is local, intended for survey errors up to ~10 cm).
    weights: optional (K, P) residual weights (e.g. correlation SNR).
    max_step caps each per-sweep per-mic move (meters) — a trust region
    against early ill-conditioned sweeps.
    """
    tdoas = jnp.asarray(tdoas)
    sources = jnp.asarray(source_positions, tdoas.dtype)
    mic_init = jnp.asarray(mic_init, tdoas.dtype)
    pi = jnp.asarray(pairs_i, jnp.int32)
    pj = jnp.asarray(pairs_j, jnp.int32)
    k, p = tdoas.shape
    m = mic_init.shape[0]
    w = (jnp.ones((k, p), tdoas.dtype) if weights is None
         else jnp.asarray(weights, tdoas.dtype))
    c = jnp.asarray(c, tdoas.dtype)

    # Per-mic pair-membership masks: mic a appears in pair p as the i slot
    # (sign -1 on u_i) or the j slot (sign +1 on u_j).
    sel_i = (pi[None, :] == jnp.arange(m)[:, None]).astype(tdoas.dtype)
    sel_j = (pj[None, :] == jnp.arange(m)[:, None]).astype(tdoas.dtype)

    def cost_fn(mics):
        r, _ = _residuals(mics, sources, pi, pj, tdoas, c, w)
        return 0.5 * jnp.sum(r * r)

    def sweep(state, _):
        mics, lam, cost = state
        r, u = _residuals(mics, sources, pi, pj, tdoas, c, w)
        ui = jnp.take(u, pi, axis=1)                       # (K, P, 3)
        uj = jnp.take(u, pj, axis=1)
        # J[a, k, p, :] = w * (sel_j[a, p] * uj - sel_i[a, p] * ui)
        jac = (sel_j[:, None, :, None] * uj[None]
               - sel_i[:, None, :, None] * ui[None])       # (M, K, P, 3)
        jac = jac * w[None, :, :, None]
        jtj = jnp.einsum("akpx,akpy->axy", jac, jac)       # (M, 3, 3)
        jtr = jnp.einsum("akpx,kp->ax", jac, r)            # (M, 3)
        diag = jnp.diagonal(jtj, axis1=-2, axis2=-1)
        damp = lam * jnp.maximum(diag, 1e-12)
        a_mat = jtj + damp[..., None] * jnp.eye(3, dtype=tdoas.dtype)
        delta = solver_ops._solve3(a_mat, -jtr)            # (M, 3)
        step = jnp.linalg.norm(delta, axis=-1, keepdims=True)
        delta = delta * jnp.minimum(1.0, max_step / jnp.maximum(step, 1e-12))
        mics_new = mics + delta
        cost_new = cost_fn(mics_new)
        accept = cost_new < cost
        mics = jnp.where(accept, mics_new, mics)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e12))
        return (mics, lam, cost), None

    cost0 = cost_fn(mic_init)
    state = (mic_init, jnp.asarray(lam0, tdoas.dtype), cost0)
    (mics, _, cost), _ = jax.lax.scan(sweep, state, None, length=sweeps)
    return GeometryCalResult(mics, cost, cost0)


def calibrate_array_geometry(signals: jnp.ndarray,
                             source_positions: jnp.ndarray,
                             mic_init: jnp.ndarray,
                             fs: float,
                             c,
                             nfft: Optional[int] = None,
                             band: Optional[tuple] = None,
                             max_expected_delay: Optional[float] = None,
                             weight_by_snr: bool = True,
                             sweeps: int = 60,
                             threshold_method: str = "gaussian"
                             ) -> GeometryCalResult:
    """Signal-level wrapper: measure per-event pair TDOAs with the standard
    GCC-PHAT -> peak ladder (physical lag convention), then refine the
    microphone geometry.

    signals: (K, M, N) recordings of K test events.  source_positions:
    (K, 3) known emitter positions.  mic_init: (M, 3) surveyed coordinates.
    With ``weight_by_snr`` each pair residual is weighted by its
    correlation-peak SNR (models/tdoa.compute_weights), so multipath-hit
    pairs are downweighted exactly as in localization.
    """
    signals = jnp.asarray(signals)
    k, m, n = signals.shape
    pairs = np.array([(i, j) for i in range(m) for j in range(i + 1, m)],
                     np.int32)
    pi, pj = pairs[:, 0], pairs[:, 1]
    corr = gccphat.gcc_phat_all_pairs(signals, pi, pj, nfft=nfft, band=band,
                                      fs=fs)                # (K, P, nfft)
    res = tdoa_ops.time_delays_from_corr(
        corr, n, n, fs, num_peaks=1, threshold_method=threshold_method,
        max_expected_delay=max_expected_delay, lag_mode="physical")
    td = -res.delays[..., 0]                                # (K, P)
    weights = None
    if weight_by_snr:
        weights = tdoa_ops.compute_weights(tdoa_ops.correlation_snr(corr))
    out = refine_mic_positions(td, source_positions, mic_init, pi, pj, c,
                               weights=weights, sweeps=sweeps)
    return GeometryCalResult(out.mic_positions, out.cost, out.initial_cost,
                             tdoas=td)
