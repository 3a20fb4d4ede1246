"""Online (streaming) localization: feed fixed-size sample blocks, get a
position per block — the serving-shaped API.

No reference counterpart (the reference is batch-only).  State is a ring
of the last ``frame`` samples per mic plus an exponential moving average —
of the whitened-able cross-power spectra (broadband ``method='srp'``):

    rfft(window * frame) -> cross-spectra -> EMA -> PHAT whiten ->
    irfft -> SRP-PHAT box search -> position

or of the full per-bin spatial covariance (narrowband
``method='capon'``/``'music'``, for tonal sources):

    rfft(window * frame) -> per-bin outer products -> EMA -> local-max
    bin selection -> MVDR / subspace map -> box search -> position

The EMA plays the role of the Welch average in ``gcc_phat_streaming`` (or
of the batch estimators' snapshot average) with O(1) state, so latency per
block is constant and independent of the stream length.  Wrap ``step`` in
``jax.jit`` once and drive it from the audio callback; everything is
functional (state in, state out), so it also vmaps across independent
streams.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import capon as capon_ops
from . import music as music_ops
from . import srp as srp_ops
from .srp import suppressed_multi_search, two_stage_search
from ..ops import gccphat


class StreamState(NamedTuple):
    buffer: jnp.ndarray      # (M, frame) most recent samples
    cross_r: jnp.ndarray     # (P, bins) EMA cross-spectrum, real plane
    cross_i: jnp.ndarray     # (P, bins) imag plane
    count: jnp.ndarray       # () blocks absorbed (diagnostics; note that
    # EMA warmup debiasing (1 - a^count) would be a positive scalar on the
    # cross-spectra, which PHAT whitening cancels exactly — so none is
    # applied)


class CovStreamState(NamedTuple):
    """State for the narrowband methods ('capon'/'music'): instead of
    per-pair cross-spectra, an EMA of the FULL per-bin spatial covariance
    (all M x M mic products as real/imag planes, ~2 MB at M=8,
    frame=4096) — the snapshot average the batch estimators compute over
    STFT frames, maintained online with O(1) state."""
    buffer: jnp.ndarray      # (M, frame) most recent samples
    cov_r: jnp.ndarray       # (bins, M, M) EMA covariance, real plane
    cov_i: jnp.ndarray       # (bins, M, M) imag plane
    count: jnp.ndarray       # () blocks absorbed


class StreamOutput(NamedTuple):
    position: jnp.ndarray    # (3,), or (K, 3) for num_sources=K > 1
    power: jnp.ndarray       # () SRP confidence, or (K,)
    state: StreamState


class StreamingLocalizer:
    """Stateful online localizer.  ``frame`` must be a power of two and a
    multiple of ``hop``; positions are searched over the static box
    [lower, upper].

    ``method`` selects the estimator:
      * 'srp' (default) — broadband GCC-PHAT + SRP box search (EMA of the
        whitened-able cross-spectra);
      * 'capon' / 'music' — narrowband snapshot-covariance estimators for
        tonal sources (which have no usable correlation peaks): the state
        carries an EMA of the per-bin spatial covariance, and each hop
        scans the MVDR / subspace map over the box.  Envelope caveat: the
        streaming selection uses fine (fs/frame) local-max bins, so there
        is no cross-bin frequency diversity to veto grating lobes — with
        multiple talkers, one talker's grating can outbid another's true
        peak once frequencies push the array's spatial-sampling limit
        (measured on the 1 m 8-mic cube: 600+700 Hz talkers both track to
        ~4 mm; 600+850 Hz puts talker 2 on a ~19 cm grating artifact that
        the batch capon/music APIs resolve via their skirt-bin diversity).
        A second online-only envelope: the bin-weight floor drops emitters
        more than ~25 dB (power) below the strongest in-band peak — use
        the batch APIs for weaker targets (their selection has no floor).

    Complex EMA state is kept as real/imag planes (complex arrays cannot
    cross the TPU tunnel host boundary and pytrees of planes jit cleanly).
    """

    def __init__(self, mic_positions, fs: float, c: float,
                 lower, upper, frame: int = 4096, hop: int = 1024,
                 ema: float = 0.7,
                 band: Optional[Tuple[float, float]] = None,
                 coarse_n: int = 20, fine_n: int = 10,
                 num_sources: int = 1,
                 min_separation: Optional[float] = None,
                 method: str = "srp",
                 num_bins: int = 8,
                 loading: float = 1e-3):
        if frame & (frame - 1):
            raise ValueError("frame must be a power of two")
        if frame % hop:
            raise ValueError("frame must be a multiple of hop")
        if method not in ("srp", "capon", "music"):
            raise ValueError(
                "method must be 'srp' (broadband GCC-PHAT), 'capon', or "
                "'music' (narrowband covariance estimators)")
        self.mics = jnp.asarray(np.asarray(mic_positions, np.float32))
        m = self.mics.shape[0]
        pi, pj = np.triu_indices(m, 1)
        self.pi = pi.astype(np.int32)
        self.pj = pj.astype(np.int32)
        self.fs = float(fs)
        self.c = float(c)
        self.lower = jnp.asarray(np.asarray(lower, np.float32))
        self.upper = jnp.asarray(np.asarray(upper, np.float32))
        self.frame = frame
        self.hop = hop
        self.ema = float(ema)
        self.band = band
        self.coarse_n = coarse_n
        self.fine_n = fine_n
        # num_sources > 1 localizes K simultaneous talkers per hop with
        # iterative-suppression SRP (models/srp.srp_phat_locate_multi);
        # outputs gain a leading K axis in coarse extraction order — pair
        # tracks across hops by nearest-neighbor on the caller's side.
        if num_sources < 1:
            raise ValueError("num_sources must be >= 1")
        if method == "music" and num_sources >= self.mics.shape[0]:
            raise ValueError("music needs num_sources < num_mics (noise "
                             "subspace must be non-empty)")
        self.num_sources = num_sources
        self.min_separation = min_separation
        self.method = method
        self.num_bins = int(num_bins)
        self.loading = float(loading)
        self.pool = srp_ops._resolve_pool(None, self.lower, self.upper,
                                          coarse_n, self.fs, self.c)
        n_ = np.arange(frame)
        self._window = jnp.asarray(
            (0.5 - 0.5 * np.cos(2 * np.pi * n_ / frame)).astype(np.float32))
        if band is not None:
            freqs = np.fft.rfftfreq(frame, d=1.0 / fs)
            self._mask = jnp.asarray(
                ((freqs >= band[0]) & (freqs <= band[1])).astype(np.float32))
        else:
            self._mask = None
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl)

    def init_state(self):
        m = self.mics.shape[0]
        p = self.pi.shape[0]
        bins = self.frame // 2 + 1
        if self.method != "srp":
            return CovStreamState(
                buffer=jnp.zeros((m, self.frame), jnp.float32),
                cov_r=jnp.zeros((bins, m, m), jnp.float32),
                cov_i=jnp.zeros((bins, m, m), jnp.float32),
                count=jnp.zeros((), jnp.int32))
        return StreamState(
            buffer=jnp.zeros((m, self.frame), jnp.float32),
            cross_r=jnp.zeros((p, bins), jnp.float32),
            cross_i=jnp.zeros((p, bins), jnp.float32),
            count=jnp.zeros((), jnp.int32))

    def _step_cov_impl(self, state: CovStreamState,
                       block: jnp.ndarray) -> StreamOutput:
        """Narrowband step: EMA per-bin spatial covariance -> Capon/MUSIC
        map over the box.  Bin centers are used as steering frequencies —
        at frame=4096/16 kHz the bins are ~4 Hz wide, so the off-grid
        phase error the batch estimators correct with the phase-vocoder
        refinement is negligible here."""
        m = self.mics.shape[0]
        buf = jnp.concatenate([state.buffer[:, self.hop:], block], axis=1)
        spec = jnp.fft.rfft(buf * self._window[None, :], n=self.frame)
        sr = jnp.real(spec).astype(jnp.float32)             # (M, bins)
        si = jnp.imag(spec).astype(jnp.float32)
        # Per-bin outer products x x^H as real/imag planes.
        out_r = (jnp.einsum("mk,nk->kmn", sr, sr)
                 + jnp.einsum("mk,nk->kmn", si, si))
        out_i = (jnp.einsum("mk,nk->kmn", si, sr)
                 - jnp.einsum("mk,nk->kmn", sr, si))
        a = self.ema
        cvr = a * state.cov_r + (1.0 - a) * out_r
        cvi = a * state.cov_i + (1.0 - a) * out_i
        new_state = CovStreamState(buf, cvr, cvi, state.count + 1)

        # Bin selection from the EMA auto power (tempered weights like
        # beamformer.select_bins), restricted to LOCAL MAXIMA: a steady
        # tone's Hann-leakage skirt spans +-4 bins whose centers are up to
        # ~30 Hz off the true frequency — steering there mis-rotates
        # phases (measured: the stream locks onto a box corner once the
        # onset transient leaves the EMA), and the batch estimators'
        # phase-vocoder refinement aliases at hop >= frame/4.  A peak
        # bin's center is within half a bin of the tone, which is
        # harmless at these fine (fs/frame) resolutions.
        power = jnp.einsum("kmm->k", cvr)                   # (bins,)
        if self._mask is not None:
            power = power * self._mask
        is_peak = ((power >= jnp.roll(power, 1))
                   & (power >= jnp.roll(power, -1)))
        # DC/Nyquist are excluded outright: the roll-based test wraps them
        # against each other, and a DC offset winning vals[0] would zero
        # every true tone bin through the relative floor below.
        is_peak = is_peak.at[0].set(False).at[-1].set(False)
        power = jnp.where(is_peak, power, 0.0)
        vals, idx = jax.lax.top_k(power, self.num_bins)
        tempered = jnp.maximum(vals, 0.0) ** 0.3
        # Relative floor: with only PEAK bins eligible, the runners-up are
        # noise local maxima orders of magnitude below the tone peaks, and
        # the tempered exponent would still hand them ~half the total
        # weight (measured: the second talker wanders ~17 cm hop-to-hop).
        # Consequence (documented in the class docstring): emitters more
        # than ~25 dB (power) below the strongest in-band peak are dropped
        # from the online map — the batch APIs have no such floor.
        tempered = jnp.where(vals > 3e-3 * vals[0], tempered, 0.0)
        bin_w = tempered / jnp.maximum(jnp.sum(tempered), 1e-30)
        omega = (2.0 * jnp.pi * idx.astype(jnp.float32)
                 * (self.fs / self.frame))

        emb = music_ops.embed_planes(cvr[idx], cvi[idx])    # (B, 2M, 2M)
        if self.method == "capon":
            inv = capon_ops.loaded_inverse(emb, self.loading)

            def map_fn(p_):
                return capon_ops.capon_map(inv, omega, bin_w, p_, self.mics,
                                           self.c)
        else:  # music
            # Per-bin signal subspace of dimension ONE: online, each
            # narrowband emitter dominates its own (local-max) bin, and a
            # wider subspace absorbs a noise eigenvector whose pseudo-
            # random direction spawns phantom peaks (measured: the second
            # talker wanders 0.2-0.9 m hop-to-hop with dim=num_sources —
            # the batch path averages those directions over many skirt
            # bins, the floored streaming selection cannot).
            # ``num_sources`` still sets how many peaks are extracted;
            # same-bin super-resolution online needs the batch API.
            _, vecs = jnp.linalg.eigh(emb)
            subs = vecs[:, :, :2 * m - 2]

            def map_fn(p_):
                return music_ops.music_map(subs, omega, bin_w, p_, self.mics,
                                           self.c)

        if self.num_sources > 1:
            positions, powers = suppressed_multi_search(
                map_fn, map_fn, self.lower, self.upper, self.coarse_n,
                self.fine_n, self.num_sources, self.min_separation,
                jnp.float32)
            return StreamOutput(positions, powers, new_state)
        pos, pw, _, _ = two_stage_search(map_fn, map_fn, self.lower,
                                         self.upper, self.coarse_n,
                                         self.fine_n, jnp.float32)
        return StreamOutput(jnp.clip(pos, self.lower, self.upper), pw,
                            new_state)

    def _step_impl(self, state, block: jnp.ndarray) -> StreamOutput:
        if self.method != "srp":
            return self._step_cov_impl(state, block)
        buf = jnp.concatenate([state.buffer[:, self.hop:], block], axis=1)
        spec = jnp.fft.rfft(buf * self._window[None, :], n=self.frame)
        cross = jnp.take(spec, self.pi, 0) * jnp.conj(jnp.take(spec, self.pj, 0))
        a = self.ema
        cr = a * state.cross_r + (1.0 - a) * jnp.real(cross)
        ci = a * state.cross_i + (1.0 - a) * jnp.imag(cross)
        # Reuse the shared whitening (gccphat._whiten / PHAT_EPS) so the
        # streaming path cannot drift from the batch pipeline's semantics.
        white = gccphat._whiten(jax.lax.complex(cr, ci), gccphat.PHAT_EPS)
        if self._mask is not None:
            white = white * self._mask
        corr = jnp.fft.irfft(white, n=self.frame)
        new_state = StreamState(buf, cr, ci, state.count + 1)
        if self.num_sources > 1:
            multi = srp_ops.srp_phat_locate_multi(
                corr, self.mics, self.pi, self.pj, self.fs, self.c,
                self.lower, self.upper, num_sources=self.num_sources,
                coarse_n=self.coarse_n, fine_n=self.fine_n,
                min_separation=self.min_separation, pool_samples=self.pool)
            return StreamOutput(multi.positions, multi.powers, new_state)
        out = srp_ops.srp_phat_locate(
            corr, self.mics, self.pi, self.pj, self.fs, self.c,
            self.lower, self.upper, coarse_n=self.coarse_n,
            fine_n=self.fine_n, pool_samples=self.pool)
        return StreamOutput(out.position, out.power, new_state)

    def step(self, state: StreamState, block) -> StreamOutput:
        """Absorb one (M, hop) block and localize.  Jitted; O(1) state."""
        block = jnp.asarray(block, jnp.float32)
        if block.shape != (self.mics.shape[0], self.hop):
            raise ValueError(
                f"block must be (num_mics, hop) = "
                f"({self.mics.shape[0]}, {self.hop}), got {block.shape}")
        return self._step(state, block)

    def _run_impl(self, state: StreamState, blocks: jnp.ndarray):
        def scan_step(st, block):
            out = self._step_impl(st, block)
            return out.state, (out.position, out.power)
        _, (positions, powers) = jax.lax.scan(scan_step, state, blocks)
        return positions, powers

    def run(self, signals) -> Tuple[np.ndarray, np.ndarray]:
        """Convenience: stream a whole (M, T) capture through the step
        update under ONE ``lax.scan`` (one host→device upload, one
        dispatch, one fetch — driving ``step`` per hop from the host costs
        a ~27 ms tunnel round trip per block upload); returns
        (positions (S, 3), powers (S,)) for the S full hops after the
        first full frame (with ``num_sources=K``: (S, K, 3), (S, K)).
        Recompiles per distinct hop count; real-time callers drive
        ``step`` directly."""
        signals = np.asarray(signals, np.float32)
        m, t = signals.shape
        num_blocks = t // self.hop
        warmup = self.frame // self.hop
        if num_blocks < warmup:  # capture shorter than one frame
            shape = ((0, 3) if self.num_sources == 1
                     else (0, self.num_sources, 3))
            pshape = (0,) if self.num_sources == 1 else (0, self.num_sources)
            return np.zeros(shape, np.float32), np.zeros(pshape, np.float32)
        blocks = jnp.asarray(
            signals[:, :num_blocks * self.hop]
            .reshape(m, num_blocks, self.hop)
            .transpose(1, 0, 2))                       # (S_all, M, hop)
        positions, powers = self._run(self.init_state(), blocks)
        return (np.asarray(positions[warmup - 1:]),
                np.asarray(powers[warmup - 1:]))
