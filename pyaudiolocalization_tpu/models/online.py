"""Online (streaming) localization: feed fixed-size sample blocks, get a
position per block — the serving-shaped API.

No reference counterpart (the reference is batch-only).  State is a ring
of the last ``frame`` samples per mic plus an exponential moving average of
the whitened-able cross-power spectra; each ``step`` is one jitted call:

    rfft(window * frame) -> cross-spectra -> EMA -> PHAT whiten ->
    irfft -> SRP-PHAT box search -> position

The EMA plays the role of the Welch average in ``gcc_phat_streaming`` but
with O(1) state, so latency per block is constant and independent of the
stream length.  Wrap ``step`` in ``jax.jit`` once and drive it from the
audio callback; everything is functional (state in, state out), so it also
vmaps across independent streams.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import srp as srp_ops
from ..ops import gccphat


class StreamState(NamedTuple):
    buffer: jnp.ndarray      # (M, frame) most recent samples
    cross_r: jnp.ndarray     # (P, bins) EMA cross-spectrum, real plane
    cross_i: jnp.ndarray     # (P, bins) imag plane
    count: jnp.ndarray       # () blocks absorbed (diagnostics; note that
    # EMA warmup debiasing (1 - a^count) would be a positive scalar on the
    # cross-spectra, which PHAT whitening cancels exactly — so none is
    # applied)


class StreamOutput(NamedTuple):
    position: jnp.ndarray    # (3,), or (K, 3) for num_sources=K > 1
    power: jnp.ndarray       # () SRP confidence, or (K,)
    state: StreamState


class StreamingLocalizer:
    """Stateful online localizer.  ``frame`` must be a power of two and a
    multiple of ``hop``; positions are searched over the static box
    [lower, upper] with SRP-PHAT.

    Complex EMA state is kept as real/imag planes (complex arrays cannot
    cross the TPU tunnel host boundary and pytrees of planes jit cleanly).
    """

    def __init__(self, mic_positions, fs: float, c: float,
                 lower, upper, frame: int = 4096, hop: int = 1024,
                 ema: float = 0.7,
                 band: Optional[Tuple[float, float]] = None,
                 coarse_n: int = 20, fine_n: int = 10,
                 num_sources: int = 1,
                 min_separation: Optional[float] = None):
        if frame & (frame - 1):
            raise ValueError("frame must be a power of two")
        if frame % hop:
            raise ValueError("frame must be a multiple of hop")
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
        self.num_sources = num_sources
        self.min_separation = min_separation
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

    def init_state(self) -> StreamState:
        m = self.mics.shape[0]
        p = self.pi.shape[0]
        bins = self.frame // 2 + 1
        return StreamState(
            buffer=jnp.zeros((m, self.frame), jnp.float32),
            cross_r=jnp.zeros((p, bins), jnp.float32),
            cross_i=jnp.zeros((p, bins), jnp.float32),
            count=jnp.zeros((), jnp.int32))

    def _step_impl(self, state: StreamState, block: jnp.ndarray) -> StreamOutput:
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
