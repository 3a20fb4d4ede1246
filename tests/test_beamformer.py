"""Narrowband steered-power localization (models/beamformer.py) — the
estimator that handles pure tones, which defeat correlation-based TDOA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models import beamformer as bf
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
C = float(speed_of_sound(20.0, 50.0))
MICS8 = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.],
                  [1., 1., 0.], [1., 0., 1.], [0., 1., 1.], [1., 1., 1.]])
LO = jnp.asarray([0., 0., 0.])
HI = jnp.asarray([1., 1., 1.])


def test_beamformer_localizes_pure_tone():
    """An 8-mic cube localizes a 1 kHz sine to mm — the case where the
    GCC-PHAT/TDOA chain is ambiguous modulo the carrier period."""
    src = np.array([0.3, 0.6, 0.4])
    sigs = simulate_signals(src, MICS8, FS, C, duration=0.25,
                            signal_type="sine", freq=1000.0,
                            key=jax.random.PRNGKey(0))
    out = bf.beamform_locate(jnp.asarray(sigs), jnp.asarray(MICS8), FS, C,
                             LO, HI, num_bins=4)
    assert float(jnp.linalg.norm(out.position - jnp.asarray(src))) < 0.02


def test_beamformer_broadband_and_vmap():
    srcs = np.array([[0.3, 0.6, 0.4], [0.7, 0.25, 0.55]])
    sigs = jnp.stack([
        jnp.asarray(simulate_signals(s, MICS8, FS, C, duration=0.25,
                                     signal_type="noise",
                                     key=jax.random.PRNGKey(i)))
        for i, s in enumerate(srcs)])
    # Broadband noise: restrict bins to the spatially well-sampled band
    # (high-frequency bins of a unit-cube array are grating-ambiguous; for
    # broadband content the SRP-PHAT chain is the better tool anyway).
    f = jax.jit(jax.vmap(lambda ss: bf.beamform_locate(
        ss, jnp.asarray(MICS8, sigs.dtype), FS, C, LO, HI,
        band=(200.0, 1200.0)).position))
    got = np.asarray(f(sigs))
    assert np.linalg.norm(got - srcs, axis=-1).max() < 0.05


def test_beam_sweep_solver_on_sine_scenes():
    """SweepSpec(solver='beam') localizes randomized SINE scenes that the
    TDOA solvers cannot (narrowband ambiguity)."""
    from pyaudiolocalization_tpu.parallel import SweepSpec, monte_carlo_sweep
    mics8 = tuple(tuple(r) for r in MICS8)
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="sine",
                     freq=800.0, mic_positions=mics8, solver="beam",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    s = monte_carlo_sweep(spec, jax.random.PRNGKey(5), 8)
    assert float(s.rmse) < 0.05
    assert float(s.hit_rate) == 1.0


def test_select_bins_band_restriction():
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((4, 513))
                       + 1j * rng.standard_normal((4, 513)))
    idx, w = bf.select_bins(spec, 1024.0, 1024, 8, band=(100.0, 200.0))
    freqs = np.fft.rfftfreq(1024, d=1.0 / 1024.0)
    got = freqs[np.asarray(idx)]
    assert np.all((got >= 100.0) & (got <= 200.0))
    assert abs(float(jnp.sum(w)) - 1.0) < 1e-6


class TestExtractSource:
    """Delay-and-sum audio extraction (localize -> listen)."""

    MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                     [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                     [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    FS = 16000.0
    C = 343.0

    def _simulate(self, pos, key, signal_type="noise", freq=500.0):
        from pyaudiolocalization_tpu.models.simulator import (
            simulate_signals_fast)
        import jax
        sigs = simulate_signals_fast(
            pos, self.MICS, self.FS, self.C, 0.25, signal_type, freq,
            None, None, jnp.asarray([0.01]), jnp.asarray([1e-6]),
            0, 1e-4, key=jax.random.PRNGKey(key))
        return sigs

    def test_aligned_output_matches_closest_mic(self):
        """Clean single source: the extraction equals the closest mic's
        signal up to the per-mic 1/d gain averaging (normalized
        correlation ~1, far above any single misaligned average)."""
        pos = np.array([0.3, 0.6, 0.4])
        sigs = np.asarray(self._simulate(pos, key=11))
        out = np.asarray(bf.extract_source(
            jnp.asarray(sigs), self.MICS, pos, self.FS, self.C))
        closest = sigs[np.argmin(np.linalg.norm(self.MICS - pos, axis=1))]
        lo = len(out) // 8
        a, b = out[lo:-lo], closest[lo:-lo]
        rho = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
        assert rho > 0.99, rho
        # misaligned steering (wrong position) must decohere the average
        out_bad = np.asarray(bf.extract_source(
            jnp.asarray(sigs), self.MICS, np.array([0.9, 0.1, 0.9]),
            self.FS, self.C))
        assert np.var(out_bad) < 0.6 * np.var(out)

    def test_array_gain_on_incoherent_noise(self):
        """Pure per-mic incoherent noise: the delay-and-sum average keeps
        only ~1/M of the single-mic noise power (array gain ~ M)."""
        rng = np.random.default_rng(9)
        noise = rng.normal(size=(8, 4000)).astype(np.float64)
        out = np.asarray(bf.extract_source(
            jnp.asarray(noise), self.MICS, np.array([0.4, 0.5, 0.6]),
            self.FS, self.C))
        ratio = np.var(out) / np.var(noise)
        assert ratio < 1.6 / 8.0, ratio

    def test_interferer_suppressed(self):
        """Source + equally-loud interferer: steering at the source must
        favor it over the interferer vs any single mic (spatial gain)."""
        ps = np.array([0.25, 0.55, 0.45])
        pi_ = np.array([0.85, 0.15, 0.80])
        s_only = np.asarray(self._simulate(ps, key=21))
        i_only = np.asarray(self._simulate(pi_, key=22))
        mixed = jnp.asarray(s_only + i_only)
        out = np.asarray(bf.extract_source(
            mixed, self.MICS, ps, self.FS, self.C))

        def level(x, ref):
            lo = len(x) // 8
            a, b = x[lo:-lo], ref[lo:-lo]
            return np.dot(a, b) / np.sqrt(np.dot(b, b))

        # coherent-gain ratio toward the source vs the interferer,
        # compared with the best single mic's ratio
        src_ref = np.asarray(bf.extract_source(
            jnp.asarray(s_only), self.MICS, ps, self.FS, self.C))
        int_ref = np.asarray(bf.extract_source(
            jnp.asarray(i_only), self.MICS, ps, self.FS, self.C))
        # energy of the interferer surviving in the steered mix vs the
        # source's: must be clearly below 1 (the mix was 1:1 per mic)
        num = np.var(int_ref)
        den = np.var(src_ref)
        assert num < 0.5 * den, (num, den)
        assert np.isfinite(out).all()

    def test_mvdr_wola_perfect_reconstruction(self):
        """sqrt-Hann STFT -> WOLA round-trip is exact in the interior
        (periodic-Hann COLA), at 50% and 75% overlap."""
        rng = np.random.default_rng(41)
        x = jnp.asarray(rng.standard_normal((2, 3001)))
        for frame, hop in ((256, 128), (256, 64)):
            spec = bf.stft_analysis(x, frame, hop)
            back = np.asarray(bf.wola_synthesis(spec, frame, hop,
                                                x.shape[-1]))
            np.testing.assert_allclose(back, np.asarray(x), atol=1e-10)

    def test_mvdr_single_mic_passthrough(self):
        """M=1: the MVDR weight is exactly 1 (tau=0, unit steering), so
        the extraction is the analysis/synthesis identity."""
        rng = np.random.default_rng(43)
        x = rng.standard_normal((1, 2500))
        out = np.asarray(bf.extract_source_mvdr(
            jnp.asarray(x), self.MICS[:1], np.array([0.4, 0.2, 0.7]),
            self.FS, self.C, frame=256))
        np.testing.assert_allclose(out, x[0], atol=1e-8)

    def _mvdr_component_sirs(self, s_only, i_only, ps, frame=256, hop=64):
        """Weights adapted on the 1:1 mix, applied per component
        (linearity): returns (sir_mvdr, sir_das, src_pass)."""
        n = s_only.shape[-1]
        s_al = bf.align_to_position(jnp.asarray(s_only), self.MICS, ps,
                                    self.FS, self.C)
        i_al = bf.align_to_position(jnp.asarray(i_only), self.MICS, ps,
                                    self.FS, self.C)
        tau0 = jnp.zeros((s_only.shape[0],), s_al.dtype)
        wr, wi = bf.mvdr_weights(bf.stft_analysis(s_al + i_al, frame, hop),
                                 tau0, self.FS, frame, loading=0.3)

        def apply(aligned):
            spec = bf.stft_analysis(aligned, frame, hop)
            xr, xi = jnp.real(spec), jnp.imag(spec)
            y = jax.lax.complex(
                jnp.einsum("mf,mtf->tf", wr, xr)
                + jnp.einsum("mf,mtf->tf", wi, xi),
                jnp.einsum("mf,mtf->tf", wr, xi)
                - jnp.einsum("mf,mtf->tf", wi, xr))
            return np.asarray(bf.wola_synthesis(y, frame, hop, n))

        src_out, int_out = apply(s_al), apply(i_al)
        das_src = np.asarray(bf.extract_source(
            jnp.asarray(s_only), self.MICS, ps, self.FS, self.C))
        das_int = np.asarray(bf.extract_source(
            jnp.asarray(i_only), self.MICS, ps, self.FS, self.C))
        sir_mvdr = np.var(src_out) / np.var(int_out)
        sir_das = np.var(das_src) / np.var(das_int)
        return sir_mvdr, sir_das, np.var(src_out) / np.var(das_src)

    def test_mvdr_nulls_narrowband_interferer(self):
        """A 1 kHz sine interferer is rank-1 per STFT bin — the adaptive
        null must beat delay-and-sum's fixed response by >10 dB SIR
        (measured ~+13 dB)."""
        ps = np.array([0.25, 0.55, 0.45])
        pi_ = np.array([0.85, 0.15, 0.80])
        s_only = np.array(self._simulate(ps, key=51))
        i_only = np.array(self._simulate(pi_, key=72, signal_type="sine",
                                         freq=1000.0))
        i_only *= np.sqrt(np.var(s_only) / np.var(i_only))
        sir_mvdr, sir_das, src_pass = self._mvdr_component_sirs(
            s_only, i_only, ps)
        assert sir_mvdr > 10.0 * sir_das, (sir_mvdr, sir_das)
        assert src_pass > 0.8, src_pass

    def test_mvdr_beats_das_on_broadband_interferer(self):
        """White-noise interferer: per-bin rank exceeds 1 (window-
        autocorrelation coherence bound, see the extract_source_mvdr
        docstring), so the win is smaller but must still be a clear
        improvement with ~unit target gain."""
        ps = np.array([0.25, 0.55, 0.45])
        pi_ = np.array([0.85, 0.15, 0.80])
        s_only = np.array(self._simulate(ps, key=51))
        i_only = np.array(self._simulate(pi_, key=52))
        sir_mvdr, sir_das, src_pass = self._mvdr_component_sirs(
            s_only, i_only, ps)
        assert sir_mvdr > 1.5 * sir_das, (sir_mvdr, sir_das)
        assert src_pass > 0.9, src_pass

    def test_mvdr_api_output_tracks_target(self):
        """End-to-end API: extract_source_mvdr(mix) correlates strongly
        with the clean target reference and is finite."""
        ps = np.array([0.30, 0.60, 0.40])
        pi_ = np.array([0.80, 0.20, 0.75])
        s_only = np.asarray(self._simulate(ps, key=61))
        i_only = np.asarray(self._simulate(pi_, key=62))
        out = np.asarray(bf.extract_source_mvdr(
            jnp.asarray(s_only + i_only), self.MICS, ps, self.FS, self.C))
        ref = np.asarray(bf.extract_source(
            jnp.asarray(s_only), self.MICS, ps, self.FS, self.C))
        lo = len(out) // 8
        a, b = out[lo:-lo], ref[lo:-lo]
        rho = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
        assert np.isfinite(out).all()
        assert rho > 0.9, rho

    def test_multitap_lcmv_preserves_target(self):
        """Convolutive (taps=3) LCMV must NOT self-cancel the target
        through its overlapped-frame history — the failure mode of a
        tap-0-only constraint (measured target gain 0.20 there; the LCMV
        constraint set holds ~0.8+) — while still suppressing the
        interferer well beyond delay-and-sum."""
        ps = np.array([0.25, 0.55, 0.45])
        pi_ = np.array([0.85, 0.15, 0.80])
        s_only = np.array(self._simulate(ps, key=51))
        i_only = np.array(self._simulate(pi_, key=52))
        n = s_only.shape[-1]
        frame, hop, taps = 256, 64, 3
        s_al = bf.align_to_position(jnp.asarray(s_only), self.MICS, ps,
                                    self.FS, self.C)
        i_al = bf.align_to_position(jnp.asarray(i_only), self.MICS, ps,
                                    self.FS, self.C)
        tau0 = jnp.zeros((s_only.shape[0],), s_al.dtype)
        wr, wi = bf.mvdr_weights(
            bf.stack_taps(bf.stft_analysis(s_al + i_al, frame, hop),
                          taps, True),
            tau0, self.FS, frame, loading=0.3, taps=taps)

        def apply(aligned):
            spec = bf.stack_taps(bf.stft_analysis(aligned, frame, hop),
                                 taps, False)
            xr, xi = jnp.real(spec), jnp.imag(spec)
            y = jax.lax.complex(
                jnp.einsum("mf,mtf->tf", wr, xr)
                + jnp.einsum("mf,mtf->tf", wi, xi),
                jnp.einsum("mf,mtf->tf", wr, xi)
                - jnp.einsum("mf,mtf->tf", wi, xr))
            return np.asarray(bf.wola_synthesis(y, frame, hop, n))

        src_out, int_out = apply(s_al), apply(i_al)
        das_src = np.asarray(bf.extract_source(
            jnp.asarray(s_only), self.MICS, ps, self.FS, self.C))
        das_int = np.asarray(bf.extract_source(
            jnp.asarray(i_only), self.MICS, ps, self.FS, self.C))
        src_pass = np.var(src_out) / np.var(das_src)
        assert src_pass > 0.7, src_pass
        sir = np.var(src_out) / np.var(int_out)
        sir_das = np.var(das_src) / np.var(das_int)
        assert sir > 1.5 * sir_das, (sir, sir_das)

    def test_multitap_api_matches_single_tap_for_taps1(self):
        """extract_source_mvdr(taps=1) is byte-for-byte the single-tap
        path (stack_taps is the identity at taps=1)."""
        ps = np.array([0.30, 0.60, 0.40])
        s = self._simulate(ps, key=61)
        a = np.asarray(bf.extract_source_mvdr(
            s, self.MICS, ps, self.FS, self.C))
        b = np.asarray(bf.extract_source_mvdr(
            s, self.MICS, ps, self.FS, self.C, taps=1))
        np.testing.assert_array_equal(a, b)
        out3 = np.asarray(bf.extract_source_mvdr(
            s, self.MICS, ps, self.FS, self.C, taps=3))
        assert np.isfinite(out3).all() and out3.shape == a.shape
        with pytest.raises(ValueError, match="taps"):
            bf.extract_source_mvdr(s, self.MICS, ps, self.FS, self.C,
                                   taps=0)

    def test_mic_weights_normalized(self):
        sigs = self._simulate(np.array([0.5, 0.5, 0.5]), key=31)
        w = np.array([1, 1, 1, 1, 0, 0, 0, 0], float)
        out = np.asarray(bf.extract_source(
            sigs, self.MICS, np.array([0.5, 0.5, 0.5]), self.FS, self.C,
            mic_weights=jnp.asarray(w)))
        out4 = np.asarray(bf.extract_source(
            sigs[:4], self.MICS[:4], np.array([0.5, 0.5, 0.5]), self.FS,
            self.C))
        np.testing.assert_allclose(out, out4, atol=1e-10)
