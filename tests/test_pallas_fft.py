"""The Pallas butterfly FFT engine (ops/pallas_fft.py) — the PRODUCTION
fused GCC path on TPU (gcc_phat_all_pairs dispatches to it).  The two
rejected matmul formulations and their tests were removed in round 3; see
docs/pallas_fft_deadends.md for the investigation record."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.ops import pallas_fft as pf


@pytest.mark.parametrize("n", [1024, 4096, 65536])
def test_bfly_forward_matches_numpy(rng, n):
    n2 = n // 128
    x = rng.standard_normal((2, n)).astype(np.float32)
    yr, yi = pf.bfly_fft_real_reference(jnp.asarray(x))
    X = np.fft.fft(x)
    t_nat = pf._bitrev_perm(n2)
    k = np.arange(128)[None, :] * n2 + t_nat[:, None]
    want = X[:, k]
    err = np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - want))
    assert err / np.max(np.abs(X)) < 5e-6


def test_bfly_kernel_interpret_matches_reference(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    ar, ai = pf.bfly_fft_real(jnp.asarray(x), interpret=True)
    rr, ri = pf.bfly_fft_real_reference(jnp.asarray(x))
    assert float(jnp.max(jnp.abs(ar - rr))) < 1e-3
    assert float(jnp.max(jnp.abs(ai - ri))) < 1e-3


def test_bfly_gcc_matches_xla_path(rng):
    """The fused kernel (interpret mode) reproduces gcc_phat_all_pairs."""
    from pyaudiolocalization_tpu.ops import gccphat
    sigs = rng.standard_normal((2, 4, 3000)).astype(np.float32)
    pi = np.array([0, 0, 0, 1, 1, 2], np.int32)
    pj = np.array([1, 2, 3, 2, 3, 3], np.int32)
    for band, fs in [(None, None), ((300.0, 3400.0), 8000.0)]:
        got = np.asarray(pf.bfly_gcc_all_pairs(
            jnp.asarray(sigs), pi, pj, 4096, band=band, fs=fs,
            interpret=True))
        want = np.asarray(gccphat.gcc_phat_all_pairs(
            jnp.asarray(sigs), pi, pj, nfft=4096, band=band, fs=fs,
            use_pallas="never"))
        assert np.max(np.abs(got - want)) < 1e-6
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))


@pytest.mark.parametrize("n", [1024, 2048, 4096, 65536])
def test_sliced_stage_schedule_matches_roll_schedule(rng, n):
    """The hybrid sliced-stage schedule (contiguous block halves for
    h >= 8, rolls within tiles) is numerically interchangeable with the
    all-roll schedule on the full fwd -> whiten -> inv GCC chain.
    n=1024 (n2=8) is the no-sliced-stage boundary; 2048 has one sliced
    stage."""
    sigs = rng.standard_normal((1, 2, n)).astype(np.float32)
    pi = np.array([0], np.int32)
    pj = np.array([1], np.int32)
    orig = pf._SLICED_STAGES
    try:
        outs = {}
        for flag in (False, True):
            pf._SLICED_STAGES = flag
            full = np.asarray(pf.bfly_gcc_all_pairs(
                jnp.asarray(sigs), pi, pj, n, interpret=True))
            fr, fi = pf.bfly_fft_real(jnp.asarray(sigs[:, 0]),
                                      interpret=True)
            outs[flag] = (full, np.asarray(fr), np.asarray(fi))
        for a, b in zip(outs[False], outs[True]):
            scale = max(np.max(np.abs(a)), 1e-30)
            assert np.max(np.abs(a - b)) / scale < 1e-5
    finally:
        pf._SLICED_STAGES = orig


@pytest.mark.parametrize("n", [2048, 4096, 65536])
def test_radix4_sliced_schedule_matches_radix2(rng, n):
    """Radix-4 fused stage pairs are numerically interchangeable with the
    radix-2 sliced schedule on the full fwd -> whiten -> inv GCC chain and
    on the bare forward transform, including the zero-top pruned first
    stage (short signals).  n=2048 (n2=16) has a single sliced stage (no
    radix-4 possible — exercises the flag's no-op path); 4096 one radix-4;
    65536 (n2=512) the mixed radix-4 + trailing radix-2 parity case."""
    sigs = rng.standard_normal((1, 2, n)).astype(np.float32)
    short = rng.standard_normal((1, 2, n // 4)).astype(np.float32)
    pi = np.array([0], np.int32)
    pj = np.array([1], np.int32)
    orig = pf._RADIX4_SLICED
    try:
        outs = {}
        for flag in (False, True):
            pf._RADIX4_SLICED = flag
            full = np.asarray(pf.bfly_gcc_all_pairs(
                jnp.asarray(sigs), pi, pj, n, interpret=True))
            ztop = np.asarray(pf.bfly_gcc_all_pairs(
                jnp.asarray(short), pi, pj, n, interpret=True))
            fr, fi = pf.bfly_fft_real(jnp.asarray(sigs[:, 0]),
                                      interpret=True)
            outs[flag] = (full, ztop, np.asarray(fr), np.asarray(fi))
        for a, b in zip(outs[False], outs[True]):
            scale = max(np.max(np.abs(a)), 1e-30)
            assert np.max(np.abs(a - b)) / scale < 1e-5
    finally:
        pf._RADIX4_SLICED = orig


def test_bfly_band_plane_layout():
    """Band plane passes exactly the natural-order band mask, permuted."""
    n, fs = 4096, 8000.0
    plane = pf.bfly_band_plane(n, (300.0, 3400.0), fs)
    n2 = n // 128
    t_nat = pf._bitrev_perm(n2)
    k = np.arange(128)[None, :] * n2 + t_nat[:, None]
    freq = np.fft.fftfreq(n, d=1.0 / fs) * 1.0
    natural = (np.abs(freq) >= 300.0) & (np.abs(freq) <= 3400.0)
    np.testing.assert_array_equal(plane.astype(bool), natural[k])


def test_ilp_chains_match_unstacked():
    """Stacked-chain cascades (_ILP_FWD/_ILP_INV = 2; measured dead end
    (e) — kept for the record) match the unstacked schedule on the full
    and windowed GCC kernels, including odd pair counts and odd mic
    counts (partial final chain).  PRIVATE rng: the conftest fixture is
    session-scoped and consuming it reshuffles later tests' data."""
    rng = np.random.default_rng(1234)
    orig = (pf._ILP_FWD, pf._ILP_INV)
    cases = [(4, 6, 300, 1024), (4, 5, 900, 2048), (3, 3, 500, 1024)]
    try:
        for m, p, n, nfft in cases:
            sigs = rng.standard_normal((2, m, n)).astype(np.float32)
            pairs = np.array([(i, j) for i in range(m)
                              for j in range(i + 1, m)], np.int32)[:p]
            pi, pj = pairs[:, 0], pairs[:, 1]
            outs = {}
            for chains in (1, 2):
                pf._ILP_FWD = pf._ILP_INV = chains
                full = np.asarray(pf.bfly_gcc_all_pairs(
                    jnp.asarray(sigs), pi, pj, nfft, interpret=True))
                w, st = pf.bfly_gcc_windowed(jnp.asarray(sigs), pi, pj,
                                             nfft, 2, interpret=True)
                outs[chains] = (full, np.asarray(w), np.asarray(st))
            for a, b in zip(outs[1], outs[2]):
                scale = max(np.max(np.abs(a)), 1e-30)
                assert np.max(np.abs(a - b)) / scale < 1e-6
    finally:
        pf._ILP_FWD, pf._ILP_INV = orig


def test_lane_bf16x3_matches_highest():
    """The production bf16x3 lane-DFT (3 MXU passes; 1.07-1.33x measured
    on-chip) stays within 1e-4 relative of the HIGHEST-precision matmul
    on the full GCC chain (PHAT whitening divides by near-zero bin
    magnitudes, amplifying the ~1e-6 matmul delta on unlucky bins) and
    within 1e-5 on the bare forward transform.  PRIVATE rng (the
    conftest fixture is session-scoped)."""
    rng = np.random.default_rng(4321)
    orig = pf._LANE_BF16X3
    sigs = rng.standard_normal((1, 2, 1500)).astype(np.float32)
    pi = np.array([0], np.int32)
    pj = np.array([1], np.int32)
    try:
        outs = {}
        for flag in (False, True):
            pf._LANE_BF16X3 = flag
            full = np.asarray(pf.bfly_gcc_all_pairs(
                jnp.asarray(sigs), pi, pj, 4096, interpret=True))
            fr, fi = pf.bfly_fft_real(jnp.asarray(
                np.pad(sigs[:, 0], ((0, 0), (0, 4096 - 1500)))),
                interpret=True)
            outs[flag] = (full, np.asarray(fr), np.asarray(fi))
        for tol, (a, b) in zip((1e-4, 1e-5, 1e-5),
                               zip(outs[False], outs[True])):
            scale = max(np.max(np.abs(a)), 1e-30)
            assert np.max(np.abs(a - b)) / scale < tol
    finally:
        pf._LANE_BF16X3 = orig


def test_bfly_eligibility_rules():
    on_tpu = pf.available()
    # dtype/shape gates (vacuously False on CPU; real gates on TPU)
    assert not pf.bfly_gcc_eligible(65536, 4, jnp.float64)
    assert not pf.bfly_gcc_eligible(65537, 4, jnp.float32)
    assert pf.bfly_gcc_eligible(65536, 4, jnp.float32) == on_tpu
    assert pf.bfly_gcc_eligible(131072, 4, jnp.float32) == on_tpu
    # The VMEM model itself is backend-independent: 131072 x 4 mics fits a
    # pipelined input block under the raised cap, 64 mics at 65536 must
    # stream signals from HBM.
    assert not pf._bfly_gcc_hbm_input(131072, 4)
    assert pf._bfly_gcc_hbm_input(65536, 64)
    assert pf._bfly_gcc_vmem(131072, 4, False) <= 48 * 1024 * 1024
    assert pf._bfly_gcc_vmem(65536, 64, True) <= 48 * 1024 * 1024


def test_bfly_windowed_tdoa_matches_full_ladder(rng):
    """Windowed kernel + tdoa_single_from_window == the full physical-mode
    gaussian ladder (the sweep's fused TPU fast path)."""
    from pyaudiolocalization_tpu.ops import gccphat
    from pyaudiolocalization_tpu.models import tdoa as tdoa_ops
    from pyaudiolocalization_tpu.models.simulator import simulate_signals
    from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

    fs = 16000.0
    c = float(speed_of_sound(20.0, 50.0))
    mics = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.]])
    pi = np.array([0, 0, 0, 1, 1, 2], np.int32)
    pj = np.array([1, 2, 3, 2, 3, 3], np.int32)
    nfft = 4096
    max_td = 1.25 * np.sqrt(2) / c
    band = (300.0, 3400.0)
    for trial in range(2):
        src = rng.uniform(0.1, 0.9, 3)
        sigs = simulate_signals(src, mics, fs, c, duration=0.2,
                                signal_type="noise",
                                key=jax.random.PRNGKey(trial)
                                ).astype(jnp.float32)
        sigs = sigs + 0.01 * jnp.asarray(
            rng.standard_normal(sigs.shape), jnp.float32)
        corr = gccphat.gcc_phat_all_pairs(sigs, pi, pj, nfft=nfft, band=band,
                                          fs=fs, use_pallas="never")
        res = tdoa_ops.time_delays_from_corr(
            corr, sigs.shape[-1], sigs.shape[-1], fs, num_peaks=1,
            threshold_method="gaussian", max_expected_delay=max_td,
            lag_mode="physical")
        want = np.asarray(res.delays[..., 0])
        distance = int(fs * 0.001)
        half = int(np.ceil(max_td * fs)) + 8 * max(distance, 1)
        wq = min(max(-(-half // 128) + 1, 1), nfft // 256)
        win, stats = pf.bfly_gcc_windowed(sigs, pi, pj, nfft, wq, band=band,
                                          fs=fs, interpret=True)
        got = np.asarray(tdoa_ops.tdoa_single_from_window(
            win, stats, wq, nfft, fs, max_td))
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_tdoa_window_fallback_boundary_decode():
    """Global-argmax fallback decodes the boundary bin nfft//2 as lag
    -nfft//2 (matching the full ladder's centered axis)."""
    from pyaudiolocalization_tpu.models import tdoa as tdoa_ops
    nfft, fs, wq = 1024, 1000.0, 1
    win = jnp.zeros((1, 2 * wq * 128))   # no candidates -> fallback path
    stats = jnp.asarray([[1.0, 5.0, float(nfft // 2)]])
    d = tdoa_ops.tdoa_single_from_window(win, stats, wq, nfft, fs, 0.01)
    assert float(d[0]) == -(nfft // 2) / fs
    stats = jnp.asarray([[1.0, 5.0, float(nfft // 2 - 1)]])
    d = tdoa_ops.tdoa_single_from_window(win, stats, wq, nfft, fs, 0.01)
    assert float(d[0]) == (nfft // 2 - 1) / fs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold_multiplier"):
        tdoa_ops.tdoa_single_from_window(win, stats, wq, nfft, fs, 0.01,
                                         threshold_multiplier=1.5)


def test_bfly_scene_kernel_matches_two_kernel_path(rng):
    """The whole-scene kernel (interpret, no noise) equals render-kernel ->
    windowed-GCC-kernel composition.  Since round 3 this is the PRODUCTION
    sweep fast path (run_scene dispatches it via _mono_scene_eligible —
    the sliced stages + MXU ramps flipped the round-1 slower-than-split
    measurement; see parallel/sweep._sim_est_fused)."""
    from pyaudiolocalization_tpu.ops.delay import fade_window
    fs, nfft, total, out = 8000.0, 2048, 1800, 1500
    base = np.zeros(total, np.float32)
    base[:1500] = rng.standard_normal(1500)
    d = rng.uniform(0, 0.02, (3, 2)).astype(np.float32)
    g = rng.uniform(0.3, 1.0, (3, 2)).astype(np.float32)
    pi = np.array([0, 0, 1], np.int32)
    pj = np.array([1, 2, 2], np.int32)
    band = (300.0, 3400.0)
    wq = 3
    fade = fade_window(total, dtype=jnp.float32)[:out]
    sigs = pf.bfly_delay_sum(jnp.asarray(base), jnp.asarray(d),
                             jnp.asarray(g), fs, nfft, out, fade=fade,
                             finalize=True, interpret=True)
    win1, st1 = pf.bfly_gcc_windowed(sigs, pi, pj, nfft, wq, band=band,
                                     fs=fs, interpret=True)
    win2, st2 = pf.bfly_scene_windowed(
        jnp.asarray(base), jnp.asarray(d), jnp.asarray(g), pi, pj, fs, nfft,
        out, wq, band=band, fade=fade, interpret=True)
    assert float(jnp.max(jnp.abs(win1 - win2))) < 1e-6
    assert float(jnp.max(jnp.abs(st1 - st2))) < 1e-6


def test_bfly_bootstrap_peaks_matches_xla_formula(rng):
    """The bootstrap-peaks kernel (fwd -> whiten vs fixed sig1 -> packed
    inverse -> max) equals the XLA rfft formula; odd row counts exercise
    the zero-pad row (whitened to zeros and sliced off)."""
    n, n_samp = 2048, 1800
    sig1 = rng.standard_normal(n_samp).astype(np.float32)
    rows = rng.standard_normal((5, n_samp)).astype(np.float32)
    s1r, s1i = pf.bfly_fft_real(
        jnp.asarray(np.pad(sig1, (0, n - n_samp)))[None], interpret=True)
    got = np.asarray(pf.bfly_bootstrap_peaks(
        (s1r[0], s1i[0]), jnp.asarray(rows), interpret=True))
    s1 = np.fft.rfft(sig1.astype(np.float64), n)
    s2 = np.fft.rfft(rows.astype(np.float64), n)
    r = s1[None] * np.conj(s2)
    r = r / (np.abs(r) + 1e-10)
    want = np.max(np.fft.irfft(r, n), -1)
    np.testing.assert_allclose(got, want, atol=5e-6)
    assert pf.bfly_bootstrap_eligible(2048, jnp.float32) == pf.available()
    assert not pf.bfly_bootstrap_eligible(2049, jnp.float32)
    assert not pf.bfly_bootstrap_eligible(2048, jnp.float64)


def test_bfly_render_matches_delay_and_sum_oracle(rng):
    """The fused render equals the XLA delay_and_sum path (pow2-circular)
    to float rounding — INCLUDING the Nyquist bin.  Regression: through
    round 2 the ramp synthesis kept the complex e^{-i*pi*tau} Nyquist
    response; the packed-pair inverse assumes Hermitian mixed spectra, so
    each mic's Nyquist imaginary leaked into its packed partner (2.2e-2
    relative waveform error vs an f64 oracle).  A real-output delay
    filter's Nyquist response is cos(pi*tau), exactly what irfft applies
    on the XLA path."""
    from pyaudiolocalization_tpu.ops.delay import delay_and_sum
    fs, nfft, n = 8000.0, 2048, 2000
    base = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.uniform(0.0, 0.02, (4, 3)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.1, 1.0, (4, 3)), jnp.float32)
    got = np.asarray(pf.bfly_delay_sum(base, d, g, fs, nfft, n,
                                       finalize=False, interpret=True))
    want = np.asarray(delay_and_sum(base, d, g, fs, apply_fade=False,
                                    pad_mode="pow2-circular"))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-5


def test_render_finalize_matches_signal_ops_oracle(rng):
    """The in-kernel finalize (normalize + log compression) must match
    ops/signal.py's XLA implementation, not merely agree between the two
    Pallas paths that share the helper."""
    from pyaudiolocalization_tpu.ops.delay import fade_window
    from pyaudiolocalization_tpu.ops import signal as sig_ops
    fs, nfft, total, out = 8000.0, 4096, 3500, 3000
    base = np.zeros(total, np.float32)
    base[:3000] = rng.standard_normal(3000)
    d = rng.uniform(0, 0.02, (4, 2)).astype(np.float32)
    g = rng.uniform(0.3, 1.0, (4, 2)).astype(np.float32)
    fade = fade_window(total, dtype=jnp.float32)[:out]
    raw = pf.bfly_delay_sum(jnp.asarray(base), jnp.asarray(d),
                            jnp.asarray(g), fs, nfft, out, fade=fade,
                            finalize=False, interpret=True)
    want = np.asarray(sig_ops.dynamic_range_compression(
        sig_ops.normalize_signal(raw)))
    got = np.asarray(pf.bfly_delay_sum(jnp.asarray(base), jnp.asarray(d),
                                       jnp.asarray(g), fs, nfft, out,
                                       fade=fade, finalize=True,
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bfly_scene_kernel_full_length_block(rng):
    """Regression (found on-chip, r2): when the kept samples fill the whole
    transform (n2_out == n2, i.e. out_samples > nfft - 128) the scene
    kernel's zero-tail write is an EMPTY slice, which Pallas rejects at
    trace time.  Exercise out = nfft here."""
    from pyaudiolocalization_tpu.ops.delay import fade_window
    fs, nfft = 8000.0, 1024
    total = out = nfft
    base = np.zeros(total, np.float32)
    base[:900] = rng.standard_normal(900)
    d = rng.uniform(0, 0.01, (2, 2)).astype(np.float32)
    g = rng.uniform(0.3, 1.0, (2, 2)).astype(np.float32)
    pi = np.array([0], np.int32)
    pj = np.array([1], np.int32)
    wq = 2
    fade = fade_window(total, dtype=jnp.float32)[:out]
    sigs = pf.bfly_delay_sum(jnp.asarray(base), jnp.asarray(d),
                             jnp.asarray(g), fs, nfft, out, fade=fade,
                             finalize=True, interpret=True)
    win1, st1 = pf.bfly_gcc_windowed(sigs, pi, pj, nfft, wq, fs=fs,
                                     interpret=True)
    win2, st2 = pf.bfly_scene_windowed(
        jnp.asarray(base), jnp.asarray(d), jnp.asarray(g), pi, pj, fs, nfft,
        out, wq, fade=fade, interpret=True)
    assert float(jnp.max(jnp.abs(win1 - win2))) < 1e-6
    assert float(jnp.max(jnp.abs(st1 - st2))) < 1e-6
