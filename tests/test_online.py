"""Streaming/online localization (models/online.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.models.online import StreamingLocalizer
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
C = float(speed_of_sound(20.0, 50.0))


def _localizer(**kw):
    return StreamingLocalizer(MICS, FS, C, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                              frame=2048, hop=512, **kw)


def test_stream_converges_to_static_source():
    src = np.array([0.3, 0.6, 0.4])
    sigs = np.asarray(simulate_signals(src, MICS, FS, C, duration=0.5,
                                       signal_type="noise",
                                       key=jax.random.PRNGKey(0)))
    loc = _localizer()
    positions, powers = loc.run(sigs)
    assert positions.shape[0] >= 8
    # After warmup + EMA settling, the tail should sit on the source.
    tail = positions[len(positions) // 2:]
    assert np.linalg.norm(tail - src[None, :], axis=-1).max() < 0.05
    assert np.all(powers > 0)


def test_stream_follows_source_jump():
    """Source jumps mid-stream; the EMA tracks to the new position."""
    a = np.asarray(simulate_signals([0.2, 0.3, 0.4], MICS, FS, C,
                                    duration=0.4, signal_type="noise",
                                    key=jax.random.PRNGKey(1)))
    b = np.asarray(simulate_signals([0.7, 0.6, 0.5], MICS, FS, C,
                                    duration=0.4, signal_type="noise",
                                    key=jax.random.PRNGKey(2)))
    loc = _localizer(ema=0.5)
    positions, _ = loc.run(np.concatenate([a, b], axis=1))
    assert np.linalg.norm(positions[-1] - [0.7, 0.6, 0.5]) < 0.05
    early = positions[2]
    assert np.linalg.norm(early - [0.2, 0.3, 0.4]) < 0.1


def test_stream_step_contract():
    loc = _localizer()
    state = loc.init_state()
    out = loc.step(state, np.zeros((4, 512), np.float32))
    assert out.position.shape == (3,)
    assert int(out.state.count) == 1
    with pytest.raises(ValueError, match="block must be"):
        loc.step(state, np.zeros((4, 100), np.float32))
    with pytest.raises(ValueError, match="power of two"):
        StreamingLocalizer(MICS, FS, C, [0] * 3, [1] * 3, frame=3000)
    with pytest.raises(ValueError, match="multiple of hop"):
        StreamingLocalizer(MICS, FS, C, [0] * 3, [1] * 3, frame=2048, hop=700)


def test_stream_vmaps_across_streams():
    """The functional step vmaps across independent streams."""
    loc = _localizer()
    s0 = loc.init_state()
    states = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), s0)
    rng = np.random.default_rng(5)
    blocks = jnp.asarray(rng.standard_normal((2, 4, 512)), jnp.float32)
    out = jax.vmap(loc._step_impl)(states, blocks)
    assert out.position.shape == (2, 3)
    assert out.state.buffer.shape == (2, 4, 2048)


def test_stream_run_short_capture_shapes():
    """Captures shorter than one frame return empty (0, 3)/(0,) arrays."""
    loc = _localizer()
    positions, powers = loc.run(np.zeros((4, 600), np.float32))
    assert positions.shape == (0, 3)
    assert powers.shape == (0,)


def test_streaming_multi_source_two_talkers():
    """num_sources=2 returns two separable positions per hop (8-mic cube,
    like the batch multi-source tests — 6-pair arrays ghost too easily)."""
    import jax
    from pyaudiolocalization_tpu.models.simulator import simulate_signals
    from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
    from pyaudiolocalization_tpu.models.online import StreamingLocalizer

    fs = 16000.0
    c = float(speed_of_sound(20.0, 50.0))
    mics8 = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.],
                      [1., 1., 0.], [1., 0., 1.], [0., 1., 1.], [1., 1., 1.]])
    srcs = np.array([[0.2, 0.2, 0.3], [0.8, 0.7, 0.6]])
    sigs = sum(
        np.asarray(simulate_signals(s, mics8, fs, c, duration=0.5,
                                    signal_type="noise",
                                    key=jax.random.PRNGKey(i + 1)))
        for i, s in enumerate(srcs))
    loc = StreamingLocalizer(mics8, fs, c, lower=(0., 0., 0.),
                             upper=(1., 1., 1.), frame=4096, hop=1024,
                             num_sources=2)
    positions, powers = loc.run(sigs)
    assert positions.shape[1:] == (2, 3)
    assert powers.shape[1:] == (2,)
    got = positions[-1]
    e1 = np.linalg.norm(got - srcs, axis=-1).max()
    e2 = np.linalg.norm(got - srcs[::-1], axis=-1).max()
    assert min(e1, e2) < 0.12


MICS8 = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                  [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])


def _tone_capture(srcs_freqs, duration=0.5, snr_db=25.0):
    sigs = sum(
        np.asarray(simulate_signals(np.asarray(s), MICS8, FS, C,
                                    duration=duration, signal_type="sine",
                                    freq=f, key=jax.random.PRNGKey(0)))
        for s, f in srcs_freqs)
    rng = np.random.default_rng(7)
    return sigs + np.std(sigs) * 10.0 ** (-snr_db / 20.0) * rng.standard_normal(
        sigs.shape)


def test_stream_capon_narrowband_tone():
    """method='capon' localizes a pure tone online — the regime where the
    broadband SRP stream has no usable correlation peaks."""
    src = np.array([0.3, 0.6, 0.4])
    sigs = _tone_capture([(src, 700.0)])
    loc = StreamingLocalizer(MICS8, FS, C, [0, 0, 0], [1, 1, 1],
                             frame=2048, hop=512, method="capon",
                             band=(300.0, 1200.0))
    positions, powers = loc.run(sigs)
    tail = positions[len(positions) // 2:]
    assert np.linalg.norm(tail - src[None, :], axis=-1).max() < 0.05
    assert np.all(powers > 0)


def _two_talker_tail_err(positions, srcs):
    """Median assignment-matched error over the second half of the stream.
    The median, not the last hop: the capture's END carries the
    fractional-delay fade-out ramp, whose chirped spectrum can smear ONE
    final-hop estimate (measured: music at 600+700 Hz reads 6.8 mm on
    every tail hop and 121 mm on the fade-out hop)."""
    errs = []
    for p in positions[len(positions) // 2:]:
        e1 = np.linalg.norm(p - srcs, axis=-1).max()
        e2 = np.linalg.norm(p - srcs[::-1], axis=-1).max()
        errs.append(min(e1, e2))
    return float(np.median(errs))


@pytest.mark.parametrize("method", ["music", "capon"])
@pytest.mark.parametrize("f2", [700.0, 850.0])
def test_stream_two_tone_talkers(method, f2):
    """num_sources=2: two simultaneous tones tracked online to within 2 cm.

    600+850 Hz is the former grating-envelope regression (VERDICT r2 item
    3): the old fine-bin local-max selection had no cross-bin frequency
    diversity, and talker 2 locked onto a ~19 cm grating artifact.  The
    coarse intra-hop snapshot design (batch-equivalent skirt diversity +
    per-round bin claiming in the multi-source search) tracks both talkers
    at batch accuracy."""
    srcs = np.array([[0.2, 0.25, 0.3], [0.8, 0.7, 0.65]])
    sigs = _tone_capture([(srcs[0], 600.0), (srcs[1], f2)])
    loc = StreamingLocalizer(MICS8, FS, C, [0, 0, 0], [1, 1, 1],
                             frame=2048, hop=512, method=method,
                             num_sources=2, min_separation=0.3,
                             band=(300.0, 1200.0))
    positions, _ = loc.run(sigs)
    err = _two_talker_tail_err(positions, srcs)
    assert err < 0.02, f"{method} 600+{f2}: tail median err={err}"


@pytest.mark.parametrize("method", ["music", "capon"])
def test_stream_weak_emitter_30db_below(method):
    """An emitter 30 dB (power) below the strongest must still be
    recovered online (VERDICT r2 item 7: the old selection had a ~25 dB
    bin-weight floor; plain batch-style top-k starves the weak emitter of
    bins entirely — the peak-group selection plus per-round bin claiming
    recover it at mm scale)."""
    srcs = np.array([[0.2, 0.25, 0.3], [0.8, 0.7, 0.65]])
    sigs1 = _tone_capture([(srcs[0], 600.0)], snr_db=40.0)
    sigs2 = _tone_capture([(srcs[1], 850.0)], snr_db=40.0)
    mix = sigs1 + 10.0 ** (-30.0 / 20.0) * sigs2
    loc = StreamingLocalizer(MICS8, FS, C, [0, 0, 0], [1, 1, 1],
                             frame=2048, hop=512, method=method,
                             num_sources=2, min_separation=0.3,
                             band=(300.0, 1200.0))
    positions, _ = loc.run(mix)
    err = _two_talker_tail_err(positions, srcs)
    assert err < 0.02, f"{method} weak emitter: tail median err={err}"


def test_stream_capon_silence_stays_finite():
    """All-zero input (lead-in digital silence) must not NaN-poison the
    'capon' stream: the loaded inverse floors the trace, so powers stay
    finite (positions are meaningless but well-defined)."""
    loc = StreamingLocalizer(MICS8, FS, C, [0, 0, 0], [1, 1, 1],
                             frame=2048, hop=512, method="capon")
    state = loc.init_state()
    for _ in range(3):
        out = loc.step(state, np.zeros((8, 512), np.float32))
        state = out.state
    assert np.all(np.isfinite(np.asarray(out.position)))
    assert np.isfinite(float(out.power))


def test_stream_method_validation():
    with pytest.raises(ValueError, match="method"):
        _localizer(method="bogus")
    with pytest.raises(ValueError, match="noise"):
        # 4 mics cannot protect a 4-source MUSIC subspace.
        _localizer(method="music", num_sources=4)


def test_streaming_multi_claim_suppression():
    """suppression='claim' pass-through: the broadband multi hop uses
    lag-claiming extraction (srp_phat_locate_multi); invalid values raise."""
    mics = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0],
                     [1.5, 3.0, 0.0], [1.5, 1.5, 2.0]])
    lower = np.zeros(3)
    upper = np.array([3.2, 3.2, 2.2])
    with pytest.raises(ValueError, match="suppression"):
        StreamingLocalizer(mics, 16000.0, 343.0, lower, upper,
                           num_sources=2, suppression="nms")
    loc = StreamingLocalizer(mics, 16000.0, 343.0, lower, upper,
                             frame=2048, hop=1024, num_sources=2,
                             coarse_n=24, fine_n=10, suppression="claim")
    rng = np.random.default_rng(123)   # private seeded RNG (CLAUDE.md)
    sigs = rng.standard_normal((4, 4096)).astype(np.float64)
    state = loc.init_state()
    for k in range(sigs.shape[-1] // 1024):
        out = loc.step(state, sigs[:, k * 1024:(k + 1) * 1024])
        state = out.state
    assert np.asarray(out.position).shape == (2, 3)
    assert np.isfinite(np.asarray(out.position)).all()
