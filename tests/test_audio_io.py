"""WAV ingestion + resampling tests (reference utils.py:459-482 path)."""

import os
import struct
import wave

import jax.numpy as jnp
import numpy as np
import pytest

from pyaudiolocalization_tpu.ops.resample import resample
from pyaudiolocalization_tpu.utils.audio_io import read_audio_files, read_wav


def write_wav_pcm16(path, data, fs, channels=1):
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(fs)
        pcm = np.clip(data * 32767, -32768, 32767).astype("<i2")
        w.writeframes(pcm.tobytes())


def test_read_wav_pcm16_roundtrip(tmp_path, rng):
    fs = 8000
    x = np.clip(rng.normal(size=4000) * 0.2, -1, 1)
    p = str(tmp_path / "a.wav")
    write_wav_pcm16(p, x, fs)
    frames, got_fs = read_wav(p)
    assert got_fs == fs
    np.testing.assert_allclose(frames[:, 0], np.round(x * 32767) / 32768.0,
                               atol=1.0 / 32767)


def test_read_wav_stereo_downmix(tmp_path, rng):
    fs = 8000
    left = np.sin(np.linspace(0, 100, 2000)) * 0.5
    right = np.cos(np.linspace(0, 100, 2000)) * 0.5
    inter = np.empty(4000)
    inter[0::2] = left
    inter[1::2] = right
    p = str(tmp_path / "st.wav")
    write_wav_pcm16(p, inter, fs, channels=2)
    sigs = read_audio_files([p], fs)
    assert sigs[0].shape == (2000,)
    # downmix = channel mean, then normalize+compress -> just check shape+range
    assert float(jnp.max(jnp.abs(sigs[0]))) <= 1.0 + 1e-9


def test_read_audio_files_missing():
    with pytest.raises(FileNotFoundError):
        read_audio_files(["/nonexistent/file.wav"], 8000)


def test_read_audio_files_resamples(tmp_path, rng):
    fs_in, fs_out = 16000, 8000
    t = np.arange(8000) / fs_in
    x = np.sin(2 * np.pi * 440 * t) * 0.5
    p = str(tmp_path / "hi.wav")
    write_wav_pcm16(p, x, fs_in)
    sigs = read_audio_files([p], fs_out)
    assert abs(sigs[0].shape[-1] - 4000) <= 1


def test_resample_preserves_tone(rng):
    """A 440 Hz tone resampled 16k->8k must stay a 440 Hz tone."""
    fs_in, fs_out = 16000.0, 8000.0
    t = np.arange(16000) / fs_in
    x = np.sin(2 * np.pi * 440 * t)
    y = np.asarray(resample(jnp.asarray(x), fs_in, fs_out))
    assert y.shape[0] == 8000
    spec = np.abs(np.fft.rfft(y[500:-500]))
    freqs = np.fft.rfftfreq(len(y[500:-500]), 1 / fs_out)
    peak_freq = freqs[np.argmax(spec)]
    assert abs(peak_freq - 440) < 2.0
    # amplitude preserved within a few percent in the interior
    assert abs(np.max(np.abs(y[500:-500])) - 1.0) < 0.05


def test_resample_antialiases(rng):
    """Content above the target Nyquist must be strongly attenuated."""
    fs_in, fs_out = 16000.0, 8000.0
    t = np.arange(16000) / fs_in
    x = np.sin(2 * np.pi * 6000 * t)  # above 4 kHz target Nyquist
    y = np.asarray(resample(jnp.asarray(x), fs_in, fs_out))
    assert np.max(np.abs(y[500:-500])) < 0.02


def test_resample_identity():
    x = jnp.asarray(np.sin(np.linspace(0, 20, 1000)))
    y = resample(x, 8000.0, 8000.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
