"""Ogg Vorbis decoder tests.

The golden fixture (tests/data/house_lo.ogg, a real encoder-produced
stream: 19 codebooks, floor1, cascaded type-1 residues) is decoded and
compared sample-exactly against tests/data/house_lo_golden.npz, an
int16 PCM capture of SDL_mixer/stb_vorbis decoding the same file — an
independent decoder implementation.  Unit tests pin the IMDCT against
the direct cosine definition, the window/lapping logic against perfect
reconstruction (including long/short block switching, which the mono
fixture does not exercise), and Huffman codeword assignment against the
spec's worked example.
"""

import os

import numpy as np
import pytest

from pyaudiolocalization_tpu.utils import vorbis as V
from pyaudiolocalization_tpu.utils.audio_io import read_audio_file

DATA = os.path.join(os.path.dirname(__file__), "data")
OGG = os.path.join(DATA, "house_lo.ogg")
GOLDEN = os.path.join(DATA, "house_lo_golden.npz")


def test_golden_decode_matches_stb_vorbis():
    pcm, fs = V.read_ogg(OGG)
    ref = np.load(GOLDEN)
    golden = ref["pcm"]
    assert fs == int(ref["fs"])
    assert pcm.shape == (len(golden), 1)
    mine = np.clip(np.round(pcm[:, 0] * 32768.0), -32768, 32767).astype(
        np.int32)
    diff = np.abs(mine - golden.astype(np.int32))
    # two independent decoders, float32 (stb) vs float64 (ours)
    assert diff.max() <= 8
    assert np.sqrt(np.mean(diff.astype(float) ** 2)) < 1.5
    # and the signal is loud enough for the bound to be meaningful
    assert np.sqrt(np.mean(golden.astype(float) ** 2)) > 5000


def test_imdct_matches_direct_definition():
    rng = np.random.default_rng(0)
    for n2 in (16, 128, 256):
        x = rng.standard_normal(n2)
        n = 2 * n2
        j = np.arange(n)[:, None]
        k = np.arange(n2)[None, :]
        direct = (np.cos(2 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
                  @ x)
        np.testing.assert_allclose(V.imdct(x), direct, atol=1e-9)


def _forward_mdct(xw: np.ndarray) -> np.ndarray:
    n = len(xw)
    n2 = n // 2
    j = np.arange(n)[:, None]
    k = np.arange(n2)[None, :]
    return (np.cos(2 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5)).T
            @ xw)


@pytest.mark.parametrize("blocks", [
    [256] * 6,                                   # all short
    [256, 256, 1024, 1024, 256, 256, 1024],      # switching both ways
])
def test_lapping_perfect_reconstruction(blocks):
    """Forward MDCT (analysis window) -> imdct -> frame_window -> OLA
    reconstructs the interior exactly, including block transitions.
    Adjacent frames are placed so their facing window slopes coincide
    (TDAC): start[i+1] = start[i] + right_start[i] - left_start[i+1]."""
    n0 = 256
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8192)
    geoms = []
    for i, n in enumerate(blocks):
        prev_flag = int(i > 0 and blocks[i - 1] == 1024)
        next_flag = int(i + 1 < len(blocks) and blocks[i + 1] == 1024)
        geoms.append(V.frame_geometry(n, n0, int(n == 1024), prev_flag,
                                      next_flag))
    starts = [2048]
    for i in range(1, len(blocks)):
        starts.append(starts[i - 1] + geoms[i - 1][2] - geoms[i][0])
    out = []
    prev_tail = None
    for i, n in enumerate(blocks):
        ls, le, rs, re = geoms[i]
        w = V.frame_window(n, geoms[i])
        spec = _forward_mdct(w * x[starts[i]:starts[i] + n])
        y = V.imdct(spec) * (4.0 / n) * w
        if prev_tail is not None:
            emit = y[ls:rs].copy()
            emit[:le - ls] += prev_tail
            out.append(emit)
        prev_tail = y[rs:re]
    out = np.concatenate(out)
    ref_start = starts[1] + geoms[1][0]
    np.testing.assert_allclose(out, x[ref_start:ref_start + len(out)],
                               atol=1e-9)


def test_huffman_assignment_spec_example():
    """Vorbis I spec 3.2.1 worked example: lengths [2,4,4,4,4,2,3,3] ->
    codewords [00, 0100, 0101, 0110, 0111, 10, 110, 111]."""
    lengths = [2, 4, 4, 4, 4, 2, 3, 3]
    codes = [0b00, 0b0100, 0b0101, 0b0110, 0b0111, 0b10, 0b110, 0b111]
    cb = V._Codebook.__new__(V._Codebook)
    cb.lengths = np.array(lengths, np.int32)
    cb.fast_entry = None
    cb._assign_codewords()
    for entry, (l, cw) in enumerate(zip(lengths, codes)):
        # pack the codeword MSB-first into an LSB-first bitstream
        bits = [(cw >> (l - 1 - i)) & 1 for i in range(l)]
        val = sum(b << i for i, b in enumerate(bits))
        br = V._BitReader(bytes([val & 0xFF, (val >> 8) & 0xFF]))
        assert cb.decode_scalar(br) == entry
        assert br.pos == l


def test_crc_detects_corruption():
    data = bytearray(open(OGG, "rb").read())
    data[5000] ^= 0x40  # flip a bit inside a page body
    bad = os.path.join("/tmp", "corrupt.ogg")
    with open(bad, "wb") as f:
        f.write(data)
    with pytest.raises(RuntimeError):
        V.read_ogg(bad)


def test_not_an_ogg_raises():
    path = os.path.join("/tmp", "not_an.ogg")
    with open(path, "wb") as f:
        f.write(b"RIFF" + b"\x00" * 64)
    with pytest.raises(RuntimeError):
        V.read_ogg(path)


def test_audio_io_dispatch_reads_ogg():
    frames, fs = read_audio_file(OGG)
    assert fs == 11025
    assert frames.shape[1] == 1
    assert frames.shape[0] == 78331
    assert 0.05 < np.sqrt((frames ** 2).mean()) < 1.0
