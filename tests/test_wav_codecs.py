"""Telephony WAV codec tests (G.711 mu-law/A-law, IMA ADPCM, MS ADPCM).

The vectorized block decoders in utils/audio_io.py are pinned against
straightforward scalar reference decoders written here directly from the
codec definitions (catching layout/vectorization bugs), against known
G.711 anchor values, and against textbook encoders for round-trip
tracking accuracy.
"""

import struct

import numpy as np
import pytest

from pyaudiolocalization_tpu.utils import audio_io as aio


# ---------------------------------------------------------------------------
# G.711
# ---------------------------------------------------------------------------

def test_mulaw_anchors():
    t = aio._MULAW
    assert t[0xFF] == 0          # the mu-law zero code
    assert t[0x7F] == 0          # negative zero
    assert t[0x80] == 32124      # maximum positive amplitude
    assert t[0x00] == -32124     # maximum negative amplitude
    # sign symmetry: codes 0x80|c and c decode to opposite values
    c = np.arange(128)
    np.testing.assert_array_equal(t[c], -t[c | 0x80].astype(np.int64))


def test_alaw_anchors():
    t = aio._ALAW
    # A-law sign convention is opposite to mu-law's: 0xD5 (a=0x80 after
    # the XOR) is the smallest POSITIVE code (ITU G.711)
    assert int(t[0xD5]) == 8
    assert int(t[0x55]) == -8
    assert int(np.abs(t.astype(np.int64)).max()) == 32256
    c = np.arange(256)
    pos = t[c] > 0
    np.testing.assert_array_equal(t[c[pos]],
                                  -t[c[pos] ^ 0x80].astype(np.int64))


def test_g711_tables_match_audioop_oracle():
    """Pin both 256-entry expansion tables against the CPython reference
    implementation (audioop wraps the ITU G.711 C tables)."""
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256))
    ref_mu = np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
    np.testing.assert_array_equal(aio._MULAW, ref_mu)
    np.testing.assert_array_equal(aio._ALAW, ref_a)


def _mulaw_encode(x: int) -> int:
    """Textbook segmented mu-law encoder (independent of the decoder)."""
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), CLIP) + BIAS
    exp, mask = 7, 0x4000
    while exp > 0 and not (x & mask):
        exp -= 1
        mask >>= 1
    mant = (x >> (exp + 3)) & 0xF
    return ~(sign | (exp << 4) | mant) & 0xFF


def test_mulaw_round_trip_quantization():
    rng = np.random.default_rng(0)
    xs = rng.integers(-32000, 32000, 500)
    for x in xs:
        dec = int(aio._MULAW[_mulaw_encode(int(x))])
        # segment quantization step at |x|: 2^(exp+3)
        err = abs(dec - int(x))
        step = max(8, 2 ** (int(abs(x) + 0x84).bit_length() - 5))
        assert err <= step, (x, dec, step)


# ---------------------------------------------------------------------------
# IMA ADPCM
# ---------------------------------------------------------------------------

def _ima_decode_scalar(payload, channels, block_align):
    """Scalar per-spec reference decoder."""
    out = []
    for boff in range(0, len(payload) - block_align + 1, block_align):
        block = payload[boff:boff + block_align]
        preds, idxs = [], []
        for c in range(channels):
            p, i = struct.unpack_from("<hB", block, 4 * c)[:2]
            preds.append(p)
            idxs.append(min(max(i, 0), 88))
        chans = [[p] for p in preds]
        body = block[4 * channels:]
        ngroups = len(body) // (4 * channels)
        for g in range(ngroups):
            for c in range(channels):
                chunk = body[(g * channels + c) * 4:(g * channels + c) * 4 + 4]
                for byte in chunk:
                    for n in (byte & 0xF, byte >> 4):
                        step = int(aio._IMA_STEPS[idxs[c]])
                        diff = step >> 3
                        if n & 1:
                            diff += step >> 2
                        if n & 2:
                            diff += step >> 1
                        if n & 4:
                            diff += step
                        if n & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = min(max(preds[c], -32768), 32767)
                        idxs[c] = min(max(idxs[c] + int(
                            aio._IMA_INDEX[n & 7]), 0), 88)
                        chans[c].append(preds[c])
        nsamp = len(chans[0])
        for t in range(nsamp):
            out.append([chans[c][t] for c in range(channels)])
    return np.array(out, np.int64)


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_matches_scalar_reference(channels):
    rng = np.random.default_rng(1)
    block_align = 4 * channels + 8 * channels * 3   # 3 nibble groups/ch
    payload = bytes(rng.integers(0, 256, block_align * 4, dtype=np.uint8))
    got = aio._ima_adpcm_decode(payload, channels, block_align)
    ref = _ima_decode_scalar(payload, channels, block_align)
    np.testing.assert_array_equal(got, ref)


def test_ima_adpcm_round_trip_tracks_sine():
    """Textbook encoder -> our decoder reconstructs a sine to ~1% rms."""
    fs, n = 8000, 2000
    x = (12000 * np.sin(2 * np.pi * 440 * np.arange(n) / fs)).astype(int)
    spb = 505  # samples per block incl. header sample
    blocks = []
    pos = 0
    index = 0  # carried across blocks via the block header, per the format
    while pos + spb <= n:
        pred = int(x[pos])
        hdr = struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in x[pos + 1:pos + spb]:
            step = int(aio._IMA_STEPS[index])
            diff = int(s) - pred
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            # mirror the decoder update
            d = step >> 3
            if code & 1:
                d += step >> 2
            if code & 2:
                d += step >> 1
            if code & 4:
                d += step
            pred = min(max(pred - d if code & 8 else pred + d, -32768),
                       32767)
            index = min(max(index + int(aio._IMA_INDEX[code & 7]), 0), 88)
            nibs.append(code)
        body = bytes(nibs[i] | (nibs[i + 1] << 4)
                     for i in range(0, len(nibs), 2))
        blocks.append(hdr + body)
        pos += spb
    block_align = len(blocks[0])
    dec = aio._ima_adpcm_decode(b"".join(blocks), 1, block_align)[:, 0]
    ref = x[:len(dec)]
    # after the encoder's step-size attack (~100 samples from index 0),
    # 4-bit IMA tracks a tone at ~30 dB SNR
    err = (dec - ref)[100:]
    rms = np.sqrt(np.mean(err ** 2.0))
    assert rms < 400.0, rms
    assert np.corrcoef(dec, ref)[0, 1] > 0.995


# ---------------------------------------------------------------------------
# MS ADPCM
# ---------------------------------------------------------------------------

def _ms_decode_scalar(payload, channels, block_align, coefs):
    out = []
    for boff in range(0, len(payload) - block_align + 1, block_align):
        block = payload[boff:boff + block_align]
        ci = [min(block[c], len(coefs) - 1) for c in range(channels)]
        deltas = list(struct.unpack_from(f"<{channels}h", block, channels))
        s1 = list(struct.unpack_from(f"<{channels}h", block,
                                     3 * channels))
        s2 = list(struct.unpack_from(f"<{channels}h", block,
                                     5 * channels))
        chans = [[s2[c], s1[c]] for c in range(channels)]
        nibs = []
        for byte in block[7 * channels:]:
            nibs.append(byte >> 4)
            nibs.append(byte & 0xF)
        nibs = nibs[:(len(nibs) // channels) * channels]
        for i, n in enumerate(nibs):
            c = i % channels
            signed = n - 16 if n >= 8 else n
            q = (chans[c][-1] * int(coefs[ci[c]][0])
                 + chans[c][-2] * int(coefs[ci[c]][1]))
            pred = int(q / 256)  # C truncation toward zero, not floor
            sample = min(max(pred + signed * deltas[c], -32768), 32767)
            chans[c].append(sample)
            deltas[c] = max((int(aio._MS_ADAPT[n]) * deltas[c]) >> 8, 16)
        nsamp = len(chans[0])
        for t in range(nsamp):
            out.append([chans[c][t] for c in range(channels)])
    return np.array(out, np.int64)


@pytest.mark.parametrize("channels", [1, 2])
def test_ms_adpcm_matches_scalar_reference(channels):
    rng = np.random.default_rng(2)
    block_align = 7 * channels + 32 * channels
    payload = bytearray(rng.integers(0, 256, block_align * 3,
                                     dtype=np.uint8))
    # keep predictor indices in range and deltas positive
    for b in range(3):
        for c in range(channels):
            payload[b * block_align + c] = (b + c) % 7
            struct.pack_into("<h", payload, b * block_align + channels
                             + 2 * c, 100 + 7 * b + c)
    got = aio._ms_adpcm_decode(bytes(payload), channels, block_align,
                               aio._MS_COEFS)
    ref = _ms_decode_scalar(bytes(payload), channels, block_align,
                            aio._MS_COEFS)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Container plumbing
# ---------------------------------------------------------------------------

def _wav_bytes(fmt_code, channels, fs, bits, block_align, payload,
               fact=None, fmt_extra=b""):
    fmt = struct.pack("<HHIIHH", fmt_code, channels, fs,
                      fs * max(block_align, 1), block_align, bits) + fmt_extra
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_read_wav_mulaw_and_alaw(tmp_path):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 256, 400, dtype=np.uint8)
    for fmt_code, table in ((7, aio._MULAW), (6, aio._ALAW)):
        p = tmp_path / f"g711_{fmt_code}.wav"
        p.write_bytes(_wav_bytes(fmt_code, 2, 8000, 8, 2, codes.tobytes()))
        frames, fs = aio.read_wav(str(p))
        assert fs == 8000 and frames.shape == (200, 2)
        np.testing.assert_allclose(
            frames, table[codes].reshape(200, 2) / 32768.0)


def test_read_wav_ima_adpcm_with_fact_truncation(tmp_path):
    rng = np.random.default_rng(4)
    block_align = 4 + 8 * 2
    payload = bytes(rng.integers(0, 256, block_align * 2, dtype=np.uint8))
    p = tmp_path / "ima.wav"
    p.write_bytes(_wav_bytes(0x11, 1, 8000, 4, block_align, payload,
                             fact=20))
    frames, fs = aio.read_wav(str(p))
    ref = _ima_decode_scalar(payload, 1, block_align)
    assert frames.shape == (20, 1)   # fact chunk truncates 34 -> 20
    np.testing.assert_allclose(frames[:, 0], ref[:20, 0] / 32768.0)


def test_read_wav_ms_adpcm(tmp_path):
    rng = np.random.default_rng(5)
    block_align = 7 + 16
    payload = bytearray(rng.integers(0, 256, block_align, dtype=np.uint8))
    payload[0] = 0
    struct.pack_into("<h", payload, 1, 64)
    p = tmp_path / "ms.wav"
    extra = struct.pack("<HHH", 2 + 32, 7, 0)[:4]  # cbSize-ish filler
    p.write_bytes(_wav_bytes(2, 1, 8000, 4, block_align, bytes(payload)))
    frames, fs = aio.read_wav(str(p))
    ref = _ms_decode_scalar(bytes(payload), 1, block_align, aio._MS_COEFS)
    np.testing.assert_allclose(frames[:, 0], ref[:, 0] / 32768.0)


def test_read_aiff_ulaw(tmp_path):
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 256, 100, dtype=np.uint8)
    comm = struct.pack(">HIH", 1, 100, 8) + _pack_extended80(8000.0) \
        + b"ulaw" + b"\x00\x00"
    ssnd = struct.pack(">II", 0, 0) + codes.tobytes()
    body = (b"AIFC"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    p = tmp_path / "t.aifc"
    p.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)
    frames, fs = aio.read_aiff(str(p))
    assert fs == 8000
    np.testing.assert_allclose(frames[:, 0],
                               aio._MULAW[codes] / 32768.0)


def _pack_extended80(x: float) -> bytes:
    import math
    if x == 0:
        return b"\x00" * 10
    m, e = math.frexp(x)
    mant = int(m * (1 << 64))
    return struct.pack(">HQ", e - 1 + 16383, mant)
