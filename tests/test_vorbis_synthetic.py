"""Hand-crafted Vorbis bitstreams for the paths the real fixture can't reach.

tests/data/house_lo.ogg is mono with type-1 residues, so stereo square-
polar coupling, residue types 0 and 2, the interleave/deinterleave
layout, and the floor-unused silence rule are otherwise untested.  This
module builds minimal spec-compliant streams bit by bit (LSB-first
writer, codewords written MSB-first) and compares the decoder output
against expectations computed here analytically: the planned residue
values run through scalar coupling rules, a direct-cosine IMDCT, and the
direct window formula — no decoder internals are reused except the Ogg
CRC (itself pinned by the real-fixture test).
"""

import struct

import numpy as np
import pytest

from pyaudiolocalization_tpu.utils import vorbis as V


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, nbits: int):
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, nbits: int):
        """Huffman codeword: MSB enters the stream first."""
        for i in range(nbits - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _float32_pack(mantissa: int, exponent: int, sign: int) -> int:
    return (sign << 31) | (exponent << 21) | mantissa


# VQ table written into every stream: value_bits=2 multiplicands
# [0,1,2,3,3,2,1,0], minimum=-2, delta=1 -> entries (lookup type 2):
VQ = {0: (-2.0, -1.0), 1: (0.0, 1.0), 2: (1.0, 0.0), 3: (-1.0, -2.0)}


def _ident_packet(channels: int) -> bytes:
    w = BitWriter()
    w.write(1, 8)
    for c in b"vorbis":
        w.write(c, 8)
    w.write(0, 32)
    w.write(channels, 8)
    w.write(8000, 32)
    for _ in range(3):
        w.write(0, 32)
    w.write(6, 4)   # blocksize0 = 64
    w.write(6, 4)   # blocksize1 = 64
    w.write(1, 1)
    return w.bytes()


def _comment_packet() -> bytes:
    w = BitWriter()
    w.write(3, 8)
    for c in b"vorbis":
        w.write(c, 8)
    w.write(0, 32)  # vendor length
    w.write(0, 32)  # user comment count
    w.write(1, 1)
    return w.bytes()


def _setup_packet(channels: int, residue_type: int,
                  coupling: bool) -> bytes:
    w = BitWriter()
    w.write(5, 8)
    for c in b"vorbis":
        w.write(c, 8)
    w.write(1, 8)             # 2 codebooks
    # book 0: scalar classbook, 2 entries of length 1
    w.write(0x564342, 24)
    w.write(1, 16)            # dims
    w.write(2, 24)            # entries
    w.write(0, 1)             # not ordered
    w.write(0, 1)             # not sparse
    w.write(0, 5)             # length 1
    w.write(0, 5)
    w.write(0, 4)             # no lookup
    # book 1: VQ book, dims=2, 4 entries of length 2, lookup type 2
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(4, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(4):
        w.write(1, 5)         # length 2
    w.write(2, 4)             # lookup type 2
    w.write(_float32_pack(1, 789, 1), 32)   # minimum = -1*2^(789-788) = -2
    w.write(_float32_pack(1, 788, 0), 32)   # delta   = +1*2^0 = 1
    w.write(1, 4)             # value_bits = 2
    w.write(0, 1)             # sequence_p = 0
    for m in (0, 1, 2, 3, 3, 2, 1, 0):
        w.write(m, 2)
    # times
    w.write(0, 6)
    w.write(0, 16)
    # one floor, type 1, zero partitions, multiplier 1, X = [0, 32]
    w.write(0, 6)
    w.write(1, 16)
    w.write(0, 5)             # partitions = 0
    w.write(0, 2)             # multiplier - 1
    w.write(5, 4)             # rangebits -> X = [0, 32]
    # one residue
    w.write(0, 6)
    w.write(residue_type, 16)
    w.write(0, 24)            # begin
    w.write(64 if residue_type == 2 and channels == 2 else 32, 24)  # end
    w.write(7, 24)            # partition_size - 1 -> 8
    w.write(0, 6)             # classifications - 1 -> 1
    w.write(0, 8)             # classbook = book 0
    w.write(1, 3)             # cascade low bits: pass 0 set
    w.write(0, 1)             # no high bits
    w.write(1, 8)             # pass-0 book = book 1
    # one mapping
    w.write(0, 6)
    w.write(0, 16)
    w.write(0, 1)             # one submap
    if coupling:
        w.write(1, 1)
        w.write(0, 8)         # one coupling step
        w.write(0, 1)         # magnitude channel 0
        w.write(1, 1)         # angle channel 1
    else:
        w.write(0, 1)
    w.write(0, 2)             # reserved
    w.write(0, 8)             # time placeholder
    w.write(0, 8)             # floor 0
    w.write(0, 8)             # residue 0
    # one mode
    w.write(0, 6)
    w.write(0, 1)             # short blocks only
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    w.write(1, 1)             # framing
    return w.bytes()


def _audio_packet(channels: int, entry_pattern, floor_on) -> bytes:
    """entry_pattern: list of VQ entry ids consumed partition by
    partition (4 two-dim vectors per 8-sample partition)."""
    w = BitWriter()
    w.write(0, 1)             # audio packet
    # zero mode bits (single mode), short block: no window flags
    for c in range(channels):
        if floor_on[c]:
            w.write(1, 1)
            w.write(255, 8)   # y0 (flat max floor -> gain ~1.0)
            w.write(255, 8)   # y1
        else:
            w.write(0, 1)
    it = iter(entry_pattern)
    nparts = len(entry_pattern) // 4
    for _ in range(nparts):
        w.write_code(0, 1)    # classword (class 0)
        for _ in range(4):
            w.write_code(next(it), 2)
    return w.bytes()


def _page(serial, seq, granule, packets, htype=0) -> bytes:
    segs = []
    body = b""
    for p in packets:
        n = len(p)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        body += p
    hdr = (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
           + struct.pack("<IiI", serial, seq, 0) + bytes([len(segs)])
           + bytes(segs))
    crc = V._ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def _build_stream(path, channels, residue_type, coupling, packets):
    data = (_page(7, 0, 0, [_ident_packet(channels)], htype=2)
            + _page(7, 1, 0, [_comment_packet(),
                              _setup_packet(channels, residue_type,
                                            coupling)])
            + _page(7, 2, 32 * (len(packets) - 1), packets))
    with open(path, "wb") as f:
        f.write(data)


def _direct_imdct(spec):
    n2 = len(spec)
    n = 2 * n2
    j = np.arange(n)[:, None]
    k = np.arange(n2)[None, :]
    return np.cos(2 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5)) @ spec


def _direct_window(n):
    i = np.arange(n) + 0.5
    return np.sin(0.5 * np.pi * np.sin(i / n * np.pi) ** 2)


def _couple(m, a):
    if m > 0:
        return (m, m - a) if a > 0 else (m + a, m)
    return (m, m + a) if a > 0 else (m - a, m)


FLOOR_MAX = 1.0649863e-07 * 1.0649863 ** 255


def _expected_block(entry_pattern, channels, residue_type, coupling,
                    floor_on):
    vals = np.concatenate([VQ[e] for e in entry_pattern])
    if residue_type == 2 and channels == 2:
        r = np.stack([vals[0::2], vals[1::2]])
    elif residue_type == 0:
        # format 0: within each 8-sample partition, 4 vectors of dim 2
        # land strided: v[i + j*step], step = 4
        r = np.zeros((1, 32))
        for p in range(len(entry_pattern) // 4):
            block = vals[p * 8:(p + 1) * 8].reshape(4, 2)
            for i in range(4):
                for jj in range(2):
                    r[0, p * 8 + i + jj * 4] = block[i, jj]
    else:
        raise AssertionError
    if coupling:
        out = np.array([[_couple(m, a) for m, a in zip(r[0], r[1])]])
        r = out[0].T.copy()
    y = np.zeros((channels, 64))
    w = _direct_window(64)
    for c in range(channels):
        if floor_on[c]:
            y[c] = _direct_imdct(FLOOR_MAX * r[c]) * w
    return y


def _expected_output(patterns, channels, residue_type, coupling, floors):
    blocks = [_expected_block(p, channels, residue_type, coupling, f)
              for p, f in zip(patterns, floors)]
    frames = []
    for prev, cur in zip(blocks, blocks[1:]):
        frames.append(prev[:, 32:] + cur[:, :32])
    return np.concatenate(frames, axis=1).T


def _patterns(n_packets, seed, entries=32):
    rng = np.random.default_rng(seed)
    return [list(rng.integers(0, 4, entries)) for _ in range(n_packets)]


def test_floor1_state_travels_with_channel_data():
    """Regression: floor configs are shared across channels and ALL
    channels decode before any curve renders, so the step2 flags must
    travel with the decoded data — instance state left every channel
    rendering with the LAST channel's flags (up to ~80% curve error)."""
    f = V._Floor1.__new__(V._Floor1)
    f.x_list = np.array([0, 128, 32, 64, 96], np.int64)
    f.multiplier = 1
    f.values = 5
    f.lo_nb = np.zeros(5, np.int64)
    f.hi_nb = np.zeros(5, np.int64)
    for i in range(2, 5):
        xs = f.x_list
        below = [j for j in range(i) if xs[j] < xs[i]]
        above = [j for j in range(i) if xs[j] > xs[i]]
        f.lo_nb[i] = max(below, key=lambda j: xs[j])
        f.hi_nb[i] = min(above, key=lambda j: xs[j])
    f.sort_order = np.argsort(f.x_list, kind="stable")
    # channel A: middle posts are zero-valued (step2 False -> interpolated)
    dec_a = f._amplitude(np.array([40, 200, 0, 0, 0], np.int64), 256)
    curve_a_before = f.curve(dec_a, 64)
    # channel B decodes afterwards with every post flagged and different Ys
    dec_b = f._amplitude(np.array([200, 40, 90, 30, 170], np.int64), 256)
    assert not np.array_equal(dec_a[1], dec_b[1])   # flags genuinely differ
    curve_a_after = f.curve(dec_a, 64)
    np.testing.assert_array_equal(curve_a_before, curve_a_after)
    # and B's own curve reflects its own flags
    assert not np.allclose(f.curve(dec_b, 64), curve_a_after)


def test_stereo_coupled_residue2(tmp_path):
    channels, rtype, coupling = 2, 2, True
    pats = _patterns(3, 0)
    floors = [(True, True)] * 3
    pkts = [_audio_packet(channels, p, f) for p, f in zip(pats, floors)]
    path = str(tmp_path / "stereo.ogg")
    _build_stream(path, channels, rtype, coupling, pkts)
    pcm, fs = V.read_ogg(path)
    assert fs == 8000 and pcm.shape == (64, 2)
    exp = _expected_output(pats, channels, rtype, coupling, floors)
    np.testing.assert_allclose(pcm, exp, rtol=1e-4, atol=1e-7)
    assert np.abs(exp).max() > 1e-3  # non-trivial signal


def test_floor_unused_silences_coupled_channel(tmp_path):
    """A zero floor silences its channel even when coupling forced its
    residue to decode (spec: floor multiply happens after coupling)."""
    channels, rtype, coupling = 2, 2, True
    pats = _patterns(3, 1)
    floors = [(True, True), (True, True), (True, False)]
    pkts = [_audio_packet(channels, p, f) for p, f in zip(pats, floors)]
    path = str(tmp_path / "halfmute.ogg")
    _build_stream(path, channels, rtype, coupling, pkts)
    pcm, fs = V.read_ogg(path)
    exp = _expected_output(pats, channels, rtype, coupling, floors)
    np.testing.assert_allclose(pcm, exp, rtol=1e-4, atol=1e-7)
    # second frame's channel-1 content is the previous block's tail only
    tail = _expected_block(pats[1], channels, rtype, coupling,
                           floors[1])[1, 32:]
    np.testing.assert_allclose(pcm[32:, 1], tail, rtol=1e-4, atol=1e-7)


def test_mono_residue0_strided_layout(tmp_path):
    channels, rtype, coupling = 1, 0, False
    pats = _patterns(4, 2, entries=16)  # 4 partitions x 4 vectors
    floors = [(True,)] * 4
    pkts = [_audio_packet(channels, p, f) for p, f in zip(pats, floors)]
    path = str(tmp_path / "res0.ogg")
    _build_stream(path, channels, rtype, coupling, pkts)
    pcm, fs = V.read_ogg(path)
    assert pcm.shape == (96, 1)
    exp = _expected_output(pats, channels, rtype, coupling, floors)
    np.testing.assert_allclose(pcm, exp, rtol=1e-4, atol=1e-7)
    # the strided layout differs from sequential: guard against a
    # decoder that treats format 0 like format 1
    vals = np.concatenate([VQ[e] for e in pats[0]])
    assert not np.allclose(
        _expected_block(pats[0], 1, 0, False, floors[0])[0],
        _direct_imdct(FLOOR_MAX * vals[:32]) * _direct_window(64))
