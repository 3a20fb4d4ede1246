"""Spec-crafted FLAC fixtures for decoder paths the project encoder never
emits (ADVICE r2: self-roundtrip tests cannot catch symmetric bugs).

Each test builds a frame BYTE-LEVEL from the format spec
(https://xiph.org/flac/format.html) — LPC subframes, left/right/mid-side
stereo decorrelation, multi-partition Rice and Rice2 residuals, escape
partitions, wasted bits — and asserts sample-exact decode against PCM
computed independently in the test (the expected signal is constructed
forward from the spec's recursions, never by calling the decoder)."""

import numpy as np
import pytest

from pyaudiolocalization_tpu.utils import flac
from pyaudiolocalization_tpu.utils.flac import (_BitWriter, _crc8, _crc16,
                                                read_flac)

FS = 16000
BITS = 16


def _streaminfo(channels: int, nframes: int, block_size: int) -> bytes:
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(FS, 20)
    si.write(channels - 1, 3)
    si.write(BITS - 1, 5)
    si.write(nframes, 36)
    for _ in range(16):
        si.write(0, 8)
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(si.bytes).to_bytes(3, "big")
    out += bytes(si.bytes)
    return bytes(out)


def _frame_header(bw: _BitWriter, block_size: int, chan_code: int) -> None:
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)                  # fixed block size strategy
    bw.write(7, 4)                  # 16-bit block size field
    bw.write(5, 4)                  # 16 kHz
    bw.write(chan_code, 4)
    bw.write(4, 3)                  # 16 bits/sample
    bw.write(0, 1)
    bw.write_utf8_number(0)
    bw.write(block_size - 1, 16)
    header = bytes(bw.bytes)
    assert bw.nbits == 0
    bw.write(_crc8(header), 8)


def _write_rice(bw: _BitWriter, values, param: int) -> None:
    for v in values:
        zz = 2 * int(v) if v >= 0 else -2 * int(v) - 1
        bw.write_unary(zz >> param)
        if param:
            bw.write(zz & ((1 << param) - 1), param)


def _finish_frame(bw: _BitWriter) -> bytes:
    bw.align()
    body = bytes(bw.bytes)
    bw.write(_crc16(body), 16)
    return bytes(bw.bytes)


def _decode_file(tmp_path, channels, nframes, block_size, frame_bytes):
    path = str(tmp_path / "fixture.flac")
    with open(path, "wb") as f:
        f.write(_streaminfo(channels, nframes, block_size) + frame_bytes)
    return read_flac(path)


def _to_int(samples):
    return np.asarray(np.round(np.asarray(samples) * (1 << (BITS - 1))),
                      np.int64)


def test_lpc_subframe(tmp_path):
    """LPC subframe with hand-picked quantized coefficients: the decoder
    must reproduce out[i] = res[i] + (sum c_k out[i-1-k] >> shift) exactly
    (expected PCM computed forward in this test)."""
    block = 64
    order, shift = 3, 4
    coeffs = [20, -9, 3]            # precision 6 bits
    warmup = [100, -50, 25]
    res = list(range(-12, block - order - 12))
    # Independent forward construction of the expected signal.
    out = list(warmup)
    for i in range(order, block):
        pred = sum(coeffs[k] * out[i - 1 - k] for k in range(order))
        out.append(res[i - order] + (pred >> shift))

    bw = _BitWriter()
    _frame_header(bw, block, 0)
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)     # LPC, order 3
    bw.write(0, 1)                  # no wasted bits
    for v in warmup:
        bw.write(v & 0xFFFF, BITS)
    bw.write(6 - 1, 4)              # precision 6
    bw.write(shift & 0x1F, 5)
    for c in coeffs:
        bw.write(c & 0x3F, 6)
    bw.write(0, 2)                  # rice, 4-bit params
    bw.write(0, 4)                  # partition order 0
    bw.write(5, 4)                  # rice param
    _write_rice(bw, res, 5)
    data = _finish_frame(bw)

    pcm, fs = _decode_file(tmp_path, 1, block, block, data)
    assert fs == FS
    np.testing.assert_array_equal(_to_int(pcm[:, 0]), np.asarray(out))


@pytest.mark.parametrize("chan_code", [8, 9, 10])
def test_stereo_decorrelation_modes(tmp_path, chan_code):
    """left/side (8), right/side (9), mid/side (10): the decoder must
    invert the spec's decorrelation exactly, including the side channel's
    extra bit.  Expected L/R chosen first; stored channels derived here
    per spec (mid = (l+r) >> 1 floors negative sums)."""
    block = 32
    rng = np.random.default_rng(3)
    left = rng.integers(-3000, 3000, block).astype(np.int64)
    right = rng.integers(-3000, 3000, block).astype(np.int64)
    side = left - right
    if chan_code == 8:
        stored = [(left, BITS), (side, BITS + 1)]
    elif chan_code == 9:
        stored = [(side, BITS + 1), (right, BITS)]
    else:
        mid = (left + right) >> 1
        stored = [(mid, BITS), (side, BITS + 1)]

    bw = _BitWriter()
    _frame_header(bw, block, chan_code)
    for samples, bits in stored:
        bw.write(0, 1)
        bw.write(1, 6)              # VERBATIM
        bw.write(0, 1)
        for v in samples:
            bw.write(int(v) & ((1 << bits) - 1), bits)
    data = _finish_frame(bw)

    pcm, _ = _decode_file(tmp_path, 2, block, block, data)
    got = _to_int(pcm)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_multipartition_rice2_and_escape(tmp_path):
    """Order-2 FIXED subframe with partition order 2 (4 partitions), coded
    with the 5-bit Rice2 method, different params per partition, and one
    ESCAPE partition (raw 7-bit residuals).  First partition carries
    block/4 - order samples per spec."""
    block = 64
    order = 2
    rng = np.random.default_rng(5)
    res = rng.integers(-40, 40, block - order).astype(np.int64)
    warmup = [7, -3]
    # Expected signal: out[i] = res + 2 out[i-1] - out[i-2].
    out = list(warmup)
    for i in range(order, block):
        out.append(int(res[i - order]) + 2 * out[i - 1] - out[i - 2])

    bw = _BitWriter()
    _frame_header(bw, block, 0)
    bw.write(0, 1)
    bw.write(8 + order, 6)          # FIXED order 2
    bw.write(0, 1)
    for v in warmup:
        bw.write(v & 0xFFFF, BITS)
    bw.write(1, 2)                  # method 1: rice2, 5-bit params
    bw.write(2, 4)                  # partition order 2 -> 4 partitions
    counts = [block // 4 - order, block // 4, block // 4, block // 4]
    params = [3, 6, None, 2]        # None -> escape partition
    idx = 0
    for count, param in zip(counts, params):
        chunk = res[idx:idx + count]
        idx += count
        if param is None:
            bw.write(31, 5)         # 5-bit escape code
            bw.write(7, 5)          # 7 raw bits per residual
            for v in chunk:
                bw.write(int(v) & 0x7F, 7)
        else:
            bw.write(param, 5)
            _write_rice(bw, chunk, param)
    data = _finish_frame(bw)

    pcm, _ = _decode_file(tmp_path, 1, block, block, data)
    np.testing.assert_array_equal(_to_int(pcm[:, 0]), np.asarray(out))


def test_wasted_bits(tmp_path):
    """A subframe with 2 wasted bits: samples are stored >> 2 in
    (bits - 2)-wide fields and the decoder must shift them back."""
    block = 16
    wasted = 2
    samples = (np.arange(block, dtype=np.int64) - 8) * 4  # multiples of 4
    stored = samples >> wasted

    bw = _BitWriter()
    _frame_header(bw, block, 0)
    bw.write(0, 1)
    bw.write(1, 6)                  # VERBATIM
    bw.write(1, 1)                  # wasted-bits flag
    bw.write_unary(wasted - 1)      # unary k-1 -> k wasted bits
    width = BITS - wasted
    for v in stored:
        bw.write(int(v) & ((1 << width) - 1), width)
    data = _finish_frame(bw)

    pcm, _ = _decode_file(tmp_path, 1, block, block, data)
    np.testing.assert_array_equal(_to_int(pcm[:, 0]), samples)


def test_corrupt_partition_order_raises(tmp_path):
    """ADVICE r2: a partition order that leaves the first partition with a
    non-positive sample count must be a clean error, not mis-indexed
    residuals (block 16, order 4, partition order 2 -> 16/4 = 4 <= 4)."""
    block = 16
    order = 4
    bw = _BitWriter()
    _frame_header(bw, block, 0)
    bw.write(0, 1)
    bw.write(8 + order, 6)          # FIXED order 4
    bw.write(0, 1)
    for v in [1, 2, 3, 4]:
        bw.write(v, BITS)
    bw.write(0, 2)
    bw.write(2, 4)                  # invalid: (16 >> 2) = 4 <= order
    bw.write(0, 4)
    _write_rice(bw, [0] * (block - order), 0)
    data = _finish_frame(bw)
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(_streaminfo(1, block, block) + data)
    with pytest.raises(RuntimeError, match="partition order"):
        read_flac(path)


def test_crc16_slicing_matches_bytewise():
    rng = np.random.default_rng(11)
    for n in (0, 1, 7, 8, 9, 31, 32, 33, 1000, 4097):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _crc16(data) == flac._crc16_bytewise(data)
