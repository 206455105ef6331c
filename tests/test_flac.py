"""FLAC codec: lossless round-trips (exact equality), hand-woven
bitstreams pinning the decode paths the encoder does not emit (LPC,
rice escape, the three stereo decorrelation modes, wasted bits, 5-bit
rice parameters), and corruption detection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from squrve_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _read_utf8_coded,
    _samples_md5,
    _write_utf8_coded,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    text_to_flac,
)


def test_roundtrip_exact_mono_stereo_multiframe():
    rng = np.random.default_rng(7)
    for shape in [(5000, 1), (5000, 2), (3, 1), (9000, 1)]:
        s = rng.integers(-32768, 32768, shape).astype(np.int16)
        dec, rate = decode_flac(encode_flac(s, rate=8000, blocksize=4096))
        assert rate == 8000
        assert dec.shape == shape
        assert np.array_equal(dec, s.astype(np.int32))


def test_roundtrip_compresses_structured_signals():
    const = np.full((5000, 1), 1234, np.int16)
    enc = encode_flac(const)
    assert np.array_equal(decode_flac(enc)[0], const.astype(np.int32))
    assert len(enc) < const.nbytes // 20  # constant subframes are tiny
    ramp = (np.arange(5000) % 2000 - 1000).astype(np.int16).reshape(-1, 1)
    enc = encode_flac(ramp)
    assert np.array_equal(decode_flac(enc)[0], ramp.astype(np.int32))
    assert len(enc) < ramp.nbytes // 2  # fixed predictors beat raw


def test_text_payload_matches_wav_sample_grid():
    from squrve_spark.operators.codecs import decode_wav, text_to_wav

    t = "hello flac éø world " * 20
    fd, fr = decode_flac(text_to_flac(t))
    wd, wr = decode_wav(text_to_wav(t))
    assert fr == wr
    assert np.array_equal(fd.reshape(-1), wd.reshape(-1).astype(np.int32))


def test_corruption_and_md5_detection():
    rng = np.random.default_rng(3)
    enc = bytearray(encode_flac(rng.integers(-100, 100, (500, 1)).astype(np.int16)))
    bad = enc.copy()
    bad[-3] ^= 0x40  # flip a residual bit -> frame CRC-16 must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    bad = enc.copy()
    bad[30] ^= 0x01  # flip inside the STREAMINFO md5 -> md5 check fires
    with pytest.raises(ValueError, match="MD5|CRC"):
        decode_flac(bytes(bad))


def test_utf8_coded_numbers_shortest_form():
    for v in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, (1 << 36) - 1]:
        w = _BitWriter()
        _write_utf8_coded(w, v)
        data = w.getvalue()
        r = _BitReader(data)
        assert _read_utf8_coded(r) == v
        assert r.pos == len(data) * 8  # shortest form: no slack bytes
    # boundary: 0x7FF must fit 2 bytes, 0x800 needs 3
    w = _BitWriter(); _write_utf8_coded(w, 0x7FF)
    assert len(w.getvalue()) == 2
    w = _BitWriter(); _write_utf8_coded(w, 0x800)
    assert len(w.getvalue()) == 3


# ---------------------------------------------------------------------------
# hand-woven streams: build a single-frame stream around custom subframe bits


def _stream(nch: int, n: int, subframe_bits, ch_code=None, bps=16):
    """Assemble streaminfo + one frame whose subframe section is produced
    by `subframe_bits(w)`; CRCs computed like any conforming encoder."""
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)        # 16-bit blocksize-1 follows
    w.write(13, 4)       # 16-bit Hz rate follows
    w.write(nch - 1 if ch_code is None else ch_code, 4)
    w.write(4, 3)        # 16-bit samples
    w.write(0, 1)
    _write_utf8_coded(w, 0)
    w.write(n - 1, 16)
    w.write(8000, 16)
    header = w.getvalue()
    wb = _BitWriter()
    subframe_bits(wb)
    body = wb.getvalue()
    frame = header + bytes([crc8(header)]) + body
    frame += struct.pack(">H", crc16(frame))
    packed = (8000 << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo = (
        struct.pack(">HH", 16, 65535) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x00" * 16  # md5 absent -> skipped
    )
    return (
        b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
        + streaminfo + frame
    )


def _write_verbatim(w, samples, bps=16, wasted=0):
    w.write(0, 1)
    w.write(1, 6)
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # unary: (wasted-1) zeros then 1
    else:
        w.write(0, 1)
    for v in samples:
        w.write(int(v) & ((1 << (bps - wasted)) - 1), bps - wasted)


def test_handwoven_lpc_subframe():
    """LPC order 2, precision 4, shift 1, coefs [3, -1]: decoded samples
    must equal the spec recurrence s[i] = e[i] + ((3*s[i-1] - s[i-2]) >> 1)."""
    warm = [100, 110]
    resid = [5, -3, 0, 7, -2, 1]
    expected = list(warm)
    for e in resid:
        expected.append(e + ((3 * expected[-1] - 1 * expected[-2]) >> 1))

    def bits(w):
        w.write(0, 1)
        w.write(32 + (2 - 1), 6)  # LPC order 2
        w.write(0, 1)             # no wasted bits
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(4 - 1, 4)         # precision 4
        w.write(1 & 0x1F, 5)      # shift 1
        w.write(3 & 0xF, 4)       # coef[0] = 3
        w.write(-1 & 0xF, 4)      # coef[1] = -1
        w.write(0, 2)             # rice, 4-bit params
        w.write(0, 4)             # partition order 0
        w.write(2, 4)             # rice param 2
        for e in resid:
            folded = (e << 1) if e >= 0 else ((-e << 1) - 1)
            w.write_unary(folded >> 2)
            w.write(folded & 3, 2)

    dec, rate = decode_flac(_stream(1, len(expected), bits))
    assert rate == 8000
    assert dec.reshape(-1).tolist() == expected


def test_handwoven_rice_escape_and_5bit_params():
    """Residual partition with the escape parameter: samples stored raw at
    a stated bit width; also the method-1 (5-bit parameter) path."""
    warm = [7]
    resid = [-4, 3, -1, 2, 0, -8, 5]
    expected = list(warm)
    for e in resid:
        expected.append(e + expected[-1])  # fixed order 1

    def bits(w):
        w.write(0, 1)
        w.write(8 + 1, 6)  # fixed order 1
        w.write(0, 1)
        w.write(warm[0] & 0xFFFF, 16)
        w.write(1, 2)       # method 1: 5-bit rice params
        w.write(0, 4)       # partition order 0
        w.write(31, 5)      # escape
        w.write(6, 5)       # 6 raw bits per sample
        for e in resid:
            w.write(e & 0x3F, 6)

    dec, _ = decode_flac(_stream(1, len(expected), bits))
    assert dec.reshape(-1).tolist() == expected


def test_handwoven_wasted_bits():
    """Wasted-bits flag: stored at bps-2 and shifted back by 2."""
    vals = [4, -8, 12, 0, -4]  # all multiples of 4

    def bits(w):
        _write_verbatim(w, [v >> 2 for v in vals], wasted=2)

    dec, _ = decode_flac(_stream(1, len(vals), bits))
    assert dec.reshape(-1).tolist() == vals


@pytest.mark.parametrize(
    "ch_code", [8, 9, 10], ids=["left-side", "side-right", "mid-side"]
)
def test_handwoven_stereo_decorrelation(ch_code):
    left = [100, -50, 32767, -32768, 7]
    right = [90, -60, 32767, -32760, -7]
    side = [l - r for l, r in zip(left, right)]

    def bits(w):
        if ch_code == 8:    # stored [left, side]; side gets bps+1
            _write_verbatim(w, left, bps=16)
            _write_verbatim(w, side, bps=17)
        elif ch_code == 9:  # stored [side, right]
            _write_verbatim(w, side, bps=17)
            _write_verbatim(w, right, bps=16)
        else:               # stored [mid, side]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _write_verbatim(w, mid, bps=16)
            _write_verbatim(w, side, bps=17)

    dec, _ = decode_flac(_stream(2, len(left), bits, ch_code=ch_code))
    assert dec[:, 0].tolist() == left
    assert dec[:, 1].tolist() == right


def test_streaminfo_md5_verified_when_present():
    s = np.array([[1], [2], [3]], dtype=np.int16)
    enc = encode_flac(s)
    assert _samples_md5(s.astype(np.int64), 16) in enc  # md5 really embedded
    assert np.array_equal(decode_flac(enc)[0], s.astype(np.int32))


def test_encode_rejects_oversized_blocksize():
    s = np.zeros((10, 1), dtype=np.int16)
    with pytest.raises(ValueError, match="blocksize"):
        encode_flac(s, blocksize=65537)
    with pytest.raises(ValueError, match="blocksize"):
        encode_flac(s, blocksize=0)
    # 65536 fits the frame header (blocksize-1) but NOT the 16-bit
    # STREAMINFO min/max fields — accepting it would emit a stream whose
    # STREAMINFO contradicts its frames (r8, ADVICE)
    with pytest.raises(ValueError, match="blocksize"):
        encode_flac(s, blocksize=65536)
    # the 16-bit ceiling itself round-trips
    assert np.array_equal(
        decode_flac(encode_flac(s, blocksize=65535))[0], s.astype(np.int32)
    )


def test_md5_skipped_for_non_whole_byte_depths():
    """A 12-bit stream with a populated STREAMINFO MD5 must still decode:
    the MD5 covers the spec's bit-packed layout, which this codec does not
    model for sub-byte depths — it skips the check instead of raising
    (review fix)."""
    vals = [100, -200, 300, -400]

    def bits(w):
        w.write(0, 1)
        w.write(1, 6)  # verbatim
        w.write(0, 1)
        for v in vals:
            w.write(v & 0xFFF, 12)

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)
    w.write(13, 4)
    w.write(0, 4)   # 1 channel
    w.write(2, 3)   # ss_code 2 = 12-bit
    w.write(0, 1)
    _write_utf8_coded(w, 0)
    w.write(len(vals) - 1, 16)
    w.write(8000, 16)
    header = w.getvalue()
    wb = _BitWriter()
    bits(wb)
    body = wb.getvalue()
    frame = header + bytes([crc8(header)]) + body
    frame += struct.pack(">H", crc16(frame))
    packed = (8000 << 44) | (0 << 41) | ((12 - 1) << 36) | len(vals)
    streaminfo = (
        struct.pack(">HH", 16, 65535) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x01" * 16  # md5 PRESENT
    )
    payload = (
        b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
        + streaminfo + frame
    )
    dec, rate = decode_flac(payload)
    assert rate == 8000
    assert dec.reshape(-1).tolist() == vals
