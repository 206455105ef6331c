"""Dependency-free FLAC codec (RFC 9639 — the format is fully public and,
unlike mp3, contains NO opaque tables: every constant below is derived from
the spec text: CRC polynomials x^8+x^2+x^1+1 and x^16+x^15+x^2+1, the fixed
predictor coefficients [1], [2,-1], [3,-3,1], [4,-6,4,-1], and the
block-size / sample-rate code tables of §9.1).

Decoder: streaminfo parse, frame sync + header (all block-size and
sample-rate codes, UTF-8-style coded frame/sample numbers, CRC-8 verified),
all four subframe types (constant, verbatim, fixed 0-4, LPC 1-32), wasted
bits, rice residual in both 4- and 5-bit parameter widths including the
escape-to-raw path, all four channel assignments (independent, left-side,
right-side, mid-side), frame CRC-16 verified, and the streaminfo sample MD5
checked when present. Output is the exact original integer sample grid —
FLAC is lossless, so round-trips assert EQUALITY, not tolerance.

Encoder: fixed-blocksize frames, independent channels, per-subframe choice
of constant / fixed order 0-2 by minimum residual magnitude, one rice
partition with the standard mean-magnitude parameter estimate, correct
CRCs and a streaminfo MD5 — a valid, complete stream any conforming
decoder accepts.

Reference parity note: the reference engine (Satissss/Squrve) ships no
codecs at all (its data plane is sqlite rows); this module extends the
repo's multimodal column support (SURVEY §2 multimodal row) the same way
jpeg.py / vp8l.py do for images.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FIXED_COEFS: dict[int, list[int]] = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# §9.1.2 block-size codes 2-5 and 8-15 (1 -> 192 handled inline)
_BLOCKSIZE_CODES = {n: 576 << (n - 2) for n in range(2, 6)}
_BLOCKSIZE_CODES.update({n: 256 << (n - 8) for n in range(8, 16)})

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = (int(_CRC16_TAB[(r >> 8) ^ b]) ^ ((r << 8) & 0xFFFF)) & 0xFFFF
    return r


_LEAD_ONES_OFFSET = np.array(
    [8] + [7] + [6] * 2 + [5] * 4 + [4] * 8 + [3] * 16 + [2] * 32 + [1] * 64
    + [0] * 128,
    dtype=np.int32,
)  # index of the highest set bit from the MSB side (8 = byte is zero)


class _BitReader:
    """MSB-first bit reader over bytes; byte-LUT unary scan."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("FLAC bitstream truncated")
        first = p >> 3
        last = (p + n - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        total = (last + 1 - first) * 8
        chunk >>= total - (p - (first << 3)) - n
        self.pos = p + n
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until (and consuming) the terminating 1."""
        q = 0
        p = self.pos
        data = self.data
        while True:
            if p >= self.nbits:
                raise ValueError("FLAC bitstream truncated in unary code")
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            lead = int(_LEAD_ONES_OFFSET[window]) - (8 - rem)
            if window == 0 or lead >= rem:
                q += rem
                p += rem
                continue
            q += lead
            p += lead + 1
            self.pos = p
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("chunks", "acc", "nacc")

    def __init__(self) -> None:
        self.chunks: list[bytes] = []
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        if self.nacc >= 4096:
            drop = self.nacc & 7
            emit = self.nacc - drop
            self.chunks.append(
                (self.acc >> drop).to_bytes(emit >> 3, "big")
            )
            self.acc &= (1 << drop) - 1
            self.nacc = drop

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc & 7:
            self.write(0, 8 - (self.nacc & 7))

    def getvalue(self) -> bytes:
        self.align()
        if self.nacc:
            self.chunks.append(self.acc.to_bytes(self.nacc >> 3, "big"))
            self.acc = 0
            self.nacc = 0
        out = b"".join(self.chunks)
        self.chunks = [out]
        return out


def _read_utf8_coded(r: _BitReader) -> int:
    """§9.1.5 UTF-8-style coded number (frame/sample index, up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _write_utf8_coded(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # shortest form: n total bytes carry (7-n) + 6*(n-1) payload bits
    for n in range(2, 8):
        if v < (1 << ((7 - n) + 6 * (n - 1))):
            break
    lead_prefix = (0xFF << (8 - n)) & 0xFF
    w.write(lead_prefix | (v >> (6 * (n - 1))), 8)
    for i in range(n - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def parse_streaminfo(payload: bytes) -> dict:
    """'fLaC' marker + metadata walk -> the STREAMINFO fields + the bit
    offset where frames begin."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info: dict | None = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        head = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) < size:
            # the declared block length runs past the payload — Python
            # slicing would silently shorten it and zero-fill downstream
            # parses (hypothesis fuzz finding, r10)
            raise ValueError("FLAC metadata block truncated")
        if head & 0x7F == 0:
            if size < 34:
                raise ValueError("FLAC STREAMINFO truncated")
            min_bs, max_bs = struct.unpack_from(">HH", body, 0)
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
            if info["sample_rate"] == 0:
                # 0 is invalid in STREAMINFO per the spec — a forged
                # all-zero block must raise, not decode to 0 samples at
                # 0 Hz (hypothesis fuzz finding, r10)
                raise ValueError("FLAC STREAMINFO sample rate 0 is invalid")
        pos += 4 + size
        if head & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    info["frames_at"] = pos
    return info


def _decode_residual(r: _BitReader, n: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    parts = 1 << po
    if n % parts:
        raise ValueError("FLAC partition order does not divide block size")
    per = n >> po
    if per < order:  # first partition holds per - order samples
        raise ValueError("FLAC partition smaller than predictor order")
    out: list[int] = []
    for p in range(parts):
        count = per - order if p == 0 else per
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                out.extend(r.read_signed(raw) for _ in range(count))
            continue
        for _ in range(count):
            q = r.unary()
            v = (q << param) | r.read(param)
            out.append((v >> 1) ^ -(v & 1))
    return out


def _predict_fixed(warm: list[int], resid: list[int], order: int) -> list[int]:
    coefs = FIXED_COEFS[order]
    out = list(warm)
    for e in resid:
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * out[-1 - j]
        out.append(e + pred)
    return out


def _predict_lpc(
    warm: list[int], resid: list[int], coefs: list[int], shift: int
) -> list[int]:
    out = list(warm)
    for e in resid:
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * out[-1 - j]
        out.append(e + (acc >> shift))
    return out


def _decode_subframe(r: _BitReader, n: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if ftype == 0:
        out = [r.read_signed(eff)] * n
    elif ftype == 1:
        out = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= ftype <= 12:
        order = ftype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        out = _predict_fixed(warm, _decode_residual(r, n, order), order)
    elif ftype >= 32:
        order = ftype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        out = _predict_lpc(warm, _decode_residual(r, n, order), coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(
    payload: bytes, info: dict | None = None
) -> tuple[np.ndarray, int]:
    """FLAC stream -> ((n_samples, channels) int32 array, sample_rate).
    CRC-8 (frame header), CRC-16 (frame), and the STREAMINFO sample MD5
    (when present) are all verified — a corrupt stream raises instead of
    returning wrong samples. Pass a pre-parsed `parse_streaminfo` dict to
    skip the second metadata walk on hot paths."""
    if info is None:
        info = parse_streaminfo(payload)
    r = _BitReader(payload, info["frames_at"] * 8)
    channels: list[list[int]] = [[] for _ in range(info["channels"])]
    total = info["total_samples"]
    decoded = 0
    rate = info["sample_rate"]
    while (total == 0 or decoded < total) and r.pos + 16 <= r.nbits:
        frame_start_byte = r.pos >> 3
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("FLAC reserved header bit set")
        r.read(1)  # blocking strategy (the coded number disambiguates)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC reserved header bit set")
        _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code")
        elif bs_code == 1:
            n = 192
        elif bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        else:
            n = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code in _SAMPLE_RATE_CODES:
            rate = _SAMPLE_RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample-rate code")
        bps = info["bits_per_sample"] if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        if bps is None:
            raise ValueError("reserved FLAC sample-size code")
        header_end = r.pos >> 3
        if crc8(payload[frame_start_byte:header_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(r, n, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            extra0 = 1 if ch_code == 9 else 0  # side channel carries +1 bit
            extra1 = 1 if ch_code in (8, 10) else 0
            s0 = _decode_subframe(r, n, bps + extra0)
            s1 = _decode_subframe(r, n, bps + extra1)
            if ch_code == 8:  # left-side
                subs = [s0, [l - s for l, s in zip(s0, s1)]]
            elif ch_code == 9:  # side-right
                subs = [[s + rgt for s, rgt in zip(s0, s1)], s1]
            else:  # mid-side
                left, right = [], []
                for m, s in zip(s0, s1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        if nch != info["channels"]:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        r.align()
        if crc16(payload[frame_start_byte : r.pos >> 3]) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(nch):
            channels[c].extend(subs[c])
        decoded += n
    if total and decoded < total:
        raise ValueError("FLAC stream ended before total_samples")
    arr = np.array(channels, dtype=np.int64).T
    if total:
        arr = arr[:total]
    # MD5 verification only for whole-byte depths: the spec hashes the
    # PACKED sample bytes, which for 12/20-bit streams is a bit-packing
    # this helper does not model — skipping (not raising) keeps those
    # otherwise-valid streams decodable
    if info["md5"] != b"\x00" * 16 and info["bits_per_sample"] % 8 == 0:
        if _samples_md5(arr, info["bits_per_sample"]) != info["md5"]:
            raise ValueError("FLAC sample MD5 mismatch")
    return arr.astype(np.int32), info["sample_rate"] if info["sample_rate"] else rate


def _samples_md5(arr: np.ndarray, bps: int) -> bytes:
    if bps % 8:
        raise ValueError("sample MD5 defined here for whole-byte depths only")
    width = bps // 8
    flat = arr.astype(np.int64).reshape(-1)
    le = np.zeros((len(flat), width), dtype=np.uint8)
    v = flat & ((1 << bps) - 1)
    for i in range(width):
        le[:, i] = (v >> (8 * i)) & 0xFF
    return hashlib.md5(le.tobytes()).digest()


def _best_fixed_order(samples: np.ndarray, max_order: int = 2) -> int:
    best, best_cost = 0, None
    for order in range(0, max_order + 1):
        if len(samples) <= order:
            break
        resid = samples.astype(np.int64)
        for _ in range(order):
            resid = np.diff(resid)
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.abs(resid).mean())
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    param = _rice_param(resid)
    w.write(0, 2)  # 4-bit rice params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    r = resid.astype(np.int64)
    folded = np.where(r >= 0, r << 1, ((-r) << 1) - 1)
    # vectorized emission (the vp8l bit-matrix pattern): lay every code
    # out in one flat bit array — q zeros, a 1, then param remainder bits
    # MSB-first — and hand the writer one big integer
    q = folded >> param
    lens = q + 1 + param
    total = int(lens.sum())
    bits = np.zeros(total, dtype=np.uint8)
    term = np.cumsum(lens) - lens + q
    bits[term] = 1
    if param:
        rem = folded & ((1 << param) - 1)
        for b in range(param):
            bits[term + 1 + b] = (rem >> (param - 1 - b)) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    big = int.from_bytes(np.packbits(bits).tobytes(), "big") >> pad
    w.write(big, total)


def _encode_subframe(w: _BitWriter, samples: np.ndarray, bps: int) -> None:
    w.write(0, 1)  # padding
    if len(samples) and np.all(samples == samples[0]):
        w.write(0, 6)  # constant
        w.write(0, 1)  # no wasted bits
        w.write(int(samples[0]) & ((1 << bps) - 1), bps)
        return
    order = _best_fixed_order(samples)
    w.write(8 + order, 6)  # fixed
    w.write(0, 1)  # no wasted bits
    s = samples.astype(np.int64)
    for v in s[:order].tolist():
        w.write(int(v) & ((1 << bps) - 1), bps)
    resid = s
    for _ in range(order):
        resid = np.diff(resid)
    _write_residual(w, resid)


def encode_flac(
    samples: np.ndarray, rate: int = 8000, blocksize: int = 4096
) -> bytes:
    """(n, ch) int16 samples -> a complete valid FLAC stream (fixed
    blocksize, independent channels, constant/fixed-predictor subframes,
    single rice partition, correct CRC-8/16 and STREAMINFO MD5)."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    if not (0 < rate < 65536):
        raise ValueError("encode_flac writes 16-bit sample rates only")
    if not 1 <= blocksize <= 65535:
        # STREAMINFO min/max blocksize are 16-bit fields; accepting 65536
        # would write a STREAMINFO that contradicts the frame headers
        # (strict decoders allocate by max_blocksize and reject/truncate)
        raise ValueError("FLAC blocksize must be in [1, 65535]")
    samples = samples.astype(np.int64)
    n_total, nch = samples.shape
    if n_total == 0:
        raise ValueError("encode_flac needs at least one sample")
    if not 1 <= nch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    bps = 16
    frames = []
    for fi, start in enumerate(range(0, n_total, blocksize)):
        block = samples[start : start + blocksize]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(13, 4)  # 16-bit Hz sample rate follows
        w.write(nch - 1, 4)
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        _write_utf8_coded(w, fi)
        w.write(len(block) - 1, 16)
        w.write(rate, 16)
        header = w.getvalue()
        w2 = _BitWriter()
        for c in range(nch):
            _encode_subframe(w2, block[:, c], bps)
        body = w2.getvalue()
        head_with_crc = header + bytes([crc8(header)])
        frame = head_with_crc + body
        frames.append(frame + struct.pack(">H", crc16(frame)))
    packed = (
        (rate << 44)
        | ((nch - 1) << 41)
        | ((bps - 1) << 36)
        | (n_total & ((1 << 36) - 1))
    )
    streaminfo = (
        struct.pack(">HH", blocksize, blocksize)
        + b"\x00" * 6
        + packed.to_bytes(8, "big")
        + _samples_md5(samples, bps)
    )
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + b"".join(frames)


def text_to_flac(text: str, rate: int = 8000) -> bytes:
    """Deterministic text -> real FLAC over the SAME sample grid as
    `codecs.text_to_wav` ((utf-8 byte - 128) << 8), so a payload mix
    decodes to identical samples whatever the container."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    s = ((b.astype(np.int32) - 128) << 8).astype(np.int16)
    if len(s) == 0:
        s = np.zeros(1, np.int16)
    return encode_flac(s.reshape(-1, 1), rate=rate)
