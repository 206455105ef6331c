"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the last honest multimodal stub: JPEG payloads now decode for real —
no PIL/opencv. Scope is BASELINE sequential DCT (SOF0), the overwhelming
majority of real-world JPEGs:

- marker parse: SOI/APP*/COM/DQT/DHT/SOF0/DRI/SOS/EOI,
- Huffman tables read FROM THE FILE (DHT), so third-party baseline JPEGs
  decode regardless of which tables their encoder chose,
- entropy decode: DC prediction + magnitude categories, AC run/size with
  ZRL + EOB, byte unstuffing, restart markers,
- dequantize -> 8x8 IDCT (orthonormal DCT matrix, one numpy matmul pair
  per block) -> component planes -> nearest-neighbor chroma upsample for
  subsampled scans (4:2:0/4:2:2) -> YCbCr->RGB (JFIF full-range).

The encoder produces valid baseline 4:4:4 JPEGs with self-describing
canonical Huffman tables (4-bit DC / 9-bit AC codes — spec-legal since the
tables ride in DHT; compactness is not the goal) and quality-scaled Annex-K
quantization: enough for lossy round-trip testing and deterministic
payload construction without any library.

Like the other codecs this runs inside Arrow-batched ``mapInPandas``
workers; a native codec swaps in at the ``codecs.decode_image`` seam for
production throughput.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K example luminance/chrominance quantization tables (public spec)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    k, n = np.mgrid[0:8, 0:8]
    d = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * s + 50) / 100)
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# Huffman helpers


def _canonical_codes(bits: list[int], vals: list[int]):
    """JPEG canonical code assignment: (symbol -> (code, length)) and the
    decoder map ((length, code) -> symbol)."""
    enc = {}
    dec = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[i]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            i += 1
        code <<= 1
    return enc, dec


# encoder's self-describing tables: DC = 12 symbols at 4 bits, AC = 162
# symbols at 9 bits (valid canonical tables; compactness is irrelevant
# because DHT carries them)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resets via sync_restart()
                    self.pos -= 1
                    return
                else:
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("JPEG bitstream exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Skip to just past the next RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _huff_decode(reader: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """Magnitude-category decode: leading 0 bit means negative."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encode


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane to (ph, pw)."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[h - 1 : h, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _encode_block(block, q, pred, ci, dc_enc, ac_enc, bw):
    coef = _D @ (block - 128.0) @ _D.T
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size = _category(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                code, length = ac_enc[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        size = _category(v)
        code, length = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes. ``subsample=True``
    writes 4:2:0 (luma 2x2 per MCU, chroma 2x2-mean-downsampled) —
    exercising the decoder's sampling-factor/upsample path; default is
    4:4:4."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w, _ = arr.shape
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    q_tabs = [_scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)]
    dc_enc, _ = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_enc, _ = _canonical_codes(_AC_BITS, _AC_VALS)

    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_planes = []
    for ci, p in enumerate(planes):
        ch, cv = samp[ci]
        if (ch, cv) != (hmax, vmax):
            # downsample by the sampling ratio (2x2 mean for 4:2:0)
            ry, rx = vmax // cv, hmax // ch
            ph = _pad_to(p, (h + ry - 1) // ry * ry, (w + rx - 1) // rx * rx)
            p = ph.reshape(ph.shape[0] // ry, ry, ph.shape[1] // rx, rx).mean(
                axis=(1, 3)
            )
        comp_planes.append(
            _pad_to(p, mcus_y * cv * 8, mcus_x * ch * 8)
        )

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                ch, cv = samp[ci]
                q = q_tabs[0 if ci == 0 else 1]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        _encode_block(block, q, pred, ci, dc_enc, ac_enc, bw)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(q_tabs):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for ci, cid in enumerate((1, 2, 3)):
        ch, cv = samp[ci]
        out += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    for tclass_tid, (bits, vals) in (
        ((0x00, (_DC_BITS, _DC_VALS))),
        ((0x10, (_AC_BITS, _AC_VALS))),
        ((0x01, (_DC_BITS, _DC_VALS))),
        ((0x11, (_AC_BITS, _AC_VALS))),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), tclass_tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W, 3) uint8 RGB (grayscale expands to 3ch)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    q_tabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several per segment)
            sp = 0
            while sp < len(seg):
                prec_id = seg[sp]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables not supported")
                tab = np.empty(64)
                tab[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, sp + 1)
                q_tabs[prec_id & 0xF] = tab.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc_th = seg[sp]
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + n])
                _, dec = _canonical_codes(bits, vals)
                huff[(tc_th >> 4, tc_th & 0xF)] = dec
                sp += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + i * 3 : 9 + i * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02x} (non-baseline) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tabs = {}
            for i in range(ns):
                cid, tdta = seg[1 + i * 2 : 3 + i * 2]
                scan_tabs[cid] = (tdta >> 4, tdta & 0xF)
            data = payload[pos + seg_len :]
            return _decode_scan(
                data, comps, scan_tabs, q_tabs, huff, h, w, restart
            )
        pos += seg_len
    raise ValueError("JPEG had no scan")


def _decode_scan(data, comps, scan_tabs, q_tabs, huff, h, w, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        )
    reader = _BitReader(data)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_dec = huff[(0, scan_tabs[c["id"]][0])]
                ac_dec = huff[(1, scan_tabs[c["id"]][1])]
                q = q_tabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_decode(reader, dc_dec)
                        diff = _extend(reader.read_bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_dec)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            s = rs & 0xF
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.empty(64)
                        coef[_ZIGZAG] = zz
                        block = _D.T @ (coef.reshape(8, 8) * q) @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample subsampled components to full resolution (nearest)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
