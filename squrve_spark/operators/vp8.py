"""VP8 (lossy WebP) — the dependency-free, exactly-specifiable core.

Reference parity: the reference treats media as opaque blobs (its loaders
ship no codecs at all — see /root/reference/core/data_manage.py's file-type
dispatch); this engine decodes real on-disk structure wherever a
dependency-free codec is honestly writable.

Scope (and the honest line). RFC 6386 splits into two layers:

1. An *algorithmic* layer that is fully specified by formulas and field
   layouts: the boolean arithmetic coder (§7), the uncompressed frame tag
   and the keyframe first-partition header field sequence (§9.1-§9.6, every
   field a probability-128 literal/flag), the inverse 4x4 DCT with the
   fixed-point constants 20091/35468 (§14.3), the inverse Walsh-Hadamard
   transform (§14.3), and the intra prediction banks (§12.2-§12.3).
   Everything in THIS module is that layer, implemented from the public
   spec semantics and pinned by tests that do not depend on this module's
   own arithmetic where possible (the iDCT constants are checked against
   round((cos(pi/8)*sqrt(2)-1)*65536) / round(sin(pi/8)*sqrt(2)*65536) and
   the integer transform against a float inverse; the bool decoder against
   hand-traced RFC byte vectors).

2. A *tabular* layer of ~2000 spec constants with no derivation: the
   default/update token probability tables (4x8x3x11 each), the keyframe
   mode probability trees, and the dc/ac quantizer lookup tables. This
   container has no authoritative copy of those tables (no libvpx/ffmpeg
   source, no RFC text), and fabricating them would produce a decoder that
   silently mis-decodes real files — strictly worse than an honest raise.
   Full pixel decode therefore still raises NotImplementedError at the
   entropy-table seam (`operators/codecs.py` decode_image), now with the
   missing tables named precisely.

What IS real and load-bearing here: `parse_vp8_frame_header` decodes a real
VP8 keyframe's first partition exactly up to the token-probability section —
quantizer indices (all five deltas), loop-filter parameters, segmentation
feature data, and DCT partition count are true on-disk fields a 100 TB media
triage pipeline wants (e.g. "re-encode everything with y_ac_qi < 20").
`encode_vp8_header_payload` builds a container whose header round-trips
through the real arithmetic coder, so the distributed metadata path is
verified bit-for-bit by a SQL oracle (plans/pipeline.py multimodal_vp8_info).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7)


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder, transcribed from the spec pseudocode.

    State: 8-bit `range` in [128, 255], 16-bit sliding `value` window over
    the bitstream, `bit_count` bits consumed from the current byte.
    """

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 2
        self.range = 255
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bit_count = 0
        self.bits_read = 0  # decoded symbol count (diagnostics)

    def _next_byte(self) -> int:
        if self._pos < len(self._data):
            b = self._data[self._pos]
            self._pos += 1
            return b
        self._pos += 1
        return 0  # reading past the end yields zero bits (spec-permitted pad)

    def read_bool(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        self.bits_read += 1
        return ret

    def read_literal(self, n: int) -> int:
        """L(n): n bits, MSB first, each at probability 128."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed_literal(self, n: int) -> int:
        """L(n) magnitude followed by a sign flag (1 = negative)."""
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree: list[int], probs: list[int], start: int = 0) -> int:
        """§8 token-tree decode: `tree` holds pairs; negative = leaf value."""
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Arithmetic encoder mirroring the §7 decoder.

    Implementation note: instead of the C carry-propagation buffer, `low`
    is kept as an unbounded Python int shifted left in lockstep with range
    renormalization. The final stream is `low` emitted MSB-first over the
    accumulated precision — any value in [low, low+range) decodes to the
    encoded sequence, and appending zero fractional bits keeps the value in
    that interval. Equivalent to the spec encoder; pinned by round-trip and
    hand-traced decoder vectors in tests/test_vp8.py.
    """

    def __init__(self) -> None:
        self.low = 0
        self.range = 255
        self.shift = 0  # renormalization shifts == emitted-bit count

    def write_bool(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.shift += 1

    def write_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool((value >> i) & 1, 128)

    def write_signed_literal(self, value: int, n: int) -> None:
        self.write_literal(abs(value), n)
        self.write_bool(1 if value < 0 else 0, 128)

    def get_bytes(self) -> bytes:
        # precision = shift + 8 bits (range started as an 8-bit quantity);
        # pad to a byte boundary with zero fractional bits, then two zero
        # lookahead bytes for the decoder's 16-bit value window
        precision = self.shift + 8
        pad = (-precision) % 8
        v = self.low << pad
        n_bytes = (precision + pad) // 8
        return v.to_bytes(n_bytes, "big") + b"\x00\x00"


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3)

# 16.16 fixed-point constants: round((cos(pi/8)*sqrt(2) - 1) * 65536) and
# round(sin(pi/8)*sqrt(2) * 65536). tests/test_vp8.py re-derives both.
_COS_SHIFT = 20091
_SIN_SHIFT = 35468


def idct4x4(block: list[list[int]]) -> list[list[int]]:
    """§14.3 inverse DCT: two butterfly passes, final (x + 4) >> 3."""
    tmp = [[0] * 4 for _ in range(4)]
    # column pass
    for c in range(4):
        i0, i1, i2, i3 = (block[r][c] for r in range(4))
        a1 = i0 + i2
        b1 = i0 - i2
        t1 = (i1 * _SIN_SHIFT) >> 16
        t2 = i3 + ((i3 * _COS_SHIFT) >> 16)
        c1 = t1 - t2
        t1 = i1 + ((i1 * _COS_SHIFT) >> 16)
        t2 = (i3 * _SIN_SHIFT) >> 16
        d1 = t1 + t2
        tmp[0][c] = a1 + d1
        tmp[3][c] = a1 - d1
        tmp[1][c] = b1 + c1
        tmp[2][c] = b1 - c1
    out = [[0] * 4 for _ in range(4)]
    # row pass with the final descale
    for r in range(4):
        i0, i1, i2, i3 = tmp[r]
        a1 = i0 + i2
        b1 = i0 - i2
        t1 = (i1 * _SIN_SHIFT) >> 16
        t2 = i3 + ((i3 * _COS_SHIFT) >> 16)
        c1 = t1 - t2
        t1 = i1 + ((i1 * _COS_SHIFT) >> 16)
        t2 = (i3 * _SIN_SHIFT) >> 16
        d1 = t1 + t2
        out[r][0] = (a1 + d1 + 4) >> 3
        out[r][3] = (a1 - d1 + 4) >> 3
        out[r][1] = (b1 + c1 + 4) >> 3
        out[r][2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block: list[list[int]]) -> list[list[int]]:
    """§14.3 inverse Walsh-Hadamard (Y2 DC block), final (x + 3) >> 3."""
    tmp = [[0] * 4 for _ in range(4)]
    for c in range(4):
        i0, i1, i2, i3 = (block[r][c] for r in range(4))
        a1 = i0 + i3
        b1 = i1 + i2
        c1 = i1 - i2
        d1 = i0 - i3
        tmp[0][c] = a1 + b1
        tmp[1][c] = c1 + d1
        tmp[2][c] = a1 - b1
        tmp[3][c] = d1 - c1
    out = [[0] * 4 for _ in range(4)]
    for r in range(4):
        i0, i1, i2, i3 = tmp[r]
        a1 = i0 + i3
        b1 = i1 + i2
        c1 = i1 - i2
        d1 = i0 - i3
        out[r][0] = (a1 + b1 + 3) >> 3
        out[r][1] = (c1 + d1 + 3) >> 3
        out[r][2] = (a1 - b1 + 3) >> 3
        out[r][3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12.2 whole-block, §12.3 4x4 subblock)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def predict_block(
    mode: str, size: int, above: list[int] | None, left: list[int] | None,
    top_left: int = 129,
) -> list[list[int]]:
    """§12.2 whole-block predictors for 16x16 luma / 8x8 chroma.

    `above`/`left` are the reconstructed neighbor rows (None = off-frame,
    giving the spec's DC fallbacks: 128 with no neighbors, single-side
    average otherwise).
    """
    n = size
    if mode == "DC_PRED":
        if above is None and left is None:
            dc = 128
        elif above is None:
            dc = (sum(left) + (n >> 1)) >> int(math.log2(n))
        elif left is None:
            dc = (sum(above) + (n >> 1)) >> int(math.log2(n))
        else:
            dc = (sum(above) + sum(left) + n) >> (int(math.log2(n)) + 1)
        return [[dc] * n for _ in range(n)]
    if mode == "V_PRED":
        a = above if above is not None else [127] * n
        return [list(a) for _ in range(n)]
    if mode == "H_PRED":
        l = left if left is not None else [129] * n
        return [[l[r]] * n for r in range(n)]
    if mode == "TM_PRED":
        a = above if above is not None else [127] * n
        l = left if left is not None else [129] * n
        return [[_clamp(l[r] + a[c] - top_left) for c in range(n)] for r in range(n)]
    raise ValueError(f"unknown whole-block mode {mode!r}")


def predict_subblock(
    mode: str, above: list[int], left: list[int], top_left: int
) -> list[list[int]]:
    """§12.3 4x4 subblock predictors.

    `above` carries 8 pixels (the 4 above plus 4 above-right, already
    edge-extended by the caller per §12.3), `left` 4, plus the corner.
    Formulas are the public avg2/avg3 diagonal banks.
    """
    A, L, P = above, left, top_left
    p = [[0] * 4 for _ in range(4)]
    if mode == "B_DC_PRED":
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == "B_TM_PRED":
        return [[_clamp(L[r] + A[c] - P) for c in range(4)] for r in range(4)]
    if mode == "B_VE_PRED":
        ext = [P] + list(A[:5])
        row = [_avg3(ext[c], ext[c + 1], ext[c + 2]) for c in range(4)]
        return [list(row) for _ in range(4)]
    if mode == "B_HE_PRED":
        ext = [P] + list(L) + [L[3]]
        col = [_avg3(ext[r], ext[r + 1], ext[r + 2]) for r in range(4)]
        return [[col[r]] * 4 for r in range(4)]
    if mode == "B_LD_PRED":
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    p[r][c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    p[r][c] = _avg3(A[6], A[7], A[7])
        return p
    if mode == "B_RD_PRED":
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                d = 3 + c - r
                p[r][c] = _avg3(pp[d], pp[d + 1], pp[d + 2])
        return p
    if mode == "B_VR_PRED":
        # explicit public assignment bank (diagonal d = 2c - r); the
        # below-diagonal half is 3-tap like B_RD, the upper half alternates
        # avg2 (even d) / avg3 (odd d)
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        p[3][0] = _avg3(pp[1], pp[2], pp[3])
        p[2][0] = _avg3(pp[2], pp[3], pp[4])
        p[3][1] = p[1][0] = _avg3(pp[3], pp[4], pp[5])
        p[2][1] = p[0][0] = _avg2(pp[4], pp[5])
        p[3][2] = p[1][1] = _avg3(pp[4], pp[5], pp[6])
        p[2][2] = p[0][1] = _avg2(pp[5], pp[6])
        p[3][3] = p[1][2] = _avg3(pp[5], pp[6], pp[7])
        p[2][3] = p[0][2] = _avg2(pp[6], pp[7])
        p[1][3] = _avg3(pp[6], pp[7], pp[8])
        p[0][3] = _avg2(pp[7], pp[8])
        return p
    if mode == "B_VL_PRED":
        p[0][0] = _avg2(A[0], A[1])
        p[1][0] = _avg3(A[0], A[1], A[2])
        p[2][0] = p[0][1] = _avg2(A[1], A[2])
        p[3][0] = p[1][1] = _avg3(A[1], A[2], A[3])
        p[2][1] = p[0][2] = _avg2(A[2], A[3])
        p[3][1] = p[1][2] = _avg3(A[2], A[3], A[4])
        p[2][2] = p[0][3] = _avg2(A[3], A[4])
        p[3][2] = p[1][3] = _avg3(A[3], A[4], A[5])
        p[2][3] = _avg3(A[4], A[5], A[6])
        p[3][3] = _avg3(A[5], A[6], A[7])
        return p
    if mode == "B_HD_PRED":
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        p[3][0] = _avg2(pp[0], pp[1])
        p[3][1] = _avg3(pp[0], pp[1], pp[2])
        p[2][0] = p[3][2] = _avg2(pp[1], pp[2])
        p[2][1] = p[3][3] = _avg3(pp[1], pp[2], pp[3])
        p[2][2] = p[1][0] = _avg2(pp[2], pp[3])
        p[2][3] = p[1][1] = _avg3(pp[2], pp[3], pp[4])
        p[1][2] = p[0][0] = _avg2(pp[3], pp[4])
        p[1][3] = p[0][1] = _avg3(pp[3], pp[4], pp[5])
        p[0][2] = _avg3(pp[4], pp[5], pp[6])
        p[0][3] = _avg3(pp[5], pp[6], pp[7])
        return p
    if mode == "B_HU_PRED":
        p[0][0] = _avg2(L[0], L[1])
        p[0][1] = _avg3(L[0], L[1], L[2])
        p[0][2] = p[1][0] = _avg2(L[1], L[2])
        p[0][3] = p[1][1] = _avg3(L[1], L[2], L[3])
        p[1][2] = p[2][0] = _avg2(L[2], L[3])
        p[1][3] = p[2][1] = _avg3(L[2], L[3], L[3])
        p[2][2] = p[2][3] = p[3][0] = p[3][1] = p[3][2] = p[3][3] = L[3]
        return p
    raise ValueError(f"unknown subblock mode {mode!r}")


def reconstruct_block(
    prediction: list[list[int]], residual: list[list[int]]
) -> list[list[int]]:
    """§14.5: reconstructed = clamp255(prediction + inverse-transformed
    residual), per pixel."""
    return [
        [_clamp(prediction[r][c] + residual[r][c]) for c in range(len(prediction[0]))]
        for r in range(len(prediction))
    ]


# ---------------------------------------------------------------------------
# Keyframe first-partition header (RFC 6386 §9.1-§9.6)

_MISSING_TABLES = (
    "default/updated token probability tables (4x8x3x11), keyframe mode "
    "probability trees, and dc/ac quantizer lookup tables"
)


@dataclass
class VP8FrameHeader:
    """Every field of a keyframe's first partition up to (exclusive) the
    token-probability-update section, which needs the §13 constant tables."""

    key_frame: bool = True
    version: int = 0
    show_frame: bool = True
    first_partition_size: int = 0
    width: int = 0
    height: int = 0
    horizontal_scale: int = 0
    vertical_scale: int = 0
    color_space: int = 0
    clamping_type: int = 0
    segmentation_enabled: bool = False
    segment_quantizer_deltas: list[int] = field(default_factory=list)
    segment_lf_deltas: list[int] = field(default_factory=list)
    filter_type: int = 0
    loop_filter_level: int = 0
    sharpness_level: int = 0
    lf_delta_enabled: bool = False
    ref_lf_deltas: list[int] = field(default_factory=list)
    mode_lf_deltas: list[int] = field(default_factory=list)
    log2_dct_partitions: int = 0
    y_ac_qi: int = 0
    y_dc_delta: int = 0
    y2_dc_delta: int = 0
    y2_ac_delta: int = 0
    uv_dc_delta: int = 0
    uv_ac_delta: int = 0
    refresh_entropy_probs: bool = True

    @property
    def n_dct_partitions(self) -> int:
        return 1 << self.log2_dct_partitions


def parse_vp8_frame_header(data: bytes) -> VP8FrameHeader:
    """Parse a raw 'VP8 ' chunk payload (frame tag onward) exactly.

    All fields up to the token-probability section are probability-128
    literals/flags (§9.2-§9.6), so this is a true spec decode of a real
    file's header — no default tables involved. Raises on non-keyframes
    (their header depends on persisted entropy state).
    """
    if len(data) < 10:
        raise ValueError("VP8 frame truncated before the uncompressed chunk")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    hdr = VP8FrameHeader(
        key_frame=(tag & 1) == 0,
        version=(tag >> 1) & 7,
        show_frame=bool((tag >> 4) & 1),
        first_partition_size=tag >> 5,
    )
    if not hdr.key_frame:
        raise NotImplementedError(
            "VP8 interframe headers depend on persisted entropy state; "
            "only keyframes are parseable statelessly"
        )
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    if len(data) < 10 + hdr.first_partition_size:
        # refusing beats decoding fabricated zero-pad bits into
        # confidently-wrong quantizer/filter fields
        raise ValueError(
            "VP8 first partition truncated: header claims "
            f"{hdr.first_partition_size} bytes, {len(data) - 10} present"
        )
    w = struct.unpack("<H", data[6:8])[0]
    h = struct.unpack("<H", data[8:10])[0]
    hdr.width, hdr.horizontal_scale = w & 0x3FFF, w >> 14
    hdr.height, hdr.vertical_scale = h & 0x3FFF, h >> 14
    d = BoolDecoder(data[10 : 10 + hdr.first_partition_size])
    hdr.color_space = d.read_bool()
    hdr.clamping_type = d.read_bool()
    hdr.segmentation_enabled = bool(d.read_bool())
    if hdr.segmentation_enabled:
        update_map = d.read_bool()
        update_data = d.read_bool()
        if update_data:
            d.read_bool()  # segment_feature_mode (abs/delta)
            for _ in range(4):  # per-segment quantizer
                if d.read_bool():
                    hdr.segment_quantizer_deltas.append(d.read_signed_literal(7))
                else:
                    hdr.segment_quantizer_deltas.append(0)
            for _ in range(4):  # per-segment loop filter
                if d.read_bool():
                    hdr.segment_lf_deltas.append(d.read_signed_literal(6))
                else:
                    hdr.segment_lf_deltas.append(0)
        if update_map:
            for _ in range(3):  # mb_segment_tree_probs
                if d.read_bool():
                    d.read_literal(8)
    hdr.filter_type = d.read_bool()
    hdr.loop_filter_level = d.read_literal(6)
    hdr.sharpness_level = d.read_literal(3)
    hdr.lf_delta_enabled = bool(d.read_bool())
    if hdr.lf_delta_enabled and d.read_bool():  # mode_ref_lf_delta_update
        for out in (hdr.ref_lf_deltas, hdr.mode_lf_deltas):
            for _ in range(4):
                out.append(d.read_signed_literal(6) if d.read_bool() else 0)
    hdr.log2_dct_partitions = d.read_literal(2)
    hdr.y_ac_qi = d.read_literal(7)
    hdr.y_dc_delta = d.read_signed_literal(4) if d.read_bool() else 0
    hdr.y2_dc_delta = d.read_signed_literal(4) if d.read_bool() else 0
    hdr.y2_ac_delta = d.read_signed_literal(4) if d.read_bool() else 0
    hdr.uv_dc_delta = d.read_signed_literal(4) if d.read_bool() else 0
    hdr.uv_ac_delta = d.read_signed_literal(4) if d.read_bool() else 0
    hdr.refresh_entropy_probs = bool(d.read_bool())
    # Next in the bitstream: token_prob_update flags coded against the
    # §13.4 update-probability table — the honest stop line.
    return hdr


def encode_vp8_header_payload(
    width: int,
    height: int,
    *,
    y_ac_qi: int = 32,
    loop_filter_level: int = 10,
    sharpness_level: int = 0,
    log2_dct_partitions: int = 0,
    y_dc_delta: int = 0,
    uv_ac_delta: int = 0,
) -> bytes:
    """Build a RIFF/WEBP container holding a 'VP8 ' chunk whose frame tag +
    keyframe header encode the given fields through the real arithmetic
    coder. Header-prefix-valid by construction: the macroblock data after
    the header is absent (the missing §13 tables are exactly what full
    encoding would need), which the metadata path never reads.
    """
    e = BoolEncoder()
    e.write_bool(0)  # color_space
    e.write_bool(0)  # clamping_type
    e.write_bool(0)  # segmentation_enabled
    e.write_bool(0)  # filter_type
    e.write_literal(loop_filter_level, 6)
    e.write_literal(sharpness_level, 3)
    e.write_bool(0)  # loop_filter_adj_enable
    e.write_literal(log2_dct_partitions, 2)
    e.write_literal(y_ac_qi, 7)
    if y_dc_delta:
        e.write_bool(1)
        e.write_signed_literal(y_dc_delta, 4)
    else:
        e.write_bool(0)
    e.write_bool(0)  # y2_dc_delta
    e.write_bool(0)  # y2_ac_delta
    e.write_bool(0)  # uv_dc_delta
    if uv_ac_delta:
        e.write_bool(1)
        e.write_signed_literal(uv_ac_delta, 4)
    else:
        e.write_bool(0)
    e.write_bool(1)  # refresh_entropy_probs
    part0 = e.get_bytes()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    frame = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + part0
    )
    if len(frame) % 2:
        frame += b"\x00"  # RIFF chunks are 2-byte aligned
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def vp8_frame_info(payload: bytes) -> dict | None:
    """WebP container -> parsed lossy-keyframe header dict, or None when the
    payload is not a lossy WebP (VP8L/other formats)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if fourcc == b"VP8 ":
            h = parse_vp8_frame_header(payload[pos + 8 : pos + 8 + size])
            return {
                "width": h.width,
                "height": h.height,
                "y_ac_qi": h.y_ac_qi,
                "y_dc_delta": h.y_dc_delta,
                "uv_ac_delta": h.uv_ac_delta,
                "loop_filter_level": h.loop_filter_level,
                "sharpness_level": h.sharpness_level,
                "n_dct_partitions": h.n_dct_partitions,
                "show_frame": h.show_frame,
            }
        pos += 8 + size + (size & 1)
    return None
