"""operators/vp8.py — the exactly-specifiable VP8 core.

Pinning strategy, strongest evidence first:
- the bool DECODER is pinned to hand-traced RFC 6386 §7.3 byte vectors
  (worked through the spec state machine by hand, not via this module);
- the iDCT constants are re-derived from the trig identities they encode,
  and the integer transform is compared against an independent float
  implementation of the same butterfly;
- encoder<->decoder round-trips cover the arithmetic coder and the full
  keyframe header field layout;
- predictors carry invariant properties (constant/hull/dependency-set) plus
  hand-computed fixtures for the diagonal banks.
"""

from __future__ import annotations

import math
import random

import pytest

from squrve_spark.operators import codecs
from squrve_spark.operators.vp8 import (
    BoolDecoder,
    BoolEncoder,
    _COS_SHIFT,
    _SIN_SHIFT,
    encode_vp8_header_payload,
    idct4x4,
    iwht4x4,
    parse_vp8_frame_header,
    predict_block,
    predict_subblock,
    reconstruct_block,
    vp8_frame_info,
)

SUBBLOCK_MODES = [
    "B_DC_PRED", "B_TM_PRED", "B_VE_PRED", "B_HE_PRED", "B_LD_PRED",
    "B_RD_PRED", "B_VR_PRED", "B_VL_PRED", "B_HD_PRED", "B_HU_PRED",
]


# ---------------------------------------------------------------------------
# Boolean coder


def test_bool_decoder_hand_traced_p128():
    # [0x80, 0x00] at p=128: split=128, SPLIT=0x8000; 0x8000 >= 0x8000 -> 1,
    # value 0, then zeros forever
    d = BoolDecoder(bytes([0x80, 0x00]))
    assert [d.read_bool(128) for _ in range(3)] == [1, 0, 0]


def test_bool_decoder_hand_traced_run():
    # [0xE0, 0x00] at p=128 traced by hand through §7.3:
    # 0xE000>=0x8000 ->1 (value 0x6000->renorm 0xC000, range 254)
    # split 127: 0xC000>=0x7F00 ->1 (value 0x4100->0x8200)
    # 0x8200>=0x7F00 ->1 (value 0x0300->0x0600)
    # 0x0600<0x7F00 ->0
    d = BoolDecoder(bytes([0xE0, 0x00]))
    assert [d.read_bool(128) for _ in range(4)] == [1, 1, 1, 0]


def test_bool_decoder_hand_traced_low_prob():
    # p=10: split=1+((254*10)>>8)=10, SPLIT=0x0A00; value 0x0A00 -> 1 with
    # range 245 and value 0; next p=10 gives split 10, value 0 -> 0
    d = BoolDecoder(bytes([0x0A, 0x00]))
    assert d.read_bool(10) == 1
    assert d.read_bool(10) == 0


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_bool_coder_roundtrip_random(seed):
    rng = random.Random(seed)
    symbols = [
        (rng.randint(0, 1), rng.choice([1, 10, 64, 128, 200, 254]))
        for _ in range(500)
    ]
    e = BoolEncoder()
    for bit, prob in symbols:
        e.write_bool(bit, prob)
    d = BoolDecoder(e.get_bytes())
    assert [d.read_bool(p) for _, p in symbols] == [b for b, _ in symbols]


def test_literal_roundtrip():
    e = BoolEncoder()
    e.write_literal(0x5A, 7)
    e.write_signed_literal(-13, 6)
    e.write_literal(0, 3)
    e.write_signed_literal(5, 4)
    d = BoolDecoder(e.get_bytes())
    assert d.read_literal(7) == 0x5A
    assert d.read_signed_literal(6) == -13
    assert d.read_literal(3) == 0
    assert d.read_signed_literal(4) == 5


def test_tree_decode():
    # 2-level token tree: root bit chooses {leaf 0 | subtree {leaf 1|leaf 2}}
    tree = [-0, 2, -1, -2]
    e = BoolEncoder()
    # encode 0: root bit 0; encode 2: root 1 then 1; encode 1: 1 then 0
    for bits in ([0], [1, 1], [1, 0]):
        for i, b in enumerate(bits):
            e.write_bool(b, [128, 200][i])
    d = BoolDecoder(e.get_bytes())
    probs = [128, 200]
    assert [d.read_tree(tree, probs) for _ in range(3)] == [0, 2, 1]


# ---------------------------------------------------------------------------
# Transforms


def test_idct_constants_are_the_spec_trig_values():
    assert _COS_SHIFT == round((math.cos(math.pi / 8) * math.sqrt(2) - 1) * 65536)
    assert _SIN_SHIFT == round(math.sin(math.pi / 8) * math.sqrt(2) * 65536)


def test_idct_dc_only():
    blk = [[0] * 4 for _ in range(4)]
    blk[0][0] = 100
    out = idct4x4(blk)
    assert all(v == (100 + 4) >> 3 for row in out for v in row)


def _idct4x4_float(block):
    """Independent float implementation of the same §14.3 butterfly."""
    c = math.cos(math.pi / 8) * math.sqrt(2) - 1
    s = math.sin(math.pi / 8) * math.sqrt(2)

    def butterfly(i0, i1, i2, i3):
        a1 = i0 + i2
        b1 = i0 - i2
        c1 = i1 * s - (i3 + i3 * c)
        d1 = (i1 + i1 * c) + i3 * s
        return a1 + d1, b1 + c1, b1 - c1, a1 - d1

    tmp = [[0.0] * 4 for _ in range(4)]
    for col in range(4):
        r0, r1, r2, r3 = butterfly(*(block[r][col] for r in range(4)))
        tmp[0][col], tmp[1][col], tmp[2][col], tmp[3][col] = r0, r1, r2, r3
    out = [[0.0] * 4 for _ in range(4)]
    for r in range(4):
        v0, v1, v2, v3 = butterfly(*tmp[r])
        out[r] = [v / 8.0 for v in (v0, v1, v2, v3)]
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_idct_matches_float_reference(seed):
    rng = random.Random(seed)
    blk = [[rng.randint(-512, 512) for _ in range(4)] for _ in range(4)]
    got = idct4x4(blk)
    ref = _idct4x4_float(blk)
    for r in range(4):
        for c in range(4):
            # 16.16 truncation + the (x+4)>>3 descale stay within 2 of the
            # exact float transform at coefficient magnitudes < 512
            assert abs(got[r][c] - ref[r][c]) <= 2.0, (r, c, got[r][c], ref[r][c])


def test_iwht_dc_impulse():
    blk = [[0] * 4 for _ in range(4)]
    blk[0][0] = 8
    assert iwht4x4(blk) == [[1] * 4 for _ in range(4)]


def test_iwht_linearity():
    rng = random.Random(5)
    a = [[rng.randint(-64, 64) for _ in range(4)] for _ in range(4)]
    doubled = iwht4x4([[2 * v for v in row] for row in a])
    single = iwht4x4(a)
    # (2x+3)>>3 vs (x+3)>>3: doubled stays within rounding of 2x single
    for r in range(4):
        for c in range(4):
            assert abs(doubled[r][c] - 2 * single[r][c]) <= 1


# ---------------------------------------------------------------------------
# Prediction + reconstruction


def test_whole_block_dc_pred():
    above = list(range(16))          # sum 120
    left = [10] * 16                 # sum 160
    out = predict_block("DC_PRED", 16, above, left)
    assert out[0][0] == (120 + 160 + 16) >> 5
    assert predict_block("DC_PRED", 16, None, None)[5][5] == 128
    assert predict_block("DC_PRED", 8, [4] * 8, None)[0][0] == 4


def test_whole_block_v_h_tm():
    above = list(range(100, 116))
    left = list(range(50, 66))
    v = predict_block("V_PRED", 16, above, left)
    assert all(v[r] == above for r in range(16))
    h = predict_block("H_PRED", 16, above, left)
    assert all(set(h[r]) == {left[r]} for r in range(16))
    tm = predict_block("TM_PRED", 16, above, left, top_left=90)
    assert tm[2][3] == min(255, max(0, left[2] + above[3] - 90))
    # clamping fires at the extremes
    t2 = predict_block("TM_PRED", 16, [255] * 16, [255] * 16, top_left=0)
    assert t2[0][0] == 255
    t3 = predict_block("TM_PRED", 16, [0] * 16, [0] * 16, top_left=255)
    assert t3[0][0] == 0


def test_subblock_constant_input_is_constant_output():
    for mode in SUBBLOCK_MODES:
        out = predict_subblock(mode, [77] * 8, [77] * 4, 77)
        assert out == [[77] * 4 for _ in range(4)], mode


def test_subblock_outputs_within_neighbor_hull():
    rng = random.Random(11)
    for mode in SUBBLOCK_MODES:
        if mode == "B_TM_PRED":
            continue  # TM extrapolates by design (then clamps)
        a = [rng.randint(0, 255) for _ in range(8)]
        l = [rng.randint(0, 255) for _ in range(4)]
        p = rng.randint(0, 255)
        lo, hi = min(a + l + [p]), max(a + l + [p])
        out = predict_subblock(mode, a, l, p)
        assert all(lo <= v <= hi for row in out for v in row), mode


def test_subblock_dependency_sets():
    a1, a2 = [10] * 8, [200] * 8
    l1, l2 = [10] * 4, [200] * 4
    # B_LD / B_VL read only the above row
    for mode in ("B_LD_PRED", "B_VL_PRED"):
        assert predict_subblock(mode, a1, l1, 0) == predict_subblock(mode, a1, l2, 99)
    # B_HU reads only the left column
    assert predict_subblock("B_HU_PRED", a1, l1, 0) == predict_subblock(
        "B_HU_PRED", a2, l1, 99
    )


def test_subblock_hand_fixtures():
    A = [1, 2, 3, 4, 5, 6, 7, 8]
    L = [10, 20, 30, 40]
    P = 0
    dc = predict_subblock("B_DC_PRED", A, L, P)
    assert dc[0][0] == (1 + 2 + 3 + 4 + 10 + 20 + 30 + 40 + 4) >> 3
    ve = predict_subblock("B_VE_PRED", A, L, P)
    # column 0 = avg3(P, A0, A1) = (0 + 2*1 + 2 + 2) >> 2 = 1
    assert [ve[0][c] for c in range(4)] == [1, 2, 3, 4]
    he = predict_subblock("B_HE_PRED", A, L, P)
    # row 3 = avg3(L2, L3, L3) = (30 + 80 + 40 + 2) >> 2 = 38
    assert [he[r][0] for r in range(4)] == [(0 + 20 + 20 + 2) >> 2, 20, 30, 38]
    rd = predict_subblock("B_RD_PRED", A, L, P)
    # pp = [40,30,20,10,0,1,2,3,4]; p[3][0]=avg3(40,30,20)=30;
    # p[0][0]=avg3(10,0,1)=3; p[0][3]=avg3(2,3,4)=3
    assert rd[3][0] == 30 and rd[0][0] == 3 and rd[0][3] == 3
    ld = predict_subblock("B_LD_PRED", A, L, P)
    # p[0][0]=avg3(A0,A1,A2)=2, p[3][3]=avg3(A6,A7,A7)=(7+16+8+2)>>2=8
    assert ld[0][0] == 2 and ld[3][3] == 8
    hu = predict_subblock("B_HU_PRED", A, L, P)
    assert hu[0][0] == (10 + 20 + 1) >> 1 and hu[3][3] == 40


def test_reconstruct_clamps():
    pred = [[250, 5], [100, 100]]
    resid = [[20, -20], [0, 55]]
    assert reconstruct_block(pred, resid) == [[255, 0], [100, 155]]


# ---------------------------------------------------------------------------
# Keyframe header codec


@pytest.mark.parametrize(
    "kw",
    [
        dict(y_ac_qi=0, loop_filter_level=0),
        dict(y_ac_qi=127, loop_filter_level=63, sharpness_level=7,
             log2_dct_partitions=3),
        dict(y_ac_qi=32, y_dc_delta=-7, uv_ac_delta=5),
        dict(y_ac_qi=101, loop_filter_level=41, sharpness_level=3,
             log2_dct_partitions=2, y_dc_delta=3, uv_ac_delta=-8),
    ],
)
def test_header_roundtrip(kw):
    payload = encode_vp8_header_payload(320, 240, **kw)
    info = vp8_frame_info(payload)
    assert info is not None
    assert (info["width"], info["height"]) == (320, 240)
    assert info["y_ac_qi"] == kw.get("y_ac_qi", 32)
    assert info["loop_filter_level"] == kw.get("loop_filter_level", 10)
    assert info["sharpness_level"] == kw.get("sharpness_level", 0)
    assert info["n_dct_partitions"] == 1 << kw.get("log2_dct_partitions", 0)
    assert info["y_dc_delta"] == kw.get("y_dc_delta", 0)
    assert info["uv_ac_delta"] == kw.get("uv_ac_delta", 0)
    assert info["show_frame"] is True


def test_header_roundtrip_sweep():
    for qi in range(0, 128, 9):
        payload = encode_vp8_header_payload(16, 1 + qi, y_ac_qi=qi,
                                            loop_filter_level=qi % 64)
        info = vp8_frame_info(payload)
        assert info["y_ac_qi"] == qi and info["height"] == 1 + qi
        assert info["loop_filter_level"] == qi % 64


def test_container_parser_sees_synthesized_lossy_webp():
    payload = encode_vp8_header_payload(640, 480)
    meta = codecs.parse_webp_header(payload)
    assert meta == {
        "width": 640, "height": 480, "has_alpha": False, "n_frames": 1,
        "variant": "VP8",
    }


def test_lossy_pixel_decode_raises_at_the_table_seam():
    payload = encode_vp8_header_payload(64, 64)
    with pytest.raises(NotImplementedError, match="entropy-table seam"):
        codecs.decode_image(payload)


def test_parse_rejects_interframe_and_bad_start_code():
    payload = encode_vp8_header_payload(64, 64)
    pos = payload.index(b"VP8 ") + 8
    frame = bytearray(payload[pos:])
    frame[0] |= 1  # flip to interframe
    with pytest.raises(NotImplementedError, match="interframe"):
        parse_vp8_frame_header(bytes(frame))
    frame = bytearray(payload[pos:])
    frame[3] = 0x00  # corrupt start code
    with pytest.raises(ValueError, match="start code"):
        parse_vp8_frame_header(bytes(frame))


def test_vp8_frame_info_none_on_lossless_webp():
    from squrve_spark.operators.vp8l import text_to_webp_lossless

    assert vp8_frame_info(text_to_webp_lossless("hello world", width=4)) is None
    assert vp8_frame_info(b"not webp at all") is None


def test_truncated_first_partition_refuses():
    payload = encode_vp8_header_payload(64, 64)
    pos = payload.index(b"VP8 ") + 8
    frame = payload[pos:]
    with pytest.raises(ValueError, match="truncated"):
        parse_vp8_frame_header(frame[:12])  # cut mid-partition


def test_extract_vp8_info_isolates_corrupt_payloads(spark):
    """One malformed payload must yield an all-NULL row, not kill the job
    (review finding): truncated chunk, interframe, and garbage all survive
    alongside a good payload."""
    from squrve_spark.operators import multimodal

    good = encode_vp8_header_payload(32, 32, y_ac_qi=9)
    pos = good.index(b"VP8 ") + 8
    inter = bytearray(good)
    inter[pos] |= 1  # interframe flag
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[: pos + 8])),  # truncated
        (3, bytearray(bytes(inter))),
        (4, bytearray(b"RIFF\x08\x00\x00\x00WEBPgarbage!")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in multimodal.extract_vp8_info(df).collect()}
    assert got[1]["y_ac_qi"] == 9 and got[1]["width"] == 32
    for bad in (2, 3, 4):
        assert got[bad]["y_ac_qi"] is None and got[bad]["width"] is None
