"""VP8L (lossless WebP) codec tests.

Three layers:
1. encoder->decoder round-trips (Huffman normal path incl. max-symbol and
   0-bit code-length codes, SUBTRACT_GREEN inverse, header/alpha rules);
2. HAND-WOVEN bitstreams for the paths the minimal encoder never emits —
   LZ77 backward references (incl. the 2D distance map), color cache,
   PREDICTOR and COLOR transforms, COLOR_INDEXING with pixel bundling, and
   the meta-Huffman entropy image — each asserting exact expected pixels;
3. spec-constant pins (distance-map prefix, canonical code assignment) and
   the decode_image dispatch/parity seams.
"""

from __future__ import annotations

import numpy as np
import pytest

from squrve_spark.operators import vp8l as V
from squrve_spark.operators.codecs import decode_image, text_to_bmp
from squrve_spark.operators.vp8l import (
    BitWriter,
    DISTANCE_MAP,
    canonical_codes,
    decode_vp8l,
    decode_webp_lossless,
    encode_vp8l,
    text_to_webp_lossless,
)


# ---------------------------------------------------------------------------
# spec-constant pins


def test_distance_map_matches_spec_table():
    # the first rows of the table as printed in the WebP lossless spec
    expect = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert DISTANCE_MAP[:40] == expect
    assert len(DISTANCE_MAP) == 120


def test_canonical_code_assignment():
    # deflate canonicalization: shorter codes first, ties by symbol
    codes = canonical_codes({0: 2, 1: 1, 2: 3, 3: 3})
    assert codes == {1: (0, 1), 0: (2, 2), 2: (6, 3), 3: (7, 3)}


# ---------------------------------------------------------------------------
# encoder round-trips


@pytest.mark.parametrize("shape", [(1, 1, 3), (3, 7, 3), (16, 16, 4), (5, 2, 4)])
@pytest.mark.parametrize("subtract_green", [False, True])
def test_roundtrip(shape, subtract_green):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_webp_lossless(encode_vp8l(arr, subtract_green=subtract_green))
    if shape[2] == 4 and (arr[..., 3] == 255).all():
        arr = arr[..., :3]
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_roundtrip_opaque_alpha_collapses_to_rgb():
    arr = np.full((2, 2, 4), 9, dtype=np.uint8)
    arr[..., 3] = 255
    out = decode_webp_lossless(encode_vp8l(arr))
    assert out.shape == (2, 2, 3)


def test_truncated_raises():
    payload = encode_vp8l(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(Exception):
        decode_webp_lossless(payload[:-6] + b"")


# ---------------------------------------------------------------------------
# hand-woven bitstreams
#
# Helpers build a raw VP8L chunk with the module's BitWriter, re-using the
# encoder's fixed complete code tables where convenient.


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple_codes(bw: BitWriter, green, red, blue, alpha, dist) -> None:
    """Five single/double-symbol simple codes (0- or 1-bit reads)."""
    for syms in (green, red, blue, alpha, dist):
        V._write_simple_table(bw, syms)


def _literal_tables(bw: BitWriter) -> None:
    """The encoder's full literal tables: green 9/5-bit, r/b/a flat-8,
    distance simple[0]."""
    V._write_green_table(bw)
    for _ in range(3):
        V._write_flat8_table(bw)
    V._write_simple_table(bw, [0])


def _emit_literal(bw: BitWriter, a: int, r: int, g: int, b: int) -> None:
    bw.write_code(*V._GREEN_CODES[g])
    bw.write_code(r, 8)
    bw.write_code(b, 8)
    bw.write_code(a, 8)


def test_lz77_copy_previous_row_and_same_row():
    """4x2: first row literals; second row copied with distance code 1
    ((0,1) -> dist = width). Then a separate 4x1 image where pixels 2..4
    copy pixel 1 with distance code 2 ((1,0) -> dist = 1) — overlapping
    copy, the LZ77 'run' idiom."""
    # image A: copy previous row
    bw = BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _literal_tables(bw)
    colors = [(255, 1, 2, 3), (255, 4, 5, 6), (255, 7, 8, 9), (255, 10, 11, 12)]
    for a, r, g, b in colors:
        _emit_literal(bw, a, r, g, b)
    # length 4: green symbol 256 + length_code 3 (prefix values 1..4)
    bw.write_code(*V._GREEN_CODES[256 + 3])
    # distance symbol: simple[0] emits 0 bits; prefix code 0 -> value 1 ->
    # DISTANCE_MAP[0] = (0,1) -> dist = 4
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (2, 4, 3)
    for x, (_a, r, g, b) in enumerate(colors):
        assert tuple(out[0, x]) == (r, g, b)
        assert tuple(out[1, x]) == (r, g, b)

    # image B: run of one pixel via distance code 2 = (1, 0) -> dist 1
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    V._write_green_table(bw)
    for _ in range(3):
        V._write_flat8_table(bw)
    V._write_simple_table(bw, [1])  # distance prefix code 1 -> value 2
    _emit_literal(bw, 255, 20, 30, 40)
    bw.write_code(*V._GREEN_CODES[256 + 2])  # length code 2 -> length 3
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (1, 4, 3)
    assert (out == [20, 30, 40]).all()


def test_plain_distance_beyond_120():
    """Distance codes > 120 are literal distances (code - 120)."""
    bw = BitWriter()
    _header(bw, 5, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    V._write_green_table(bw)
    for _ in range(3):
        V._write_flat8_table(bw)
    # distance prefix symbols come from a 2-symbol simple code: bit0 -> 18,
    # bit1 -> unused. prefix code 18: extra=(18-2)>>1=8, offset=(2+0)<<8=512
    # ... too big for this image; use symbols whose VALUE lands on 122:
    # code 14: extra=6, offset=(2+0)<<6=128 -> value 128+extra_bits+1; need
    # 122 -> smaller: code 13: extra=5, offset=(2+1)<<5=96 -> 96+eb+1,
    # eb=25 -> 122 -> dist = 122-120 = 2
    V._write_simple_table(bw, [13, 39])
    _emit_literal(bw, 255, 1, 1, 1)
    _emit_literal(bw, 255, 2, 2, 2)
    bw.write_code(*V._GREEN_CODES[256 + 2])  # length 3
    bw.write(0, 1)  # distance huffman: bit 0 -> symbol 13
    bw.write(25, 5)  # extra bits -> prefix value 122 -> distance 2
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (1, 5, 3)
    assert [tuple(p) for p in out[0]] == [
        (1, 1, 1), (2, 2, 2), (1, 1, 1), (2, 2, 2), (1, 1, 1)]


def test_color_cache():
    """cache_bits=2: literal inserts, cache symbol re-emits the pixel."""
    cache_bits = 2
    argb = (255 << 24) | (7 << 16) | (77 << 8) | 200
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    # green alphabet 284: literals 9 bits, length codes 6 bits, cache 4 bits
    lengths = {**{s: 9 for s in range(256)},
               **{s: 6 for s in range(256, 272)},
               **{s: 4 for s in range(280, 284)}}
    codes = canonical_codes(lengths)
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    # green table: code-length-code over lengths {0, 4, 6, 9}
    cl = {9: 1, 6: 2, 4: 3, 0: 3}
    V._write_cl_header(bw, cl)
    bw.write(0, 1)  # no max-symbol limit: all 284 lengths explicit
    cl_codes = canonical_codes(cl)
    for s in range(284):
        bw.write_code(*cl_codes[lengths.get(s, 0)])
    for _ in range(3):
        V._write_flat8_table(bw)
    V._write_simple_table(bw, [0])
    # literal pixel
    bw.write_code(*codes[77])   # green
    bw.write_code(7, 8)         # red
    bw.write_code(200, 8)       # blue
    bw.write_code(255, 8)       # alpha
    # cache hit
    bw.write_code(*codes[280 + idx])
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (1, 2, 3)
    assert tuple(out[0, 0]) == (7, 77, 200)
    assert tuple(out[0, 1]) == (7, 77, 200)


def _subimage_1px(bw: BitWriter, a: int, r: int, g: int, b: int) -> None:
    """A 1x1 non-level0 entropy image holding one ARGB value, all five
    codes simple."""
    bw.write(0, 1)  # no cache
    _simple_codes(bw, [g], [r], [b], [a], [0])
    # one literal: green/red/blue/alpha reads are 0-bit (single-symbol)


def test_predictor_transform_mode_T():
    """4x4, one predictor tile with mode 2 (T): only pixel (0,0) carries a
    residual; the whole image reconstructs to one constant color."""
    bw = BitWriter()
    _header(bw, 4, 4)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits - 2 = 2 -> tile 16x16 -> one tile
    _subimage_1px(bw, 0, 0, 2, 0)  # tile pixel green channel = mode 2
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _literal_tables(bw)
    # residuals: (0,0) = target - black(0xff000000); everything else 0
    _emit_literal(bw, 0, 10, 20, 30)
    for _ in range(15):
        _emit_literal(bw, 0, 0, 0, 0)
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (4, 4, 3)
    assert (out == [10, 20, 30]).all()


def test_color_transform_green_to_red():
    """One color-transform tile with green_to_red=1: red shifts by
    (1 * int8(green)) >> 5."""
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(2, 3)  # one tile
    _subimage_1px(bw, 0, 0, 0, 1)  # cte blue channel = green_to_red = 1
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _literal_tables(bw)
    _emit_literal(bw, 255, 100, 64, 5)   # delta = (1*64)>>5 = 2 -> red 102
    _emit_literal(bw, 255, 100, 160, 5)  # green 160 = int8 -96 -> delta -3
    out = decode_vp8l(bw.to_bytes())
    assert tuple(out[0, 0]) == (102, 64, 5)
    assert tuple(out[0, 1]) == (97, 160, 5)


def test_color_indexing_with_bundling():
    """8x1 image, 4-color palette -> 2-bit indices bundled 4-per-byte
    (packed width 2)."""
    palette = [(255, 10, 0, 0), (255, 0, 20, 0), (255, 0, 0, 30), (255, 9, 9, 9)]
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # n_colors - 1
    # palette sub-image: 4x1, literal tables; entries stored as DELTAS
    bw.write(0, 1)  # no cache
    _literal_tables(bw)
    prev = (0, 0, 0, 0)
    for a, r, g, b in palette:
        da, dr, dg, db = (a - prev[0]) & 255, (r - prev[1]) & 255, \
            (g - prev[2]) & 255, (b - prev[3]) & 255
        _emit_literal(bw, da, dr, dg, db)
        prev = (a, r, g, b)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache (main image)
    bw.write(0, 1)  # no meta
    _literal_tables(bw)
    # indices 0,1,2,3 then 3,2,1,0 -> packed green bytes 0b11100100, 0b00011011
    _emit_literal(bw, 0, 0, 0b11100100, 0)
    _emit_literal(bw, 0, 0, 0b00011011, 0)
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (1, 8, 3)
    want = [palette[i][1:] for i in [0, 1, 2, 3, 3, 2, 1, 0]]
    assert [tuple(p) for p in out[0]] == want


def test_meta_huffman_entropy_image():
    """4x4 with an entropy image (precision 2 -> one meta tile -> group 0):
    exercises the meta-Huffman read path end-to-end."""
    bw = BitWriter()
    _header(bw, 4, 4)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # entropy image present
    bw.write(0, 3)  # precision - 2 = 0 -> 2 -> tiles of 4 -> 1x1 meta
    _subimage_1px(bw, 0, 0, 0, 0)  # meta pixel 0 -> group 0
    _literal_tables(bw)
    for i in range(16):
        _emit_literal(bw, 255, i, 2 * i, 3 * i)
    out = decode_vp8l(bw.to_bytes())
    assert out.shape == (4, 4, 3)
    flat = out.reshape(16, 3)
    for i in range(16):
        assert tuple(flat[i]) == (i, 2 * i, 3 * i)


# ---------------------------------------------------------------------------
# seams


def test_decode_image_dispatches_webp_lossless():
    text = "the quick brown fox jumps over the lazy dog" * 3
    webp = decode_image(text_to_webp_lossless(text))
    bmp = decode_image(text_to_bmp(text))
    assert (webp == bmp).all()  # same pixel grid, different container


def test_decode_image_lossy_webp_still_raises():
    from squrve_spark.operators.codecs import text_to_webp

    with pytest.raises(NotImplementedError):
        decode_image(text_to_webp("payload"))


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_vp8l(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_vp8l(np.zeros((1, 20000, 3), dtype=np.uint8))


def test_predictor_select_tie_goes_to_top():
    """Spec/libwebp: Select returns T when the distances tie."""
    # L=(10,)*4 channels, T=(20,), TL=(15,): gradient p = 15 per channel,
    # |p-L| == |p-T| == 5 -> tie -> T
    l = 0x0A0A0A0A
    t = 0x14141414
    tl = 0x0F0F0F0F
    assert V._select(l, t, tl) == t


def test_cache_bits_out_of_range_rejected():
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(15, 4)  # invalid: spec allows 1..11
    with pytest.raises(ValueError, match="color-cache bits"):
        decode_vp8l(bw.to_bytes() + b"\x00" * 8)
