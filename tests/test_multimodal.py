"""Multimodal decode path: the real header-decode branch (BMP/PNG, pure
Python) must flow through the full mapInPandas pipeline — ok=true rows no
longer depend on the deterministic fake (VERDICT r2 item 9)."""

from __future__ import annotations

import struct

from squrve_spark.operators import multimodal


def make_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Minimal valid-enough BMP: file header (14B) + BITMAPINFOHEADER."""
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0, 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 54)
    return header + info


def make_png(width: int, height: int, color_type: int = 6) -> bytes:
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_data
        + b"\x00\x00\x00\x00"  # crc not validated by the header parser
    )


def test_parse_bmp_header():
    assert multimodal.parse_image_header(make_bmp(640, 480)) == (640, 480, 3)
    assert multimodal.parse_image_header(make_bmp(5, -7, 32)) == (5, 7, 4)


def test_parse_png_header():
    assert multimodal.parse_image_header(make_png(320, 200, color_type=6)) == (320, 200, 4)
    assert multimodal.parse_image_header(make_png(16, 16, color_type=0)) == (16, 16, 1)


def test_parse_rejects_non_images():
    assert multimodal.parse_image_header(b"plain text payload") is None
    assert multimodal.parse_image_header(b"BMx") is None
    assert multimodal.parse_image_header(b"") is None


def test_pipeline_real_decode_branch(spark):
    """End-to-end mapInPandas over mixed payloads: real headers decode to
    their true dimensions; non-image payloads take the fake (ok stays true
    under SQURVE_FAKE_DECODE default)."""
    rows = [
        (1, bytearray(make_bmp(640, 480))),
        (2, bytearray(make_png(320, 200))),
        (3, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in multimodal.extract_media_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (640, 480, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (320, 200, 4)
    assert got[1]["ok"] and got[2]["ok"]
    assert got[3]["ok"]  # fake branch, deterministic
    assert got[3]["n_bytes"] == len(b"not an image at all")
