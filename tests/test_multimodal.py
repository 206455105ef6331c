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


def _mixed_payloads(spark):
    rows = [
        (1, bytearray(make_bmp(640, 480))),
        (2, bytearray(make_png(320, 200))),
        (3, bytearray(b"not an image at all")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_pipeline_real_decode_branch_default_honest(spark, monkeypatch):
    """Default config (round-4): real headers decode to true dimensions;
    an unrecognized payload yields ok=false with NULL dims — never silently
    fabricated ones."""
    monkeypatch.delenv("SQURVE_FAKE_DECODE", raising=False)
    df = _mixed_payloads(spark)
    got = {r["doc_id"]: r for r in multimodal.extract_media_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (640, 480, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (320, 200, 4)
    assert got[1]["ok"] and got[2]["ok"]
    assert not got[3]["ok"]
    assert got[3]["width"] is None and got[3]["height"] is None
    # byte-level profiling still real for the undecodable row
    assert got[3]["n_bytes"] == len(b"not an image at all")


def test_pipeline_fake_decode_opt_in(spark):
    """Explicit opt-in (fake_decode=True or SQURVE_FAKE_DECODE=1): the
    deterministic fake stands in for the missing pixel codec."""
    df = _mixed_payloads(spark)
    got = {
        r["doc_id"]: r
        for r in multimodal.extract_media_meta(df, fake_decode=True).collect()
    }
    assert got[3]["ok"]  # fake branch, deterministic
    assert got[3]["width"] is not None
    # real-header rows are identical with or without the fake
    assert (got[1]["width"], got[1]["height"]) == (640, 480)


def test_fake_decode_env_resolution(monkeypatch):
    monkeypatch.delenv("SQURVE_FAKE_DECODE", raising=False)
    assert multimodal.fake_decode_default() is False
    monkeypatch.setenv("SQURVE_FAKE_DECODE", "1")
    assert multimodal.fake_decode_default() is True
