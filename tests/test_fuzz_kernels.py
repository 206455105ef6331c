"""Hypothesis fuzz of the pure-Python kernels: these run on arbitrary
user/LLM-supplied input (SQL strings, binary payloads), so the contract is
'never crash, always return the right type' on ANY input — exactly what
property-based fuzzing checks and example tests can't.

No SparkSession involved: pure functions only, so hundreds of examples run
in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from squrve_spark.index import _features_stable, _stable_hash
from squrve_spark.llm import extract_sql
from squrve_spark.metasql import decompose, extract_subqueries, strip_clause
from squrve_spark.operators.multimodal import parse_image_header
from squrve_spark.transpile import rewrite_qualify, transpile


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_image_header_never_crashes(payload):
    out = parse_image_header(payload)
    if out is not None:
        w, h, c = out
        assert w > 0 and h > 0 and c in (1, 2, 3, 4)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_transpile_total_on_arbitrary_text(sql):
    for dialect in ("sqlite", "snowflake", "bigquery"):
        out = transpile(sql, dialect)
        assert isinstance(out, str)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_qualify_rewrite_total_and_idempotent_without_qualify(sql):
    out = rewrite_qualify(sql)
    assert isinstance(out, str)
    if "qualify" not in sql.lower():
        assert out == sql  # no QUALIFY -> untouched


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_metasql_total(sql):
    assert isinstance(decompose(sql), dict)
    assert isinstance(extract_subqueries(sql), list)
    strip_clause(sql, "WHERE")  # None or str, never raises


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_extract_sql_total(text):
    assert isinstance(extract_sql(text), str)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_stable_hash_stays_32bit(s):
    h = _stable_hash(s)
    assert 0 <= h <= 0xFFFFFFFF


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_feature_vectors_unit_norm_or_zero(s):
    import numpy as np

    v = _features_stable(s, 64)
    n = float(np.linalg.norm(v))
    assert abs(n - 1.0) < 1e-9 or n == 0.0


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=60, deadline=None)
def test_flac_roundtrip_exact_on_arbitrary_samples(vals, nch):
    import numpy as np

    from squrve_spark.operators.flac import decode_flac, encode_flac

    n = len(vals) // nch
    if n == 0:
        return
    s = np.array(vals[: n * nch], dtype=np.int16).reshape(n, nch)
    dec, rate = decode_flac(encode_flac(s, rate=8000, blocksize=64))
    assert rate == 8000
    assert np.array_equal(dec, s.astype(np.int32))


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_flac_decoder_never_accepts_garbage_silently(payload):
    """Arbitrary bytes either raise or (with a forged fLaC prefix) raise
    at streaminfo/frame/CRC checks — the decoder never fabricates
    samples from a stream it cannot verify."""
    import pytest as _pt

    from squrve_spark.operators.flac import decode_flac

    import struct

    with _pt.raises((ValueError, struct.error, IndexError)):
        decode_flac(b"fLaC" + payload)
