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
