"""SQL-callable engine functions (§2.E extension surface).

``register_sql_functions(spark)`` installs the engine's text/vector
primitives as **SQL scalar functions** (CREATE TEMPORARY FUNCTION ...
RETURN <expression>) so plain ``spark.sql`` queries — including
LLM-generated SQL — can call them. The bodies are pure Catalyst
expressions: they inline into the calling query's codegen stage, so there
is no UDF boundary, no Python, and every optimizer rule still applies.

Reference analog: sqlite exposes its scalar functions to generated SQL;
this is the Spark-native equivalent for the engine's own primitives.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body). Bodies mirror the Column-API operators in
# operators/text.py and operators/similarity.py; keep both in sync.
_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # canonical exact-dedup fingerprint (operators/text.fingerprint)
    "sq_fingerprint": (
        "(t STRING) RETURNS STRING",
        r"md5(lower(regexp_replace(trim(t), '\\s+', ' ')))",
    ),
    # whitespace token count (operators/text.token_count)
    "sq_token_count": (
        "(t STRING) RETURNS INT",
        r"size(split(trim(t), '\\s+'))",
    ),
    # PII scrub chain (operators/text.mask_pii; same pattern order)
    "sq_mask_pii": (
        "(t STRING) RETURNS STRING",
        r"""regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(t,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
                    '\\b(?:\\d[ -]?){13,16}\\b', '<CARD>'),
                  '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>'),
                '(?:\\+?\\d{1,2}[ .-])?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}\\b', '<PHONE>'),
              '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>')""",
    ),
    # cosine similarity over array<double> (operators/similarity kernels)
    "sq_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        """aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
           / (sqrt(aggregate(a, 0.0D, (acc, v) -> acc + v * v))
              * sqrt(aggregate(b, 0.0D, (acc, v) -> acc + v * v)))""",
    ),
    # dot product
    "sq_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install all engine SQL functions on the session; returns the names.
    Idempotent (CREATE OR REPLACE)."""
    for name, (sig, body) in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    return sorted(_SQL_FUNCTIONS)
