"""SQL-callable engine functions: registered bodies must agree exactly with
the Column-API operators they mirror, and inline as pure expressions (no
Python UDF boundary in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.functions.sqlfuncs import register_sql_functions
from tests.conftest import SF_SMALL


def test_register_and_parity_with_operators(spark):
    names = register_sql_functions(spark)
    assert {"sq_fingerprint", "sq_token_count", "sq_mask_pii", "sq_cosine", "sq_dot"} <= set(names)

    docs = load_table(spark, SF_SMALL, "documents")
    docs.createOrReplaceTempView("documents")
    via_sql = {
        r["doc_id"]: (r["fp"], r["nt"])
        for r in spark.sql(
            "SELECT doc_id, sq_fingerprint(text) AS fp, sq_token_count(text) AS nt FROM documents"
        ).collect()
    }
    from squrve_spark.operators.text import fingerprint, token_count

    via_ops = {r["doc_id"]: r["fp_md5"] for r in fingerprint(docs).collect()}
    via_cnt = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    for did, (fp, nt) in via_sql.items():
        assert via_ops[did] == fp
        assert via_cnt[did] == nt


def test_mask_pii_sql_matches_operator(spark):
    register_sql_functions(spark)
    rows = [(1, "mail a@b.co or call (555) 123-4567 from 10.0.0.1")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("pii_probe")
    got = spark.sql("SELECT sq_mask_pii(text) AS t FROM pii_probe").collect()[0]["t"]
    from squrve_spark.operators.text import mask_pii

    want = mask_pii(df).collect()[0]["text"]
    assert got == want
    assert "<EMAIL>" in got and "<PHONE>" in got and "<IP>" in got


def test_cosine_sql_function(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT sq_cosine(array(1.0D, 0.0D), array(0.6D, 0.8D)) AS c, "
        "sq_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d"
    ).collect()[0]
    assert abs(row["c"] - 0.6) < 1e-9
    assert row["d"] == 11.0


def test_sql_functions_stay_jvm_side(spark):
    register_sql_functions(spark)
    load_table(spark, SF_SMALL, "documents").createOrReplaceTempView("documents")
    plan = (
        spark.sql("SELECT sq_fingerprint(text) FROM documents")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_chunk_udtf_matches_jvm_operator(spark):
    """The SQL-callable UDTF and the map-only JVM chunker implement ONE
    windowing rule: identical output on the fixture corpus sample."""
    from squrve_spark.functions.udtfs import register_udtfs
    from squrve_spark.operators.text import chunk_documents

    assert "sq_chunk_text" in register_udtfs(spark)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 30")
        .select("doc_id", "text")
    )
    docs.createOrReplaceTempView("_chunk_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk AS chunk_text, c.n_chunk_tokens "
        "FROM _chunk_docs d, LATERAL sq_chunk_text(d.text, 16, 4) c"
    )
    via_jvm = chunk_documents(docs, chunk_tokens=16, overlap=4)
    u = sorted(tuple(r) for r in via_udtf.collect())
    j = sorted(tuple(r) for r in via_jvm.collect())
    assert u == j and len(u) > 30


def test_chunk_udtf_rejects_bad_params(spark):
    from squrve_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError, Exception)):
        spark.sql("SELECT * FROM sq_chunk_text('a b c', 4, 9)").collect()
