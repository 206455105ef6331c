"""Sampling / selection / packing operators (squrve_spark/operators/
sampling.py): determinism, DuckDB parity for the hash-rank sample and
per-group top-k, and pack invariants for FFD token packing.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import sampling, text
from squrve_spark.plans import REGISTRY
from tests.conftest import SF_SMALL

DOCS = f"{SF_SMALL}/documents.parquet"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_deterministic_sample_matches_duckdb(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    got = _rows(sampling.deterministic_sample(docs, 7, ["lang"]), ["doc_id", "lang"])
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(f"""
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM read_parquet('{DOCS}')
            ) WHERE rk <= 7
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_deterministic_sample_exact_sizes_and_stability(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    out = sampling.deterministic_sample(docs, 5, ["lang"])
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    pool = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {lang: min(5, n) for lang, n in pool.items()}
    # repartitioned input -> identical selection (the sampleBy failure mode)
    again = sampling.deterministic_sample(docs.repartition(13), 5, ["lang"])
    assert _rows(out, ["doc_id"]) == _rows(again, ["doc_id"])


def test_prefilter_factor_preserves_selection(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    exact = sampling.deterministic_sample(docs, 5, ["lang"])
    fast = sampling.deterministic_sample(docs, 5, ["lang"], prefilter_factor=8)
    assert _rows(exact, ["doc_id", "lang"]) == _rows(fast, ["doc_id", "lang"])


def test_topk_per_group_matches_duckdb(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    scored = text.quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    got = _rows(
        sampling.topk_per_group(
            scored.select("doc_id", "lang", "stopword_ratio"),
            ["lang"],
            [F.col("stopword_ratio").desc(), F.col("doc_id")],
            k=3,
        ),
        ["doc_id", "lang", "rank"],
    )
    # independent DuckDB reimplementation of the same quality signal
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(f"""
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(trim(text), '\\s+') AS w
                FROM read_parquet('{DOCS}')
            ), scored AS (
                SELECT doc_id, lang,
                       ROUND(len(list_filter(w, t -> list_contains({text.STOPWORDS_EN!r}, t)))
                             / len(w), 4) AS sr
                FROM toks
            )
            SELECT doc_id, lang, CAST(rk AS INTEGER) FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang ORDER BY sr DESC, doc_id) AS rk
                FROM scored
            ) WHERE rk <= 3
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_pack_documents_invariants(spark):
    counts = text.token_count(load_table(spark, SF_SMALL, "documents"))
    src = counts.select("doc_id", "n_tokens")
    budget = 256
    packed = sampling.pack_documents(src, budget=budget, num_shards=4).collect()
    # every doc assigned exactly once
    assert sorted(r["doc_id"] for r in packed) == sorted(
        r["doc_id"] for r in src.collect()
    )
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, rows in by_pack.items():
        total = sum(r["n_tokens"] for r in rows)
        assert all(r["pack_tokens"] == total for r in rows)
        # budget holds unless the pack is a single over-budget doc
        assert total <= budget or len(rows) == 1
        # packs never span shards
        assert len({r["shard"] for r in rows}) == 1
    # determinism
    again = sampling.pack_documents(src.repartition(11), budget=budget, num_shards=4)
    assert sorted((r["doc_id"], r["pack_id"]) for r in again.collect()) == sorted(
        (r["doc_id"], r["pack_id"]) for r in packed
    )


def test_stratified_sample_runs(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    out = sampling.stratified_sample(docs, "lang", {l: 0.5 for l in langs}, seed=7)
    assert 0 < out.count() <= docs.count()


@pytest.mark.parametrize(
    "name", ["doc_sample_per_lang", "doc_topk_quality", "doc_pack_budget"]
)
def test_registry_entries_run(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    assert df.columns and df.count() > 0
