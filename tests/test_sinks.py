"""Deterministic shard-writer sink: completeness, determinism, balance,
one-sorted-file-per-shard layout, and DuckDB parity of the assignment."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from squrve_spark import sinks
from squrve_spark.catalog import load_table
from tests.conftest import SF_SMALL, duck_views


def _read_back(spark, path):
    return spark.read.parquet(path)


def test_shards_complete_deterministic_balanced(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text", "source")
    n_docs = docs.count()
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    sinks.write_training_shards(docs, p1, n_shards=8)
    sinks.write_training_shards(docs, p2, n_shards=8)

    back = _read_back(spark, p1)
    assert back.count() == n_docs  # every row exactly once
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }

    # byte-determinism: same shard membership AND same within-file order
    def files_rows(path):
        out = {}
        for f in sorted(glob.glob(os.path.join(path, "shard=*/*.parquet"))):
            shard = f.split("shard=")[1].split("/")[0]
            rows = spark.read.parquet(f).select("doc_id").collect()
            out[shard] = [r["doc_id"] for r in rows]
        return out

    assert files_rows(p1) == files_rows(p2)

    # one file per shard, all shards present
    per_shard = {
        d.split("=")[1]: len(glob.glob(os.path.join(p1, d, "*.parquet")))
        for d in os.listdir(p1)
        if d.startswith("shard=")
    }
    assert len(per_shard) == 8 and all(v == 1 for v in per_shard.values())

    # balance: uniform hash keeps every shard within 2x of the mean at n=500
    counts = sorted(len(v) for v in files_rows(p1).values())
    assert counts[0] > 0 and counts[-1] <= 2 * (n_docs / 8)


def test_shard_order_decorrelated_from_source(spark, tmp_path):
    """Within a shard, doc_ids must not arrive in source order — the hash
    order key breaks input clustering (longest ascending doc_id run stays
    far below the shard length)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    p = str(tmp_path / "s")
    sinks.write_training_shards(docs, p, n_shards=2)
    f = sorted(glob.glob(os.path.join(p, "shard=0/*.parquet")))[0]
    ids = [r["doc_id"] for r in spark.read.parquet(f).select("doc_id").collect()]
    run, best = 1, 1
    for a, b in zip(ids, ids[1:]):
        run = run + 1 if b > a else 1
        best = max(best, run)
    assert len(ids) > 50 and best < len(ids) / 4


def test_shard_manifest_matches_duckdb(spark, duck):
    """The assignment is a pure row function, so the manifest is
    recomputable from written output with any engine: compare against
    DuckDB grouping over the shard column of the written files."""
    docs = load_table(spark, SF_SMALL, "documents")
    man = sinks.shard_manifest(docs, n_shards=8, token_col=None)
    got = {r["shard"]: r["n_docs"] for r in man.collect()}
    assert sum(got.values()) == docs.count()

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "out")
        sinks.write_training_shards(docs.select("doc_id", "text"), p, n_shards=8)
        duck_views(duck, SF_SMALL)
        rows = duck.execute(
            f"SELECT shard, COUNT(*) n FROM read_parquet('{p}/shard=*/*.parquet', "
            "hive_partitioning=1) GROUP BY shard ORDER BY shard"
        ).fetchall()
    assert {int(s): n for s, n in rows} == got
