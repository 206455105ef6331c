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


def test_upsert_partitioned_rewrites_only_touched(spark, tmp_path):
    from squrve_spark.sinks import upsert_partitioned
    import os

    path = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p3")],
        "id long, val string, part string",
    )
    upsert_partitioned(spark, base, path, ["id"], "part")

    def files_of(part):
        d = os.path.join(path, f"part={part}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    p3_before = files_of("p3")

    # batch updates id=2 (p1), inserts id=5 (p2); p3 untouched
    batch = spark.createDataFrame(
        [(2, "B2", "p1"), (5, "e", "p2")], "id long, val string, part string"
    )
    upsert_partitioned(spark, batch, path, ["id"], "part")

    got = {
        (r["id"], r["part"]): r["val"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "p1"): "a", (2, "p1"): "B2", (3, "p2"): "c",
        (4, "p3"): "d", (5, "p2"): "e",
    }
    # dynamic overwrite must leave untouched partitions' files alone
    assert files_of("p3") == p3_before


def test_upsert_partitioned_first_write_bootstraps(spark, tmp_path):
    from squrve_spark.sinks import upsert_partitioned

    path = str(tmp_path / "fresh")
    df = spark.createDataFrame([(1, "x", "p1")], "id long, val string, part string")
    upsert_partitioned(spark, df, path, ["id"], "part")
    assert spark.read.parquet(path).count() == 1


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from squrve_spark.sinks import compact_parquet
    import os

    path = str(tmp_path / "many")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(37).write.parquet(path)  # 37 tiny files

    def count_files():
        return sum(
            1 for _dp, _dn, fns in os.walk(path) for f in fns if f.endswith(".parquet")
        )

    assert count_files() >= 37
    before = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1 and count_files() == 1
    after = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert after == before


def test_partitioned_read_prunes_partitions(spark, tmp_path):
    """Partition filter must reach the scan (PartitionFilters), so a query
    over one partition never lists/reads the others at 100 TB."""
    from squrve_spark.sinks import upsert_partitioned

    path = str(tmp_path / "pruned")
    df = spark.createDataFrame(
        [(i, f"v{i}", f"p{i % 5}") for i in range(50)],
        "id long, val string, part string",
    )
    upsert_partitioned(spark, df, path, ["id"], "part")
    q = spark.read.parquet(path).filter(F.col("part") == "p3").select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the equality predicate must land in PartitionFilters (directory-level
    # pruning), not PushedFilters (row-group level) — inputFiles() is not
    # filter-aware, so the plan is the observable contract
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "part" in pf and "p3" in pf
    assert q.count() == 10


def test_compact_parquet_partitioned_merges_within_partitions(spark, tmp_path):
    """Partitioned compaction must MERGE each hive partition's files (one
    per partition), never scatter partitions across round-robin tasks."""
    from squrve_spark.sinks import compact_parquet
    import os

    path = str(tmp_path / "many_parts")
    df = spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(300)], "id long, part string"
    )
    df.repartition(10).write.partitionBy("part").parquet(path)  # ~30 files

    def files_per_part():
        out = {}
        for d in os.listdir(path):
            if d.startswith("part="):
                out[d] = sum(
                    1 for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
                )
        return out

    assert all(n >= 2 for n in files_per_part().values())
    before = sorted((r["id"], r["part"]) for r in spark.read.parquet(path).collect())
    written = compact_parquet(spark, path, target_file_bytes=1 << 30, partition_col="part")
    per = files_per_part()
    assert set(per.values()) == {1}, per  # one file per partition
    assert written == sum(per.values())
    after = sorted((r["id"], r["part"]) for r in spark.read.parquet(path).collect())
    assert after == before


def test_upsert_partitioned_null_partition_survivors_kept(spark, tmp_path):
    """Rows already in the NULL partition must survive an upsert that
    touches the NULL partition (isin() alone never matches NULL)."""
    from squrve_spark.sinks import upsert_partitioned

    path = str(tmp_path / "nullpart")
    base = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "c", "p1")],
        "id long, val string, part string",
    )
    upsert_partitioned(spark, base, path, ["id"], "part")
    batch = spark.createDataFrame([(9, "z", None)], "id long, val string, part string")
    upsert_partitioned(spark, batch, path, ["id"], "part")
    got = sorted((r["id"], r["val"], r["part"]) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a", None), (2, "b", None), (3, "c", "p1"), (9, "z", None)]


def test_incremental_dedup_ingest(spark, tmp_path):
    """Batch 1 seeds the store; batch 2 drops cross-batch and within-batch
    dupes; replaying batch 2 is a no-op (idempotent at result level)."""
    from squrve_spark.sinks import incremental_dedup_ingest

    store = str(tmp_path / "fp_store")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "ALPHA   beta")],
        "doc_id long, text string",
    )
    out1 = incremental_dedup_ingest(b1, store)
    # within-batch: doc 3 is a canonical dup of doc 1 (case/whitespace)
    assert {r["doc_id"] for r in out1.collect()} == {1, 2}
    b2 = spark.createDataFrame(
        [(10, "gamma delta"), (11, "epsilon zeta"), (12, "epsilon  ZETA")],
        "doc_id long, text string",
    )
    out2 = incremental_dedup_ingest(b2, store)
    assert {r["doc_id"] for r in out2.collect()} == {11}
    # replay: everything already stored
    out3 = incremental_dedup_ingest(b2, store)
    assert out3.count() == 0
    # the store holds exactly the distinct fingerprints
    assert spark.read.parquet(store).count() == 3
    # returned frame stays valid AFTER the store append (eager checkpoint)
    assert out2.count() == 1


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Two batches merged incrementally must equal the one-shot aggregate
    over their union; untouched partitions keep their rows."""
    from squrve_spark.sinks import incremental_rollup

    store = str(tmp_path / "rollup")
    b1 = spark.createDataFrame(
        [("d1", "click", 2), ("d1", "buy", 10), ("d2", "click", 1)],
        "day string, et string, cents int",
    )
    b2 = spark.createDataFrame(
        [("d2", "click", 4), ("d2", "buy", 7), ("d3", "click", 5)],
        "day string, et string, cents int",
    )
    aggs = {"n": "count(*)", "cents": "sum(cents)"}
    incremental_rollup(spark, b1, store, ["day", "et"], aggs, "day")
    out2 = incremental_rollup(spark, b2, store, ["day", "et"], aggs, "day")
    # returned frame = touched partitions only (d2, d3)
    assert {r["day"] for r in out2.collect()} == {"d2", "d3"}
    stored = {
        (r["day"], r["et"]): (r["n"], r["cents"])
        for r in spark.read.parquet(store).collect()
    }
    full = b1.unionByName(b2).groupBy("day", "et").agg(
        F.expr("count(*)").alias("n"), F.expr("sum(cents)").alias("cents")
    )
    expect = {
        (r["day"], r["et"]): (r["n"], r["cents"]) for r in full.collect()
    }
    assert stored == expect
    # d1 was untouched by batch 2 and survived intact
    assert stored[("d1", "buy")] == (1, 10)


def test_incremental_dedup_null_text_contract(spark, tmp_path):
    """The doc_incremental_dedup NULL contract (review fix): text is
    COALESCEd upstream, so null-text docs share the empty-text
    fingerprint and the SECOND batch's null doc is deduped against the
    first — without the coalesce, NULL fps bypass the store's anti-join
    and survive every batch."""
    from pyspark.sql import functions as F

    from squrve_spark.sinks import incremental_dedup_ingest

    store = str(tmp_path / "fp_store")
    coalesce = lambda df: df.select(  # noqa: E731
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    b1 = spark.createDataFrame([(0, None), (2, "real text")], "doc_id long, text string")
    b2 = spark.createDataFrame([(1, None), (3, "")], "doc_id long, text string")
    out1 = incremental_dedup_ingest(coalesce(b1), store)
    assert {r["doc_id"] for r in out1.collect()} == {0, 2}
    out2 = incremental_dedup_ingest(coalesce(b2), store)
    # doc 1 (NULL) and doc 3 ('') both canonicalize to the stored ''
    # fingerprint from doc 0 — nothing survives batch 2
    assert out2.count() == 0


def test_incremental_rollup_mid_upsert_torn_write(spark, tmp_path):
    """r9 review: upsert_partitioned commits one partition directory at a
    time, so a crash can leave SOME touched partitions stamped with the
    batch id and others not. The replay guard must be PER PARTITION:
    re-merge exactly the unstamped partitions, pass the stamped ones
    through — a store-wide max(_batch_id) skip would silently lose the
    unstamped partitions' contribution."""
    import shutil

    from squrve_spark.sinks import incremental_rollup

    store = str(tmp_path / "store")
    aggs = {"n": "count(*)", "cents": "sum(c)"}
    b0 = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "day string, c long"
    )
    incremental_rollup(spark, b0, store, ["day"], aggs, "day", batch_id=0)
    b1 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "day string, c long"
    )
    incremental_rollup(spark, b1, store, ["day"], aggs, "day", batch_id=1)
    # simulate the torn batch-1 upsert: partition b reverts to its batch-0
    # state (stamped 0), partition a keeps its batch-1 state (stamped 1)
    snapshot = spark.read.parquet(store).localCheckpoint()
    shutil.rmtree(f"{store}/day=b")
    (
        snapshot.where("day = 'b'")
        .withColumn("n", F.lit(1).cast("long"))
        .withColumn("cents", F.lit(5).cast("long"))
        .withColumn("_batch_id", F.lit(0).cast("long"))
        .write.mode("append").partitionBy("day").parquet(store)
    )
    # replay batch 1 (what Structured Streaming does after the crash)
    out = incremental_rollup(spark, b1, store, ["day"], aggs, "day", batch_id=1)
    rows = {r["day"]: (r["n"], r["cents"]) for r in out.collect()}
    stored = {
        r["day"]: (r["n"], r["cents"], r["_batch_id"])
        for r in spark.read.parquet(store).collect()
    }
    # b re-merged exactly once more; a passed through untouched
    assert stored["a"] == (3, 31, 1), stored
    assert stored["b"] == (3, 10, 1), stored
    assert rows == {"a": (3, 31), "b": (3, 10)}
    # a FULL replay (every touched partition already stamped) is a no-op
    out2 = incremental_rollup(spark, b1, store, ["day"], aggs, "day", batch_id=1)
    assert {r["day"]: (r["n"], r["cents"]) for r in out2.collect()} == rows
    assert {
        r["day"]: (r["n"], r["cents"]) for r in spark.read.parquet(store).collect()
    } == rows


def _ingest_with_output(spark, batch, store, out_dir, batch_id):
    """The at-least-once foreachBatch caller shape: ingest (store append
    happens inside), then persist the survivors with an idempotent
    per-batch OVERWRITE — replays converge instead of duplicating."""
    from squrve_spark.sinks import incremental_dedup_ingest

    kept = incremental_dedup_ingest(batch, store, batch_id=batch_id)
    kept.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
    return kept


def test_incremental_dedup_torn_write_output_then_crash_before_append(
    spark, tmp_path
):
    """r10 (r9 verdict #6): crash BETWEEN the survivor output write and the
    fingerprint-store append. Torn state: the output sink has batch 1's
    survivors, the store does not have their fingerprints. The replay must
    re-select the SAME survivors (store can't disqualify them yet),
    re-write the output idempotently, and append each fingerprint exactly
    once — final store+output equal the uninterrupted run."""
    import shutil

    store = str(tmp_path / "fp_store")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    _ingest_with_output(spark, b0, store, out_dir, batch_id=0)
    b1 = spark.createDataFrame(
        [(10, "gamma delta"), (11, "epsilon zeta"), (12, "epsilon  ZETA")],
        "doc_id long, text string",
    )
    # uninterrupted reference run on a cloned store
    ref_store = str(tmp_path / "fp_store_ref")
    shutil.copytree(store, ref_store)
    ref_out = str(tmp_path / "out_ref")
    _ingest_with_output(spark, b1, ref_store, ref_out, batch_id=1)
    # torn delivery: survivors written to the output, store append "lost"
    # (simulated by snapshotting the store before the ingest and restoring
    # it after — the crash landed before the append's files committed)
    pre = str(tmp_path / "fp_store_pre")
    shutil.copytree(store, pre)
    _ingest_with_output(spark, b1, store, out_dir, batch_id=1)
    shutil.rmtree(store)
    shutil.copytree(pre, store)
    # resume: streaming replays batch 1
    kept = _ingest_with_output(spark, b1, store, out_dir, batch_id=1)
    assert {r["doc_id"] for r in kept.collect()} == {11}
    got_store = sorted(
        (r["_fp"], r["first_id"], r["_batch_id"])
        for r in spark.read.parquet(store).collect()
    )
    want_store = sorted(
        (r["_fp"], r["first_id"], r["_batch_id"])
        for r in spark.read.parquet(ref_store).collect()
    )
    assert got_store == want_store
    got_out = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out_dir}/batch=1").collect()
    )
    want_out = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{ref_out}/batch=1").collect()
    )
    assert got_out == want_out == [11]


def test_incremental_dedup_torn_write_append_then_crash_before_output(
    spark, tmp_path
):
    """The OTHER side of the seam: the store append committed but the
    caller crashed before persisting the survivors. Without the batch_id
    guard the replay returns 0 rows and the batch's documents are lost
    forever (the store already says "seen"); with it, fingerprints stamped
    by THIS batch do not disqualify their docs — the replay returns the
    identical survivor set and appends nothing new."""
    from squrve_spark.sinks import incremental_dedup_ingest

    store = str(tmp_path / "fp_store")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    _ingest_with_output(spark, b0, store, out_dir, batch_id=0)
    b1 = spark.createDataFrame(
        [(10, "gamma delta"), (11, "epsilon zeta"), (12, "epsilon  ZETA")],
        "doc_id long, text string",
    )
    # torn delivery: the ingest ran (store append committed) but the
    # output write never happened — the crash point is right after return
    first = incremental_dedup_ingest(b1, store, batch_id=1)
    assert {r["doc_id"] for r in first.collect()} == {11}
    n_store = spark.read.parquet(store).count()
    # resume: the replay must re-emit doc 11, not 0 rows
    kept = _ingest_with_output(spark, b1, store, out_dir, batch_id=1)
    assert {r["doc_id"] for r in kept.collect()} == {11}
    # and the store holds each fingerprint exactly once
    assert spark.read.parquet(store).count() == n_store
    fps = [r["_fp"] for r in spark.read.parquet(store).collect()]
    assert len(fps) == len(set(fps))
    got_out = {r["doc_id"] for r in spark.read.parquet(f"{out_dir}/batch=1").collect()}
    assert got_out == {11}
    # a DIFFERENT later batch is still deduped against batch 1's fps
    b2 = spark.createDataFrame([(20, "epsilon zeta")], "doc_id long, text string")
    assert incremental_dedup_ingest(b2, store, batch_id=2).count() == 0


def test_incremental_dedup_legacy_store_without_batch_id(spark, tmp_path):
    """A store written before the _batch_id column existed must keep
    deduplicating (mergeSchema path): its fingerprints read as NULL-stamped
    and disqualify docs from every later batch."""
    from squrve_spark.sinks import incremental_dedup_ingest

    store = str(tmp_path / "fp_store")
    legacy = spark.createDataFrame(
        [("x", 1)], "dummy string, dummy_id long"
    ).selectExpr("md5(lower(trim(regexp_replace('alpha beta', '\\\\s+', ' ')))) AS _fp",
                 "1::long AS first_id")
    legacy.write.parquet(store)
    b = spark.createDataFrame(
        [(5, "ALPHA   beta"), (6, "new text")], "doc_id long, text string"
    )
    kept = incremental_dedup_ingest(b, store, batch_id=3)
    assert {r["doc_id"] for r in kept.collect()} == {6}
