"""HLL distinct-count sketches: accuracy vs exact, merge associativity,
partitioning/rerun determinism, and cross-batch incremental maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.operators import sketches
from tests.conftest import SF_MED


def test_sketch_estimates_close_to_exact_and_deterministic(spark):
    ev = load_table(spark, SF_MED, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    sk = sketches.distinct_sketch(ev, "user_id", ["event_type"])
    est = {r["event_type"]: r["n_distinct_est"] for r in sk.collect()}
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])

    # determinism across partitionings and reruns (hash-based, order-free)
    re = sketches.distinct_sketch(ev.repartition(7), "user_id", ["event_type"])
    assert {r["event_type"]: r["n_distinct_est"] for r in re.collect()} == est


def test_union_estimate_rolls_up(spark):
    ev = load_table(spark, SF_MED, "events")
    sk = sketches.distinct_sketch(ev, "user_id", ["event_type"])
    total = sketches.union_estimate(sk, []).first()["n_distinct_est"]
    exact_total = ev.agg(F.countDistinct("user_id")).first()[0]
    assert abs(total - exact_total) / exact_total < 0.05
    # union of per-group sketches must NOT be the sum of estimates
    # (the whole point: users appear under several event types)
    assert total < sum(
        r["n_distinct_est"] for r in sk.collect()
    )


def test_incremental_distinct_matches_single_shot(spark, tmp_path):
    """Three batches merged through the persisted store must estimate the
    same as one sketch over the concatenation, and untouched groups pass
    through unchanged."""
    ev = load_table(spark, SF_MED, "events").select("event_type", "user_id")
    store = str(tmp_path / "sk_store")
    batches = [
        ev.filter("user_id % 3 = 0"),
        ev.filter("user_id % 3 = 1"),
        ev.filter("user_id % 3 = 2"),
    ]
    for b in batches:
        sketches.incremental_distinct(spark, b, store, "user_id", ["event_type"])
    final = {
        r["event_type"]: r["n_distinct_est"]
        for r in spark.read.parquet(store)
        .withColumn("n_distinct_est", F.hll_sketch_estimate("sketch").cast("long"))
        .collect()
    }
    single = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketches.distinct_sketch(ev, "user_id", ["event_type"]).collect()
    }
    assert final == single  # HLL union is exact-associative, not approximate-associative

    # a batch touching ONE group leaves the others' stored sketches intact
    before = {
        r["event_type"]: bytes(r["sketch"])
        for r in spark.read.parquet(store).collect()
    }
    one = ev.filter("event_type = 'click'").limit(10)
    sketches.incremental_distinct(spark, one, store, "user_id", ["event_type"])
    after = {
        r["event_type"]: bytes(r["sketch"])
        for r in spark.read.parquet(store).collect()
    }
    for k in before:
        if k != "click":
            assert after[k] == before[k]


def test_streaming_incremental_distinct_via_foreachbatch(spark, tmp_path):
    """The streaming integration: micro-batches drain through foreachBatch
    into the persisted sketch store; after the stream finishes, the store's
    estimates equal a single-shot sketch of the whole source — distinct
    counts maintained incrementally over a stream, which exact
    COUNT(DISTINCT) cannot do without unbounded state."""
    from squrve_spark.streaming.ops import read_event_stream

    store = str(tmp_path / "stream_sk")
    # the fixture ships ONE parquet file = one micro-batch; rewrite it as
    # three files so maxFilesPerTrigger=1 actually produces THREE batches
    # and the store-merge branch (not just first-write) is exercised
    src = str(tmp_path / "multi")
    load_table(spark, SF_MED, "events").repartition(3).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) >= 3
    ev = read_event_stream(spark, src, max_files_per_trigger=1, glob="part-*.parquet")
    q = (
        ev.select("event_type", "user_id")
        .writeStream.foreachBatch(
            lambda b, _id: sketches.incremental_distinct(
                b.sparkSession, b, store, "user_id", ["event_type"]
            )
            and None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    final = {
        r["event_type"]: r["n_distinct_est"]
        for r in spark.read.parquet(store)
        .withColumn("n_distinct_est", F.hll_sketch_estimate("sketch").cast("long"))
        .collect()
    }
    batch = load_table(spark, SF_MED, "events")
    single = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketches.distinct_sketch(batch, "user_id", ["event_type"]).collect()
    }
    assert final == single


def test_theta_audience_overlap_exact_below_threshold(spark):
    """Theta sketches are exact below their nominal-entries threshold, so
    on the fixture the five set-op estimates must EQUAL the exact
    cardinalities — including intersection and difference, which HLL
    cannot express at all."""
    ev = load_table(spark, SF_MED, "events")
    seg_a = (F.col("event_type") == "purchase") & (F.col("value") > 300)
    seg_b = F.col("event_type") == "error"
    got = sketches.audience_overlap(ev, "user_id", seg_a, seg_b).first()

    a = {
        r[0]
        for r in ev.filter(seg_a).select("user_id").distinct().collect()
    }
    b = {
        r[0]
        for r in ev.filter(seg_b).select("user_id").distinct().collect()
    }
    assert 0 < len(a) < len(b)  # non-degenerate segments on the fixture
    assert got["est_a"] == len(a)
    assert got["est_b"] == len(b)
    assert got["est_union"] == len(a | b)
    assert got["est_intersection"] == len(a & b)
    assert got["est_a_minus_b"] == len(a - b)


def test_kll_quantile_sketch_accuracy_and_merge(spark):
    """Per-group KLL quantiles land near the exact percentiles, and the
    MERGED global sketch (quantiles don't compose — sketches do) lands
    near the exact global percentiles."""
    ev = load_table(spark, SF_MED, "events")
    sk = sketches.quantile_sketch(ev, "value", ["event_type"], [0.5, 0.95])
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    span = ev.agg(F.max("value") - F.min("value")).first()[0]
    for r in sk.collect():
        e50, e95 = exact[r["event_type"]]
        assert abs(r["p50"] - e50) / span < 0.02
        assert abs(r["p95"] - e95) / span < 0.02

    g = sketches.merge_quantiles(sk, [], [0.5, 0.95]).first()
    g50, g95 = (
        ev.agg(
            F.expr("percentile(value, 0.5)"), F.expr("percentile(value, 0.95)")
        ).first()
    )
    assert abs(g["p50"] - g50) / span < 0.02
    assert abs(g["p95"] - g95) / span < 0.02


def test_incremental_stores_skip_replayed_batch(spark, tmp_path):
    """r7 (ADVICE): foreachBatch is at-least-once — a retried micro-batch
    re-invokes the handler with the SAME batch_id. With batch_id passed,
    both incremental stores must skip the replay instead of double-merging
    (estimates identical before/after the replay); a NEW id still merges."""
    from pyspark.sql import functions as F

    rows = [(i, "click", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")

    q_store = str(tmp_path / "kll")
    sketches.incremental_quantiles(spark, df, q_store, "value", ["event_type"], batch_id=0)
    before = spark.read.parquet(q_store).select("p50", "p90", "p99").first()
    # replay of batch 0 with different data must be a no-op
    shifted = df.withColumn("value", F.col("value") + 1000.0)
    sketches.incremental_quantiles(spark, shifted, q_store, "value", ["event_type"], batch_id=0)
    after = spark.read.parquet(q_store).select("p50", "p90", "p99").first()
    assert before == after
    # a new batch id merges (p99 moves up into the shifted range)
    sketches.incremental_quantiles(spark, shifted, q_store, "value", ["event_type"], batch_id=1)
    moved = spark.read.parquet(q_store).select("p99").first()["p99"]
    assert moved > 900

    d_store = str(tmp_path / "hll")
    sketches.incremental_distinct(spark, df, d_store, "user_id", ["event_type"], batch_id=0)
    b = spark.read.parquet(d_store).select("n_distinct_est").first()[0]
    more = spark.createDataFrame(
        [(i + 10_000, "click", 0.0) for i in range(200)],
        "user_id long, event_type string, value double")
    sketches.incremental_distinct(spark, more, d_store, "user_id", ["event_type"], batch_id=0)
    assert spark.read.parquet(d_store).select("n_distinct_est").first()[0] == b
    sketches.incremental_distinct(spark, more, d_store, "user_id", ["event_type"], batch_id=1)
    assert spark.read.parquet(d_store).select("n_distinct_est").first()[0] > b


def test_incremental_store_replay_returns_touched_groups_only(spark, tmp_path):
    """r8 (ADVICE): the replay-skip path must honor the same return
    contract as first delivery — ONLY the replayed batch's groups, not the
    whole prior store, so a foreachBatch caller consuming the return value
    sees identical row sets on first delivery and on replay."""
    two = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0)],
        "user_id long, event_type string, value double",
    )
    click_only = two.filter("event_type = 'click'")

    for fn, key in (
        (sketches.incremental_distinct, "user_id"),
        (sketches.incremental_quantiles, "value"),
    ):
        store = str(tmp_path / f"store_{key}")
        first = fn(spark, click_only, store, key, ["event_type"], batch_id=0)
        assert {r["event_type"] for r in first.collect()} == {"click"}
        # seed a second group under a new batch id
        fn(spark, two.filter("event_type = 'view'"), store, key,
           ["event_type"], batch_id=1)
        # replay batch 0: store now holds BOTH groups, return must not
        replay = fn(spark, click_only, store, key, ["event_type"], batch_id=0)
        assert {r["event_type"] for r in replay.collect()} == {"click"}
