"""Streaming queries run to a deterministic batch result.

Each entry drains the full event source with Trigger.AvailableNow and
returns the final in-memory table — a real Structured Streaming execution
(stateful operators, watermarks) whose output is hash-checkable against the
same DuckDB SQL as the batch analog.

r12 (guide §1.2/§2.4): every entry passes ``no_data_batch=False`` — the
trailing zero-row micro-batch availableNow appends only advances the
watermark and runs state cleanup/timeouts, while these entries emit their
entire output during data batches (complete-mode re-emission; update-mode
applyInPandasWithState kernels with NoTimeout, which the engine only
invokes on data; append dedup/join emission on arrival/match). Output
verified row-identical with and without the batch for all seven stateful
shapes; the skip saves one full state-store reload+commit cycle per drain
(biggest for the dedup horizon store: 4.0 -> 2.3 s). Anything relying on
timeouts or watermark-driven emission (the TTL neardup variant) keeps the
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squrve_spark.plans.registry import register
from squrve_spark.streaming import (
    hourly_counts_stream,
    read_event_stream,
    run_stream_to_table,
    session_counts_stream,
    user_running_state_stream,
)


@register(
    "stream_hourly_counts",
    oracle="""
    SELECT event_type,
           epoch_us(ts) // 3600000000 AS bucket_hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "events", "window-agg"),
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-hour rollup executed as a stream (complete
    output mode so the finite replay yields every window)."""
    ev = read_event_stream(spark, sf_dir)
    return run_stream_to_table(
        hourly_counts_stream(ev), "complete", no_data_batch=False
    )


@register(
    "stream_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
    tags=("streaming", "events", "sessionize"),
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization run as a stream; session count
    per user. (session_window starts a NEW session when the gap is >= the
    duration, hence >= in the oracle — the batch q_events_sessionize uses
    the strict-> convention; both match when no gap is exactly 30 min.)"""
    ev = read_event_stream(spark, sf_dir)
    sessions = run_stream_to_table(
        session_counts_stream(ev), "complete", no_data_batch=False
    )
    return sessions.groupBy("user_id").agg(F.count("*").alias("n_sessions"))


@register(
    "stream_sliding_counts",
    oracle="""
    WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
    w AS (
        SELECT event_type,
               (t // 900000000 - i.i) * 900000000 AS win_start_us
        FROM e, LATERAL (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT event_type,
           win_start_us // 60000000 AS bucket_min,
           CAST(count(*) AS BIGINT) AS n_events
    FROM w GROUP BY 1, 2
    """,
    tags=("streaming", "events", "window-agg"),
    # deferred: the 50-slot driver cap is full; exact DuckDB parity runs in
    # tests/test_oracle_parity.py
    # rotated INTO the driver-checked 50 in r13 (r12 verdict task 8)
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1h window / 15min slide) per-type rollup run as a
    stream — each event contributes to 4 overlapping windows (the trending /
    rate-monitor shape; watermark bounds the 4x state overlap)."""
    from squrve_spark.streaming.ops import sliding_counts_stream

    ev = read_event_stream(spark, sf_dir)
    return run_stream_to_table(
        sliding_counts_stream(ev), "complete", no_data_batch=False
    )


@register(
    "stream_user_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS purchase_cents
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "events", "stateful"),
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) draining the event
    stream; final per-user running totals. Update-mode emissions are
    collapsed to the last state per user (max is exact: totals only grow)."""
    ev = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(
        user_running_state_stream(ev), "update", no_data_batch=False
    )
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("purchase_cents").alias("purchase_cents"),
    )


@register(
    "stream_dedup",
    # single-delivery batch counts: if the streaming dedup is exact, the
    # doubled stream collapses back to these
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "dedup"),
    # deferred (r10 rotation): long-stable driver row; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under duplicated delivery: the event stream unioned
    with itself (every row delivered twice) passes through
    dropDuplicatesWithinWatermark on event_id; per-type counts must equal
    the single-delivery batch counts."""
    from squrve_spark.streaming.ops import dedup_stream

    # project BEFORE dedup: the state store holds full rows per key, so
    # carrying only (event_id, ts, event_type) instead of all 7 columns
    # halves per-key state — the lever that matters when the horizon holds
    # billions of keys
    cols = ["event_id", "ts", "event_type"]
    ev = read_event_stream(spark, sf_dir).select(*cols)
    doubled = ev.union(read_event_stream(spark, sf_dir).select(*cols))
    deduped = run_stream_to_table(
        dedup_stream(doubled), "append", no_data_batch=False
    )
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_events"))


@register(
    "stream_attribution",
    # batch analog of the stream-stream interval join: a DuckDB range join
    # (verified via pytest parity; deferred — the driver's 50-slot cap is full)
    oracle="""
    SELECT r.user_id AS r_user,
           CAST(COUNT(DISTINCT r.event_id) AS BIGINT) AS n_attributed_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_view_purchase_pairs
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'view' AND r.event_type = 'purchase'
     AND l.ts <= r.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    GROUP BY r.user_id
    """,
    tags=("streaming", "join"),
    defer_oracle=False,  # r12: rotated INTO the driver-checked 50 (never driver-checked before)
)
def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view -> purchase within 1 h, per user),
    reduced to attributed-purchase counts per user; DuckDB range-join parity
    via the deferred oracle in tests/test_oracle_parity.py."""
    from squrve_spark.streaming.ops import interval_join_stream

    ev = read_event_stream(spark, sf_dir)
    joined = run_stream_to_table(
        interval_join_stream(ev), "append", no_data_batch=False
    )
    return joined.groupBy("r_user").agg(
        F.countDistinct("r_event").alias("n_attributed_purchases"),
        F.count("*").alias("n_view_purchase_pairs"),
    )


@register(
    "stream_enrich",
    # batch analog of the stream-static feature join (deferred: driver cap
    # is full; exact parity in tests/test_oracle_parity.py)
    oracle="""
    WITH user_feat AS (
        SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(f.user_total) AS BIGINT) AS sum_user_total
    FROM events e JOIN user_feat f USING (user_id)
    GROUP BY e.event_type
    """,
    tags=("streaming", "join"),
    # rotated INTO the driver-checked 50 in r13 (r12 verdict task 8)
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: each streamed event picks up a static
    per-user feature row (broadcast map-side hash join, no state store),
    then rolls up per event type. The canonical feature-store shape."""
    from squrve_spark.catalog import load_table, memo_checkpoint
    from squrve_spark.streaming import enrich_stream

    # checkpoint the static side: a stream-static join re-executes the
    # static plan EVERY micro-batch; materializing the aggregate once turns
    # each batch's work into a broadcast-hash probe only
    feat = memo_checkpoint(
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )
    ev = read_event_stream(spark, sf_dir).select("user_id", "event_type")
    enriched = enrich_stream(ev, feat, on=["user_id"], how="inner")
    agg = enriched.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("user_total").alias("sum_user_total"),
    )
    return run_stream_to_table(agg, "complete", no_data_batch=False)


@register(
    "stream_anomaly",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, value,
               epoch_us(ts) AS t
        FROM events
    ),
    s AS (
        SELECT event_id, user_id, value,
               avg(value)        OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(*)          OVER w AS k
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(k AS BIGINT) AS n_prior,
           COALESCE(k >= 2 AND sd > 0 AND value > mu + 3 * sd, FALSE)
               AS is_anomaly
    FROM s
    """,
    tags=("streaming", "events", "stateful"),
    # deferred: driver cap full. The compared columns are INTEGER/BOOLEAN
    # only (no float z-scores) so Welford-vs-window float-path differences
    # cannot produce hash mismatches off the 3-sigma boundary; exact parity
    # in tests/test_oracle_parity.py.
    # r11: rotated out of the driver 50 (long-stable survivor, r10 verdict
    # task 1); oracle still enforced exactly by tests/test_oracle_parity.py
    defer_oracle=True,
)
def stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming anomaly detection (value > mean + 3 stddev of the
    user's PRIOR history) via applyInPandasWithState Welford state — the
    incremental rolling-statistics shape built-in windowed aggs can't
    express. availableNow single-batch drain makes the flags deterministic."""
    from squrve_spark.streaming.ops import anomaly_stream

    ev = read_event_stream(spark, sf_dir)
    return run_stream_to_table(
        anomaly_stream(ev), "update", no_data_batch=False
    )


@register(
    "stream_top_keys",
    oracle=r"""
    SELECT CAST(regexp_extract(props, '(\d+)', 1) AS INTEGER) AS k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1 ORDER BY n DESC, k LIMIT 20
    """,
    tags=("streaming", "events"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    # rotated INTO the driver-checked 50 in r13 (r12 verdict task 8)
)
def stream_top_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: incremental per-key counts over the parsed
    props payload (complete mode, one counter per distinct key), exact
    top-20 selected on the drained batch result (count desc, key asc)."""
    from squrve_spark.streaming.ops import top_keys_stream

    ev = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(
        top_keys_stream(ev), "complete", no_data_batch=False
    )
    return out.orderBy(F.col("n").desc(), "k").limit(20)


@register(
    "stream_scd2",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    marked AS (
      SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      FROM e
    ),
    changes AS (SELECT * FROM marked WHERE prev IS NULL OR event_type <> prev)
    SELECT user_id,
           event_type AS status,
           CAST(us AS BIGINT) AS valid_from_us,
           CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS valid_to_us,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS version,
           (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL) AS is_current
    FROM changes
    """,
    tags=("streaming", "events", "stateful", "warehouse"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=False,  # r12: rotated INTO the driver-checked 50 (never driver-checked before)
)
def stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming type-2 SCD maintenance (r5): the event stream drains
    through `scd2_stream` (applyInPandasWithState, 3 values of state per
    user) and the update-mode emissions collapse to the final history —
    per (user, version), MAX(valid_to_us) keeps the closing emission when
    one exists (max ignores the open row's null). The result equals the
    batch q_events_scd2 exactly; the oracle IS the batch SQL."""
    from squrve_spark.streaming.ops import scd2_stream

    ev = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(
        scd2_stream(ev),
        "update",
        parts=spark.sparkContext.defaultParallelism,
        no_data_batch=False,
    )
    return (
        out.groupBy("user_id", "version")
        .agg(
            F.max("status").alias("status"),
            F.min("valid_from_us").alias("valid_from_us"),
            F.max("valid_to_us").alias("valid_to_us"),
        )
        .select(
            "user_id",
            "status",
            F.col("valid_from_us").cast("long").alias("valid_from_us"),
            F.col("valid_to_us").cast("long").alias("valid_to_us"),
            F.col("version").cast("long").alias("version"),
            F.col("valid_to_us").isNull().alias("is_current"),
        )
    )


@register(
    "stream_merge_apply",
    # the oracle IS the batch CDC merge-apply SQL: the collapsed drain must
    # equal the batch final state exactly
    oracle="""
    WITH ops AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events
      WHERE event_type IN ('signup', 'click', 'purchase', 'error')
    ),
    numbered AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      FROM ops
    ),
    marked AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'error' THEN rn END)
                 OVER (PARTITION BY user_id) AS del_rn
      FROM numbered
    ),
    live AS (SELECT * FROM marked WHERE rn > COALESCE(del_rn, 0))
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_live_ops,
           CAST(ROUND(CAST(SUM(CASE WHEN event_type IN ('click', 'purchase')
                     THEN CAST(value AS DECIMAL(18, 6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
                AS DOUBLE), 6) AS DOUBLE) AS balance,
           CAST(MAX(us) AS BIGINT) AS last_op_us
    FROM live GROUP BY user_id
    """,
    tags=("streaming", "events", "stateful", "cdc", "warehouse"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    # rotated INTO the driver-checked 50 in r13 (r12 verdict task 8)
)
def stream_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC MERGE-apply (r6): the event stream drains through
    `merge_apply_stream` (applyInPandasWithState, four scalars of state per
    user — exact decimal balance as integer micros) and the update-mode
    snapshots collapse to each user's LAST emission (max emit_seq), with
    dead rows (log ends in a tombstone) dropped. The result equals the
    batch q_events_merge_apply exactly; the oracle IS the batch SQL."""
    from squrve_spark.streaming.ops import merge_apply_stream

    ev = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(
        merge_apply_stream(ev),
        "update",
        parts=spark.sparkContext.defaultParallelism,
        no_data_batch=False,
    )
    w = W.partitionBy("user_id").orderBy(F.col("emit_seq").desc())
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & F.col("alive"))
        .select(
            "user_id",
            F.col("n_live_ops").cast("long").alias("n_live_ops"),
            F.col("balance").cast("double").alias("balance"),
            F.col("last_op_us").cast("long").alias("last_op_us"),
        )
    )


@register(
    "stream_value_quantiles",
    # oracle=None blocked by: stateful Structured Streaming drain through a KLL sketch store — not a batch SQL statement
    oracle=None,
    tags=("streaming", "sketch", "no-oracle"))
def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentile monitoring with CONSTANT state (r6): the event
    stream drains through foreachBatch into `sketches.incremental_quantiles`
    — per micro-batch, values are KLL-sketched JVM-side and merged into a
    persisted per-event_type sketch store (#groups x O(k log n) bytes; raw
    history never re-read). Output: approximate p50/p90/p99 of `value` per
    event_type from the merged sketches. Rows-only: KLL is randomized
    within its rank-error bound; tests/test_streaming.py asserts every
    estimate sits within rank error of the exact percentile and that the
    store holds exactly one row per event_type."""
    import tempfile

    from squrve_spark.operators.sketches import incremental_quantiles
    from squrve_spark.streaming.ops import _scratch_root, read_event_stream

    # scratch-backed (r13): throwaway checkpoint + per-call sketch store —
    # see streaming.ops._scratch_root for the fsync rationale
    work = tempfile.mkdtemp(prefix="squrve_kll_stream_", dir=_scratch_root())
    store = f"{work}/store"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # batch_id makes the merge idempotent under foreachBatch's
        # at-least-once replay (r7, ADVICE)
        incremental_quantiles(
            spark, batch_df, store, "value", ["event_type"], batch_id=batch_id
        )

    ev = read_event_stream(spark, sf_dir)
    # r12: skip the trailing zero-row micro-batch — it would invoke
    # handle(empty, 1), a full store read+merge+rewrite job that cannot
    # change any sketch (zero values merged); store contents identical
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            ev.writeStream.foreachBatch(handle)
            .option("checkpointLocation", f"{work}/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
        )
    return (
        spark.read.parquet(store)
        .select("event_type", "p50", "p90", "p99")
        .orderBy("event_type")
    )


@register(
    "stream_lm_ppl_monitor",
    # oracle=None blocked by: stateful streaming drain + KLL quantile store
    # — not a batch SQL statement; batch-vs-stream equivalence is asserted
    # in tests/test_streaming.py
    oracle=None,
    tags=("streaming", "curation", "sketch", "no-oracle"),
)
def stream_lm_ppl_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-quality monitor (r7): each documents micro-batch is
    scored against the bigram LM trained on the reference slice
    (`operators/lm.py` — same model as batch `doc_lm_perplexity`) and the
    per-doc perplexities merge into the persisted per-source KLL store
    (`sketches.incremental_quantiles`, batch_id-idempotent). The production
    shape of "alert when a crawl source's perplexity distribution drifts":
    state is #sources x O(k log n) sketch bytes, raw history never re-read,
    the model join is per-batch and broadcastable. Output: approximate
    p50/p90/p99 perplexity per source. Rows-only: KLL is randomized within
    its rank-error bound; tests/test_streaming.py asserts the estimates sit
    within rank error of the exact batch scoring and one store row per
    source."""
    import tempfile

    from squrve_spark.catalog import load_table
    from squrve_spark.operators import lm
    from squrve_spark.operators.sketches import incremental_quantiles
    from squrve_spark.streaming.ops import _scratch_root

    from squrve_spark.catalog import memo_checkpoint

    docs = load_table(spark, sf_dir, "documents")
    bigrams, contexts, vocab = lm.train_bigram_lm(
        docs.where(F.col("doc_id") % 5 == 0)
    )
    # the model is re-read by every micro-batch join: materialize it ONCE
    # per corpus snapshot (r12 — memo_checkpoint instead of a per-call
    # cache()/unpersist() cycle, which re-materialized the identical
    # trained model on every invocation; the model is a trained artifact,
    # same contract as the memoized DSIR weights / PQ codebooks)
    bigrams = memo_checkpoint(bigrams)
    contexts = memo_checkpoint(contexts)

    # scratch-backed (r13): throwaway checkpoint + per-call KLL store
    work = tempfile.mkdtemp(prefix="squrve_ppl_stream_", dir=_scratch_root())
    store = f"{work}/store"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        scored = lm.score_perplexity(batch_df, bigrams, contexts, vocab).join(
            batch_df.select("doc_id", "source"), "doc_id"
        )
        incremental_quantiles(
            spark, scored, store, "ppl", ["source"], batch_id=batch_id
        )

    from squrve_spark.streaming.ops import _source_schema

    stream = (
        spark.readStream.schema(
            _source_schema(spark, sf_dir, "documents.parquet")
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # r12: skip the trailing zero-row micro-batch (see
    # stream_value_quantiles — an empty-batch handle invocation is a full
    # model-join + store-merge job that cannot change the store)
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", f"{work}/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
        )
    return (
        spark.read.parquet(store)
        .select("source", "p50", "p90", "p99")
        .orderBy("source")
    )


@register(
    "stream_neardup",
    # the batch SimHash pair set IS the oracle: the streaming banding's
    # emitted pair set is batching-invariant (each unordered pair fires
    # once per shared bucket when its later member arrives; distinct
    # collapses multi-bucket hits), and the pigeonhole recall contract
    # guarantees no hamming<=3 pair is missed — so an online run over the
    # corpus must reproduce exactly the all-pairs computation
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(
                   regexp_split_to_array(trim(text), '\s+'))) AS t
        FROM documents
    ), h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS hv
        FROM tok
    ), votes AS (
        SELECT doc_id, b.b,
               sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM h, (SELECT unnest(range(64)) AS b) b
        GROUP BY 1, 2
    ), sig AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 AND b < 32
                        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo,
               sum(CASE WHEN s > 0 AND b >= 32
                        THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi
        FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    ORDER BY id_a, id_b
    """,
    tags=("streaming", "dedup"),
    defer_oracle=False,  # r12: rotated INTO the driver-checked 50 (never driver-checked before)
)
def stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate detection at ingest: the document stream
    flows through map-side SimHash signatures into stateful pigeonhole
    buckets (streaming/ops.py:simhash_neardup_stream); emitted pairs,
    distinct-collapsed across buckets, must equal the BATCH SimHash sweep
    (dedup_simhash) — online dedup with no recall loss."""
    from squrve_spark.streaming.ops import (
        read_document_stream,
        run_stream_to_files,
        simhash_neardup_stream,
    )

    # r12 (guide §5 driver rule + §2.5): this stream emits ~400k pair rows
    # per drain at sf0.1 — the memory sink would collect them all to the
    # driver. Drain through the executor-parallel parquet sink instead
    # (the updater only emits new pairs, so append mode is semantics-
    # preserving — see simhash_neardup_stream), and spread the ~18k
    # stateful buckets over the session's actual parallelism instead of
    # the fixed local state-store constant (scale-adaptive: local[8]
    # gets 8, local[32] gets 32, a cluster gets its own setting).
    # Measured 5.0 -> ~3.2 s steady; emitted pair set identical.
    docs = read_document_stream(spark, sf_dir)
    out = run_stream_to_files(
        simhash_neardup_stream(docs, output_mode="append"),
        parts=spark.sparkContext.defaultParallelism,
        no_data_batch=False,
    )
    return (
        out.select("id_a", "id_b", "hamming").distinct().orderBy("id_a", "id_b")
    )
