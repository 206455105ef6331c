"""Analytics extensions: grouping sets, pivot, array aggregation, and
event-log windowing/sessionization.

These go beyond the reference's sqlite surface (SURVEY §2.A notes A17 as
dialect-only) — they're first-class here because Spark has native support and
the target workload (large-scale log/event analytics) needs them.

Events timestamps: the fixture's ``ts`` encoding has varied across driver
generations (TIMESTAMP(NANOS), timestamp[us]/NTZ). ``catalog.
normalize_events_time`` adapts to whichever arrives and always exposes
``ts_ns`` (epoch-nanos long); every derived time value here is computed from
the microsecond basis (``ts_ns div 1000`` == DuckDB ``epoch_us(ts)``) so
Spark and the DuckDB oracle are engine-identical regardless of encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table
from squrve_spark.functions import dexact, money
from squrve_spark.plans.registry import register

US_PER_HOUR = 3_600_000_000


@register(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
    FROM region
    JOIN nation ON r_regionkey = n_regionkey
    JOIN customer ON n_nationkey = c_nationkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("A8", "rollup"),
    # rotated out of the 50-slot driver cap late in r4 for doc_signals —
    # A8 stays driver-checked via q_grouping_sets/q_having_distinct/
    # q_join_agg; this keeps exact pytest parity.
    defer_oracle=True,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: per-nation, per-region subtotal, grand total."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .join(c, n.n_nationkey == c.c_nationkey)
        .rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "q_pivot",
    oracle="""
    SELECT year(o_orderdate) AS yr,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders
    GROUP BY 1
    """,
    tags=("A8", "pivot"),
    # deferred (r10 rotation): long-stable driver row; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders by status into wide yearly counts (explicit value list —
    at scale, never let pivot infer distinct values with an extra job)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "q_array_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
    tags=("A17",),
    # rotated out of the driver cap in round 4 for doc_numeric_profile;
    # exact parity stays in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG surface: collect + canonical sort (collect_list order is
    partition-dependent; sort_array makes it deterministic), joined to string
    so the hash compare is representation-stable across engines."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@register(
    "q_events_hourly",
    oracle="""
    SELECT event_type,
           epoch_us(ts) // 3600000000 AS bucket_hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg"),
    # rotated out of the driver cap in round 4 for doc_ngram_freq: the same
    # hourly rollup is driver-checked as stream_hourly_counts (identical
    # counts at every fixture SF); exact parity stays in test_oracle_parity
    defer_oracle=True,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly rollup of the event log (batch form of the streaming
    window in squrve_spark.streaming). Value summed as floor-cents BIGINT —
    double sums are partitioning-order-dependent, integer sums are exact."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("bucket_hr", F.expr(f"(ts_ns div 1000) div {US_PER_HOUR}"))
        .groupBy("event_type", "bucket_hr")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_events_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
    tags=("events", "sessionize"),
    # r11: rotated out of the driver 50 (long-stable survivor, r10 verdict
    # task 1); oracle still enforced exactly by tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session count per user via lag window.
    One shuffle on user_id; the streaming analog (session window +
    watermark) lives in squrve_spark.streaming."""
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts_ns div 1000"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1).otherwise(0),
    )
    return gapped.groupBy("user_id").agg((1 + F.sum("new_session")).alias("n_sessions"))


@register(
    "q_events_user_ltv",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS purchase_cents,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_seen_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_seen_us
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    """,
    tags=("events",),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_user_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime rollup with conditional aggregation over event types."""
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts_ns div 1000"))
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("purchase_cents"),
            F.min("ts_us").alias("first_seen_us"),
            F.max("ts_us").alias("last_seen_us"),
        )
        .filter(F.col("n_events") >= 3)
    )


@register(
    "q_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS t,
                      CAST(FLOOR(value * 100) AS BIGINT) AS click_cents
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.t,
           c.click_cents, c.t AS click_t
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
    """,
    tags=("events", "asof-join"),
    # deferred (r7 rotation): long-stable driver row; exact parity kept
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase enriched with the latest prior
    click per user (union + single window pass — one shuffle, no join
    fan-out; squrve_spark.operators.temporal)."""
    from squrve_spark.operators import temporal

    e = load_table(spark, sf_dir, "events").withColumn("t", F.expr("ts_ns div 1000"))
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "t")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("t"),
        F.floor(F.col("value") * 100).cast("long").alias("click_cents"),
    )
    out = temporal.asof_join(
        purchases, clicks, ["user_id"], "t", "t", ["click_cents", "t"], suffix="_c"
    )
    return out.select(
        "event_id", "user_id", "t",
        F.col("click_cents_c").alias("click_cents"),
        F.col("t_c").alias("click_t"),
    )


@register(
    "q_time_range_pairs",
    oracle="""
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
    """,
    tags=("events", "range-join"),
    # deferred (r7 rotation): long-stable driver row; exact parity kept
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_time_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-proximity pairs (same user within 1 h) via cell-blocked
    equi-join instead of a per-user cross join."""
    from squrve_spark.operators import temporal

    e = load_table(spark, sf_dir, "events").withColumn("t", F.expr("ts_ns div 1000"))
    return temporal.time_range_pairs(e, ["user_id"], "t", "event_id", 3_600_000_000)


@register(
    "q_events_funnel",
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    tags=("events", "funnel"),
    defer_oracle=True,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click after view -> purchase
    after that click): per-stage user counts where each stage's event must
    occur at-or-after the user's previous stage time.

    Shape: ONE events scan. Cumulative RANGE windows per user carry the
    earliest view at-or-before each event (``t1m``) and then the earliest
    view-qualified click at-or-before each event (``t2m``) — an event
    qualifies for its stage exactly when the previous stage's carry is
    non-null. RANGE frames (value-based) make equal-timestamp peers
    deterministic. The per-user flag aggregate is co-partitioned with the
    window shuffle, so the whole funnel is one exchange + one sort — the
    naive per-stage join formulation (the oracle SQL) replays the events
    scan per stage and is equivalent, which the parity test proves."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("t")
    )
    cum = (
        W.partitionBy("user_id").orderBy("t")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    is_view = F.col("event_type") == "view"
    e = e.withColumn("t1m", F.min(F.when(is_view, F.col("t"))).over(cum))
    qual_click = (F.col("event_type") == "click") & F.col("t1m").isNotNull()
    e = e.withColumn("t2m", F.min(F.when(qual_click, F.col("t"))).over(cum))
    qual_purchase = (F.col("event_type") == "purchase") & F.col("t2m").isNotNull()
    per_user = e.groupBy("user_id").agg(
        F.max(is_view.cast("int")).alias("f1"),
        F.max(qual_click.cast("int")).alias("f2"),
        F.max(qual_purchase.cast("int")).alias("f3"),
    )
    return per_user.agg(
        F.sum("f1").cast("bigint").alias("1_view"),
        F.sum("f2").cast("bigint").alias("2_click"),
        F.sum("f3").cast("bigint").alias("3_purchase"),
    ).selectExpr(
        "stack(3, '1_view', `1_view`, '2_click', `2_click`, "
        "'3_purchase', `3_purchase`) AS (stage, n_users)"
    )


@register(
    "q_events_rolling",
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS t_us,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_1h
    FROM events
    """,
    tags=("events", "rolling-window"),
    defer_oracle=True,
)
def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user spend (RANGE window frame — value-based, so
    equal-timestamp peers aggregate identically on every engine; summed as
    floor-cents BIGINT because double sums are order-dependent).

    Shape: ONE shuffle on user_id + one sort — the native windowed
    analytics path; at scale the frame is bounded by each user's 1-hour
    event density, not their history length."""
    e = load_table(spark, sf_dir, "events").withColumn("t_us", F.expr("ts_ns div 1000"))
    w = (
        W.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-US_PER_HOUR, 0)
    )
    return e.select(
        "event_id", "user_id", "t_us",
        F.sum(F.floor(F.col("value") * 100).cast("long")).over(w)
        .cast("bigint").alias("cents_1h"),
    )


@register(
    "q_events_retention",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
    SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
           CAST(e.day - f.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "analytics"),
    # deferred: the 50-slot driver cap is full; exact DuckDB parity in
    # tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    distinct actives per (cohort_day, day_offset) — the standard
    growth-analytics triangle.

    Shape: the cohort day is a MIN window over user_id — ONE shuffle on
    user_id, no events-vs-events self-join (the naive formulation scans
    and shuffles twice); the final (cohort, offset) distinct-count is the
    second and last shuffle, keyed on a small composite."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000 div 86400000000").alias("day")
    )
    w = W.partitionBy("user_id")
    cohorted = e.withColumn("cohort_day", F.min("day").over(w))
    return (
        cohorted.groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


@register(
    "q_events_resample",
    oracle="""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS b,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    a AS (SELECT b, COUNT(*) AS n, SUM(cents) AS c FROM e GROUP BY b),
    g AS (
        SELECT unnest(range((SELECT MIN(b) FROM a),
                            (SELECT MAX(b) FROM a) + 1)) AS b
    )
    SELECT CAST(g.b AS BIGINT) AS bucket_hr,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(a.c, 0) AS BIGINT) AS value_cents
    FROM g LEFT JOIN a USING (b)
    """,
    tags=("events", "analytics"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling: EVERY hour bucket between the corpus
    min and max appears, empty ones as zeros — the regularized series a
    monitoring/forecast consumer needs (a groupBy alone silently drops
    empty buckets).

    Shape: one agg shuffle on bucket; the dense bucket grid comes from a
    1-row min/max scalar broadcast exploded through `sequence` (same
    sanctioned 1-row-broadcast pattern as bm25's corpus stats) and left-
    joins the sparse aggregate — grid size is (time span / granularity),
    independent of event count."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000 div 3600000000").alias("b"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = e.groupBy("b").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    bounds = agg.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b")
    )
    return (
        grid.join(agg, "b", "left")
        .select(
            F.col("b").cast("long").alias("bucket_hr"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("value_cents"),
        )
    )


@register(
    "q_events_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(max(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("events", "variant"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py,
    # deferred (r10 rotation): long-stable driver row; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics via Spark 4 VARIANT: parse_json on
    the props column ONCE into the binary variant encoding, typed
    variant_get extraction, aggregate per event type — the schema-on-read
    path for ingesting JSON event payloads without a fixed schema (at
    scale, parse once at ingest and store the variant column; shredded
    parquet reads then prune untouched fields). DuckDB oracle uses its
    native JSON operators on the same payloads."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(k.cast("long")).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_events_ewma",
    oracle="""
    WITH arr AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id)
                   AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(ROUND(list_reduce(vals,
                (a, b) -> CAST(0.9 AS DOUBLE) * a + CAST(0.1 AS DOUBLE) * b),
                6) AS DOUBLE) AS ewma
    FROM arr
    """,
    tags=("events", "timeseries"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event value
    (alpha = 0.1, seeded at the first observation) — the RECURSIVE
    smoothing shape windowed aggregates can't express: an ordered
    higher-order fold over the user's timeline. One user-key shuffle;
    fold is left-to-right so DuckDB's list_reduce replays the exact
    double arithmetic (identical multiply order, identical constants).
    Per-key timelines must fit a task — same bound as every sequence op
    here; see asof_join's chunked variant for the hot-key escape hatch."""
    ev = load_table(spark, sf_dir, "events")
    # order on the MICROSECOND basis per the fixture-contract convention —
    # raw ns would tie-break differently from the oracle's epoch_us on a
    # nanosecond-resolution source. FLOOR division (DuckDB epoch_us floors;
    # Spark DIV truncates toward zero, differing for pre-epoch timestamps)
    t_us = F.expr(
        "CAST(CASE WHEN ts_ns % 1000 < 0 THEN ts_ns DIV 1000 - 1 "
        "ELSE ts_ns DIV 1000 END AS BIGINT)"
    ).alias("t_us")
    arr = ev.select(t_us, "event_id", "user_id", "value").groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("t_us", "event_id", F.col("value")))
        ).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda x: x["value"].cast("double"))
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: F.lit(0.9) * acc + F.lit(0.1) * v,
    )
    return arr.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(fold, 6).cast("double").alias("ewma"),
    )


@register(
    "event_distinct_sketch",
    # oracle=None blocked by: the HLL register array is a Spark/DataSketches
    # binary — DuckDB's approx_count_distinct uses a different sketch, so
    # only exactness-window properties are portable (tests/test_sketches.py)
    oracle=None,
    tags=("events", "sketch", "no-oracle"),
)
def event_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via mergeable HLL sketches (the
    100 TB COUNT(DISTINCT) recipe: partials are fixed-size register
    arrays, so map-side combine and cross-batch maintenance both work,
    which exact distinct cannot do). DataSketches estimates are
    hash-based and order-insensitive -> deterministic output; accuracy
    (<5% err), rollup-union, and incremental-store maintenance are
    property-tested in tests/test_sketches.py. No oracle: DuckDB's HLL
    is a different sketch implementation."""
    from squrve_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events")
    sk = sketches.distinct_sketch(ev, "user_id", ["event_type"])
    return sk.select("event_type", "n_distinct_est").orderBy("event_type")


@register(
    "event_audience_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 300
                 AND user_id IS NOT NULL),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'error' AND user_id IS NOT NULL)
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS est_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS est_b,
           CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
                AS BIGINT) AS est_union,
           CAST((SELECT count(*) FROM a JOIN b USING (user_id)) AS BIGINT)
               AS est_intersection,
           CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
                AS BIGINT) AS est_a_minus_b
    """,
    tags=("events", "sketch"),
    # deferred: driver cap full. Theta sketches are EXACT below their
    # nominal-entries threshold (2^12 entries; fixture segments are
    # hundreds), so the estimates equal the oracle's exact set-op
    # cardinalities at every fixture SF. Beyond ~4k distinct keys per
    # segment the sketch turns unbiased-approximate and this oracle
    # would need a tolerance check instead.
    defer_oracle=True,
)
def event_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set-operation dashboard via THETA sketches: big-spender
    purchasers vs users who hit errors — distinct/union/INTERSECTION/
    DIFFERENCE cardinalities from one scan + two KB-sized sketches
    (intersection/difference are the set ops HLL fundamentally cannot
    express). Exact below the sketch threshold; property + oracle tested."""
    from squrve_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events")
    return sketches.audience_overlap(
        ev,
        "user_id",
        (F.col("event_type") == "purchase") & (F.col("value") > 300),
        F.col("event_type") == "error",
    )


@register(
    "event_value_quantiles",
    # oracle=None blocked by: KLL sketch estimates are compaction-history
    # dependent (engine-specific binary); rank-error bounds are the portable
    # contract (tests/test_sketches.py)
    oracle=None,
    tags=("events", "sketch", "no-oracle"),
)
def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value p50/p95 via MERGEABLE KLL sketches (quantiles
    don't compose; sketches do — per-group summaries roll up to any
    coarser grouping and maintain across batches). Accuracy + merge
    properties tested in tests/test_sketches.py; no oracle: KLL is
    sampling-based and engine-specific."""
    from squrve_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events")
    sk = sketches.quantile_sketch(ev, "value", ["event_type"], [0.5, 0.95])
    return sk.select(
        "event_type",
        F.round("p50", 2).alias("p50"),
        F.round("p95", 2).alias("p95"),
    ).orderBy("event_type")


@register(
    "q_events_scd2",
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
    tags=("events", "warehouse", "A13"),
    # driver-checked since round 6 (rotated in for doc_fingerprint)
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log (r5):
    each user's event_type is the tracked status; a new version opens only
    when the status CHANGES, with [valid_from_us, valid_to_us) validity
    intervals (open row = null valid_to, is_current). The warehouse-side
    complement of the streaming user-state operator.

    Shape: both windows partition on user_id with the same (us, event_id)
    order, so Spark plans ONE shuffle and reuses the sort across the
    lag-mark, change-filter, and lead/row_number stages — no self-join
    (the naive SCD2 build joins the log to itself per version). Time is
    the fixture contract's microsecond basis (ts_ns div 1000 == epoch_us).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    changes = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .drop("prev")
    )
    w2 = W.partitionBy("user_id").orderBy("us", "event_id")
    lead_us = F.lead("us").over(w2)
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("us").cast("long").alias("valid_from_us"),
        lead_us.cast("long").alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        lead_us.isNull().alias("is_current"),
    )


_PERCENTILE_SQL = """
SELECT event_type,
       CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS DOUBLE) AS p50_cont,
       CAST(ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 6) AS DOUBLE) AS p95_cont,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p90_disc
FROM events
GROUP BY event_type
"""


@register(
    "q_percentiles",
    oracle=_PERCENTILE_SQL,
    tags=("A7", "events", "ordered-set-agg"),
    # driver-checked since round 6 (rotated in for doc_ngram_freq),
    # deferred (r10 rotation): long-stable driver row; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ordered-set aggregates (r5): percentile_cont (linear
    interpolation) and percentile_disc (smallest value at-or-above the
    fraction) via the ANSI WITHIN GROUP syntax — identical SQL text runs
    on both engines (interpolation rounded to 6 dp so an ULP of formula
    difference can't flake the hash). The exact complement of the
    KLL-sketch quantiles (`event_value_quantiles`), which are the scale
    path: exact percentiles need a per-group sort, sketches don't."""
    from squrve_spark.catalog import register_tables

    register_tables(spark, sf_dir, tables=["events"])
    return spark.sql(_PERCENTILE_SQL)


_UNPIVOT_SQL = """
SELECT o_orderpriority, metric, CAST(ROUND(val, 2) AS DOUBLE) AS val
FROM (
  SELECT o_orderpriority,
         CAST(ROUND(AVG(o_totalprice), 2) AS DOUBLE) AS avg_price,
         CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS max_price
  FROM orders GROUP BY o_orderpriority
) UNPIVOT (val FOR metric IN (avg_price, max_price))
"""


@register(
    "q_unpivot",
    oracle=_UNPIVOT_SQL,
    tags=("A8", "unpivot"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNPIVOT (r5): wide per-priority metrics melt to (key, metric,
    value) rows with the identical SQL text on both engines — the
    standard-syntax complement of the engine's stack()-based unpivots
    (q_pivot's inverse direction, schema profiling, curation audits)."""
    from squrve_spark.catalog import register_tables

    register_tables(spark, sf_dir, tables=["orders"])
    return spark.sql(_UNPIVOT_SQL)


@register(
    "q_events_interpolate",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS b, value FROM events
    ),
    a AS (SELECT event_type, b, ROUND(AVG(value), 6) AS v FROM e GROUP BY 1, 2),
    g AS (
      SELECT event_type, unnest(range(lo, hi + 1)) AS b
      FROM (SELECT event_type, MIN(b) AS lo, MAX(b) AS hi
            FROM a GROUP BY event_type)
    ),
    j AS (SELECT g.event_type, g.b, a.v FROM g LEFT JOIN a USING (event_type, b)),
    f AS (
      SELECT event_type, b, v,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY b
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY b
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j)
    SELECT event_type, CAST(b AS BIGINT) AS bucket_hr,
      CAST(ROUND(CASE
        WHEN v IS NOT NULL THEN v
        WHEN pv IS NOT NULL AND nv IS NOT NULL
          THEN pv + (nv - pv) * (b - pb) / (nb - pb)
        WHEN pv IS NOT NULL THEN pv
        ELSE nv END, 6) AS DOUBLE) AS v_interp,
      (v IS NULL) AS filled
    FROM f
    """,
    tags=("events", "analytics", "timeseries"),
    # driver-checked since round 6 (rotated in for doc_sample_per_lang)
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-interpolated gap filling (r5): every (event_type, hour)
    bucket appears; empty buckets take the line between their nearest
    observed neighbors (edge gaps forward/backward-fill) — the sensor/
    metrics regularization a forecast consumer needs beyond
    q_events_resample's zero-fill.

    Shape: one agg shuffle on (type, bucket); the dense grid explodes
    straight out of the per-type min/max aggregate (each type spans its
    own observed range — no cross join of any kind); the four
    IGNORE-NULLS carry windows share ONE partition/sort so Spark plans a
    single exchange.
    Interpolation runs on 6-dp-rounded bucket means so both engines feed
    identical doubles into the identical arithmetic.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_ns div 1000 div 3600000000").alias("b"),
        "value",
    )
    a = e.groupBy("event_type", "b").agg(F.round(F.avg("value"), 6).alias("v"))
    # per-type bounds: the grid explodes straight out of the per-type
    # min/max aggregate — no cross join of any kind, and each type's series
    # spans exactly its own observed range
    grid = (
        a.groupBy("event_type")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b"),
        )
    )
    j = grid.join(a, ["event_type", "b"], "left")
    w_back = W.partitionBy("event_type").orderBy("b").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_fwd = W.partitionBy("event_type").orderBy("b").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    b_if_v = F.when(F.col("v").isNotNull(), F.col("b"))
    f = j.select(
        "event_type",
        "b",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(b_if_v, ignorenulls=True).over(w_back).alias("pb"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(b_if_v, ignorenulls=True).over(w_fwd).alias("nb"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("b") - F.col("pb"))
            / (F.col("nb") - F.col("pb")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return f.select(
        "event_type",
        F.col("b").cast("long").alias("bucket_hr"),
        F.round(interp, 6).cast("double").alias("v_interp"),
        F.col("v").isNull().alias("filled"),
    )


@register(
    "q_events_merge_apply",
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
                     THEN COALESCE(CAST(value AS DECIMAL(18, 6)),
                                   CAST(0 AS DECIMAL(18,6)))
                     ELSE CAST(0 AS DECIMAL(18,6)) END)
                AS DOUBLE), 6) AS DOUBLE) AS balance,
           CAST(MAX(us) AS BIGINT) AS last_op_us
    FROM live GROUP BY user_id
    """,
    tags=("events", "warehouse", "cdc", "A13"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_events_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE-apply with tombstones (r6): the event log read as an
    ordered change stream per user — signup/click/purchase upsert, 'error'
    is a DELETE tombstone that clears the row, later ops re-create it
    (MERGE INTO semantics without a table format: the same final-state
    computation a Delta/Iceberg MERGE would produce, derived relationally).
    A user's live row aggregates only the ops AFTER their last tombstone;
    users whose log ends in a tombstone have no row.

    Plan: one hash partition by user_id serves BOTH windows (row_number and
    the partition-wide max-tombstone-rank share the sort) and the final
    groupBy — a single exchange end to end. Balance sums through
    DECIMAL(18,6) per-row casts so the result is partitioning-order-exact
    cross-engine.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase", "error")
    )
    ops = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.expr("ts_ns div 1000").alias("us"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    w_all = Window.partitionBy("user_id")
    numbered = ops.withColumn("rn", F.row_number().over(w_ord)).withColumn(
        "del_rn",
        F.max(F.when(F.col("event_type") == "error", F.col("rn"))).over(w_all),
    )
    live = numbered.filter(F.col("rn") > F.coalesce(F.col("del_rn"), F.lit(0)))
    return live.groupBy("user_id").agg(
        F.count("*").alias("n_live_ops"),
        # per-summand COALESCE: a NULL value contributes 0, exactly like
        # the stream kernel's _quantize_micros — without it a user whose
        # live ops are all NULL-valued clicks gets a NULL batch balance
        # while the stream emits 0.0 (r7, ADVICE)
        F.round(
            F.sum(
                F.when(
                    F.col("event_type").isin("click", "purchase"),
                    F.coalesce(
                        F.col("value").cast("decimal(18,6)"),
                        F.lit(0).cast("decimal(18,6)"),
                    ),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("double"),
            6,
        ).cast("double").alias("balance"),
        F.max("us").cast("long").alias("last_op_us"),
    )


@register(
    "event_key_skew",
    # driver-checked (r7 late rotation, promoted over q3_shipping_priority).
    # percentile semantics: Spark percentile == DuckDB quantile_cont (both
    # linear interpolation), ROUND(,6) absorbs formula ULP (the
    # q_percentiles idiom).
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS n_rows
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), s AS (
      SELECT count(*) AS n_keys, sum(n_rows) AS total,
             max(n_rows) AS max_key_rows,
             ROUND(quantile_cont(n_rows, 0.99), 6) AS p_key_rows
      FROM c
    ), r AS (
      SELECT user_id, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id) AS rank
      FROM c
    )
    SELECT r.rank, r.user_id, CAST(r.n_rows AS BIGINT) AS n_rows,
           CAST(ROUND(100.0 * r.n_rows / s.total, 4) AS DOUBLE) AS share_pct,
           CAST(ROUND(r.n_rows * s.n_keys / CAST(s.total AS DOUBLE), 4)
               AS DOUBLE) AS skew_vs_mean,
           CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(s.p_key_rows AS DOUBLE) AS p_key_rows,
           CAST(s.max_key_rows AS BIGINT) AS max_key_rows
    FROM r, s WHERE r.rank <= 10
    ORDER BY r.rank
    """,
    tags=("events", "scale", "diagnostics"),
    # driver-checked (r7 late rotation, promoted over q3_shipping_priority)
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def event_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over events.user_id — the profile that
    decides whether a key needs `salted_join` / AQE skew handling before
    a 100 TB join: top-10 heaviest keys with corpus share and
    skew-vs-mean ratio, plus global key stats (n_keys, p99 key size, max)
    on every row. One keyed shuffle + TakeOrderedAndProject top-N (never
    a global sort) + a 1-row broadcast summary
    (`operators/scale.key_skew_profile`)."""
    from squrve_spark.operators.scale import key_skew_profile

    events = load_table(spark, sf_dir, "events")
    return key_skew_profile(events, "user_id", top=10).orderBy("rank")


@register(
    "event_skew_join",
    # r8 (r7 verdict #5): key_skew_profile's ACTING lever, driven through
    # the registry with a cross-engine oracle. The derived key sends half
    # the fact rows to k=0, so `skew_aware_join` decides to SALT (asserted
    # in tests/test_plan_shapes.py); the salt is internal — the oracle is
    # the PLAIN equi-join, proving salted == unsalted numerically. Money
    # sums in DECIMAL(18,2) (exact), cast DOUBLE on output.
    oracle="""
    WITH ev AS (
        SELECT CASE WHEN user_id % 4 < 2 THEN 0 ELSE user_id % 100 END AS k,
               value
        FROM events
    ), dim AS (
        SELECT range AS k, range * 2 + 1 AS mult FROM range(100)
    )
    SELECT ev.k,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * mult) AS DOUBLE)
               AS weighted_value
    FROM ev JOIN dim ON ev.k = dim.k
    GROUP BY ev.k ORDER BY ev.k
    """,
    tags=("events", "scale"),
    # r9: promoted into the driver cap (r8 verdict #1)
)
def event_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-aware fact-to-dim join over events with a DELIBERATELY skewed
    derived key (user_id folded so key 0 carries ~half the fact side —
    the power-law key a plain shuffle would send to one task).
    `scale.skew_aware_join` profiles the key (one keyed count aggregate),
    crosses the documented thresholds (hot key >= 4x mean AND >= 1% of
    rows), and routes through `salted_join`: fact rows spread over 8
    salts, the 100-row dim replicates per salt, the hot key fans across 8
    reducers. The aggregate result is row-identical to the plain join —
    the DuckDB oracle runs the UNSALTED join, so the driver check proves
    the rewrite is invisible to results."""
    from squrve_spark.operators.scale import skew_aware_join

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        F.when(F.col("user_id") % 4 < 2, F.lit(0))
        .otherwise(F.col("user_id") % 100)
        .alias("k"),
        "value",
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("mult")
    )
    joined = skew_aware_join(ev, dim, ["k"])
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)") * F.col("mult"))
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("k")
    )


@register(
    "event_campaign_attrib",
    # r9 (r8 verdict #3): the skew lever driven INSIDE a real composite —
    # campaign revenue attribution where unattributed traffic folds onto
    # the default campaign 0 (the power-law key every attribution join
    # has). The oracle replays the plain join AND recomputes the salting
    # DECISION from the same thresholds skew_aware_join applies, so the
    # driver check proves both the rewrite's invisibility and the
    # decision logic cross-engine.
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN user_id % 4 < 2 THEN 0 ELSE user_id % 100 END AS k,
               user_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 100) AS BIGINT)
                    ELSE 0 END AS cents
        FROM events
    ), rollup AS (
        SELECT k, user_id, count(*) AS n_events, sum(cents) AS purchase_cents
        FROM fact GROUP BY k, user_id
    ), prof AS (
        SELECT sum(cnt) AS total, count(*) AS n_keys, max(cnt) AS max_rows
        FROM (SELECT k, count(*) AS cnt FROM rollup
              WHERE k IS NOT NULL GROUP BY k)
    ), dim AS (
        SELECT range AS k, range % 7 + 1 AS budget FROM range(100)
    )
    SELECT r.k,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(r.n_events) AS BIGINT) AS n_events,
           CAST(sum(r.purchase_cents * d.budget) AS BIGINT) AS weighted_cents,
           (SELECT max_rows >= 4.0 * (total / CAST(n_keys AS DOUBLE))
                   AND 100.0 * max_rows / total >= 1.0
            FROM prof) AS salted,
           CAST((SELECT CASE WHEN max_rows >= 4.0 * (total / CAST(n_keys AS DOUBLE))
                                  AND 100.0 * max_rows / total >= 1.0
                             THEN 8 ELSE 0 END FROM prof) AS INTEGER) AS n_salts,
           CAST((SELECT 100.0 * max_rows / total FROM prof) AS DOUBLE)
               AS skew_share_pct
    FROM rollup r JOIN dim d USING (k)
    GROUP BY r.k ORDER BY r.k
    """,
    tags=("events", "scale", "composite"),
    # promoted to the driver cap in r10 (rotation)
)
def event_campaign_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign revenue attribution THROUGH the skew lever (r9, r8 verdict
    #3): per-user LTV rollup on a derived campaign key where every
    un-campaigned user lands on the default campaign 0 (~half the users —
    the classic attribution hot key), then `scale.skew_aware_join` joins
    the rollup to the 100-row campaign dim. The lever profiles the rollup
    (one keyed count), crosses both documented thresholds (hot key >= 4x
    mean AND >= 1% of rows), and routes through `salted_join`; the
    decision rides on every output row (`salted`, `n_salts`,
    `skew_share_pct` — computed by the ORACLE from the same thresholds,
    so the decision logic itself is driver-checked). Scale shape: one
    keyed rollup shuffle (map-side combined), the bounded profile
    aggregate, then the salted fact-dim join; money stays in long cents
    end-to-end (exact)."""
    from squrve_spark.operators.scale import skew_aware_join

    events = load_table(spark, sf_dir, "events")
    fact = events.select(
        F.when(F.col("user_id") % 4 < 2, F.lit(0))
        .otherwise(F.col("user_id") % 100)
        .alias("k"),
        "user_id",
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("cents"),
    )
    rollup = fact.groupBy("k", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("purchase_cents"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("budget")
    )
    joined, dec = skew_aware_join(rollup, dim, ["k"], return_decision=True)
    share = 100.0 * dec["max_key_rows"] / dec["total_rows"]
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum(F.col("purchase_cents") * F.col("budget"))
            .cast("bigint")
            .alias("weighted_cents"),
        )
        .withColumn("salted", F.lit(bool(dec["salted"])))
        .withColumn("n_salts", F.lit(int(dec["n_salts"])).cast("int"))
        .withColumn("skew_share_pct", F.lit(share).cast("double"))
        .orderBy("k")
    )


@register(
    "q_asof_nearest",
    # r9: the pandas merge_asof direction='nearest' variant — DuckDB has
    # ASOF only for the backward form, so the oracle takes each side's
    # best candidate via LATERAL top-1 (ordered exactly like the Spark
    # operator's per-(key,ts) dedup: ts, then value DESC) and replays the
    # closer-side pick (distance tie -> backward) plus the tolerance gate
    # on the PICKED match.
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS t,
                      CAST(FLOOR(value * 100) AS BIGINT) AS click_cents
               FROM events WHERE event_type = 'click'),
         b AS (SELECT p.event_id, bb.t AS bt, bb.click_cents AS bc
               FROM p LEFT JOIN LATERAL (
                   SELECT t, click_cents FROM c
                   WHERE c.user_id = p.user_id AND c.t <= p.t
                   ORDER BY t DESC, click_cents DESC LIMIT 1) bb ON true),
         f AS (SELECT p.event_id, ff.t AS ft, ff.click_cents AS fc
               FROM p LEFT JOIN LATERAL (
                   SELECT t, click_cents FROM c
                   WHERE c.user_id = p.user_id AND c.t > p.t
                   ORDER BY t ASC, click_cents DESC LIMIT 1) ff ON true),
         pick AS (
           SELECT p.event_id, p.user_id, p.t,
                  CASE WHEN b.bt IS NOT NULL
                            AND (f.ft IS NULL OR (p.t - b.bt) <= (f.ft - p.t))
                       THEN b.bc ELSE f.fc END AS cand_cents,
                  CASE WHEN b.bt IS NOT NULL
                            AND (f.ft IS NULL OR (p.t - b.bt) <= (f.ft - p.t))
                       THEN b.bt ELSE f.ft END AS cand_t
           FROM p JOIN b USING (event_id) JOIN f USING (event_id))
    SELECT event_id, user_id, t,
           CASE WHEN cand_t IS NOT NULL AND abs(t - cand_t) <= 3600000000
                THEN cand_cents END AS click_cents,
           CASE WHEN cand_t IS NOT NULL AND abs(t - cand_t) <= 3600000000
                THEN cand_t END AS click_t,
           CASE WHEN cand_t IS NOT NULL AND abs(t - cand_t) <= 3600000000
                THEN CAST(abs(t - cand_t) AS BIGINT) END AS dist_us
    FROM pick ORDER BY event_id
    """,
    tags=("events", "asof-join"),
    # promoted to the driver cap in r10 (rotation)
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (r9): each purchase enriched with the CLOSEST
    click per user on either side of its timestamp, within a 1-hour
    tolerance — the pandas merge_asof direction='nearest' surface
    (`temporal.asof_join`): both directional carries share ONE sort (two
    frames over the same window ordering — no second shuffle, no join
    fan-out), distance ties take the backward match."""
    from squrve_spark.operators import temporal

    e = load_table(spark, sf_dir, "events").withColumn(
        "t", F.expr("ts_ns div 1000")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("t"),
        F.floor(F.col("value") * 100).cast("long").alias("click_cents"),
    )
    out = temporal.asof_join(
        purchases, clicks, ["user_id"], "t", "t", ["click_cents", "t"],
        suffix="_c", direction="nearest", tolerance=3_600_000_000,
    )
    return out.select(
        "event_id", "user_id", "t",
        F.col("click_cents_c").alias("click_cents"),
        F.col("t_c").alias("click_t"),
        F.when(
            F.col("t_c").isNotNull(),
            F.abs(F.col("t") - F.col("t_c")).cast("bigint"),
        ).alias("dist_us"),
    ).orderBy("event_id")


@register(
    "q_stats_moments",
    # exact-moments statistics: the one-pass float corr/covar/regr_*
    # built-ins can never hash-match across engines (merge order of
    # Welford partials is scheduling-dependent), so the engine-portable
    # formulation sums EXACT INTEGER moments (quantity units, price
    # cents; per-row products bounded, sums in DECIMAL(38,0)) and derives
    # corr / regr_slope / stddev_samp as one fixed-shape double
    # expression over those exact inputs — bit-identical on any engine.
    oracle="""
    WITH u AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(q AS DECIMAL(38,0))) AS sx,
             SUM(CAST(c AS DECIMAL(38,0))) AS sy,
             SUM(CAST(q * c AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(q * q AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(c * c AS DECIMAL(38,0))) AS syy
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS DOUBLE) AS qty_price_corr,
           CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 4)
             AS DOUBLE) AS price_per_qty,
           CAST(ROUND(
             sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100.0, 2)
             AS DOUBLE) AS price_stddev
    FROM m ORDER BY l_returnflag
    """,
    tags=("A7", "statistics"),
    defer_oracle=True,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / regression-slope / sample-stddev per return flag via
    exact integer moment sums — Pearson corr(quantity, price),
    regr_slope(price, quantity) in dollars-per-unit, stddev_samp(price).
    The decimal-moments idiom extended to second-order statistics: the
    partial aggregation is map-side-combinable exact integer math (the
    same shuffle shape the float built-ins use), only the final k-row
    projection touches floats. price_per_qty ~ the part-price mix;
    corr is high (~0.9) because extendedprice = quantity x unit price."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    dec = "decimal(38,0)"
    m = u.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").cast(dec)).alias("sx"),
        F.sum(F.col("c").cast(dec)).alias("sy"),
        F.sum((F.col("q") * F.col("c")).cast(dec)).alias("sxy"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).alias("sxx"),
        F.sum((F.col("c") * F.col("c")).cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    cov_n = nd * sxy - sx * sy
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6)
        .cast("double")
        .alias("qty_price_corr"),
        F.round(cov_n / var_x / 100.0, 4).cast("double").alias("price_per_qty"),
        F.round(F.sqrt(var_y / (nd * (nd - 1))) / 100.0, 2)
        .cast("double")
        .alias("price_stddev"),
    ).orderBy("l_returnflag")


@register(
    "q_histogram",
    # width_bucket replay: Spark computes 0 below lo, n+1 at/above hi,
    # else floor((x-lo)/width)+1. Bounds chosen so width = 110000/22 =
    # 5000 is EXACT in binary — the width-first and scale-first float
    # formulations provably coincide and the DuckDB CASE/FLOOR replay is
    # bit-identical (DuckDB has no width_bucket).
    oracle="""
    WITH b AS (
      SELECT CASE WHEN l_extendedprice < 0.0 THEN 0
                  WHEN l_extendedprice >= 110000.0 THEN 23
                  ELSE CAST(FLOOR(l_extendedprice / 5000.0) AS INTEGER) + 1
             END AS bucket,
             l_extendedprice
      FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST((bucket - 1) * 5000.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS sum_price
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=("A7", "statistics"),
    defer_oracle=True,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of extended price via the width_bucket SQL
    function (22 buckets over [0, 110000)): per-bucket row count and
    exact-decimal price mass — the profiling/distribution-audit shape.
    One map-side-combinable groupBy on a computed int key; no sort until
    the 24-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.width_bucket(
        F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(22)
    )
    return (
        li.groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(money("l_extendedprice")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "bucket",
            ((F.col("bucket") - 1) * 5000.0).cast("double").alias("bucket_lo"),
            "n",
            "sum_price",
        )
        .orderBy("bucket")
    )


@register(
    "q_string_distance",
    # levenshtein is an exact integer both engines compute identically;
    # the key-range filter keeps the self-join quadratic-in-50, not in
    # the corpus (the scale path for string-pair joins is
    # dedup.fuzzy_pairs' deletion-neighborhood blocking — this entry
    # covers the SQL built-in surface)
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
    WHERE a.c_custkey < 50 AND b.c_custkey < 50
      AND levenshtein(a.c_name, b.c_name) <= 2
    ORDER BY key_a, key_b
    """,
    tags=("A19", "string"),
    defer_oracle=True,
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string matching via the levenshtein built-in
    (JVM-side, exact integer): near-identical customer names among the
    first 50 keys at distance <= 2 — the SQL-surface form of fuzzy name
    matching (the corpus-scale form with deletion-neighborhood blocking
    is dedup.fuzzy_pairs)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    a = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    b = c.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(dist <= 2)
        .select("key_a", "key_b", dist.cast("int").alias("dist"))
        .orderBy("key_a", "key_b")
    )
