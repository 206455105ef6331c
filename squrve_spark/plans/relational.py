"""Relational query surface — SURVEY.md §2.A operator inventory.

Each query is the idiomatic-Spark expression of one or more §2.A rows
(A1-A23); the paired DuckDB oracle states identical ANSI semantics. The
reference executes this surface as generated SQL against sqlite/BigQuery/
Snowflake (/root/reference/core/db_connect.py:139-147); here Catalyst plans
it: filters/projections push into the parquet scan, small dims broadcast,
aggregates get map-side partials — verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table, register_tables
from squrve_spark.functions import MONEY, dexact, dround, money, revenue_expr
from squrve_spark.plans.registry import register


# --------------------------------------------------------------------------
# A1-A3, A7-A8: scan, projection, filter, aggregate (TPC-H Q1 style flagship)
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*), 4) AS DOUBLE) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-06-30'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A2", "A3", "A7", "A8"),
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan + filter + multi-aggregate groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-06-30").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dexact(F.sum(money("l_quantity"))).alias("sum_qty"),
            dexact(F.sum(money("l_extendedprice"))).alias("sum_base_price"),
            dexact(F.sum(revenue_expr())).alias("sum_disc_price"),
            dround(dexact(F.sum(money("l_extendedprice"))) / F.count("*"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_scan_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
    FROM orders
    WHERE o_totalprice > 400000 AND o_orderstatus = 'F'
      AND o_totalprice BETWEEN 400000 AND 600000
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1993-01-01' AND DATE '1997-12-31'
    """,
    tags=("A1", "A2", "A3"),
    defer_oracle=True,  # r9: demoted after 8 straight driver-green rounds (cap rotation)
)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan: comparison, equality, and numeric/date BETWEEN
    predicates — all push down to the parquet reader (A1-A3 in one plan)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.filter(
            (F.col("o_totalprice") > 400000)
            & (F.col("o_orderstatus") == "F")
            & F.col("o_totalprice").between(400000, 600000)
            & d.between(F.lit("1993-01-01").cast("date"), F.lit("1997-12-31").cast("date"))
        )
        .select("o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("o_date"))
    )


# --------------------------------------------------------------------------
# A4, A7: DISTINCT / COUNT(DISTINCT)
# --------------------------------------------------------------------------
@register(
    "q_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    """,
    tags=("A4", "A7"),
    defer_oracle=True,  # subsumed by q_having_distinct/composites; pytest-parity only
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global COUNT(DISTINCT) — Spark expands to partial aggregation, no collect."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A5: inner equi-joins on FK paths (multi-way), broadcast-able dims
# --------------------------------------------------------------------------
@register(
    "q_join_agg",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nation_value,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) > 5
    """,
    tags=("A5", "A7", "A8"),
    defer_oracle=True,  # r9: demoted after 8 straight driver-green rounds (cap rotation)
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-path join orders->customer->nation + GROUP BY + HAVING.

    nation is tiny: broadcast explicitly so the plan stays shuffle-free on the
    dim side at any scale; the orders<->customer join shuffles on the key.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dexact(F.sum(money("o_totalprice"))).alias("nation_value"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("n_orders") > 5)
    )


@register(
    "q_multijoin_region_revenue",
    oracle="""
    SELECT r_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY r_name
    """,
    tags=("A5", "A7", "A8"),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_multijoin_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way FK join lineitem->orders->customer->nation->region.

    Join order follows cardinality: the big fact tables join first on their
    shuffle keys; nation/region broadcast. Catalyst + AQE would reorder/pick
    broadcast anyway; the hints make the 100TB plan explicit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    od = F.col("o_orderdate").cast("date")
    return (
        li.join(
            o.filter(
                (od >= F.lit("1996-01-01").cast("date")) & (od < F.lit("1998-01-01").cast("date"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(dexact(F.sum(revenue_expr())).alias("revenue"))
    )


@register(
    "q_self_join",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM customer c1
    JOIN customer c2 ON c1.c_nationkey = c2.c_nationkey AND c1.c_custkey < c2.c_custkey
    JOIN nation ON c1.c_nationkey = n_nationkey
    WHERE c1.c_acctbal > 0 AND c2.c_acctbal > 0
    GROUP BY n_name
    """,
    tags=("A5",),
    defer_oracle=True,  # joins driver-checked via q_join_agg/q_multijoin/TPC-H; pytest-parity only
)
def q_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: same-nation customer pairs (deduped by key ordering)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    n = load_table(spark, sf_dir, "nation")
    c1 = c.alias("c1")
    c2 = c.alias("c2")
    return (
        c1.join(
            c2,
            (F.col("c1.c_nationkey") == F.col("c2.c_nationkey"))
            & (F.col("c1.c_custkey") < F.col("c2.c_custkey")),
        )
        .join(F.broadcast(n), F.col("c1.c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# A6: outer joins (NULL-preserving)
# --------------------------------------------------------------------------
@register(
    "q_outer_join",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("A6", "A7"),
    defer_oracle=True,  # r9: demoted after 8 straight driver-green rounds (cap rotation)
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN preserving order-less customers (COUNT(col) skips NULLs)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dexact(F.coalesce(F.sum(money("o_totalprice")), F.lit(0).cast(MONEY))).alias("spend"),
        )
    )


@register(
    "q_null_handling",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_inactive
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
           ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    GROUP BY c_mktsegment
    """,
    tags=("A6", "A23"),
    # rotated out of the driver cap in round 4 for doc_repetition: NULL/outer
    # semantics stay driver-checked via q_outer_join; exact parity here runs
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL over outer-join output: customers with no high-value orders.

    Expressed as a left anti join — same semantics, and Spark skips
    materializing the null-padded rows entirely. The 300k threshold is
    calibrated so the fixture data yields a NON-empty result (every
    customer has some order at sf>=0.01, so the unfiltered variant was a
    vacuous 0-row hash match).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_inactive"))
    )


# --------------------------------------------------------------------------
# A9: ORDER BY + LIMIT (top-k)
# --------------------------------------------------------------------------
@register(
    "q_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10
    """,
    tags=("A9",),
    defer_oracle=True,  # top-k driver-checked via q3/q10/q18 composites; pytest-parity only
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject (per-partition heap, no full
    sort). Tie-break on the unique key makes the selected set deterministic."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )


# --------------------------------------------------------------------------
# A10: set operations
# --------------------------------------------------------------------------
@register(
    "q_setops",
    oracle="""
    SELECT 'both_1995_1996' AS src, custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    )
    UNION ALL
    SELECT 'never_finished' AS src, custkey FROM (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'big_balance' AS src, c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    """,
    tags=("A10",),
    # rotated out of the driver 50-cap in r5 (stable since r2;
    # composites + pytest parity still cover it)
    defer_oracle=True,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three A10 set operations in one tagged result: INTERSECT
    (ordered in both 1995 and 1996), EXCEPT (no finished order), and a
    UNION ALL over heterogeneous sources (bag semantics preserved)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    y = F.year("o_orderdate")
    a = o.filter(y == 1995).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(y == 1996).select(F.col("o_custkey").alias("custkey"))
    both = a.intersect(b).select(F.lit("both_1995_1996").alias("src"), "custkey")
    all_b = o.select(F.col("o_custkey").alias("custkey"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    never = all_b.subtract(fin).select(F.lit("never_finished").alias("src"), "custkey")
    rich = (
        c.filter(F.col("c_acctbal") > 9000)
        .select(F.lit("big_balance").alias("src"), F.col("c_custkey").alias("custkey"))
    )
    return both.unionAll(never).unionAll(rich)


# --------------------------------------------------------------------------
# A11: subqueries — IN / NOT IN, correlated EXISTS, scalar
# --------------------------------------------------------------------------
@register(
    "q_sub_in_notin",
    oracle="""
    SELECT 'heavy_part' AS src, p_partkey, p_name FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 49
    )
    UNION ALL
    SELECT 'stale_part' AS src, p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE CAST(l_shipdate AS DATE) > DATE '1999-06-30'
    )
    """,
    tags=("A11",),
    # rotated out of the 50-slot driver cap in r4 for doc_span_dup — A11
    # stays driver-checked via q_sub_exists/q_scalar_subquery/
    # q_corr_min_subquery; this keeps exact pytest parity.
    defer_oracle=True,
)
def q_sub_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN and NOT IN subqueries in one tagged result: IN == left-semi join,
    NOT IN == left-anti join (keys are non-null here)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") > 49).select("l_partkey")
    recent = li.filter(F.col("l_shipdate").cast("date") > F.lit("1999-06-30").cast("date")).select(
        "l_partkey"
    )
    in_side = (
        p.join(heavy, p.p_partkey == heavy.l_partkey, "left_semi")
        .select(F.lit("heavy_part").alias("src"), "p_partkey", "p_name")
    )
    notin_side = (
        p.join(recent, p.p_partkey == recent.l_partkey, "left_anti")
        .select(F.lit("stale_part").alias("src"), "p_partkey", "p_name")
    )
    return in_side.unionAll(notin_side)


@register(
    "q_sub_exists",
    oracle="""
    SELECT 'urgent_buyer' AS src, c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'rich_no_finished' AS src, c_custkey, c_name FROM customer c
    WHERE c.c_acctbal > 9000 AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderstatus = 'F'
    )
    """,
    tags=("A11",),
    # rotated out of the driver 50-cap in r5 (stable since r2;
    # composites + pytest parity still cover it)
    defer_oracle=True,
)
def q_sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (left-semi) and NOT EXISTS (left-anti, TPC-H Q4/Q21
    family) in one tagged result; Catalyst decorrelates the SQL form to the
    same plans."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    finished = o.filter(F.col("o_orderstatus") == "F")
    exists_side = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select(F.lit("urgent_buyer").alias("src"), "c_custkey", "c_name")
    )
    not_exists_side = (
        c.filter(F.col("c_acctbal") > 9000)
        .join(finished, c.c_custkey == finished.o_custkey, "left_anti")
        .select(F.lit("rich_no_finished").alias("src"), "c_custkey", "c_name")
    )
    return exists_side.unionAll(not_exists_side)


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer
    )
    """,
    tags=("A11",),
    # deferred since late r4 (rotated out for doc_dsir_select): A11 stays
    # driver-checked via q_sub_exists + q_corr_min_subquery
    defer_oracle=True,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold (above-average balance).

    Threshold is computed as exact-decimal-sum -> double / count so both
    engines derive the bit-identical cutoff (see registry determinism notes).
    """
    register_tables(spark, sf_dir, tables=["customer"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer
        )
        """
    )


# --------------------------------------------------------------------------
# A12, A13: CTE + window functions
# --------------------------------------------------------------------------
@register(
    "q_cte_window",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_date FROM ranked WHERE rn = 1
    """,
    tags=("A12", "A13"),
    defer_oracle=True,  # r9: demoted after 8 straight driver-green rounds (cap rotation)
)
def q_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First order per customer: CTE + row_number window (SQL surface)."""
    register_tables(spark, sf_dir, tables=["orders"])
    return spark.sql(
        """
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        )
        SELECT o_custkey, o_orderkey, o_date FROM ranked WHERE rn = 1
        """
    )


@register(
    "q_window_combo",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           dense_rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS price_rnk,
           CAST(lag(o_totalprice) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
               AS prev_price
    FROM orders
    """,
    tags=("A13",),
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_window_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 window surface in one pass: ordered running-sum frame over exact
    decimals, dense_rank, and lag. Both specs partition on o_custkey so Spark
    plans a single shuffle (two in-partition sorts)."""
    o = load_table(spark, sf_dir, "orders")
    w_time = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_frame = w_time.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_price = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        dexact(F.sum(money("o_totalprice")).over(w_frame)).alias("running_spend"),
        F.dense_rank().over(w_price).alias("price_rnk"),
        F.lag("o_totalprice").over(w_time).cast("double").alias("prev_price"),
    )


# --------------------------------------------------------------------------
# A15, A16 + string functions: LIKE / ILIKE predicates feeding a
# string-function projection surface
# --------------------------------------------------------------------------
@register(
    "q_string_like",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 8)) AS prefix,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           CONCAT(p_brand, '#', CAST(p_partkey AS VARCHAR)) AS tagged,
           REPLACE(p_type, 'PROMO', 'PR') AS shorttype,
           CAST(POSITION('a' IN p_name) AS INTEGER) AS a_at
    FROM part
    WHERE p_type ILIKE '%promo%' AND p_name LIKE '%a%'
    """,
    tags=("A2", "A15", "A16", "strings"),
    # rotated out of the driver 50-cap in r5 (stable since r2;
    # composites + pytest parity still cover it)
    defer_oracle=True,
)
def q_string_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive ILIKE + case-sensitive LIKE predicates feeding
    SUBSTR/UPPER/LENGTH/CONCAT/REPLACE/POSITION projections."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").ilike("%promo%") & F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 8)).alias("prefix"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_partkey").cast("string")).alias(
                "tagged"
            ),
            F.regexp_replace("p_type", "PROMO", "PR").alias("shorttype"),
            F.instr(F.col("p_name"), "a").cast("int").alias("a_at"),
        )
    )


# --------------------------------------------------------------------------
# A18 + A19: date/time functions grouping CAST-disciplined ratio metrics
# --------------------------------------------------------------------------
@register(
    "q_date_ratio",
    oracle="""
    SELECT strftime(o_orderdate, '%Y') AS yr,
           month(o_orderdate) AS mth,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS big_ratio,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY 1, 2
    """,
    tags=("A18", "A19", "A20"),
    # rotated out of the driver 50-cap in r5 (stable since r2;
    # composites + pytest parity still cover it)
    defer_oracle=True,
)
def q_date_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (Spark `date_format` == sqlite/duckdb `strftime`,
    the §7.4 transpile pair) grouping ratio metrics with explicit
    CAST-to-DOUBLE before division (the sqlite int/int trap from A18)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy").alias("yr"),
            F.month("o_orderdate").alias("mth"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dround(
                F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("big_ratio"),
            (dexact(F.sum(money("o_totalprice"))) / F.count("*")).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# A20, A21: CASE WHEN as grouping expression + conditional-aggregate
# arithmetic (the reference's OpenSearchSQL rewrite pattern, SURVEY §2.A A21)
# --------------------------------------------------------------------------
@register(
    "q_case_condagg",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_value,
           CAST(COALESCE(SUM(CASE WHEN year(o_orderdate) = 1995
                                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
                - COALESCE(SUM(CASE WHEN year(o_orderdate) = 1996
                                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
                AS DOUBLE) AS yoy_delta
    FROM orders
    GROUP BY 1
    """,
    tags=("A20", "A21"),
    # rotated out of the driver 50-cap in r5 (stable since r2;
    # composites + pytest parity still cover it)
    defer_oracle=True,
)
def q_case_condagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding as the group key + SUBTRACT-of-conditional-aggregates
    (1995 vs 1996 spend delta) in the same single-pass aggregation."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    y = F.year("o_orderdate")
    zero = F.lit(0).cast(MONEY)
    return (
        o.groupBy(band.alias("band"))
        .agg(
            F.count("*").alias("n_orders"),
            dexact(F.sum(money("o_totalprice"))).alias("band_value"),
            dexact(
                F.coalesce(F.sum(F.when(y == 1995, money("o_totalprice"))), zero)
                - F.coalesce(F.sum(F.when(y == 1996, money("o_totalprice"))), zero)
            ).alias("yoy_delta"),
        )
    )


# --------------------------------------------------------------------------
# A11 deep-dive: correlated scalar subquery over a group minimum (TPC-H Q2
# shape) and NOT EXISTS anti-join (TPC-H Q4/Q21 shape)
# --------------------------------------------------------------------------
@register(
    "q_corr_min_subquery",
    oracle="""
    SELECT s.s_name, p.p_partkey, CAST(ROUND(l.l_extendedprice, 2) AS DOUBLE) AS price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    ) AND p.p_partkey < 100
    """,
    tags=("A5", "A11"),
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_corr_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (cheapest offer per part, TPC-H Q2 shape).
    Catalyst decorrelates into an aggregate + join; expressed via spark.sql
    so the decorrelation path itself is exercised."""
    register_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(
        """
        SELECT s.s_name, p.p_partkey,
               CAST(ROUND(l.l_extendedprice, 2) AS DOUBLE) AS price
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        ) AND p.p_partkey < 100
        """
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT n_name, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
    """,
    tags=("A8", "grouping-sets"),
    # deferred since round 6 (stable driver-green r1-r5; slot rotated to
    # q_recursive_cte); exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube)."""
    register_tables(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(
        """
        SELECT n_name, o_orderstatus, COUNT(*) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
        """
    )


@register(
    "q_having_distinct",
    oracle="""
    SELECT o_custkey, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderstatus) >= 2 AND COUNT(*) >= 10
    """,
    tags=("A7", "A8"),
    # deferred since late r4 (rotated out for emb_decontam): A7/A8 stay
    # driver-checked via q1_pricing_summary + q_join_agg + q_grouping_sets
    defer_oracle=True,
)
def q_having_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over COUNT(DISTINCT) — distinct aggregation + post-agg filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            F.count("*").alias("n_orders"),
        )
        .filter((F.col("n_statuses") >= 2) & (F.col("n_orders") >= 10))
    )


@register(
    "q_window_dist",
    # deferred oracle (driver cap full): distribution-window surface —
    # ntile / percent_rank / cume_dist / first+last frame values
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w_price AS INTEGER) AS spend_quartile,
           CAST(ROUND(percent_rank() OVER w_price, 6) AS DOUBLE) AS pct_rnk,
           CAST(ROUND(cume_dist() OVER w_price, 6) AS DOUBLE) AS cume,
           CAST(first_value(o_totalprice) OVER w_price AS DOUBLE) AS top_price,
           CAST(last_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
               AS bottom_price
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("A13",),
    defer_oracle=True,
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 distribution windows: ntile, percent_rank, cume_dist, and
    first/last frame values — one partition key, one shuffle; the
    unbounded-following frame for last_value is explicit (the default
    frame would stop at CURRENT ROW)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rnk"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        F.first("o_totalprice").over(w).cast("double").alias("top_price"),
        F.last("o_totalprice").over(w_full).cast("double").alias("bottom_price"),
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery (per-group top-n without a window function)
# --------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) c
"""


@register(
    "q_lateral_topn",
    oracle=_LATERAL_SQL,
    tags=("A11", "lateral"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per-nation top-2 customers by balance —
    the correlated table-subquery surface (ANSI lateral, Spark >= 3.2);
    Catalyst decorrelates into a ranked join, DuckDB runs the IDENTICAL SQL
    string as the oracle. Deterministic: unique c_name tie-break."""
    register_tables(spark, sf_dir, tables=["nation", "customer"])
    return spark.sql(_LATERAL_SQL)


@register(
    "q_setops_all",
    oracle="""
    SELECT 'clerk_overlap' AS src, o_orderpriority AS pri FROM (
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
    )
    UNION ALL
    SELECT 'excess_1995' AS src, pri FROM (
        SELECT o_orderpriority AS pri FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
    )
    """,
    tags=("A10", "bag-semantics"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (r5): INTERSECT ALL keeps each priority
    min(count_1995, count_1996) times, EXCEPT ALL keeps the 1995 surplus
    count_1995 - count_1996 times — the multiplicity arithmetic DISTINCT
    set ops erase, and exactly what Spark's intersectAll/exceptAll plan as
    a count-compare aggregate rather than a quadratic join."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = o.filter(y == 1995).select(F.col("o_orderpriority").alias("pri"))
    b = o.filter(y == 1996).select(F.col("o_orderpriority").alias("pri"))
    overlap = a.intersectAll(b).select(F.lit("clerk_overlap").alias("src"), "pri")
    excess = a.exceptAll(b).select(F.lit("excess_1995").alias("src"), "pri")
    return overlap.unionAll(excess)


_RECURSIVE_SQL_SPARK = """
WITH RECURSIVE tree AS (
  SELECT n_nationkey AS id, n_name AS name,
         CAST(n_name AS STRING) AS path, 0 AS depth
  FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, n.n_name,
         t.path || '/' || n.n_name, t.depth + 1
  FROM nation n JOIN tree t ON (n.n_nationkey - 1) div 2 = t.id
  WHERE n.n_nationkey > 0
)
SELECT id, name, path, CAST(depth AS INT) AS depth FROM tree
"""


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT n_nationkey AS id, n_name AS name,
             CAST(n_name AS VARCHAR) AS path, 0 AS depth
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, n.n_name,
             t.path || '/' || n.n_name, t.depth + 1
      FROM nation n JOIN tree t ON (n.n_nationkey - 1) // 2 = t.id
      WHERE n.n_nationkey > 0
    )
    SELECT id, name, path, CAST(depth AS INT) AS depth FROM tree
    """,
    tags=("A12", "recursive"),
    # driver-checked since round 6 (rotated in for q_grouping_sets)
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 WITH RECURSIVE, r5): walk the implicit
    binary hierarchy parent(k) = (k-1) div 2 over nation, accumulating
    root-to-node paths and depths — the iterative-closure surface
    (hierarchies, BOMs, graph reachability) that until Spark 4 required
    driver-side loops; DuckDB executes the same recursion as the oracle
    (only the integer-division spelling differs: `div` vs `//`)."""
    register_tables(spark, sf_dir, tables=["nation"])
    return spark.sql(_RECURSIVE_SQL_SPARK)


@register(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS pri,
             CAST(COUNT(*) AS BIGINT) AS n95
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
    b AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS pri,
             CAST(COUNT(*) AS BIGINT) AS n96
      FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
    SELECT a.pri, n95, n96
    FROM a JOIN b ON a.pri IS NOT DISTINCT FROM b.pri
    """,
    tags=("A5", "A23", "null-safe"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    # rotated out of the driver-checked 50 in r13 (r12 verdict task 8:
    # slot given to a never-checked oracle); exact parity stays asserted
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (r5): the NULL group (priority folded to
    NULL via NULLIF) must MATCH across sides — Spark's `<=>` (eqNullSafe)
    against DuckDB's `IS NOT DISTINCT FROM`. A plain `=` join silently
    drops the NULL row on both sides; this pins the three-valued-logic
    corner A23 leaves to the comparator."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri")
    a = o.filter(y == 1995).groupBy(pri).agg(F.count("*").alias("n95"))
    b = o.filter(y == 1996).groupBy(pri).agg(F.count("*").alias("n96"))
    return a.join(b, a.pri.eqNullSafe(b.pri)).select(a.pri, "n95", "n96")


_GROUPING_ID_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


@register(
    "q_grouping_id",
    oracle=_GROUPING_ID_SQL,
    tags=("A8", "grouping"),
    # deferred: driver cap full; exact parity in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers over ROLLUP (r5): subtotal rows carry NULL group
    keys, and GROUPING() is the only way to distinguish 'subtotal' from a
    genuine NULL key — the standard reporting idiom on top of A8's
    rollup/grouping-sets surface. Identical SQL text runs on both engines."""
    register_tables(spark, sf_dir, tables=["orders"])
    return spark.sql(_GROUPING_ID_SQL)
