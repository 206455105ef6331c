"""Classic TPC-H-shaped analytics adapted to the TESTDATA star schema.

The reference executes benchmark-grade SQL of exactly this shape via its
backends (/root/reference/core/db_connect.py:139-147; Spider/BIRD-grade
surface catalogued in SURVEY.md §2.A). These eight queries are the canonical
multi-join + aggregate workloads (TPC-H Q3/Q5/Q7/Q10/Q14/Q18/Q19/Q22
restricted to the columns TESTDATA carries) expressed Spark-first:

* fact-fact joins (lineitem⋈orders) shuffle on their keys; every dimension
  (customer at sf-scale is still fact-ish, nation/region/part-slices are not)
  that stays small at 100TB is broadcast explicitly;
* filters sit on the scan side of each join so they push into parquet;
* money math follows the registry determinism contract (DECIMAL(18,2)
  per-row casts, DOUBLE only at the output boundary);
* top-k queries tie-break on a unique key so the selected set is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table, register_tables
from squrve_spark.functions import MONEY, dexact, dround, money, revenue_expr
from squrve_spark.plans.registry import register


def _d(s: str):
    return F.lit(s).cast("date")


# --------------------------------------------------------------------------
# Q3: shipping priority — segment-filtered 3-way join, top-10 revenue orders
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_date
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("A5", "A7", "A8", "A9"),
    # deferred (r7 late rotation): driver-green r1-r6; exact parity kept
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-revenue top orders for one market segment.

    The segment filter prunes customer before the join; orders/lineitem date
    filters push to their scans. customer-after-filter is ~1/5 of customers —
    broadcast-able at any scale where customer fits in executor memory times
    segment selectivity; left to AQE otherwise.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < _d("1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > _d("1997-01-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
        .agg(dexact(F.sum(revenue_expr())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_date")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5: local supplier volume — 6-way join with the c_nationkey = s_nationkey
#     co-location predicate
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY n_name
    """,
    tags=("A5", "A7", "A8"),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from suppliers in the customer's own nation.

    supplier and nation/region are broadcast (supplier is 1/10 of customer in
    TPC-H and carries only 4 columns here); the only shuffles are the two
    fact joins lineitem⋈orders⋈customer on their FK keys.
    """
    od = F.col("o_orderdate").cast("date")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (od >= _d("1996-01-01")) & (od < _d("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dexact(F.sum(revenue_expr())).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, by shipment year and direction
# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
    FROM supplier
    JOIN lineitem  ON s_suppkey = l_suppkey
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT)
    """,
    tags=("A5", "A7", "A8", "A19"),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations per year, both directions.

    The two nation joins are broadcasts; the OR'd nation-pair predicate sits
    after them but only over broadcast-joined columns, so the big-table scans
    stay full and the fact joins shuffle once each — at 100TB one would
    semi-join push the nation filter into supplier/customer first, which
    Spark does automatically via DPP when the tables are partitioned.
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    s2 = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
    c2 = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
    return (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == c2.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dexact(F.sum(revenue_expr())).alias("volume"))
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting — top-20 customers by lost revenue
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("A5", "A7", "A8", "A9"),
    # r11: rotated out of the driver 50 (long-stable survivor, r10 verdict
    # task 1); oracle still enforced exactly by tests/test_oracle_parity.py
    defer_oracle=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in one quarter."""
    od = F.col("o_orderdate").cast("date")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (od >= _d("1996-10-01")) & (od < _d("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dexact(F.sum(revenue_expr())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14: promotion effect — conditional-aggregate percentage over a join
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             4) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
    """,
    tags=("A5", "A7", "A20", "A21"),
    # deferred (r7 late rotation): driver-green r1-r6; exact parity kept
    # in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one month.

    part is broadcast (a month of lineitem is the big side); both decimal
    sums are exact, so the final double division is bit-identical on any
    engine and any partitioning.
    """
    sd = F.col("l_shipdate").cast("date")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (sd >= _d("1997-03-01")) & (sd < _d("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", revenue_expr()).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dround(
                F.lit(100.0) * dexact(F.sum(promo)) / dexact(F.sum(revenue_expr())), 4
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers — HAVING-filtered semi-join into a detail join
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE)
    """,
    tags=("A5", "A7", "A8", "A11"),
    # r11: rotated out of the driver 50 (long-stable survivor, r10 verdict
    # task 1); oracle still enforced exactly by tests/test_oracle_parity.py
    defer_oracle=True,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold.

    The HAVING aggregate runs first (map-side partials on l_orderkey), its
    tiny key set broadcasts into a semi-join on lineitem — the classic
    aggregate-then-semi-join plan that avoids re-scanning the fact table at
    100TB (one full scan feeds both the aggregate and the detail join).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("_big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
        )
        .agg(dexact(F.sum(money("l_quantity"))).alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue — OR'd multi-bracket predicate across a join
# --------------------------------------------------------------------------
@register(
    "q19_bracketed_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("A3", "A5", "A7"),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd brand/size/quantity brackets.

    The part-only disjunction (brand ∈ {...}) is implied by the brackets and
    stated explicitly on the part scan so the broadcast side shrinks before
    the join; the mixed lineitem+part residual stays as a post-join filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#22", "Brand#4")
    )
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(dexact(F.sum(revenue_expr())).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q22: idle wealthy customers — scalar-aggregate threshold + anti-join
# --------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    oracle="""
    SELECT n_name AS cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000)
    GROUP BY n_name
    """,
    tags=("A7", "A11", "A23"),
    # r8: demoted after 7 straight driver-green rounds to free a
    # cap slot for a never-driver-checked r7 flagship (r7 verdict #2);
    # exact parity still asserted every run in tests/test_oracle_parity.py
    defer_oracle=True,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 variant: above-average-balance customers with no HIGH-VALUE
    orders (>300k), by nation — thresholded so the fixture data yields a
    non-empty result (the classic no-orders predicate matches nobody at
    sf>=0.01: every customer has orders, a vacuous 0-row hash match).

    The average is computed as exact-decimal sum / count, converted to double
    once — identical IEEE arithmetic on every engine, so the threshold
    predicate cannot flip on boundary rows. Written as Spark SQL so the
    scalar average plans as a true ScalarSubquery (a separate tiny job whose
    result embeds into the filter) instead of a nested-loop join; NOT EXISTS
    becomes a left-anti hash join on o_custkey.
    """
    register_tables(spark, sf_dir, ["customer", "orders", "nation"])
    return spark.sql(
        """
        SELECT n_name AS cntry,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*)
                FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000)
        GROUP BY n_name
        """
    )


# --------------------------------------------------------------------------
# Extended TPC-H coverage (beyond the driver's 50-slot oracle cap: these
# register oracle=None; DuckDB parity is asserted in tests/test_tpch_extra.py
# instead — same hash-style compare, pytest-side).
# TESTDATA carries no partsupp table, so Q2/Q9/Q11/Q16/Q20 have no faithful
# analog; the remaining classic shapes are below, restricted to the columns
# TESTDATA has (SURVEY §2.A composites; reference executes this SQL grade
# via core/db_connect.py:139-147).
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    tags=("A3", "A7"),
    defer_oracle=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-scan filter + one-row aggregate.

    The whole query is a parquet scan with every predicate pushed down
    (shipdate range, discount band, quantity cap) and a map-side partial sum
    — zero shuffles beyond the final 1-row exchange. The canonical
    sanity-check that filter pushdown reaches the scan at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (sd >= _d("1996-01-01"))
            & (sd < _d("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dexact(F.sum(money("l_extendedprice") * money("l_discount"))).alias("revenue"))
    )


@register(
    "q8_market_share",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    WITH vol AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND CAST(o_orderdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1997-12-31')
    SELECT o_year,
           CAST(ROUND(
             CAST(SUM(CASE WHEN supp_nation='NATION_3' THEN volume ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    tags=("A5", "A20", "A21"),
    defer_oracle=True,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the two-role nation join.

    nation joins twice under different roles (customer's nation restricts
    the market region; supplier's nation is the share numerator) — both
    broadcast (25 rows at any scale). The share is conditional aggregation
    over exact-decimal volumes, divided once at the output boundary.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    od = F.col("o_orderdate").cast("date")
    o = load_table(spark, sf_dir, "orders").filter(
        (od >= _d("1996-01-01")) & (od <= _d("1997-12-31"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_nation), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_nation), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year(od).alias("o_year"),
            revenue_expr().alias("volume"),
            F.col("supp_nation"),
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            dround(dexact(F.sum(target)) / dexact(F.sum("volume")), 6).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_order_distribution",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("A6", "A7", "A8"),
    defer_oracle=True,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution via outer join.

    LEFT OUTER join with the filter in the ON clause (urgent orders only —
    the fixture's analog of Q13's comment exclusion; plain WHERE would
    silently turn the join inner), then two aggregations: per-customer
    count, then histogram of counts. Zero-order customers must survive as
    c_count = 0 — the semantic the outer join exists to test.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority == "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("A11", "A12"),
    defer_oracle=True,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue (CTE + scalar max).

    The revenue CTE is computed once (Spark reuses the subtree across the
    join and the scalar-max subquery via the SQL view), the max embeds as a
    ScalarSubquery, and equality on exact-decimal revenue selects the
    winner(s) deterministically — no double-evaluation of the aggregate,
    no window over the whole supplier set.
    """
    register_tables(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@register(
    "q17_small_qty_revenue",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    SELECT CAST(ROUND(
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
             2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_size <= 10
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("A11",),
    defer_oracle=True,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue (correlated AVG subquery).

    The correlated `l_quantity < 0.2 * AVG(l_quantity) per part` decorrelates
    to a per-part aggregate joined back on partkey — one extra shuffle on
    l_partkey instead of a per-row subquery. The brand/size slice of part is
    tiny and broadcast; the per-part average is computed over ALL lineitems
    of that part (not just the slice), matching TPC-H semantics.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10)
    )
    per_part_avg = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cap"))
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(per_part_avg.withColumnRenamed("l_partkey", "ap_key")),
            li.l_partkey == F.col("ap_key"),
        )
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            dround(dexact(F.sum(money("l_extendedprice"))) / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    WITH per_os AS (
      SELECT l_orderkey, l_suppkey, MAX(CAST(l_shipdate AS DATE)) AS supp_last_ship
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey),
    ranked AS (
      SELECT l_orderkey, l_suppkey, supp_last_ship,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY supp_last_ship DESC, l_suppkey) AS rk,
             MAX(supp_last_ship) OVER (PARTITION BY l_orderkey
                 ORDER BY supp_last_ship DESC, l_suppkey
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_best
      FROM per_os)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM ranked JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp > 1 AND rk = 1 AND supp_last_ship > next_best
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
    tags=("A5", "A11"),
    defer_oracle=True,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (shipdate-adapted): suppliers who held up multi-supplier
    orders — their line shipped strictly later than every other supplier's.

    TESTDATA has no receipt/commit dates, so lateness is "last to ship".
    The classic EXISTS + NOT-EXISTS double self-join decorrelates into ONE
    two-level aggregation: per (order, supplier) max shipdate, then per
    order the latest/second-latest supplier ship times; the waiting supplier
    is the unique latest in an order with >1 supplier. Two shuffles total
    (orderkey, then suppkey) versus three self-join shuffles in the naive
    translation — the shape that survives a 100x scale-up.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    per_os = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("supp_last_ship"))
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("supp_last_ship").desc(), F.col("l_suppkey")
    )
    ranked = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last_ship",
        F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")).alias("n_supp"),
        F.row_number().over(w).alias("rk"),
        F.max("supp_last_ship")
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                F.col("supp_last_ship").desc(), F.col("l_suppkey")
            )
            .rowsBetween(1, Window.unboundedFollowing)
        )
        .alias("next_best"),
    )
    waiting = ranked.filter(
        (F.col("n_supp") > 1)
        & (F.col("rk") == 1)
        & (F.col("supp_last_ship") > F.col("next_best"))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q4_order_priority",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND CAST(l_shipdate AS DATE)
                        > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("A11", "A7"),
    defer_oracle=True,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (shipdate-adapted): priority distribution of orders with a
    late line. TESTDATA has no commit/receipt dates, so "late" is a line
    shipped >60 days after the order date (ref semantics: ANY late line
    qualifies the order — once).

    The EXISTS decorrelates into a LEFT SEMI hash join on orderkey with the
    lateness comparison as the join residual — one shuffle, no duplicate
    orders to re-distinct, the aggregation input stays order-grained.
    """
    od = F.col("o_orderdate").cast("date")
    o = load_table(spark, sf_dir, "orders").filter(
        (od >= _d("1996-07-01")) & (od < _d("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > F.date_add(od, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_ship_class",
    # r8 (r7 verdict #3): oracle moved from tests/test_tpch_extra.py
    # into the registry as a deferred oracle — exact parity now runs
    # through the same tests/test_oracle_parity.py harness as every
    # other deferred entry (driver cap full; rows-only before this)
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1 ORDER BY ship_class
    """,
    tags=("A20", "A21"),
    defer_oracle=True,
)
def q12_ship_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipmode-adapted): line counts by priority class per ship
    class. TESTDATA has no l_shipmode, so lines classify by ship delay
    (<=30 days FAST, else SLOW) — same CASE-classified conditional-agg
    shape as the original.

    One join orders<->lineitem (shuffle on orderkey), classification and
    both conditional sums are map-side expressions; output is 2 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    od = F.col("o_orderdate").cast("date")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (sd >= _d("1996-01-01")) & (sd < _d("1997-01-01"))
    )
    ship_class = F.when(F.datediff(sd, od) <= 30, "FAST").otherwise("SLOW")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(
            ship_class.alias("ship_class"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("is_high").cast("bigint").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )
