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

from pyspark.sql import DataFrame, SparkSession
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
