"""TPC-H partsupp composites (Q2/Q9/Q11/Q16/Q20 adapted to TESTDATA).

The driver fixtures ship no ``partsupp`` table, but the reference executes
Spider/BIRD-grade SQL of exactly these shapes (correlated scalar subquery
over an aggregate — Q2; multi-fact star join — Q9; HAVING over a scalar
subquery — Q11; NOT-IN anti-semantics with COUNT(DISTINCT) — Q16; nested
IN chains with a correlated aggregate — Q20; few-shot family at
``/root/reference/core/actor/generator/DINSQLGenerate.py:242-278``). So the
engine synthesizes a DETERMINISTIC, ENGINE-PORTABLE partsupp from the
tables that do exist, and both Spark and the DuckDB oracle derive the
identical relation:

* keys = DISTINCT ``(l_partkey, l_suppkey)`` pairs actually traded in
  lineitem (so the Q9/Q20 fact joins match, as in genuine TPC-H where
  lineitem pairs always appear in partsupp), unioned with a 4-suppliers-
  per-part arithmetic scheme ``(p_partkey + i*step) % n_supp`` (so every
  part has suppliers, as Q2/Q11/Q16 require);
* measures come from the first 8 hex digits of ``md5(partkey-suppkey)`` —
  the same engine-portable hash idiom the sampling/DSIR operators use —
  so any engine recomputes bit-identical availqty/supplycost without a
  stored fixture.

Scale notes (100 TB): the distinct over lineitem is one shuffle bounded by
the true pair cardinality (TPC-H: 4·|part|); the scheme side is a map-only
cross join with a 4-row literal; per-query join strategies are documented
on each function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from squrve_spark.catalog import load_table, memo_checkpoint
from squrve_spark.functions import MONEY, dexact, money
from squrve_spark.plans.registry import register

# DuckDB-side definition of the SAME synthetic relation (prefixed to every
# oracle below). `//` is DuckDB integer division; CAST('0x'||hex AS BIGINT)
# mirrors Spark's conv(hex, 16, 10).
PARTSUPP_CTE = """
WITH ps_keys AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
  UNION
  SELECT p_partkey,
         (p_partkey + gen.i * ((SELECT COUNT(*) FROM supplier) // 4 + 1))
           % (SELECT COUNT(*) FROM supplier)
  FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS gen(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(h % 9999 + 1 AS INTEGER) AS ps_availqty,
         CAST(h % 99900 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
  FROM (SELECT ps_partkey, ps_suppkey,
               CAST(('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || '-'
                     || CAST(ps_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        FROM ps_keys) hashed
)
"""


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost).

    One distinct-shuffle over lineitem's (partkey, suppkey) projection (column-
    pruned at the scan) + a map-only 4x expansion of part; measures are
    md5-derived so the relation is a pure function of the input tables.
    localCheckpoint-memoized: queries that reference partsupp twice (Q2's
    min-cost join-back) reuse one materialization instead of re-running the
    distinct per branch.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    # dim-table scalar, session-memoized per sf_dir (r12): the count job
    # re-ran on every partsupp-referencing build (5 TPC-H entries/pass)
    _cnt_cache = spark.__dict__.setdefault("_squrve_dimcount_cache", {})
    _ck = ("supplier", os.path.abspath(sf_dir))
    n_supp = _cnt_cache.get(_ck)
    if n_supp is None:
        n_supp = _cnt_cache[_ck] = load_table(spark, sf_dir, "supplier").count()
    step = n_supp // 4 + 1
    gen = spark.range(4).select(F.col("id").alias("i"))
    scheme = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey")
        .crossJoin(F.broadcast(gen))  # 4-row literal: map-only expansion
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * F.lit(step)) % F.lit(n_supp))
            .cast("long")
            .alias("ps_suppkey"),
        )
    )
    keys = li.union(scheme).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("ps_partkey").cast("string"),
                    F.col("ps_suppkey").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    ps = keys.withColumn("h", h).select(
        "ps_partkey",
        "ps_suppkey",
        (F.col("h") % 9999 + 1).cast("int").alias("ps_availqty"),
        ((F.col("h") % 99900 + 100).cast("double") / 100.0).alias("ps_supplycost"),
    )
    return memo_checkpoint(ps)


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated scalar MIN subquery, decorrelated
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle=PARTSUPP_CTE
    + """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM part, partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("A5", "A7", "A9", "A11"),
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest EUROPE supplier per mid-size STANDARD part.

    The oracle keeps the reference's correlated-scalar-subquery text; the
    Spark plan is the decorrelated form Catalyst would target anyway: build
    the region-filtered (partsupp x supplier) once, aggregate MIN per part,
    and join back on cost equality. nation/region are broadcast (constant
    size at any SF); the partsupp<->supplier join shuffles on suppkey and
    AQE may broadcast the region-filtered supplier slice (1/5 of suppliers)
    when it fits. `costs` is derived from the memoized partsupp checkpoint,
    so the min-branch and the row-branch share one synthesis.
    LIMIT under a total order ((s_name, p_partkey) is unique per row) keeps
    the selected set deterministic across engines.
    """
    ps = load_partsupp(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = ps.join(s, ps.ps_suppkey == s.s_suppkey).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name"
    )
    mins = costs.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    return (
        costs.join(
            mins,
            (costs.ps_partkey == mins.ps_partkey)
            & (costs.ps_supplycost == mins.min_cost),
        )
        .drop(mins.ps_partkey)
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: product-type profit — six-way star join, profit = revenue - cost
# --------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=PARTSUPP_CTE
    + """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(ps_supplycost AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    tags=("A5", "A7", "A16", "A19"),
    defer_oracle=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: per-nation, per-year profit on one product family.

    Join order puts the part-name filter first so the selective semi-shrink
    happens before the fact-fact joins: lineitem joins the filtered part
    (1/8 of parts — shuffle or AQE-broadcast), then partsupp on the
    composite (partkey, suppkey) key, then orders on orderkey; supplier and
    nation are key-lookup dims (nation broadcast always, supplier left to
    AQE). Money math is exact DECIMAL per the determinism contract; the
    final 175-group aggregate is map-side-combined.
    """
    ps = load_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = money("l_extendedprice") * (
        F.lit(1).cast(MONEY) - money("l_discount")
    ) - money("ps_supplycost") * money("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dexact(F.sum("amount")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11: important stock — HAVING over a scalar subquery on the same aggregate
# --------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle=PARTSUPP_CTE
    + """
    , natps AS (
      SELECT ps_partkey, CAST(ps_supplycost AS DECIMAL(18,2)) * ps_availqty AS val
      FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_9'
    )
    SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS value
    FROM natps GROUP BY ps_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
           > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM natps)
    ORDER BY value DESC, ps_partkey
    """,
    tags=("A7", "A8", "A11"),
    defer_oracle=True,  # r12: rotated out of the driver cap (long-stable green r01-r11; pytest exact parity)
)

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose one-nation stock value exceeds a global share.

    The scalar threshold is the total of the SAME grouped aggregate, so the
    Spark plan computes the per-part decimal sums ONCE and re-aggregates
    them for the total (decimal addition is associative — grand total over
    groups == total over rows), then broadcasts the 1-row threshold into a
    filter. One shuffle for the groupBy, no second scan, no collect.
    """
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    natps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (money("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    # checkpoint the grouped sums: both the output rows and the threshold
    # derive from this one frame — without it the supplier join + groupBy
    # would re-execute per branch (part-count-sized, cheap to materialize)
    grouped = memo_checkpoint(
        natps.groupBy("ps_partkey").agg(F.sum("val").alias("dval"))
    )
    total = grouped.agg(
        (F.sum("dval").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("dval").cast("double") > F.col("threshold"))
        .select("ps_partkey", F.col("dval").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# --------------------------------------------------------------------------
# Q16: parts/supplier relationship — NOT IN + COUNT(DISTINCT)
# --------------------------------------------------------------------------
@register(
    "q16_supplier_relation",
    oracle=PARTSUPP_CTE
    + """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("A5", "A7", "A11", "A16"),
    defer_oracle=True,
)
def q16_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size) bucket,
    excluding flagged suppliers.

    NOT IN over a provably-non-null key list is planned as a LEFT ANTI join
    (broadcast: the flagged-supplier slice is tiny at any SF). The part
    filters prune at the scan; COUNT(DISTINCT) shuffles once on the grouping
    key with partial distinct aggregation map-side.
    """
    ps = load_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(flagged), ps.ps_suppkey == flagged.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20: potential part promotion — nested IN chains + correlated aggregate
# --------------------------------------------------------------------------
@register(
    "q20_potential_promotion",
    oracle=PARTSUPP_CTE
    + """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_6'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > (
            SELECT 1000 * SUM(l.l_quantity) FROM lineitem l
            WHERE l.l_partkey = ps_partkey AND l.l_suppkey = ps_suppkey
              AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'))
    ORDER BY s_name
    """,
    tags=("A11", "A16", "A19"),
    defer_oracle=True,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers overstocked (vs what they actually shipped in
    1996) on some 'red' part, in one nation.

    The excess factor is 1000 (not the reference's 0.5) because the
    synthetic availqty is uniform rather than demand-correlated — 1000
    splits suppliers ~59/41 at sf0.01, so the correlated predicate
    demonstrably filters. The correlated SUM decorrelates to a grouped
    aggregate of the date-filtered lineitem joined back on the composite
    key; an INNER join implements the NULL-comparison semantics (pairs with
    no 1996 shipments fail the > and drop). Both IN chains become LEFT SEMI
    joins; quantities are integer-valued doubles so the sum is exact in
    either engine.
    """
    ps = load_partsupp(spark, sf_dir)
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    over = (
        ps.join(red, ps.ps_partkey == red.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == shipped.l_partkey)
            & (F.col("ps_suppkey") == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.lit(1000) * F.col("qty"))
        .select("ps_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(over, F.col("s_suppkey") == over.ps_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
