"""Extended TPC-H composites (q6/q8/q13/q15/q17/q21 adapted to TESTDATA).

These register beyond the driver's 50-slot oracle cap (oracle=None), so
DuckDB parity lives here instead: same sorted-columns / sorted-rows value
compare the correctness driver uses, at sf0.01.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from squrve_spark.plans import REGISTRY
from tests.conftest import SF_MED, duck_views

ORACLES = {
    "q6_forecast_revenue": """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "q8_market_share": """
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
    "q13_order_distribution": """
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
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
    "q17_small_qty_revenue": """
      SELECT CAST(ROUND(
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
               2) AS DOUBLE) AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4' AND p_size <= 10
        AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q4_order_priority": """
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
    "q12_ship_class": """
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
    "q21_waiting_supplier": """
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
}


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_matches_duckdb(spark, duck, name):
    duck_views(duck, SF_MED)
    sdf = REGISTRY[name].fn(spark, SF_MED)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_norm(r[c]) for c in scols) for r in sdf.collect()], key=str
    )
    res = duck.execute(ORACLES[name])
    rcols = [d[0] for d in res.description]
    drows = sorted(
        [
            tuple(_norm(dict(zip(rcols, row))[c]) for c in sorted(rcols))
            for row in res.fetchall()
        ],
        key=str,
    )
    assert scols == sorted(rcols)
    assert len(srows) > 0
    assert srows == drows


def test_registered_rows_only():
    # beyond the oracle cap by design: driver sees them as rows-only entries
    for name in ORACLES:
        assert REGISTRY[name].oracle is None
        assert "no-oracle" in REGISTRY[name].tags
