"""Column-expression helpers shared by the query library.

All helpers return JVM-side Column expressions (whole-stage-codegen'd); no
Python UDFs here. The decimal helpers implement the engine's determinism
contract (plans/registry.py docstring): money math in DECIMAL is exact and
independent of partitioning/aggregation order, so results hash-match any
other engine at any parallelism — doubles summed in parallel would not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money(col) -> Column:
    """Per-row cast of a 2-dp-valued double column to exact DECIMAL(18,2)."""
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def dround(col: Column, n: int = 2) -> Column:
    """Round and return as DOUBLE — canonical numeric output type."""
    return F.round(col, n).cast("double")


def dexact(col: Column) -> Column:
    """Exact decimal -> double conversion (values < 2^53 stay exact)."""
    return col.cast("double")


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    return money("l_extendedprice") * (F.lit(1).cast(MONEY) - money("l_discount"))
