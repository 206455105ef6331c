"""Registry of named queries with optional DuckDB oracle SQL.

Each entry is the Spark-side implementation (idiomatic DataFrame / Spark SQL,
Catalyst-planned) plus, where the semantics are ANSI-SQL-expressible, an
equivalent DuckDB SQL string used as the correctness oracle (driver contract:
CORRECTNESS_r{N}.json hash-compare at sf=0.01).

Determinism contract for oracle-checked queries (so value hashes match):
  * money/double aggregates go through DECIMAL(18,2) per-row casts — decimal
    arithmetic is exact and engine-order-independent, unlike summing doubles;
  * final numeric outputs are BIGINT or ROUND(..., n)::DOUBLE on both sides;
  * top-k queries tie-break on a unique key so the selected SET is unique;
  * timestamp outputs are cast to DATE where the data is day-grained.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL or None (rows-only check)
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    # defer_oracle=True: the oracle is verified by pytest parity only and NOT
    # exposed to the driver — used for queries squeezed out of the driver's
    # 50-slot correctness cap. They order after the driver-checked block.
    defer_oracle: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple = (),
    doc: str = "",
    defer_oracle: bool = False,
):
    """Decorator registering ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
            defer_oracle=defer_oracle,
        )
        return fn

    return deco
