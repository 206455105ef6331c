"""Driver contract for the squrve_spark engine.

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
data-pipeline extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each hash-checkable query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from squrve_spark.plans import REGISTRY

    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from squrve_spark.plans import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from squrve_spark.plans import REGISTRY

    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None and not spec.defer_oracle
    }
