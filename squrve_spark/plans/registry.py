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


def memo_entry_plan(name: str, fn: Callable) -> Callable:
    """Session-memoize a PURE registry builder's plan object (r12, guide
    §1.2 driver work): the wrapped fn returns the SAME lazy DataFrame per
    (session, entry, sf_dir), so steady-state invocations skip re-parsing
    and re-analyzing a bit-identical logical plan (~0.1–0.5 s of
    single-threaded driver time per entry per pass; 19% of the whole
    bench in aggregate). EXECUTION IS NOT CACHED — every action on the
    returned frame still runs the full distributed plan (the bench's noop
    sink recomputes from parquet each pass).

    Eligibility is empirical and test-asserted (tests/test_plans.py): an
    entry may be wrapped only if a warm fn() call launches ZERO Spark
    jobs (no actions/side effects left after the trained-artifact memos)
    and two consecutive builds produce the same semanticHash (plan is a
    deterministic function of (code, sf_dir)). Stream drains, store
    writers and per-call-action entries stay unwrapped."""
    import os as _os

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        cache = spark.__dict__.setdefault("_squrve_entry_plan_cache", {})
        key = (name, _os.path.abspath(sf_dir))
        logical = cache.get(key)
        if logical is None:
            logical = fn(spark, sf_dir)._jdf.queryExecution().analyzed()
            cache[key] = logical
        # wrap the memoized ANALYZED plan in a FRESH Dataset (new
        # QueryExecution) per call (~0.5 ms vs a 0.1–1.7 s rebuild):
        # optimization, physical planning, AQE and execution all happen
        # per action on the new frame, so no adaptive/runtime state is
        # ever shared between invocations — only parse+analysis is memoized.
        try:
            jvm = spark._sc._jvm
            jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                spark._jsparkSession, logical
            )
            return DataFrame(jdf, spark)
        except Exception:
            # non-classic session (e.g. Spark Connect): fall back to a
            # fresh build — correctness over the memo
            return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", name)
    wrapped.__doc__ = fn.__doc__
    wrapped._squrve_inner_fn = fn
    return wrapped


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
