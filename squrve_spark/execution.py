"""SQL execution wrapper: the ``(result, error)`` protocol over ``spark.sql``.

Reference analog: /root/reference/core/db_connect.py:14-191 — every backend
returns ``(pandas DataFrame | scalar | None, error_string | None)``; a timing
variant wraps it; ``execute_sql`` renders a row-capped string for LLM
feedback prompts. Here there is one backend (Spark), with:

  * dialect transpile before execution (squrve_spark.transpile),
  * error capture (AnalysisException / ParseException -> message string),
  * statement timeout via job-group cancellation (SURVEY §7.5 — the
    reference uses server-side timeouts, core/db_connect.py:71,115),
  * a ROW CAP on any driver materialization: ``spark.sql`` results convert
    to pandas only under ``limit(cap+1)`` so a runaway SELECT * on a 100 TB
    table can never OOM the driver — the capped flag is reported.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass
from os import PathLike
from pathlib import Path
from typing import Optional, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from squrve_spark.transpile import transpile

DEFAULT_ROW_CAP = 10_000
DEFAULT_TIMEOUT_S = 120.0  # parity: Snowflake/BigQuery statement timeout
FETCH_CHUNK = 500  # parity: sqlite chunked CSV export chunk size


@dataclass
class ExecResult:
    """Rich execution record (the tuple protocol is derived from this)."""

    df: Optional[pd.DataFrame]
    error: Optional[str]
    seconds: float
    capped: bool = False
    sql: str = ""

    @property
    def tuple(self):
        return self.df, self.error


def _run_with_timeout(spark: SparkSession, fn, timeout_s: float, group: str):
    """Run ``fn`` in a worker thread under a Spark job group; cancel the
    group's jobs on timeout. Cancellation is cooperative on the JVM side —
    running stages abort at the next task boundary."""
    sc = spark.sparkContext
    box: dict = {}

    def worker():
        sc.setJobGroup(group, f"squrve exec {group}", interruptOnCancel=True)
        try:
            box["value"] = fn()
        except Exception as exc:  # noqa: BLE001 — error string is the protocol
            box["error"] = str(exc)
        finally:
            sc.setJobGroup("", "")

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        sc.cancelJobGroup(group)
        return None, f"Execution timed out after {timeout_s:.0f}s (job group cancelled)"
    if "error" in box:
        return None, box["error"]
    return box.get("value"), None


def get_spark_sql_result(
    sql_query: str,
    spark: SparkSession,
    save_path: Union[str, PathLike, None] = None,
    row_cap: int = DEFAULT_ROW_CAP,
    timeout_seconds: float = DEFAULT_TIMEOUT_S,
    dialect: str = "spark",
    chunk_size: int = FETCH_CHUNK,
    **kwargs,
):
    """Execute SQL on Spark; return ``(pandas DataFrame | True | None, error | None)``.

    With ``save_path`` the result streams to CSV via ``toLocalIterator`` in
    ``chunk_size`` batches (bounded driver memory, parity with the sqlite
    chunked export) and returns ``(True, None)``.
    """
    if save_path is not None:
        # Full (uncapped) export: stream partitions through toLocalIterator
        # in chunk_size batches so driver memory stays bounded regardless of
        # result size, under the same job-group timeout as the collect path.
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        normalized = transpile(sql_query, dialect) if dialect != "spark" else sql_query
        group = f"squrve-{uuid.uuid4().hex[:12]}"

        def run():
            df: DataFrame = spark.sql(normalized)
            cols = df.columns
            buf: list = []
            first = True
            with open(save_path, "w", newline="") as fh:
                for row in df.toLocalIterator(prefetchPartitions=True):
                    buf.append(row)
                    if len(buf) >= chunk_size:
                        pd.DataFrame(buf, columns=cols).to_csv(
                            fh, index=False, header=first
                        )
                        first = False
                        buf.clear()
                pd.DataFrame(buf, columns=cols).to_csv(fh, index=False, header=first)
            return True

        value, error = _run_with_timeout(spark, run, timeout_seconds, group)
        if error is not None:
            return None, error
        return True, None
    res = execute(spark, sql_query, row_cap, timeout_seconds, dialect)
    if res.error is not None:
        return None, res.error
    return res.df, None


def execute(
    spark: SparkSession,
    sql_query: str,
    row_cap: int = DEFAULT_ROW_CAP,
    timeout_seconds: float = DEFAULT_TIMEOUT_S,
    dialect: str = "spark",
) -> ExecResult:
    """Core execution: transpile -> plan -> collect under cap -> ExecResult."""
    normalized = transpile(sql_query, dialect) if dialect != "spark" else sql_query
    group = f"squrve-{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()

    def run():
        df: DataFrame = spark.sql(normalized)
        # cap+1 rows: detect truncation without a count() job
        pdf = df.limit(row_cap + 1).toPandas()
        return pdf

    value, error = _run_with_timeout(spark, run, timeout_seconds, group)
    elapsed = time.perf_counter() - t0
    if error is not None:
        return ExecResult(None, error, elapsed, sql=normalized)
    capped = len(value) > row_cap
    if capped:
        value = value.iloc[:row_cap]
    return ExecResult(value, None, elapsed, capped=capped, sql=normalized)


def get_sql_exec_result(db_type: str = "spark", **kwargs):
    """Dispatch shim keeping the reference's config-compatible shape
    (db_connect.py:139-147): every db_type routes to Spark here."""
    if db_type in ("spark", "sqlite", "big_query", "snowflake"):
        return get_spark_sql_result(**kwargs)
    return None, None


def get_sql_exec_result_with_time(db_type: str = "spark", **kwargs):
    start = time.perf_counter()
    res = get_sql_exec_result(db_type, **kwargs)
    return time.perf_counter() - start, res


def execute_sql(
    spark: SparkSession,
    sql: str,
    dialect: str = "spark",
    max_rows: int = 50,
    max_chars: int = 4000,
) -> str:
    """Stringified result for LLM feedback prompts (db_connect.py:158-191):
    errors and empty results come back as text, data as a capped table."""
    res = execute(spark, sql, row_cap=max_rows, dialect=dialect)
    if res.error:
        return res.error
    if res.df is None or res.df.empty:
        return "No data found for the specified query"
    text = res.df.to_string(max_rows=max_rows)
    return text[:max_chars]
