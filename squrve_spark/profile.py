"""Database introspection / profiling — prompt-enrichment operators (§2.C).

Reference analog: PRAGMA table_info / information_schema probes and
full-table pandas profiling (/root/reference/core/actor/parser/
OpenSearchCoTParse.py:152-199). Here every data-touching probe is a single
Spark aggregate designed to survive 100 TB inputs:

  * null/distinct profiling is ONE ``agg`` pass per table using
    ``approx_count_distinct`` (HLL sketch, no shuffle-per-column) with an
    exact option for test-scale oracle checks;
  * value samples use per-column ``distinct().limit(k)`` — pushdown-pruned
    scans of one column, never a full collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_columns(spark: SparkSession, table: str) -> list[dict]:
    """PRAGMA table_info equivalent from the catalog: name/type/nullable."""
    return [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in spark.table(table).schema.fields
    ]


def list_tables(spark: SparkSession) -> list[str]:
    """sqlite_master equivalent."""
    return [t.name for t in spark.catalog.listTables()]


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """One-pass profile: per column -> (n_rows, n_null, n_distinct).

    Output one row per column: (column, n_rows, n_null, n_distinct) so the
    result is stable long-format. ``exact_distinct`` trades the HLL sketch
    for exact counts (test-scale oracle parity); default approx at scale.
    """
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"dist_{c}"))
    wide = df.agg(*aggs)
    # Unpivot the one-row wide aggregate to long format distributed-side
    # (stack), keeping the whole profile lazy: no driver collect, one pass
    # over the data regardless of column count.
    pairs = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in df.columns)
    return wide.select(
        F.expr(
            f"stack({len(df.columns)}, {pairs}) AS (column, n_null, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        F.col("column"),
        F.col("n_rows").cast("bigint"),
        F.col("n_null").cast("bigint"),
        F.col("n_distinct").cast("bigint"),
    )


def top_values(df: DataFrame, k: int = 5, columns: list[str] | None = None) -> DataFrame:
    """Per-column top-k most frequent values in ONE pass over the data:
    unpivot columns to long (column, value) rows via ``stack`` (map-side,
    no Python), count per (column, value) — partial aggregation combines
    map-side so the shuffle carries at most (distinct values) rows — then a
    window row_number keeps k per column.

    The heavy-hitters feed for value-grounded SQL generation (the
    reference's value-retrieval scaler probes column values the same way,
    OpenSearchSQLScale.py:630). Output: (col_name, value string, n, rank).

    At 100 TB: one shuffle keyed by (column, value); a pathologically
    high-cardinality column contributes many small groups, not one hot one
    (count-min/approx sketches only become necessary when even the distinct
    set won't shuffle — plug in F.approx_count_distinct-style sketches at
    that point).
    """
    cols = columns or df.columns
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col_name, value)")
    ).where(F.col("value").isNotNull())
    counts = long.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), F.col("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("col_name", "value", F.col("n").cast("bigint"), F.col("rank").cast("int"))
    )


def numeric_summary(
    df: DataFrame,
    columns: list[str],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = False,
) -> DataFrame:
    """Per-numeric-column distribution summary in ONE aggregate pass:
    (col_name, n, n_null, min, max, mean, q25, q50, q75).

    ``exact=False`` (scale default) uses ``approx_percentile`` (a
    t-digest-style sketch — mergeable, so the whole summary is map-side
    partial aggregation + one tiny reduce); ``exact=True`` uses
    ``percentile`` (exact interpolated, holds per-column values in memory —
    for test-scale oracle parity only).
    """
    fn = "percentile" if exact else "approx_percentile"
    aggs = []
    for c in columns:
        qs = ", ".join(str(q) for q in quantiles)
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.avg(c).alias(f"mean_{c}"),
            F.expr(f"{fn}(`{c}`, array({qs}))").alias(f"q_{c}"),
        ]
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', n_{c}, null_{c}, CAST(min_{c} AS DOUBLE), CAST(max_{c} AS DOUBLE), "
        f"mean_{c}, q_{c}[0], q_{c}[1], q_{c}[2]"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {parts}) AS "
            "(col_name, n, n_null, min, max, mean, q25, q50, q75)"
        )
    ).select(
        "col_name",
        F.col("n").cast("bigint"),
        F.col("n_null").cast("bigint"),
        F.round("min", 4).cast("double").alias("min"),
        F.round("max", 4).cast("double").alias("max"),
        F.round("mean", 4).cast("double").alias("mean"),
        F.round("q25", 4).cast("double").alias("q25"),
        F.round("q50", 4).cast("double").alias("q50"),
        F.round("q75", 4).cast("double").alias("q75"),
    )


def sample_values(df: DataFrame, column: str, k: int = 3) -> list:
    """k distinct non-null sample values of one column (pruned scan)."""
    rows = (
        df.select(column)
        .where(F.col(column).isNotNull())
        .distinct()
        .limit(k)
        .collect()
    )
    return [r[0] for r in rows]


def first_row(df: DataFrame) -> dict | None:
    rows = df.limit(1).collect()
    return rows[0].asDict() if rows else None


def describe_for_prompt(spark: SparkSession, table: str, k: int = 3) -> str:
    """Compact per-table prompt block: columns + k sample values each."""
    df = spark.table(table)
    lines = [f"### Table = {table}"]
    for col in table_columns(spark, table):
        samples = sample_values(df, col["name"], k)
        rendered = ", ".join(repr(s)[:40] for s in samples)
        lines.append(f"  {col['name']} ({col['type']}): e.g. {rendered}")
    return "\n".join(lines)


def numeric_outliers(
    df: DataFrame,
    column: str,
    id_col: str,
    k: float = 1.5,
    exact: bool = False,
) -> DataFrame:
    """Tukey-fence outlier flags for one numeric column: rows outside
    [q25 - k*IQR, q75 + k*IQR] -> (id, value, fence tag).

    Two-pass shape: pass 1 computes the two quantiles (sketch by default,
    exact for oracle parity); pass 2 is a map-only filter against the 1-row
    fence broadcast — no sort, no per-row window, scales linearly. The
    standard data-quality sweep before training on numeric features.
    """
    fn = "percentile" if exact else "approx_percentile"
    fences = df.agg(
        F.expr(f"{fn}(`{column}`, 0.25)").alias("q25"),
        F.expr(f"{fn}(`{column}`, 0.75)").alias("q75"),
    ).select(
        (F.col("q25") - k * (F.col("q75") - F.col("q25"))).alias("lo"),
        (F.col("q75") + k * (F.col("q75") - F.col("q25"))).alias("hi"),
    )
    return (
        df.select(id_col, column)
        .crossJoin(F.broadcast(fences))  # 1-row scalar broadcast
        .filter((F.col(column) < F.col("lo")) | (F.col(column) > F.col("hi")))
        .select(
            id_col,
            F.col(column).cast("double").alias("value"),
            F.when(F.col(column) < F.col("lo"), F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("fence"),
        )
    )
