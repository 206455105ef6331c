"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Why sketches are a first-class 100 TB primitive: ``COUNT(DISTINCT)`` is
NOT algebraic — exact partials can't merge, so exact distinct forces a
full shuffle of the key domain and can never be maintained incrementally.
An HLL sketch is a fixed-size (~2^lgk bytes) register array whose union
is associative and order-insensitive, which restores the two properties
everything else in this engine leans on:

  * **map-side partial aggregation** — each task sketches its shard, the
    shuffle moves sketches (KBs), not keys;
  * **cross-batch incrementality** — a persisted per-group sketch store
    merges each arriving batch in O(batch + store), where the store is
    #groups fixed-size sketches (never the raw history) — the
    `sinks.incremental_rollup` pattern, which sums can use but distinct
    counts cannot (without this module).

Determinism: the DataSketches HLL build hashes items and is insertion-
order-insensitive, so estimates are stable across partitionings and
reruns (asserted in tests/test_sketches.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from squrve_spark.catalog import spread


def distinct_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + estimate: (group..., sketch binary,
    n_distinct_est). One hash shuffle whose payload is sketches, not
    keys — the scan side partial-aggregates per task."""
    return (
        spread(df)
        .groupBy(*group_cols)
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"))
        .withColumn(
            "n_distinct_est", F.hll_sketch_estimate("sketch").cast("long")
        )
    )


def union_estimate(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate sketches to a coarser grouping (possibly global:
    ``group_cols=[]``) by register-wise union — the rollup exact distinct
    cannot express. Returns (group..., n_distinct_est)."""
    agg = (
        sketches.groupBy(*group_cols)
        if group_cols
        else sketches.groupBy()
    )
    return agg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("n_distinct_est")
    )


def incremental_distinct(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
    batch_id: int | None = None,
) -> DataFrame:
    """Maintain a persisted per-group distinct-count sketch as batches
    arrive: sketch the batch, UNION with the stored sketches for the
    touched groups. The incremental-maintenance contract
    `sinks.incremental_rollup` gives additive measures, extended to the
    non-additive distinct count — raw HISTORY is never re-read; what is
    re-read/rewritten per batch is the sketch STORE itself, which is
    #groups x ~2^lgk bytes regardless of history length (for a group
    cardinality where even that matters, partition the store by a group
    hash and upsert touched partitions via `sinks.upsert_partitioned` —
    same shape, smaller rewrite).

    Returns the updated (group..., sketch, n_distinct_est) rows for the
    touched groups.

    ``batch_id`` makes the merge IDEMPOTENT under Structured Streaming's
    at-least-once ``foreachBatch`` contract (r7, ADVICE): the store rows
    carry the last applied batch id, and a replayed batch whose id is
    already recorded returns the stored rows untouched instead of
    double-merging its values. The id travels IN the store parquet, so the
    skip decision is atomic with the store contents. The replay return is
    semi-joined to the batch's group keys so a caller consuming the return
    value sees the SAME row set (the touched groups) on replay as on first
    delivery (r8, ADVICE).
    """
    if batch_id is not None and os.path.isdir(store_path):
        prior = spark.read.parquet(store_path)
        if "_batch_id" in prior.columns:
            last = prior.agg(F.max("_batch_id")).first()[0]
            if last is not None and last >= batch_id:
                # replayed micro-batch: already merged; match the
                # first-delivery contract (touched groups only)
                keys = batch.select(*group_cols).distinct()
                return prior.join(keys, group_cols, "left_semi")
    agg = (
        spread(batch)
        .groupBy(*group_cols)
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"))
        .localCheckpoint()  # ONE batch pass feeds merge + touched + result
    )
    touched = agg.select(*group_cols).distinct()
    if os.path.isdir(store_path):
        existing = spark.read.parquet(store_path)
        # merge = union_agg over (stored ∪ batch) sketches per group;
        # untouched groups pass through unchanged
        merged_touched = (
            existing.join(touched, group_cols, "left_semi")
            .select(*group_cols, "sketch")
            .unionByName(agg)
            .groupBy(*group_cols)
            .agg(F.hll_union_agg("sketch").alias("sketch"))
        )
        untouched = existing.join(touched, group_cols, "left_anti").select(
            *group_cols, "sketch"
        )
        out = merged_touched.unionByName(untouched)
    else:
        out = agg
    out = out.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("sketch").cast("long")
    )
    if batch_id is not None:
        out = out.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
    out = out.localCheckpoint()  # pin before overwriting the store being read
    out.write.mode("overwrite").parquet(store_path)
    return out.join(touched, group_cols, "left_semi")


def audience_overlap(
    df: DataFrame,
    key_col: str,
    seg_a,
    seg_b,
) -> DataFrame:
    """Set-operation estimates between two audience segments via THETA
    sketches — the capability HLL lacks: theta retains hashed samples, so
    INTERSECTION and DIFFERENCE cardinalities compose, not just union.
    ``seg_a``/``seg_b`` are boolean Columns; output is one row with
    est_a / est_b / est_union / est_intersection / est_a_minus_b.

    One scan, two conditionally-fed sketch aggregates (map-side partial,
    KB-sized shuffle payload). Estimates are EXACT while a sketch stays
    under its nominal-entries threshold (2^12 by default) and unbiased
    approximations beyond — the audience-overlap dashboard at 100 TB.
    """
    sk = spread(df).agg(
        F.theta_sketch_agg(F.when(seg_a, F.col(key_col))).alias("sa"),
        F.theta_sketch_agg(F.when(seg_b, F.col(key_col))).alias("sb"),
    )
    return sk.select(
        F.theta_sketch_estimate("sa").cast("long").alias("est_a"),
        F.theta_sketch_estimate("sb").cast("long").alias("est_b"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb"))
        .cast("long")
        .alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
        .cast("long")
        .alias("est_intersection"),
        F.theta_sketch_estimate(F.theta_difference("sa", "sb"))
        .cast("long")
        .alias("est_a_minus_b"),
    )


def _qlabel(q: float) -> str:
    """Column label for a quantile: p50, p95, p99_9 — round-then-format
    (int() would truncate 0.29*100 == 28.999... to p28) with '.' -> '_'
    so 0.99 and 0.999 never collide."""
    return "p" + f"{round(float(q) * 100, 4):g}".replace(".", "_")


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.95),
) -> DataFrame:
    """Per-group KLL quantile sketches + extracted quantiles — the
    MERGEABLE quantile: per-group sketches re-aggregate to any coarser
    grouping via ``kll_merge_agg_double`` (see ``merge_quantiles``),
    which exact percentiles cannot do (quantiles don't compose) and
    which makes distribution summaries maintainable across batches the
    same way `incremental_distinct` maintains distinct counts."""
    agg = (
        spread(df)
        .groupBy(*group_cols)
        .agg(
            F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias(
                "kll"
            )
        )
    )
    cols = [
        F.kll_sketch_get_quantile_double("kll", F.lit(float(q)))
        .alias(_qlabel(q))
        for q in quantiles
    ]
    return agg.select(*group_cols, "kll", *cols)


def merge_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.95),
) -> DataFrame:
    """Roll per-group KLL sketches up to a coarser grouping (``[]`` =
    global) and extract quantiles from the MERGED sketch."""
    agg = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    # kll_merge_agg_double (Spark 4.1) is the TRUE aggregate merge —
    # map-side partial merging, no driver-shaped collect_list fold
    merged = agg.agg(F.kll_merge_agg_double("kll").alias("kll"))
    cols = [
        F.kll_sketch_get_quantile_double("kll", F.lit(float(q)))
        .alias(_qlabel(q))
        for q in quantiles
    ]
    return merged.select(*(group_cols or []), "kll", *cols)


def incremental_quantiles(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    value_col: str,
    group_cols: list[str],
    k: int = 200,
    quantiles: tuple = (0.5, 0.9, 0.99),
    batch_id: int | None = None,
) -> DataFrame:
    """KLL analog of ``incremental_distinct``: maintain a persisted
    per-group mergeable QUANTILE sketch as batches arrive. Each batch is
    sketched JVM-side (``kll_sketch_agg_double``), merged into the stored
    sketches for the touched groups with the true aggregate merge
    (``kll_merge_agg_double``), and the store is rewritten — #groups x
    O(k log n) bytes regardless of history length. Raw history is never
    re-read, so percentile monitoring over an unbounded stream costs one
    pass per batch and constant state.

    ``batch_id`` gives the same at-least-once idempotency as
    `incremental_distinct`: a replayed ``foreachBatch`` id that the store
    already records is skipped, not double-merged (r7, ADVICE); the replay
    return is semi-joined to the batch's group keys so replay and first
    delivery yield the same row set (r8, ADVICE).
    """
    if batch_id is not None and os.path.isdir(store_path):
        prior = spark.read.parquet(store_path)
        if "_batch_id" in prior.columns:
            last = prior.agg(F.max("_batch_id")).first()[0]
            if last is not None and last >= batch_id:
                # replayed micro-batch: already merged; touched groups only
                keys = batch.select(*group_cols).distinct()
                return prior.join(keys, group_cols, "left_semi")
    agg = (
        spread(batch)
        .groupBy(*group_cols)
        .agg(
            F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(int(k))
            ).alias("kll")
        )
        .localCheckpoint()  # ONE batch pass feeds merge + touched + result
    )
    touched = agg.select(*group_cols).distinct()
    if os.path.isdir(store_path):
        existing = spark.read.parquet(store_path).select(*group_cols, "kll")
        merged_touched = (
            existing.join(touched, group_cols, "left_semi")
            .unionByName(agg)
            .groupBy(*group_cols)
            .agg(F.kll_merge_agg_double("kll").alias("kll"))
        )
        untouched = existing.join(touched, group_cols, "left_anti")
        out = merged_touched.unionByName(untouched)
    else:
        out = agg
    qcols = [
        F.kll_sketch_get_quantile_double("kll", F.lit(float(q))).alias(_qlabel(q))
        for q in quantiles
    ]
    out = out.select(*group_cols, "kll", *qcols)
    if batch_id is not None:
        out = out.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
    out = out.localCheckpoint()
    out.write.mode("overwrite").parquet(store_path)
    return out.join(touched, group_cols, "left_semi")
