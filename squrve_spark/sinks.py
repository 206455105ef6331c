"""Training-corpus output sinks: deterministic globally-shuffled shards.

The last stage of every large-scale training-data pipeline is writing the
curated corpus as N shuffled, size-balanced shards that data loaders stream
independently. Requirements at 100 TB, and how each maps to Spark:

* **Global shuffle, reproducible** — order must not correlate with source
  layout (parquet row groups cluster by crawl/source), and a re-run must
  produce byte-identical shards. Shard id = ``pmod(xxhash64(id, seed),
  n_shards)`` and within-shard order = the same hash: pure functions of the
  row, independent of partitioning, cluster size, or task scheduling. No
  ``rand()`` (non-reproducible), no ``repartitionByRange`` (sampled
  boundaries are run-dependent).
* **One file per shard, rows sorted** — ``repartition(n_shards, shard)``
  (hash exchange, the only shuffle) + ``sortWithinPartitions`` +
  ``partitionBy(shard)`` on write: each task owns whole shards, so every
  shard directory gets exactly one sorted file.
* **Balanced shards** — xxhash64 is uniform on ids, so shard sizes
  concentrate tightly around corpus/n_shards (tested).

``shard_manifest`` computes the audit half distributedly (per-shard row and
token counts — one groupBy, no data movement beyond k rows to the driver's
result), so pipelines can assert balance without reading the output back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"
_ORDER_COL = "_shuffle_ord"


def with_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Assign the deterministic shard id and within-shard order key."""
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    return df.withColumn(SHARD_COL, F.pmod(h, F.lit(n_shards)).cast("int")).withColumn(
        _ORDER_COL, h
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic shuffled shards under
    ``path`` (one sorted file per shard=<i>/ directory)."""
    sharded = with_shard(df, n_shards, id_col, seed)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, _ORDER_COL)
        .drop(_ORDER_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .format(fmt)
        .save(path)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard audit rows: (shard, n_docs[, n_tokens]) — the distributed
    balance check for the writer's assignment function."""
    sharded = with_shard(df, n_shards, id_col, seed)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("bigint").alias("n_tokens"))
    return sharded.groupBy(SHARD_COL).agg(*aggs).orderBy(SHARD_COL)
