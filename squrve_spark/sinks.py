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
    """Assign the deterministic shard id and within-shard order key.

    r9: the hash moved from xxhash64 to the engine-portable md5 idiom —
    shard = first-15-hex-of-md5("<id>:<seed>") mod n_shards — so ANY
    engine reading written shards can recompute which shard a document
    belongs to (DuckDB: `CAST(('0x'||substr(md5(id||':'||seed),1,15)) AS
    BIGINT) % n`), and `doc_shard_manifest` is oracle-checkable. 15 hex
    digits = 60 bits: fits a signed BIGINT on both engines and keeps the
    within-shard order key collision-free at real shard sizes. md5 is
    slower than xxhash64 per row, but one hash per written row is noise
    next to the write itself, and a portable shard layout is worth it.

    NULL-id contract (r9 review): the key concatenation is
    NULL-PROPAGATING (F.concat, matching SQL || semantics) so a null id
    yields a null shard on BOTH engines — concat_ws would silently hash
    just the seed string here while the documented DuckDB recompute
    formula returns NULL, splitting the two definitions. Callers must
    assign ids before sharding; null-shard rows land in the null
    partition where the writer's own audit exposes them."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(f":{seed}"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
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


def upsert_partitioned(
    spark,
    new_df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Key-based upsert into a hive-partitioned parquet dataset, rewriting
    ONLY the partitions the new batch touches (dynamic partition overwrite).

    The parquet-only MERGE shape for a periodically re-ingested corpus:
      1. partitions touched = distinct ``partition_col`` values in the batch;
      2. survivors = existing rows of those partitions whose key does NOT
         appear in the batch (left anti join — new rows win);
      3. write survivors + batch with partitionOverwriteMode=dynamic, so
         untouched partitions' files are never rewritten (or even read:
         step 2's scan partition-prunes on the touched set).

    At 100 TB the cost is proportional to the touched partitions, not the
    dataset; the anti join broadcasts when the batch is small. Not atomic
    across partitions (parquet has no transaction log — a lakehouse format
    adds that); each partition's overwrite is individually atomic-ish via
    Spark's commit protocol.
    """
    import os

    if not os.path.isdir(path):
        new_df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return
    touched = [r[0] for r in new_df.select(partition_col).distinct().collect()]
    # isin() never matches NULL: a batch touching the null partition would
    # silently drop that partition's survivors. Build the predicate
    # null-safely.
    non_null = [t for t in touched if t is not None]
    pred = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(t is None for t in touched):
        pred = pred | F.col(partition_col).isNull()
    existing = spark.read.parquet(path).filter(pred)
    survivors = existing.join(
        F.broadcast(new_df.select(*key_cols).distinct()), on=key_cols, how="left_anti"
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            survivors.select(*new_df.columns)
            .unionByName(new_df)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ``ceil(bytes / target_file_bytes)`` files (per partition directory when
    ``partition_col`` is given). Returns the file count written.

    The standing maintenance job of any long-running ingestion: streaming
    sinks and per-batch writers accrete small files until open/footer
    overhead dominates scans. Compaction here is one read + one
    repartition + one write — no data transformation, safe to re-run.

    With ``partition_col``, rows repartition BY the partition column so
    each hive partition lands wholly in one task and writes one file
    (repartitioning round-robin would scatter every partition across all
    tasks and multiply files instead of merging them).

    NOT atomic: the swap is two renames (old out, new in); a crash between
    them leaves the data under ``<path>__old_*`` needing a manual rename
    back, and a concurrent reader can see ``path`` briefly missing. True
    atomic compaction needs a table format with a transaction log
    (Delta/Iceberg); parquet directories can't express it.
    """
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dns, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    if partition_col:
        writer = (
            df.repartition(n_files, F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(tmp)
    written = sum(
        1 for _dp, _dns, fns in os.walk(tmp) for f in fns if f.endswith(".parquet")
    )
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return written


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


# ---------------------------------------------------------------------------
# incremental dedup ingestion (r4): the daily-batch crawl pattern


def incremental_dedup_ingest(
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int | None = None,
) -> DataFrame:
    """Ingest a new batch against a PERSISTED fingerprint store: return only
    documents whose canonical fingerprint has never been seen (not in the
    store, not earlier in this batch), and append the survivors'
    fingerprints to the store.

    The production shape for continuous corpus building — each day's crawl
    dedups against ALL history without ever re-reading historical text:
    the store holds (fingerprint, id) only, so the anti-join's build side
    is a fraction of corpus size and the new batch (the small side) streams
    against it. Within-batch dupes collapse to the min-id copy first so two
    copies arriving together can't both pass. The append is an atomic-ish
    parquet directory append (new files only); re-running the same batch is
    idempotent at the RESULT level: already-stored fingerprints are
    filtered, so a replay returns 0 rows and appends 0 fingerprints.

    NULL-text contract: callers must COALESCE null text upstream
    (doc_incremental_dedup does) — a NULL fingerprint silently bypasses
    the store because the left_anti join never matches NULL keys, so
    null-text docs would survive every batch.

    ``batch_id`` (r10, r9 verdict #6) closes the torn-write seam under
    at-least-once ``foreachBatch`` delivery: the function appends the
    survivors' fingerprints to the store and RETURNS the survivors for the
    caller's output write, so a crash can land on either side of that seam.
    Store rows are stamped with the writing batch id; on replay, a
    fingerprint stored BY THIS SAME BATCH does not disqualify its doc —
    the replay returns the identical survivor set (the caller's
    idempotent/overwrite output write then converges) instead of 0 rows,
    which for the crash-after-append-before-output-write interleaving
    would silently lose the batch's documents forever. The store append
    stays duplicate-free: only fingerprints absent from the store are
    appended, so a replay after a COMPLETE delivery appends nothing.
    With ``batch_id=None`` the legacy contract holds (replay returns 0
    rows) — correct only when the output write is transactional with the
    store append or the caller replays never.
    """
    import os

    spark = new_docs.sparkSession
    from squrve_spark.operators.text import canon_expr

    # single-source canonical form (text.canon_expr) — the PERSISTED store
    # must never drift from exact_dedup_groups' hashing
    batch = new_docs.withColumn("_fp", F.md5(canon_expr(text_col)))
    # within-batch: keep min-id per fingerprint
    w_keep = batch.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    batch = batch.join(w_keep, [id_col, "_fp"], "left_semi")
    stored_fps = None
    if os.path.exists(store_path):
        # anti-join on the narrow (fp) store — a hash shuffle on the 128-bit
        # key; the store is the big side and cannot be broadcast, but its
        # shuffled payload is 32 bytes/row regardless of historical text size.
        # mergeSchema: older stores predate the _batch_id column.
        store = spark.read.option("mergeSchema", "true").parquet(store_path)
        if "_batch_id" not in store.columns:
            store = store.withColumn("_batch_id", F.lit(None).cast("long"))
        stored_fps = store.select("_fp")
        seen = store.select("_fp", "_batch_id")
        if batch_id is not None:
            # a fp stamped by THIS batch is a replay re-delivery, not a dup
            seen = seen.filter(
                F.col("_batch_id").isNull() | (F.col("_batch_id") != F.lit(batch_id))
            )
        batch = batch.join(seen.select("_fp"), "_fp", "left_anti")
    # EAGER checkpoint before the append: the survivor set must be pinned,
    # because a lazy plan re-evaluated after the append would re-read the
    # store, see its own fingerprints, and yield zero rows.
    survivors = batch.localCheckpoint()
    to_store = survivors.select(
        "_fp",
        F.col(id_col).alias("first_id"),
        F.lit(batch_id).cast("long").alias("_batch_id"),
    )
    if stored_fps is not None:
        # replayed survivors' fps may already be stored — never append twice
        to_store = to_store.join(stored_fps, "_fp", "left_anti")
    to_store.write.mode("append").parquet(store_path)
    return survivors.drop("_fp")


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (r4): the materialized-rollup pattern


def incremental_rollup(
    spark,
    batch: DataFrame,
    store_path: str,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    partition_col: str,
    batch_id: int | None = None,
) -> DataFrame:
    """Maintain a persisted additive rollup as batches arrive: aggregate the
    batch, MERGE with the stored partial aggregates for the touched
    partitions (sum-merge — requires additive measures: counts/sums; avg
    must be carried as sum+count), and upsert only those partitions.

    ``agg_exprs`` maps output column -> SQL aggregate over the batch (e.g.
    {"n_events": "count(*)", "value_cents": "sum(cents)"}). The measures
    merge by SUM, which is exactly the algebraic-aggregate contract that
    makes map-side partial aggregation correct inside one query — applied
    here ACROSS batches. Cost per batch ~ batch size + touched-partition
    rollup rows; the full history is never re-read. Returns the updated
    rollup rows for the touched partitions.

    ``batch_id`` (r9, r8 verdict #6) closes the torn-write seam under
    Structured Streaming's at-least-once ``foreachBatch``: a crash
    BETWEEN the store upsert and the checkpoint commit replays the batch,
    and without the guard the additive sums double-merge (unlike sketch
    unions, sums are not idempotent). The skip is PER PARTITION (r9
    review): `upsert_partitioned` commits one partition directory at a
    time, so a crash can land MID-upsert with some touched partitions
    stamped and others not — a store-wide max(_batch_id) guard would then
    skip the whole replay and silently lose the unstamped partitions'
    contribution. Each touched partition is re-merged exactly when its
    own stored _batch_id is behind; already-stamped partitions pass
    through untouched, so the return is the same row set as an
    uninterrupted first delivery. The store is read with mergeSchema so a
    store whose older partitions predate the _batch_id column (or were
    written with batch_id=None) still surfaces it.
    """
    agg = batch.groupBy(*group_cols).agg(
        *[F.expr(e).cast("long").alias(name) for name, e in agg_exprs.items()]
    )
    measures = list(agg_exprs)
    import os

    def _part_pred(values):
        non_null = [t for t in values if t is not None]
        pred = (
            F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        )
        if any(t is None for t in values):
            pred = pred | F.col(partition_col).isNull()
        return pred

    done_rows = None
    if batch_id is not None and os.path.isdir(store_path):
        prior = spark.read.option("mergeSchema", "true").parquet(store_path)
        if "_batch_id" in prior.columns:
            tkeys = batch.select(partition_col).distinct()
            ptouched = prior.join(tkeys, [partition_col], "left_semi")
            done_rows = ptouched.where(
                F.col("_batch_id") >= F.lit(int(batch_id))
            ).localCheckpoint()
            done = [
                r[0]
                for r in done_rows.select(partition_col).distinct().collect()
            ]
            if done:
                # drop already-applied partitions from THIS delivery
                agg = agg.filter(~F.coalesce(_part_pred(done), F.lit(False)))
                if agg.limit(1).count() == 0:
                    return done_rows  # full replay: every partition stamped
    if os.path.isdir(store_path):
        touched = [
            r[0] for r in agg.select(partition_col).distinct().collect()
        ]
        existing = (
            spark.read.option("mergeSchema", "true")
            .parquet(store_path)
            .filter(_part_pred(touched))
        )
        if "_batch_id" in existing.columns:
            existing = existing.drop("_batch_id")
        merged = (
            existing.unionByName(agg)
            .groupBy(*group_cols)
            .agg(*[F.sum(m).cast("long").alias(m) for m in measures])
        )
    else:
        merged = agg
    if batch_id is not None:
        merged = merged.withColumn(
            "_batch_id", F.lit(int(batch_id)).cast("long")
        )
    merged = merged.localCheckpoint()  # pin before the store rewrite
    upsert_partitioned(
        spark, merged, store_path, key_cols=group_cols, partition_col=partition_col
    )
    if done_rows is not None:
        # same row set as first delivery: re-merged partitions + the
        # already-stamped ones that passed through
        return merged.unionByName(done_rows, allowMissingColumns=True)
    return merged
