"""Streaming operators over the events table.

Scale design: every operator keeps state bounded —
  * windowed aggregations carry a watermark so state for closed windows is
    dropped, not accumulated forever;
  * the session operator uses Spark's native ``session_window`` (state
    merges server-side, one shuffle on the grouping key);
  * the custom stateful operator (``applyInPandasWithState``) holds one
    fixed-size tuple per user and emits updates per micro-batch — the
    pattern for anything the built-in windows can't express.

The file source replays the driver-provided parquet as a stream
(``maxFilesPerTrigger`` controls micro-batching in tests; ``availableNow``
drains everything and terminates, which is how the hash-checkable registry
entries run streaming plans to a deterministic batch result).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from squrve_spark.catalog import normalize_events_time
from squrve_spark.session import apply_runtime_confs

US_PER_HOUR = 3_600_000_000


def _scratch_root() -> str:
    """Filesystem root for EPHEMERAL drain state — checkpoint dirs and
    file-sink work dirs that live only for the duration of one
    availableNow replay and are never read for recovery (a failed drain
    re-runs from the source parquet; the registry entries' semantics are
    batch-deterministic).

    Durability buys nothing here, but the checkpoint commit path pays
    real disk I/O for it: per micro-batch, the WAL/offset/commit logs
    plus one state-store delta file PER PARTITION are written+synced
    (measured on ext4 /tmp at 32 state partitions: stateCommit 4-6 s
    summed vs 0.3 s at 8 — fsync contention, not compute; guide §6).
    A RAM-backed scratch removes that entirely. Resolution order:
      * $SQURVE_STREAM_SCRATCH — a real deployment points this at its
        fast local scratch (NVMe, instance store); durable checkpoint
        locations belong to real continuous pipelines, which configure
        their own checkpointLocation and never pass through here;
      * /dev/shm when writable (Linux RAM-backed tmpfs);
      * the process tempdir otherwise.
    """
    root = os.environ.get("SQURVE_STREAM_SCRATCH")
    if root:
        return root
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()

# state-store count for local availableNow replays (see run_stream_to_table);
# measured on local[32] at sf0.1: 8 halves state-store init for the
# dropDuplicates path vs 16 with no slowdown elsewhere — any real deployment
# sets spark.sql.shuffle.partitions itself before starting queries
STREAM_SHUFFLE_PARTITIONS = 8


def _source_schema(spark: SparkSession, sf_dir: str, glob: str) -> StructType:
    """Schema of a parquet file-stream source, memoized per session.

    Every stream build needs the source schema up front (file streams
    can't infer), and ``spark.read.parquet(...).schema`` pays a fresh
    file listing + footer read + py4j hop per call (~0.1 s). Schemas of
    the read-only test tables never change within a session — the same
    contract `catalog.load_table`'s frame memo already relies on."""
    cache = spark.__dict__.setdefault("_squrve_stream_schema_cache", {})
    key = (os.path.abspath(sf_dir), glob)
    schema = cache.get(key)
    if schema is None:
        schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
        cache[key] = schema
    return schema


def read_event_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """File-source stream with the same schema-adaptive time normalization
    as the batch loader (`catalog.normalize_events_time`): whatever encoding
    the parquet ships ``ts`` in (epoch-nanos long, TIMESTAMP, TIMESTAMP_NTZ),
    the stream exposes ``ts`` as TIMESTAMP (watermark-eligible; session TZ is
    pinned UTC so the NTZ cast is value-stable) plus exact ``ts_ns``."""
    apply_runtime_confs(spark)
    schema = _source_schema(spark, sf_dir, glob)
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_events_time(reader.parquet(sf_dir))


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (streaming analog of
    q_events_hourly): (event_type, bucket_hr, n_events, value_cents).

    The watermark bounds state: windows older than max(event time) - delay
    finalize and their state is evicted. Distinct-user counting is left to
    the batch path (exact distinct isn't incrementally aggregable without
    a sketch; at scale use approx_count_distinct here).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "event_type",
            (F.unix_micros(F.col("win.start")) / US_PER_HOUR).cast("long").alias("bucket_hr"),
            "n_events",
            "value_cents",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window rollup: each event lands in
    duration/slide overlapping windows (here 4), the standard trending /
    rate-monitor shape. State is windows-in-flight x keys, bounded by the
    watermark exactly like the tumbling case — the overlap multiplies state
    by duration/slide, which is the knob to mind at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            (F.unix_micros(F.col("win.start")) / 60_000_000)
            .cast("long")
            .alias("bucket_min"),
            "n_events",
        )
    )


def session_counts_stream(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Native session windows per user: one row per (user, session) with the
    session bounds and event count. State merges sessions server-side; the
    watermark closes sessions whose gap has definitively passed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sess.start")).alias("start_us"),
            F.unix_micros(F.col("sess.end")).alias("end_us"),
            "n_events",
        )
    )


_STATE_SCHEMA = "n_events long, purchase_cents long"
_OUT_SCHEMA = "user_id long, n_events long, purchase_cents long"


def _update_user_state(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Custom stateful kernel: running (event count, purchase cents) per
    user. One bounded tuple of state per key; emits the updated running
    totals once per micro-batch the key appears in."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        purchases = pdf[pdf["event_type"] == "purchase"]["value"]
        cents += int((purchases * 100).apply(int).sum())
    state.update((n, cents))
    yield pd.DataFrame([{"user_id": key[0], "n_events": n, "purchase_cents": cents}])


def user_running_state_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user running totals (the extension point
    for stateful logic session_window/aggregations can't express)."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_to_table(
    df: DataFrame,
    output_mode: str,
    name: str | None = None,
    timeout_s: float = 300.0,
    metrics_out: dict | None = None,
    parts: int | None = None,
    no_data_batch: bool = True,
) -> DataFrame:
    """Drain a streaming DataFrame with Trigger.AvailableNow into an
    in-memory table; returns the result as a batch DataFrame.

    This is how streaming plans become hash-checkable: availableNow
    processes the full source then terminates, so the memory table holds
    the deterministic final result.

    ``metrics_out`` (optional dict, filled in place) receives the drained
    query's state-store telemetry — ``state_operators``: the FINAL
    micro-batch's stateOperators list (numRowsTotal, numRowsUpdated,
    memoryUsedBytes, ...), plus ``num_batches`` and ``num_output_rows``.
    This turns 100x-scale state claims (e.g. 'anomaly state is 3 numbers
    per user') into executable assertions — see tests/test_streaming.py.

    ``parts`` (r12, guide §2): per-query state-store count override —
    kernels with real per-group Python work (scd2, merge-apply) spread
    over the session's actual cores instead of the fixed local constant;
    default stays the measured local optimum for state-init-bound drains.

    ``no_data_batch=False`` (r12, guide §1.2/§2.4): skip the trailing
    empty micro-batch. availableNow appends one zero-row batch after the
    data to advance the watermark and fire event-time timeouts/state
    cleanup; entries whose OUTPUT is emitted entirely during data batches
    (complete-mode aggregations; update-mode applyInPandasWithState with
    NoTimeout, which is only invoked on data; append dedup/joins that
    emit on arrival/match) pay its full state-store reload + commit for
    zero output rows. Callers must leave the default when timeouts or
    watermark-driven emission carry semantics (e.g. the TTL-evicting
    neardup variant — its eviction telemetry fires in that final batch)."""
    name = name or f"stream_{uuid.uuid4().hex[:10]}"
    spark = df.sparkSession
    # state-store count is fixed at stream start from shuffle.partitions;
    # a small value keeps per-run store init cheap on local replays while
    # any real deployment would set its own value before starting the query
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(parts or STREAM_SHUFFLE_PARTITIONS)
    )
    if not no_data_batch:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    # explicit throwaway checkpoint on the scratch filesystem (r13): the
    # implicit temp checkpoint lands in java.io.tmpdir (disk) and pays an
    # fsync per state partition per batch for durability this one-shot
    # drain can never use; see _scratch_root. Cleaned up in finally.
    ck_dir = tempfile.mkdtemp(prefix="squrve_stream_ck_", dir=_scratch_root())
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ck_dir)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
        if not finished:
            raise TimeoutError(
                f"stream drain '{name}' did not finish within {timeout_s}s — "
                "result would be a silently-truncated partial drain"
            )
        if metrics_out is not None:
            progs = _progress_dicts(q)
            with_state = [p for p in progs if p.get("stateOperators")]
            metrics_out["num_batches"] = len(progs)
            metrics_out["state_operators"] = (
                with_state[-1]["stateOperators"] if with_state else []
            )
            metrics_out["num_output_rows"] = sum(
                (p.get("sink") or {}).get("numOutputRows") or 0 for p in progs
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
        import shutil

        shutil.rmtree(ck_dir, ignore_errors=True)
    # detach the result from the memory sink: checkpoint the (small,
    # aggregated) result to executor blocks, then drop the sink table —
    # otherwise every call leaks a uuid-named in-memory table for the
    # session's lifetime (unbounded in a service or bench loop).
    # r13 (guide §1.2): coalesce(1) + LAZY checkpoint. The sink's rows
    # already sit in ONE driver-side buffer, so a 1-partition checkpoint
    # is right-sized (the old default inherited the state-store partition
    # count: 8-32 near-empty tasks per drain), and eager=False folds the
    # materialization into the caller's first action instead of paying a
    # separate scan+persist job per drain (dropTempView only removes the
    # catalog NAME — the plan holds the sink relation itself, so deferred
    # materialization stays correct; blocks persist at first action as
    # before). Measured: scd2 1.87->1.54 s, sessionize 1.12->0.87,
    # top_keys 0.65->0.57 end-to-end, values bit-identical.
    out = spark.table(name).coalesce(1).localCheckpoint(eager=False)
    spark.catalog.dropTempView(name)
    return out


def run_stream_to_files(
    df: DataFrame,
    parts: int | None = None,
    timeout_s: float = 300.0,
    no_data_batch: bool = True,
) -> DataFrame:
    """Drain an append-mode streaming DataFrame with Trigger.AvailableNow
    into a parquet directory and return the read-back batch frame.

    The high-volume alternative to ``run_stream_to_table`` (r12, guide
    §5 driver rule): the memory sink COLLECTS every output row to the
    driver — fine for the aggregated streams (hundreds of rows), a
    driver bottleneck for row-heavy emitters (``stream_neardup`` pushes
    ~400k pair rows per drain at sf0.1; measured ~1.2 s faster through
    the executor-parallel file sink, and the driver never holds the
    output). This is also the production shape: a real ingest pipeline
    lands detected pairs in a table, not in driver memory.

    ``parts`` sets the state-store count for THIS query (default: the
    module's ``STREAM_SHUFFLE_PARTITIONS``); heavy stateful streams pass
    the session's ``defaultParallelism`` so the per-group work spreads
    over the actual cores instead of a fixed local constant."""
    # scratch-backed work dir (r13, see _scratch_root): the checkpoint is
    # throwaway (fsync per state partition per batch saved), and the
    # output parquet is read straight back into the returned frame — RAM
    # residency is exactly the pair rows' lifetime. The dir must outlive
    # this call (the caller's lazy frame scans it), so it is not deleted
    # here; entries are MB-sized and the dir dies with the machine's
    # scratch, the same bounded-leak contract the /tmp tempdir had.
    work = tempfile.mkdtemp(prefix="squrve_stream_out_", dir=_scratch_root())
    spark = df.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(parts or STREAM_SHUFFLE_PARTITIONS)
    )
    if not no_data_batch:
        # see run_stream_to_table: skip the trailing zero-row micro-batch
        # when the caller's output is fully emitted during data batches
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            df.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
        if not finished:
            raise TimeoutError(
                f"stream drain to '{work}' did not finish within {timeout_s}s "
                "— result would be a silently-truncated partial drain"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
    return spark.read.parquet(f"{work}/out")


def _progress_dicts(q) -> list[dict]:
    """StreamingQuery.recentProgress as plain dicts across PySpark versions
    (older returns dicts; newer returns StreamingQueryProgress objects)."""
    import json as _json

    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            j = p.json() if callable(getattr(p, "json", None)) else p.json
            out.append(_json.loads(j))
    return out


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: drop re-delivered rows by key, keeping state
    only within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The ingestion-side dedup primitive for a training-data pipeline: file
    sources get re-listed, at-least-once buses re-deliver — keying on the
    event id and bounding state by event time makes exactly-once semantics
    out of duplicated input with O(keys-per-horizon) state, not O(corpus).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def interval_join_stream(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each ``right_type`` event to
    same-user ``left_type`` events that happened in the preceding
    ``horizon`` (the click/view -> purchase attribution shape).

    Both sides carry watermarks and the join condition bounds the time
    delta, so Spark can expire buffered rows once the watermark passes the
    interval — state stays O(events-per-horizon), the requirement for an
    unbounded stream. Equi-key on user_id keeps it one shuffle per side.
    """
    horizon_expr = f"INTERVAL {horizon}"
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("l_event"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("r_event"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        F.expr(
            f"l_user = r_user AND l_ts <= r_ts AND r_ts <= l_ts + {horizon_expr}"
        ),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach a (small) static dimension /
    feature table to each streaming row.

    The canonical feature-store shape: the static side is planned ONCE and
    broadcast to every task, so each micro-batch pays a map-side hash join —
    no shuffle of the stream, no state store (unlike stream-stream joins).
    At 100 TB of stream, the only requirement is that ``dim`` stays
    broadcast-sized; a bigger dim drops ``broadcast_dim`` and shuffles
    per micro-batch instead.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def write_stream_exactly_once(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: float = 300.0,
    reset_output: bool = False,
) -> None:
    """Drain a streaming DataFrame into parquet with exactly-once delivery:
    ``foreachBatch`` + idempotent per-batch directory overwrite.

    Spark's streaming checkpoint gives at-least-once batch execution: after
    a crash the last uncommitted micro-batch REPLAYS with the same
    batch_id. The sink makes the replay harmless by making the write a pure
    function of (batch content, batch_id): each batch lands in its own
    ``batch_id=<id>/`` hive-style directory with mode=overwrite, so a
    replayed batch replaces its own partial output instead of appending
    duplicates — at-least-once execution + idempotent write = exactly-once
    output. Readers see the whole corpus via partition discovery over
    ``out_dir`` (batch_id becomes a normal partition column).

    Re-invoking with the same checkpoint is a no-op on an exhausted source
    (availableNow resumes from the committed offsets) — restart safety is
    tested in tests/test_streaming.py.

    Exactly-once scope: the idempotence guarantee holds for SAME-CHECKPOINT
    restarts (replayed batch_ids overwrite their own directories). Re-running
    against the same ``out_dir`` with a FRESH checkpoint is not safe in
    general — different micro-batch boundaries would leave stale
    higher-numbered ``batch_id=`` dirs alongside new data — so this function
    refuses to start when ``out_dir`` already holds batch dirs but
    ``checkpoint_dir`` has never started (no offsets log; a crashed-
    mid-batch checkpoint HAS an offsets log and restarts fine). Pass
    ``reset_output=True`` to explicitly clear the stale batch dirs and
    re-drain from scratch.

    An all-empty drain still writes an empty batch-0 directory (schema, zero
    rows) so ``spark.read.parquet(out_dir)`` works after any completed drain.
    """
    import os as _os

    # A checkpoint that has STARTED (offsets log exists) is a legitimate
    # same-checkpoint restart even if no batch committed yet — a crash
    # between foreachBatch's write and the commit-log record leaves
    # has_output=True with an empty commits/ dir, and the idempotent
    # per-batch overwrite recovers it correctly. Only a checkpoint with no
    # offsets at all is genuinely FRESH and unsafe against existing output.
    has_started = _os.path.isdir(_os.path.join(checkpoint_dir, "offsets")) and bool(
        _os.listdir(_os.path.join(checkpoint_dir, "offsets"))
    )
    has_output = _os.path.isdir(out_dir) and any(
        d.startswith("batch_id=") for d in _os.listdir(out_dir)
    )
    if has_output and not has_started:
        if not reset_output:
            raise ValueError(
                f"out_dir {out_dir!r} holds prior batch output but checkpoint "
                f"{checkpoint_dir!r} has no commit log: a fresh-checkpoint rerun "
                "can duplicate data under different batch boundaries. Clear "
                "out_dir (reset_output=True) or reuse the original checkpoint."
            )
        import shutil as _shutil

        for d in _os.listdir(out_dir):
            if d.startswith("batch_id="):
                _shutil.rmtree(_os.path.join(out_dir, d))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id > 0 and batch_df.isEmpty():
            return  # batch 0 always lands (schema for readers); later empties skip
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        raise TimeoutError(
            f"exactly-once drain into {out_dir!r} did not finish within "
            f"{timeout_s}s — output is a partial prefix, not the full stream"
        )


_ANOM_STATE = "n long, mean double, m2 double"
_ANOM_OUT = "event_id long, user_id long, n_prior long, is_anomaly boolean"


def _update_anomaly(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Welford running mean/variance per user; an event is anomalous when
    its value exceeds mean + 3 sample-stddev of the user's PRIOR history
    (>= 2 prior observations). State is three numbers per key."""
    import math

    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    # concat FIRST: a group's rows can span several Arrow batches with no
    # cross-batch ordering guarantee — sorting each chunk independently
    # would interleave out-of-time-order at >maxRecordsPerBatch group
    # sizes. Order on the MICROSECOND basis (ts_ns // 1000 == epoch_us)
    # per the fixture contract, so ns-resolution sources tie-break like
    # the oracle's (epoch_us, event_id).
    chunks = [c for c in pdfs if len(c)]
    if not chunks:  # NoTimeout means data-driven calls only, but be safe
        state.update((n, mean, m2))
        yield pd.DataFrame(columns=["event_id", "user_id", "n_prior", "is_anomaly"])
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    # lean per-group body (r12, guide §4.2 — the neardup-updater pattern):
    # numpy lexsort + pre-converted python lists replace the per-group
    # pandas assign/sort_values/Series-iteration overhead; the Welford
    # recurrence itself stays the SAME sequential float ops in the same
    # order, so every emitted flag is bit-identical.
    t_us = (pdf["ts_ns"].to_numpy() // 1000)
    eids_a = pdf["event_id"].to_numpy()
    vals_a = pdf["value"].to_numpy()
    if len(eids_a) > 1:
        order = np.lexsort((eids_a, t_us))
        eids_a = eids_a[order]
        vals_a = vals_a[order]
    uid = int(key[0])
    rows = []
    for eid, v in zip(eids_a.tolist(), vals_a.tolist()):
        v = float(v)
        flag = False
        if n >= 2:
            # Welford m2 can drift an ulp below zero on near-constant
            # streams — clamp, don't crash the query
            sd = math.sqrt(max(m2, 0.0) / (n - 1))
            flag = sd > 0 and v > mean + 3 * sd
        rows.append((int(eid), uid, n, flag))
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    state.update((n, mean, m2))  # commit state BEFORE yielding (proven pattern)
    yield pd.DataFrame(
        rows, columns=["event_id", "user_id", "n_prior", "is_anomaly"]
    )


def anomaly_stream(events: DataFrame) -> DataFrame:
    """Per-user streaming anomaly flags (value > mean + 3 stddev of PRIOR
    history) via ``applyInPandasWithState`` — the rolling-statistics shape
    windowed aggregations can't express incrementally. State per key is a
    fixed 3-tuple (Welford), so memory is #users x 24 bytes at any scale."""
    return (
        events.select("event_id", "user_id", "value", "ts_ns")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_anomaly,
            outputStructType=_ANOM_OUT,
            stateStructType=_ANOM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SCD2_STATE = "last_status string, last_from long, version int"
_SCD2_OUT = (
    "user_id long, status string, valid_from_us long, valid_to_us long, version int"
)


def _update_scd2(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Incremental type-2 SCD maintenance per user: a new version row opens
    when the tracked status (event_type) CHANGES; the previous version's
    closing emission carries its valid_to. State is (last_status,
    valid_from, version) — three values per key at any scale."""
    last_status, last_from, version = (
        state.get if state.exists else (None, None, 0)
    )
    chunks = [c for c in pdfs if len(c)]
    if not chunks:
        state.update((last_status, last_from, version))
        yield pd.DataFrame(
            columns=["user_id", "status", "valid_from_us", "valid_to_us", "version"]
        )
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    # order on the microsecond basis + event_id, same as the batch SCD2;
    # lean body (r12, guide §4.2): numpy lexsort + a change-point scan —
    # the per-event loop only ever acts where event_type differs from its
    # predecessor, so replaying the original body over exactly those
    # indices emits the identical rows in the identical order.
    t_us = (pdf["ts_ns"].to_numpy() // 1000)
    eids = pdf["event_id"].to_numpy()
    ets = pdf["event_type"].to_numpy()
    if len(eids) > 1:
        order = np.lexsort((eids, t_us))
        t_us = t_us[order]
        ets = ets[order]
    # object dtype, NOT empty_like(ets): if event_type ever arrived as a
    # fixed-width unicode array, assigning last_status/the sentinel would
    # silently truncate and could fake equality with ets[0] (r12 advice)
    prev = np.empty(len(ets), dtype=object)
    prev[0] = last_status if last_status is not None else "\x00<none>"
    prev[1:] = ets[:-1]
    chg = np.flatnonzero(ets != prev)
    uid = int(key[0])
    rows = []
    for i in chg.tolist():
        et, us = ets[i], int(t_us[i])
        if last_status is None:
            version = 1
            last_status, last_from = et, us
            rows.append((uid, et, us, None, version))  # open row
        else:
            rows.append((uid, last_status, last_from, us, version))  # close
            version += 1
            last_status, last_from = et, us
            rows.append((uid, et, us, None, version))  # new open row
    state.update((last_status, last_from, version))
    yield pd.DataFrame(
        rows, columns=["user_id", "status", "valid_from_us", "valid_to_us", "version"]
    )


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming type-2 SCD maintenance (``applyInPandasWithState``): the
    incremental form of the batch ``q_events_scd2`` — each user's dimension
    history is maintained as events arrive, versions closing with their
    valid_to the moment the status changes. DELIVERY CONTRACT: events must
    arrive time-ordered per key across micro-batches (the standard
    partitioned-log guarantee, e.g. Kafka per-key ordering); within a batch
    any order is fine (sorted in the kernel). The final collapsed output
    equals the batch SCD2 exactly — tested."""
    return (
        events.select("event_id", "user_id", "event_type", "ts_ns")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_scd2,
            outputStructType=_SCD2_OUT,
            stateStructType=_SCD2_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def top_keys_stream(events: DataFrame) -> DataFrame:
    """Streaming frequency table over the parsed ``props`` payload key —
    the heavy-hitters shape: incremental groupBy count whose state is one
    counter per DISTINCT key (exact because the fixture's key domain is
    bounded; an unbounded domain would swap in a space-saving/CMS sketch
    kernel via applyInPandasWithState, same plan shape). Top-k selection
    happens AFTER the drain on the batch result — ordering inside a
    streaming aggregation is not incremental."""
    keyed = events.select(
        F.regexp_extract(F.col("props"), r"(\d+)", 1).cast("int").alias("k")
    )
    return keyed.groupBy("k").agg(F.count("*").cast("long").alias("n"))


_MERGE_STATE = "balance_micros long, n_live long, last_us long, emit_seq int"
_MERGE_OUT = (
    "user_id long, n_live_ops long, balance double, last_op_us long, "
    "alive boolean, emit_seq int"
)


def _quantize_micros(v) -> int:
    """Exactly Spark's CAST(double AS DECIMAL(18,6)) in integer micros:
    shortest-repr decimal of the double, scale 6, HALF_UP. NULL/NaN values
    contribute 0 — matching the batch SUM, where a NULL summand is simply
    skipped (one bad row must degrade the balance, never kill the stream)."""
    from decimal import ROUND_HALF_UP, Decimal

    if v is None or v != v:  # None or NaN (Arrow hands NULL as NaN)
        return 0
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        * 1_000_000
    )


def _update_merge(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Incremental CDC MERGE-apply per user (streaming twin of the batch
    q_events_merge_apply): signup/click/purchase upsert, 'error' is a
    tombstone clearing the row, later ops re-create it. State is four
    scalars per key: exact DECIMAL(18,6) balance held as integer micros, a
    live-op count, the last op time, and an emission sequence so the sink
    can keep each user's LAST snapshot."""
    bal, n, last, seq = state.get if state.exists else (0, 0, 0, 0)
    chunks = [c for c in pdfs if len(c)]
    if not chunks:
        state.update((bal, n, last, seq))
        yield pd.DataFrame(columns=[
            "user_id", "n_live_ops", "balance", "last_op_us", "alive",
            "emit_seq"])
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    # lean body (r12, guide §4.2): numpy lexsort + aggregate only the
    # events AFTER the batch's last tombstone — the loop's net effect is
    # (reset if any error) + count/max/quantized-sum over the tail, and
    # the exact Decimal quantization runs only over the tail's
    # click/purchase values instead of every event.
    t_us = (pdf["ts_ns"].to_numpy() // 1000)
    eids = pdf["event_id"].to_numpy()
    ets = pdf["event_type"].to_numpy()
    vals = pdf["value"].to_numpy()
    if len(eids) > 1:
        order = np.lexsort((eids, t_us))
        t_us = t_us[order]
        ets = ets[order]
        vals = vals[order]
    err_idx = np.flatnonzero(ets == "error")
    start = int(err_idx[-1]) + 1 if len(err_idx) else 0
    if len(err_idx):
        bal, n, last = 0, 0, 0
    tail_ets = ets[start:]
    if len(tail_ets):
        n += len(tail_ets)
        last = int(t_us[-1])
        money = (tail_ets == "click") | (tail_ets == "purchase")
        for v in vals[start:][money].tolist():
            bal += _quantize_micros(v)
    seq += 1
    state.update((bal, n, last, seq))
    yield pd.DataFrame(
        [(int(key[0]), n, round(bal / 1e6, 6), last, n > 0, seq)],
        columns=["user_id", "n_live_ops", "balance", "last_op_us", "alive",
                 "emit_seq"],
    )


def merge_apply_stream(events: DataFrame) -> DataFrame:
    """Streaming CDC MERGE-apply (``applyInPandasWithState``): per-user
    final-state maintenance under upserts and delete tombstones — the
    incremental form of the batch ``q_events_merge_apply``. Same delivery
    contract as ``scd2_stream``: per-key time order across micro-batches
    (partitioned-log guarantee); any order within a batch. Each batch emits
    the user's CURRENT snapshot (update mode) tagged with an emission
    sequence; the sink keeps each user's last snapshot and drops dead rows,
    so a user whose log ends in a tombstone vanishes even though earlier
    snapshots were emitted."""
    return (
        events.filter(
            F.col("event_type").isin("signup", "click", "purchase", "error")
        )
        .select("event_id", "user_id", "event_type", "value", "ts_ns")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_merge,
            outputStructType=_MERGE_OUT,
            stateStructType=_MERGE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def read_document_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the documents table — the ingest shape of a
    continuously-crawled corpus (new parquet drops appear as micro-batches)."""
    apply_runtime_confs(spark)
    schema = _source_schema(spark, sf_dir, glob)
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(sf_dir)


_NEARDUP_OUT = "id_a long, id_b long, hamming long"
_NEARDUP_STATE = "ids array<long>, sigs array<long>"
# TTL mode: per-member event-time ms rides along so hot buckets can prune
# watermark-expired members on data arrival (the timeout path only covers
# buckets with no traffic)
_NEARDUP_STATE_TTL = "ids array<long>, sigs array<long>, tss array<long>"
_NEARDUP_MAX_HAMMING = 3  # fixed with the 4x16 pigeonhole chunking below


_NEARDUP_EMPTY = pd.DataFrame(
    {
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "hamming": pd.Series([], dtype="int64"),
    }
)


def _make_simhash_bucket_updater(ttl_ms: int | None = None, ts_col: str | None = None):
    """Build the per-bucket state updater. With ``ttl_ms`` (and the event-
    time column riding along as ``ts_col``), each data invocation re-arms
    an EVENT-TIME timeout at max(batch event time) + ttl; when the
    watermark passes it the group fires with ``hasTimedOut`` and the
    bucket's state is REMOVED — the hot-bucket eviction path (r10 verdict
    task 4). Without it, the NoTimeout form is unchanged.

    Per-group Python cost is the operator's wall-clock at corpus scale
    (r12, guide §4.2/§1.2: ~18k occupied buckets at sf0.1 -> ~18k calls
    of this function per drain; measured ~2.0 ms/group of pure pandas
    overhead in the previous form — sort_values, fresh empty frames,
    Series iteration — vs ~0.4 ms lean). The lean form: ONE module-level
    empty frame reused for the no-pair yields (never mutated downstream;
    the Arrow serializer only reads it), numpy column views + a stable
    argsort instead of DataFrame sort, and output-frame construction only
    when a pair actually fired. Semantics are bit-identical: same
    doc_id processing order, same pairing, same state tuples."""

    def _empty():
        return _NEARDUP_EMPTY

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        """Per-(chunk_idx, chunk_val) bucket state: every SimHash signature
        seen so far. Each arriving doc pairs against the bucket's history
        (and the earlier docs of its own batch, doc_id-ordered), emitting
        pairs at hamming <= 3 — so the emitted pair SET is batching-
        invariant: each unordered pair fires exactly once per shared
        bucket, at the moment its later member arrives. Re-delivered
        doc_ids are dropped against state (file sources re-list).

        TTL mode keeps a third per-member array of event-time ms and
        evicts on BOTH paths: the event-time timeout removes buckets that
        stop receiving traffic, and a member prune on every data arrival
        drops entries the watermark has outlived — necessary because the
        timeout never fires for a group that has data in the batch, so a
        HOT bucket would otherwise pair against arbitrarily old history."""
        if ttl_ms is not None and state.hasTimedOut:
            # watermark passed the bucket's TTL: evict. Docs arriving later
            # no longer pair against this bucket's history — the bounded-
            # state trade a production crawl makes explicitly.
            state.remove()
            yield _empty()
            return
        if ttl_ms is None:
            ids, sigs = ([], []) if not state.exists else [list(x) for x in state.get]
            tss = []
        else:
            ids, sigs, tss = (
                ([], [], []) if not state.exists else [list(x) for x in state.get]
            )
            # member-level watermark prune: expired history must not pair
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and ids:
                keep = [i for i, t in enumerate(tss) if t + ttl_ms >= wm]
                if len(keep) < len(ids):
                    ids = [ids[i] for i in keep]
                    sigs = [sigs[i] for i in keep]
                    tss = [tss[i] for i in keep]
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            state.update((ids, sigs) if ttl_ms is None else (ids, sigs, tss))
            yield _empty()
            return
        # first-match-chunk emission (r12, guide §2.3 shuffle fewer bytes):
        # a qualifying pair shares one bucket per equal chunk (a hamming-0
        # pair shares all 4), so bucket-local pairing emits it up to 4x and
        # the caller's distinct collapses the copies. Both full signatures
        # are IN the bucket, so each bucket can recompute the lower-index
        # chunk values from sig XOR and emit ONLY when no earlier chunk
        # also matches — every pair fires exactly once (at its first
        # shared chunk), cutting emitted rows ~2x before the sink/distinct.
        # Consistent under TTL eviction: a doc's expiry condition
        # (member-time + ttl vs the batch-global watermark) is identical
        # in every bucket it occupies, so "the earlier bucket would have
        # emitted it" holds exactly when this bucket sees the pair.
        chunk_idx = int(key[0])
        _w = 64 // (_NEARDUP_MAX_HAMMING + 1)
        _m = (1 << _w) - 1
        low_shifts = [c * _w for c in range(chunk_idx)]
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        dids = pdf["doc_id"].to_numpy()
        sgs = pdf["sig"].to_numpy()
        ts_vals = (
            pdf[ts_col].to_numpy().astype("datetime64[ns]").astype("int64")
            // 10**6
            if ttl_ms is not None
            else None
        )
        if len(dids) > 1:
            order = np.argsort(dids, kind="stable")
            dids = dids[order]
            sgs = sgs[order]
            if ts_vals is not None:
                ts_vals = ts_vals[order]
        seen = set(ids)
        rows = []
        for pos in range(len(dids)):
            did, sg = int(dids[pos]), int(sgs[pos])
            if did in seen:
                continue
            for pid, ps in zip(ids, sigs):
                x = (sg ^ ps) & 0xFFFFFFFFFFFFFFFF
                h = bin(x).count("1")
                if h <= _NEARDUP_MAX_HAMMING and not any(
                    (x >> s) & _m == 0 for s in low_shifts
                ):
                    rows.append((min(did, pid), max(did, pid), h))
            ids.append(did)
            sigs.append(sg)
            if ttl_ms is not None:
                tss.append(int(ts_vals[pos]))
            seen.add(did)
        # commit state BEFORE yielding (proven pattern)
        state.update((ids, sigs) if ttl_ms is None else (ids, sigs, tss))
        if ttl_ms is not None:
            # re-arm: the bucket lives ttl past its newest member's event
            # time; clamp above the current watermark (Spark rejects
            # timeouts the watermark has already passed)
            max_event_ms = int(ts_vals.max())
            state.setTimeoutTimestamp(
                max(max_event_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if not rows:
            yield _empty()
        else:
            yield pd.DataFrame(
                rows, columns=["id_a", "id_b", "hamming"]
            ).astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})

    return update


_update_simhash_bucket = _make_simhash_bucket_updater()


def simhash_neardup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    ttl_seconds: float = 3600.0,
    watermark_delay: str = "0 seconds",
    output_mode: str = "update",
) -> DataFrame:
    """STREAMING SimHash near-dup detection: 64-bit md5-derived signatures
    computed map-side (stateless), pigeonhole-banded into 4x16-bit chunks,
    then a stateful per-bucket pairing (`applyInPandasWithState`) — the
    online form of `dedup.simhash_pairs`, for flagging near-duplicates at
    INGEST time instead of in a batch sweep.

    Recall contract carries over: hamming <= 3 with 4 chunks means every
    qualifying pair shares at least one exact chunk, so pairing inside
    buckets misses nothing. State is (ids, sigs) per occupied bucket — 16
    bytes per doc per chunk, the same footprint as the batch inverted
    index, held online.

    Hot-bucket TTL (r11, executable — formerly a documented knob): pass
    ``ts_col`` (an event-time timestamp column) to bound state with
    WATERMARK EVICTION — each bucket arms an event-time timeout at
    max(member event time) + ``ttl_seconds``; when the watermark
    (``watermark_delay`` behind max event time) passes it, the bucket's
    state is removed, so docs arriving later than the TTL no longer pair
    against the evicted history and ``numRowsTotal`` stays bounded by the
    TTL window (telemetry-asserted in tests/test_streaming.py). The
    recall trade is explicit: pairs whose members arrive more than the
    TTL apart are not emitted. The fixture's registry entry has no time
    column and keeps the exact NoTimeout form.

    ``output_mode`` ("update" | "append", r12): the updater only ever
    emits NEW pairs (never revisions of earlier output), so its row
    stream is append-semantics either way; declaring "append" lets the
    drain use the executor-parallel file sink (`run_stream_to_files`)
    instead of the driver-collecting memory sink. Emitted pairs are
    identical in both modes."""
    from squrve_spark.operators.dedup import _md5_hash64, _simhash_udf
    from squrve_spark.operators.text import tokens_expr

    token_hashes = F.transform(F.array_distinct(tokens_expr(text_col)), _md5_hash64)
    extra = [F.col(ts_col)] if ts_col else []
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), _simhash_udf(token_hashes).alias("sig"), *extra
    )
    chunks, width = _NEARDUP_MAX_HAMMING + 1, 64 // (_NEARDUP_MAX_HAMMING + 1)
    mask = (1 << width) - 1
    chunked = sigs.select(
        "doc_id",
        "sig",
        *([F.col(ts_col)] if ts_col else []),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda c: F.call_function(
                    "shiftrightunsigned", F.col("sig"), c * width
                ).bitwiseAND(F.lit(mask)),
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    if ts_col is None:
        return chunked.groupBy("chunk_idx", "chunk_val").applyInPandasWithState(
            _update_simhash_bucket,
            outputStructType=_NEARDUP_OUT,
            stateStructType=_NEARDUP_STATE,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return (
        chunked.withWatermark(ts_col, watermark_delay)
        .groupBy("chunk_idx", "chunk_val")
        .applyInPandasWithState(
            _make_simhash_bucket_updater(int(ttl_seconds * 1000), ts_col),
            outputStructType=_NEARDUP_OUT,
            stateStructType=_NEARDUP_STATE_TTL,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
