"""Table registration and loading over the driver-provided parquet tables.

Reference analog: Squrve resolves a benchmark ``db_id`` to a sqlite file /
warehouse database and introspects it (``core/db_connect.py:139-147``,
``core/data_manage.py:841-916`` in /root/reference). Here a "database" is a
directory of parquet files registered as temp views; all introspection comes
from the Spark catalog.

Scale notes:
  * Registration is metadata-only (lazy scans); per-query re-registration is
    cheap and idempotent.
  * ``events`` time is normalized schema-adaptively: the fixture has shipped
    ``ts`` as TIMESTAMP(NANOS) (reads as ``bigint`` under
    ``spark.sql.legacy.parquet.nanosAsLong``), as ``timestamp[us]`` (reads as
    TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ), and could ship plain
    TIMESTAMP. Whatever arrives, the loader exposes BOTH ``ts`` (TIMESTAMP —
    the analytic/watermark column; session TZ is pinned UTC so NTZ->TIMESTAMP
    casts are value-stable) and ``ts_ns`` (epoch-nanos long — the exact
    join/sort key). Conversion is a codegen'd projection, no Python involved.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from squrve_spark.session import apply_runtime_confs

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]
AUX_TABLES = ["events", "documents", "embeddings"]
ALL_TABLES = TPCH_TABLES + AUX_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_time(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to (ts TIMESTAMP, ts_ns long)
    regardless of how the parquet encoded it.

    Accepted encodings (all observed across driver fixture generations):
      * ``bigint``        — epoch nanoseconds (TIMESTAMP(NANOS) parquet read
                            under ``nanosAsLong``): exact ns kept, ts derived.
      * ``timestamp_ntz`` — parquet timestamp[us] without tz: cast to
                            TIMESTAMP (session TZ pinned UTC => value-stable),
                            ts_ns derived as ``unix_micros(ts) * 1000``.
      * ``timestamp``     — ts_ns derived the same way.
    Works for batch and streaming frames alike (pure column projection).
    """
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_ns", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
        )
    # column order is normalized but the SET is whatever the fixture ships —
    # hard-coding a column list here would crash on the next fixture drift
    # (the exact failure mode this function exists to prevent)
    lead = ["event_id", "ts", "ts_ns"]
    rest = [c for c in df.columns if c not in lead]
    return df.select(*[c for c in lead if c in df.columns], *rest)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the events time column (any encoding).

    Memoized per (session, sf_dir, table): ``spark.read.parquet`` re-reads
    file listings + footers on every call (~100 ms each — a 6-table join
    paid ~0.6 s of pure metadata work per run). DataFrame plans are
    immutable, so reuse is safe; the cache dies with the session object.
    Reusing the object also memoizes its ``.rdd`` (spread's partition probe)
    and keeps analyzed-plan fragments cacheable across queries.
    """
    cache = spark.__dict__.setdefault("_squrve_table_cache", {})
    key = (os.path.abspath(sf_dir), name)
    df = cache.get(key)
    if df is not None:
        return df
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_events_time(df)
    cache[key] = df
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    session's parallelism.

    Single-file parquet reads with one row group arrive as ONE partition, so
    per-row CPU-heavy operators (shingling, signatures, scoring) would run
    single-threaded. At real scale inputs already carry >= cores partitions
    and this is a no-op — the shuffle only ever pays for itself.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Probing partition counts by building the physical RDD is NOT free on
    # shuffle-bearing plans (r12): an ADAPTIVE plan executes its upstream
    # query stages (one real job per spread() call — measured: line_dedup
    # re-ran its payload shuffle on every plan build), and even with AQE
    # off a BroadcastHashJoin fires its async broadcast-build job and a
    # global-Sort range exchange samples its boundaries at RDD
    # construction. So decide STATICALLY from the analyzed logical plan:
    # any shuffle-introducing node (join/aggregate/window/global sort/
    # repartition/dedup/set-op) means output partitioning follows
    # spark.sql.shuffle.partitions (>= cores on any sane deployment;
    # AQE may coalesce tiny exchanges, which is the right call at scale) —
    # spread no-ops without touching the physical plan. Only plain
    # scan/project/filter/generate/union chains — the single-file-fixture
    # case this function exists for — are probed, and those plans are
    # exchange-free so the probe launches nothing.
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # non-classic sessions (e.g. Spark Connect)
        plan = ""
    if plan:
        import re as _re

        # Repartition\w* covers RepartitionByExpression / RebalancePartitions
        # (r12 advice: the bare \b missed them, falling through to the JVM
        # probe this branch exists to avoid); GlobalLimit likewise implies a
        # single-partition exchange downstream.
        if _re.search(
            r"(?m)^[\s:+|-]*(Join|Aggregate|Repartition\w*|Window|Deduplicate"
            r"|Intersect|Except|CTERelationRef|WithCTE|GlobalLimit)\b",
            plan,
        ) or _re.search(r"(?m)^[\s:+|-]*Sort \[.*\], true", plan):
            return df
    try:
        # JVM-side probe: skips wrapping the plan in the Python-pickle RDD
        # serde that df.rdd builds (measured 4x cheaper per call; this runs
        # once per operator construction, so it adds up across a workload)
        n = df._jdf.rdd().getNumPartitions()
    except Exception:  # non-classic sessions (e.g. Spark Connect)
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def int_array_expr(vals):
    """Literal int array as ONE parsed SQL expression.

    ``F.array(*[F.lit(int(v)) for v in vals])`` costs one py4j round trip
    per element — a 1024-bucket weight table built that way adds ~2 s of
    pure DRIVER time to every plan build (measured on sim_ivf_topk's
    16x64 centroid literals, r10 verdict task 6). One ``F.expr`` parse is
    a single JVM call; the resulting literal array is identical."""
    if not len(vals):
        return F.array()
    return F.expr("array(" + ",".join(str(int(v)) for v in vals) + ")")


def double_array_expr(vals):
    """Literal double array as ONE parsed SQL expression (see
    `int_array_expr`). ``DOUBLE('<repr>')`` casts the shortest round-trip
    decimal string back to the identical IEEE value, so oracles replaying
    the values see exactly the doubles ``F.lit(float(v))`` produced (bare
    SQL decimals would parse as DECIMAL, not DOUBLE).

    Finite values only (r11 advice, premise corrected by measurement:
    Spark 4's string-to-double cast DOES parse 'nan'/'inf' — but the
    guard stays). Every caller feeds trained weights or scale factors
    that are finite by construction, so a non-finite input here is an
    upstream training bug; and any DuckDB oracle replaying the literal
    would have to match engine-specific non-finite spellings/totals —
    failing loudly beats a silent cross-engine hash mismatch."""
    if not len(vals):
        return F.array()
    floats = [float(v) for v in vals]
    bad = [v for v in floats if not math.isfinite(v)]
    if bad:
        raise ValueError(
            f"double_array_expr requires finite values; got {bad[:3]!r} "
            "(a non-finite trained weight/scale is an upstream bug)"
        )
    return F.expr("array(" + ",".join(f"DOUBLE('{v!r}')" for v in floats) + ")")


# Session-memo entry bound, shared by every plan_key-keyed cache (r12).
# The caps were 64 per cache; a full 205-entry registry pass creates 64
# distinct memo_checkpoint frames (measured), so the FIFO sat exactly at
# the edge and wrapped — 2 re-misses (re-materializations) per bench pass.
# 256 gives headroom; entries are bounded derived frames/trained scalars,
# so the executor cost of the extra slots is trivial. Env-overridable for
# constrained deployments.
MEMO_CAP = int(os.environ.get("SQURVE_MEMO_CAP", "256"))


def _file_fingerprint(uri: str) -> tuple:
    """(uri, size, mtime_ns) for a local input file — the cheap snapshot
    fingerprint folded into plan_key (r12 advice / r13): an IN-PLACE
    rewrite of the same path changes size/mtime, so every plan_key-keyed
    memo (checkpoints, offsets, trained scalars, counts) misses instead
    of serving stale data. Non-local / unstat-able URIs degrade to the
    bare name (the pre-r13 behavior)."""
    path = uri
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        path = unquote(urlparse(uri).path)
    try:
        st = os.stat(path)
        return (uri, st.st_size, st.st_mtime_ns)
    except OSError:
        return (uri,)


def plan_key(df: DataFrame) -> tuple:
    """THE session-memo cache key for a DataFrame: (canonicalized plan
    string, semanticHash, sorted input-file fingerprints). All three
    components are load-bearing — see memo_checkpoint's docstring for why
    the canonicalized toString alone collides across parquet paths, and
    `_file_fingerprint` for why the file list carries size+mtime. Shared
    by memo_checkpoint, similarity.int8_scales and similarity.integer_kmeans
    (r10 review: three hand-copied key recipes could drift independently)."""
    qe = df._jdf.queryExecution()
    return (
        qe.analyzed().canonicalized().toString(),
        qe.analyzed().semanticHash(),
        tuple(_file_fingerprint(f) for f in sorted(df.inputFiles())),
    )


def memo_checkpoint(df: DataFrame) -> DataFrame:
    """Lazily localCheckpoint ``df``, memoized per session on the
    canonicalized analyzed plan.

    Re-invoking an operator rebuilds an identical plan; a fresh
    ``localCheckpoint`` per call materializes a NEW block set each time
    while the orphaned old ones wait for driver+JVM GC (measured:
    dedup_simhash grew 2.4s -> 5.2s over four back-to-back runs from
    accumulating block pressure). Keying the checkpoint on the plan's
    canonicalized form (expression-id-normalized, so identical rebuilt
    plans match) reuses ONE materialized block set per distinct operator
    configuration — storage is bounded by configuration count, not call
    count, and repeat calls skip the recompute entirely. The cache dies
    with the session; entries are FIFO-evicted past MEMO_CAP (default
    256, env-overridable via SQURVE_MEMO_CAP) so a long-lived service
    cannot pin unbounded executor storage. Staleness: plan_key folds in
    each input file's size+mtime (r13), so an in-place rewrite of the
    same path misses instead of serving the old checkpoint.

    Key construction: the canonicalized toString alone is NOT sufficient —
    a canonicalized ``LogicalRelation`` prints only its (id-normalized)
    output attributes, not the files it scans, so two reads of *different*
    parquet paths with the same schema stringify identically (measured:
    sf0.001 vs sf0.01 documents collide, serving one sf's checkpoint for
    the other). The key therefore also folds in ``semanticHash`` (which
    distinguishes in-memory LocalRelations by data) and the plan's input
    file list (which distinguishes file scans by path).
    """
    spark = df.sparkSession
    cache = spark.__dict__.setdefault("_squrve_ckpt_cache", {})
    key = plan_key(df)
    hit = cache.get(key)
    if hit is None:
        while len(cache) >= MEMO_CAP:
            cache.pop(next(iter(cache)))
        hit = cache[key] = df.localCheckpoint(eager=False)
    return hit


def memo_count(df: DataFrame) -> int:
    """Session-memoized ``df.count()`` per plan snapshot (r12): derived
    scalar of a deterministic frame over the read-only test tables — the
    same contract as the trained-scalar memos (dim counts, vocab sizes).
    Repeat builds skip the count job; the frame's own execution paths are
    untouched."""
    spark = df.sparkSession
    cache = spark.__dict__.setdefault("_squrve_count_cache", {})
    key = plan_key(df)
    n = cache.get(key)
    if n is None:
        n = df.count()
        while len(cache) >= MEMO_CAP:
            cache.pop(next(iter(cache)))
        cache[key] = n
    return n


def memo_plan(spark: SparkSession, key: tuple, build):
    """Session-memoize a BUILT (lazy) DataFrame per logical key.

    r12 (guide §1.2, driver side): re-invoking an ANN operator with an
    identical (corpus snapshot, queries snapshot, params) tuple rebuilds
    a bit-identical logical plan — for the quantized tiers that means
    re-parsing the literal-codebook SQL and re-running Catalyst analysis
    (measured 0.4–0.7 s per build at codebook_k=16, and the recall audit
    pays it for every tier it composes). Returning the SAME DataFrame
    object skips only that plan construction: every action on it still
    executes the full distributed plan (the noop-sink bench re-scores
    the corpus per pass). ``key`` must capture every input that shapes
    the plan — the callers fold in `plan_key` of each input frame plus
    all scalar params, so any change to data or configuration rebuilds.
    NEVER use this for builders with side effects (stream drains,
    training loops whose collects aren't themselves memoized)."""
    cache = spark.__dict__.setdefault("_squrve_plan_cache", {})
    hit = cache.get(key)
    if hit is None:
        hit = build()
        while len(cache) >= MEMO_CAP:
            cache.pop(next(iter(cache)))
        cache[key] = hit
    return hit


def memo_broadcast(spark: SparkSession, value, tag: str = ""):
    """Broadcast ``value`` once per session per CONTENT, not per call.

    r12 (guide §1.2, driver side): a fresh ``sparkContext.broadcast`` per
    operator call gives every ``applyInPandas``/``mapInPandas`` kernel
    closure a new broadcast id, which lands in the pickled UDF bytes
    inside the plan — so two otherwise identical plans get different
    ``semanticHash`` values and EVERY downstream ``plan_key`` memo
    (memo_checkpoint, dsir weights, codebooks) misses forever (measured:
    pipeline_curate_v7 re-collected its DSIR distributions on every pass
    because semantic_dedup's kernel broadcast changed the plan hash).
    Keying the broadcast on a content fingerprint makes repeat operator
    builds reuse ONE broadcast, which (verified) restores bit-stable
    plan keys. Values are the engine's bounded trained artifacts
    (centroid matrices, ADC tables, eval shingle sets) — never corpus-
    sized. Evicted entries are unpersisted best-effort (r13): executor
    copies are dropped; an earlier plan that still references one
    re-ships it lazily from the retained driver value, so eviction can
    never break a live plan (destroy() would — never use it here).
    """
    import hashlib
    import pickle

    cache = spark.__dict__.setdefault("_squrve_bcast_cache", {})
    key = (tag, hashlib.md5(pickle.dumps(value, protocol=4)).hexdigest())
    hit = cache.get(key)
    if hit is not None:
        return hit
    bc = spark.sparkContext.broadcast(value)
    while len(cache) >= MEMO_CAP:
        old = cache.pop(next(iter(cache)))
        try:
            old.unpersist(False)  # drop executor copies; driver value stays
        except Exception:  # noqa: BLE001 — best-effort cleanup
            pass
    cache[key] = bc
    return bc


def clear_session_memos(spark: SparkSession) -> int:
    """Drop EVERY session-scoped memo cache — checkpoints, plan objects,
    trained scalars/models, broadcasts, table/schema metadata — so the
    next build of any operator pays its full first-run cost.

    This is the bench's memo-cold hook (r12 verdict task 1): steady-state
    passes with warm memos measure the long-lived-service workload, but
    the 100 TB-relevant number is what a FIRST run of each query costs —
    training jobs, checkpoint materializations, metadata reads included.
    Clearing between passes makes the two separable without ripping out
    memos a real service legitimately wants.

    Every memo in the engine lives in ``spark.__dict__`` under a
    ``_squrve_*`` key (the session-lifetime convention), so the sweep is
    name-based and future-proof. Broadcast entries are unpersisted
    best-effort first (executor copies dropped; a plan still referencing
    one re-ships lazily from the driver value, so nothing breaks).
    Checkpoint blocks are freed by the ContextCleaner once the dropped
    frames are garbage-collected — ``gc.collect()`` nudges that so
    repeated cold passes don't accumulate orphaned block sets.
    Returns the number of caches cleared."""
    import gc

    names = [k for k in list(spark.__dict__) if k.startswith("_squrve_")]
    for name in names:
        cache = spark.__dict__.get(name)
        if name == "_squrve_bcast_cache" and isinstance(cache, dict):
            for bc in cache.values():
                try:
                    bc.unpersist(False)
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass
        spark.__dict__.pop(name, None)
    gc.collect()
    return len(names)


def register_tables(
    spark: SparkSession,
    sf_dir: str | None = None,
    tables: list[str] | None = None,
    prefix: str = "",
) -> dict[str, DataFrame]:
    """Register parquet tables as temp views; returns name -> DataFrame.

    ``prefix`` gives the multi-database namespace the reference gets from
    db-per-file sqlite (SURVEY §1.3): views named ``{prefix}{table}``.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    tables = tables if tables is not None else ALL_TABLES
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(f"{prefix}{name}")
        out[name] = df
    return out
