"""SparkSession factory tuned for the engine.

Single long-lived session on the driver (reference keeps one sqlite/warehouse
connection per query; we keep one JVM for the whole run — per-query session
spin-up would dominate sub-second queries, cf. BASELINE.md interpretation).

Scale stance: these confs are the local[32] test profile of settings that are
equally valid on a 1000-executor cluster — AQE (runtime coalescing + skew-join
splitting), adaptive broadcast selection, Arrow for any pandas-boundary
transfer. Only master/memory are local-mode specific.
"""

from __future__ import annotations

import os
import shutil
import zipfile

from pyspark.sql import SparkSession

# Confs that must hold on ANY session running engine queries (runtime-settable).
RUNTIME_CONFS: dict[str, str] = {
    # some fixture generations ship events.parquet with TIMESTAMP(NANOS),
    # which Spark's reader rejects; this conf makes those read as epoch-nanos
    # longs instead of erroring. catalog.normalize_events_time then adapts to
    # whichever encoding actually arrived (bigint / timestamp / timestamp_ntz).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # classic (non-ANSI) arithmetic: silent 64-bit wraparound, lax casts —
    # matches the reference's sqlite-grade semantics and lets hash mixing
    # (minhash permutations) use native long multiply
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # foreign sessions arrive with the 200 default; AQE coalesces batch
    # shuffles but NOT streaming state stores — 64 keeps local state-store
    # overhead sane and is re-overridden by get_spark's own sizing
    "spark.sql.shuffle.partitions": "64",
}


_SHIPPED: set[int] = set()  # SparkContext ids already carrying the package


def _ship_package(spark: SparkSession) -> None:
    """addPyFile the squrve_spark package so Python workers can unpickle
    module-level UDF functions (pickled by reference) no matter what
    sys.path the driver process has. Same mechanism ships the code to real
    executors on a cluster; a no-op after the first call per context."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join("/tmp", f"squrve_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join("squrve_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        shutil.move(tmp, zip_path)
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # already added under another name: workers can import either way
    _SHIPPED.add(key)


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-created session.

    Entry points that receive a foreign ``SparkSession`` (the verify driver's)
    call this so behavior doesn't depend on who built the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: keep going, reads may still work
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "squrve_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver harness contract) else 32.
    ``spark.sql.shuffle.partitions`` defaults to 2x cores locally; on a real
    cluster AQE coalescing makes the initial number mostly a ceiling.
    """
    cpus = int(cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate may have returned a pre-existing session: re-assert runtime confs
    apply_runtime_confs(spark)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
